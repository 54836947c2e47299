"""Pallas decode-attention kernel: interpret-mode equivalence vs XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.ops.decode_attention import (
    decode_attention,
    decode_attention_reference,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject)


@pytest.mark.parametrize("length", [1, 63, 64, 100, 256])
def test_kernel_matches_reference(length):
    B, H, S, D = 4, 2, 256, 64
    HD = H * D
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, HD)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.float32)
    # poison invalid cache region: must never influence the output
    k = k.at[:, length:, :].set(jnp.nan)
    v = v.at[:, length:, :].set(jnp.nan)

    ref = decode_attention_reference(q, k, v, jnp.int32(length), n_head=H)
    out = decode_attention(q, k, v, jnp.int32(length), n_head=H, interpret=True)
    assert not np.isnan(np.asarray(out)).any()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_kernel_bf16():
    B, H, S, D = 2, 6, 128, 64
    HD = H * D
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, HD)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, S, HD)), jnp.bfloat16)
    ref = decode_attention_reference(q, k, v, jnp.int32(77), n_head=H)
    out = decode_attention(q, k, v, jnp.int32(77), n_head=H, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


def test_model_pallas_flag_matches_xla():
    """GPT decode step with attn_impl='pallas' == attn_impl='xla'
    (kernel runs in interpret mode on CPU automatically)."""
    import dataclasses

    from ai_music_generation_tpu.models.gpt import GPT, GPTConfig, KVCache

    cfg_x = GPTConfig(block_size=64, vocab_size=32, n_layer=2, n_head=2,
                      n_embd=32, dropout=0.0, dtype=jnp.float32, attn_impl="xla")
    model_x = GPT(cfg_x)
    params = model_x.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    prompt = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    cache = KVCache.create(cfg_x, 1, dtype=jnp.float32)
    _, _, cache = model_x.apply(params, prompt, cache=cache)
    step_x, _, _ = model_x.apply(params, jnp.asarray([[9]], jnp.int32), cache=cache)

    cfg_p = dataclasses.replace(cfg_x, attn_impl="pallas")
    step_p, _, _ = GPT(cfg_p).apply(params, jnp.asarray([[9]], jnp.int32), cache=cache)
    np.testing.assert_allclose(
        np.asarray(step_x), np.asarray(step_p), atol=1e-5, rtol=1e-5
    )

"""GPT model unit tests: shapes, loss masking, KV-cache equivalence, surgery."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.models.gpt import (
    GPT,
    GPTConfig,
    KVCache,
    cross_entropy_ignore_index,
    crop_block_size,
    num_params,
)

TINY = GPTConfig(
    block_size=32, vocab_size=64, n_layer=2, n_head=2, n_embd=32,
    dropout=0.0, bias=True, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = GPT(TINY)
    idx = jnp.zeros((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), idx)
    return model, params


def test_forward_shapes_train(tiny_model):
    model, params = tiny_model
    idx = jnp.ones((2, 8), jnp.int32)
    targets = jnp.ones((2, 8), jnp.int32)
    logits, loss, _ = model.apply(params, idx, targets)
    assert logits.shape == (2, 8, TINY.vocab_size)
    assert loss.shape == ()
    assert jnp.isfinite(loss)


def test_forward_inference_last_position_only(tiny_model):
    model, params = tiny_model
    idx = jnp.ones((2, 8), jnp.int32)
    logits, loss, _ = model.apply(params, idx)
    assert logits.shape == (2, 1, TINY.vocab_size)
    assert loss is None


def test_loss_ignore_index():
    logits = jnp.array([[[2.0, 0.0], [0.0, 2.0]]])
    t_all = jnp.array([[0, 1]])
    t_masked = jnp.array([[0, -1]])
    l_all = cross_entropy_ignore_index(logits, t_all)
    l_masked = cross_entropy_ignore_index(logits, t_masked)
    # identical per-token losses here, so masking should not change the mean
    assert np.isclose(float(l_all), float(l_masked), atol=1e-6)
    # a fully masked batch must not produce nan
    l_none = cross_entropy_ignore_index(logits, jnp.array([[-1, -1]]))
    assert jnp.isfinite(l_none)


def test_kv_cache_matches_full_forward(tiny_model):
    """Incremental decode must reproduce full-context logits."""
    model, params = tiny_model
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, TINY.vocab_size, size=(2, 10)), jnp.int32)

    # full forward, last position
    full_logits, _, _ = model.apply(params, idx)

    # prefill 6 tokens then step 4 tokens one at a time
    cache = KVCache.create(TINY, batch=2, dtype=jnp.float32)
    logits, _, cache = model.apply(params, idx[:, :6], cache=cache)
    for t in range(6, 10):
        logits, _, cache = model.apply(params, idx[:, t : t + 1], cache=cache)
    # tolerances allow for different fp32 accumulation orders (padded cache
    # softmax length vs exact-length softmax)
    np.testing.assert_allclose(
        np.asarray(full_logits), np.asarray(logits), rtol=1e-3, atol=1e-3
    )
    assert int(cache.length) == 10


def test_crop_block_size(tiny_model):
    model, params = tiny_model
    new_params, new_cfg = crop_block_size(params, TINY, 16)
    assert new_cfg.block_size == 16
    assert new_params["params"]["wpe"]["embedding"].shape[0] == 16
    idx = jnp.ones((1, 16), jnp.int32)
    logits, _, _ = GPT(new_cfg).apply(new_params, idx)
    assert logits.shape == (1, 1, TINY.vocab_size)


def test_num_params(tiny_model):
    _, params = tiny_model
    n = num_params(params)
    n_with = num_params(params, non_embedding=False)
    assert n_with - n == TINY.block_size * TINY.n_embd
    assert n > 0


def test_dropout_rng_changes_output():
    cfg = dataclasses.replace(TINY, dropout=0.5)
    model = GPT(cfg)
    idx = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), idx)
    t = jnp.ones((2, 8), jnp.int32)
    _, l1, _ = model.apply(params, idx, t, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
    _, l2, _ = model.apply(params, idx, t, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.isclose(float(l1), float(l2))


def test_flash_flag_falls_back_off_tpu():
    """attn_impl='flash' must produce identical results off-TPU (fallback)."""
    import dataclasses

    cfg_f = dataclasses.replace(TINY, attn_impl="flash")
    model_f = GPT(cfg_f)
    model_x = GPT(TINY)
    idx = jnp.ones((2, 8), jnp.int32)
    params = model_x.init(jax.random.PRNGKey(0), idx)
    t = jnp.ones((2, 8), jnp.int32)
    _, lf, _ = model_f.apply(params, idx, t)
    _, lx, _ = model_x.apply(params, idx, t)
    assert float(lf) == float(lx)


def test_forward_rejects_overlong_sequence():
    """T > block_size must error at trace time: the wpe clipping gather
    would otherwise silently reuse the last position row (the reference
    asserts the same bound, nanoGPT/model.py:172)."""
    import pytest

    cfg = GPTConfig(block_size=16, vocab_size=32, n_layer=1, n_head=2,
                    n_embd=16, dropout=0.0)
    model = GPT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    with pytest.raises(ValueError, match="block_size"):
        model.apply(params, jnp.zeros((1, 17), jnp.int32))

"""int8 Pallas decode-attention kernel: interpret-mode equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.ops.decode_attention_int8 import (
    decode_attention_int8,
    decode_attention_int8_reference,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject)


def make_inputs(B=4, H=2, S=256, D=64, seed=0):
    HD = H * D
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, HD)), jnp.bfloat16)
    kf = rng.normal(size=(B, S, HD)).astype(np.float32)
    vf = rng.normal(size=(B, S, HD)).astype(np.float32)
    ks = np.maximum(np.abs(kf).max(-1), 1e-6) / 127.0  # [B, S]
    vs = np.maximum(np.abs(vf).max(-1), 1e-6) / 127.0
    k8 = np.clip(np.round(kf / ks[..., None]), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs[..., None]), -127, 127).astype(np.int8)
    return (q, jnp.asarray(k8), jnp.asarray(v8),
            jnp.asarray(ks.reshape(B, 1, S), jnp.float32),
            jnp.asarray(vs.reshape(B, 1, S), jnp.float32))


@pytest.mark.parametrize("length", [1, 127, 128, 200, 256])
def test_int8_kernel_matches_reference(length):
    q, k8, v8, ks, vs = make_inputs()
    out = decode_attention_int8(q, k8, v8, ks, vs, jnp.int32(length),
                                n_head=2, interpret=True)
    ref = decode_attention_int8_reference(q, k8, v8, ks, vs, jnp.int32(length),
                                          n_head=2)
    assert not np.isnan(np.asarray(out, np.float32)).any()
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_int8_kernel_ignores_poisoned_region():
    q, k8, v8, ks, vs = make_inputs(S=128)
    # poison beyond length with extreme values
    k8 = k8.at[:, 100:, :].set(127)
    ks = ks.at[:, :, 100:].set(1e4)
    vs = vs.at[:, :, 100:].set(1e4)
    out = decode_attention_int8(q, k8, v8, ks, vs, jnp.int32(100),
                                n_head=2, interpret=True)
    ref = decode_attention_int8_reference(q, k8, v8, ks, vs, jnp.int32(100),
                                          n_head=2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_int8_multirow_matches_reference():
    from ai_music_generation_tpu.ops.decode_attention_int8 import (
        decode_attention_int8_multirow,
    )

    B, H, S, D = 16, 2, 256, 64
    HD = H * D
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(B, HD)), jnp.bfloat16)
    kf = rng.normal(size=(B, S, HD)).astype(np.float32)
    ks = (np.abs(kf).max(-1) / 127).astype(np.float32)
    k8 = jnp.asarray(np.clip(np.round(kf / ks[..., None]), -127, 127), jnp.int8)
    out = decode_attention_int8_multirow(
        q, k8, k8, jnp.asarray(ks), jnp.asarray(ks), jnp.int32(100),
        n_head=H, rows_per_program=4, interpret=True,
    )
    ref = decode_attention_int8_reference(
        q, k8, k8, jnp.asarray(ks.reshape(B, 1, S)),
        jnp.asarray(ks.reshape(B, 1, S)), jnp.int32(100), n_head=H,
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )

"""Speculative-verify Pallas kernel (ops/spec_attention.py):
interpret-mode equivalence vs the pure-XLA reference, plus the
flat-cache model-path invariants the kernel contract encodes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.models.gpt import GPT, GPTConfig, KVCache
from ai_music_generation_tpu.ops.spec_attention import (
    spec_attention,
    spec_attention_reference,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject)

INVALID = KVCache.INVALID_POS


def make_inputs(B=4, T=5, H=2, S=64, D=64, quantized=True, seed=0):
    """Random flat-cache operands with ragged per-row valid windows:
    row b has columns 0..n_b-1 valid at logical positions 0..n_b-1 and
    everything past n_b dead (INVALID_POS), queries at n_b..n_b+T-1 —
    the exact state decode/speculative.py hands the kernel."""
    HD = H * D
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(B, T, HD)), jnp.bfloat16)
    kf = rng.normal(size=(B, S, HD)).astype(np.float32)
    vf = rng.normal(size=(B, S, HD)).astype(np.float32)
    nvalid = rng.integers(1, S - T, size=(B,))
    col_pos = np.where(
        np.arange(S)[None, :] < nvalid[:, None],
        np.arange(S)[None, :], INVALID).astype(np.int32)
    # the T fresh columns land at a shared cursor with per-row positions
    cursor = int(S - T)
    col_pos[:, cursor:] = nvalid[:, None] + np.arange(T)[None, :]
    lengths = nvalid.astype(np.int32)  # query t sits at nvalid + t
    if quantized:
        # per-(position, head) symmetric int8, scales TRANSPOSED [B, H, S]
        k4 = kf.reshape(B, S, H, D)
        v4 = vf.reshape(B, S, H, D)
        ks = np.maximum(np.abs(k4).max(-1), 1e-6) / 127.0  # [B, S, H]
        vs = np.maximum(np.abs(v4).max(-1), 1e-6) / 127.0
        k8 = np.clip(np.round(k4 / ks[..., None]), -127, 127).astype(np.int8)
        v8 = np.clip(np.round(v4 / vs[..., None]), -127, 127).astype(np.int8)
        k = jnp.asarray(k8.reshape(B, S, HD))
        v = jnp.asarray(v8.reshape(B, S, HD))
        k_scale = jnp.asarray(ks.transpose(0, 2, 1), jnp.bfloat16)
        v_scale = jnp.asarray(vs.transpose(0, 2, 1), jnp.bfloat16)
    else:
        k = jnp.asarray(kf, jnp.bfloat16)
        v = jnp.asarray(vf, jnp.bfloat16)
        k_scale = v_scale = None
    return q, k, v, k_scale, v_scale, jnp.asarray(col_pos), jnp.asarray(lengths)


# mid T values nightly: the edge strides (1 = plain-decode shape, 8 = the
# full 8-aligned column block) pin the kernel contract every run.
@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize(
    "T", [1, pytest.param(2, marks=pytest.mark.nightly),
          pytest.param(5, marks=pytest.mark.nightly), 8])
def test_kernel_matches_reference(quantized, T):
    args = make_inputs(T=T, quantized=quantized, seed=T)
    out = spec_attention(*args, n_head=2, interpret=True)
    ref = spec_attention_reference(*args, n_head=2)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    assert not np.isnan(np.asarray(out, np.float32)).any()
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


@pytest.mark.parametrize(
    "T", [1, pytest.param(5, marks=pytest.mark.nightly), 8])
def test_kernel_int8_dots_matches_reference(T):
    """int8 x int8 MXU mode: q and the scaled probs are symmetrically
    re-quantized inside the kernel, so the output carries ~1/127 relative
    rounding on top of the cache quantization — bounded here against the
    bf16-dot reference."""
    args = make_inputs(T=T, quantized=True, seed=20 + T)
    out = spec_attention(*args, n_head=2, interpret=True, int8_dots=True)
    ref = spec_attention_reference(*args, n_head=2)
    assert not np.isnan(np.asarray(out, np.float32)).any()
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=6e-2, rtol=6e-2,
    )


def test_kernel_int8_dots_ignores_dead_columns():
    q, k, v, ks, vs, col_pos, lengths = make_inputs(T=4, quantized=True,
                                                    seed=31)
    dead = np.asarray(col_pos) == INVALID
    k = jnp.where(jnp.asarray(dead)[:, :, None], jnp.int8(127), k)
    ks = jnp.where(jnp.asarray(dead)[:, None, :], jnp.bfloat16(1e4), ks)
    vs = jnp.where(jnp.asarray(dead)[:, None, :], jnp.bfloat16(1e4), vs)
    out = spec_attention(q, k, v, ks, vs, col_pos, lengths,
                         n_head=2, interpret=True, int8_dots=True)
    ref = spec_attention_reference(q, k, v, ks, vs, col_pos, lengths, n_head=2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=6e-2, rtol=6e-2,
    )


@pytest.mark.parametrize("quantized", [False, True])
@pytest.mark.parametrize("T", [1, 5, 8])
def test_update_kernel_matches_write_then_attend(quantized, T):
    """The fused write+attend kernel == DUS into the cache followed by the
    reference attention, for both the cache contents and the outputs."""
    from ai_music_generation_tpu.ops.spec_attention import (
        spec_attention_update,
    )
    q, k, v, ks, vs, col_pos, lengths = make_inputs(
        T=T, quantized=quantized, seed=40 + T)
    B, S, HD = k.shape
    Tw = -(-T // 8) * 8
    cursor = S - 2 * Tw  # somewhere 8-aligned mid-buffer
    rng = np.random.default_rng(99)
    if quantized:
        k_slab = jnp.asarray(
            rng.integers(-127, 128, size=(B, Tw, HD)).astype(np.int8))
        v_slab = jnp.asarray(
            rng.integers(-127, 128, size=(B, Tw, HD)).astype(np.int8))
    else:
        k_slab = jnp.asarray(rng.normal(size=(B, Tw, HD)), jnp.bfloat16)
        v_slab = jnp.asarray(rng.normal(size=(B, Tw, HD)), jnp.bfloat16)
    k_new, v_new, y = spec_attention_update(
        q, k, v, k_slab, v_slab, ks, vs, col_pos, lengths, cursor,
        n_head=2, interpret=True)
    # cache contents: slab landed at cursor, everything else untouched
    k_exp = np.asarray(k).copy()
    v_exp = np.asarray(v).copy()
    k_exp[:, cursor:cursor + Tw] = np.asarray(k_slab)
    v_exp[:, cursor:cursor + Tw] = np.asarray(v_slab)
    np.testing.assert_array_equal(np.asarray(k_new), k_exp)
    np.testing.assert_array_equal(np.asarray(v_new), v_exp)
    ref = spec_attention_reference(
        q, jnp.asarray(k_exp), jnp.asarray(v_exp), ks, vs, col_pos,
        lengths, n_head=2)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_update_kernel_fresh_columns_attended():
    """Queries must see the freshly written slab values: changing the slab
    at a fresh column the mask allows changes the outputs."""
    from ai_music_generation_tpu.ops.spec_attention import (
        spec_attention_update,
    )
    T = 4
    q, k, v, ks, vs, col_pos, lengths = make_inputs(
        T=T, quantized=False, seed=7)
    B, S, HD = k.shape
    Tw = 8
    # place the slab exactly where make_inputs put the fresh columns so
    # col_pos marks slab column j as position lengths + j (attendable)
    cursor = S - T - 4  # make an 8-aligned window covering [S-T, S)
    cursor = (cursor // 8) * 8
    cp = np.asarray(col_pos).copy()
    cp[:, cursor:cursor + Tw] = INVALID
    fresh = np.asarray(lengths)[:, None] + np.arange(T)[None, :]
    cp[:, cursor:cursor + T] = fresh
    cp = jnp.asarray(cp)
    slab_a = jnp.ones((B, Tw, HD), jnp.bfloat16)
    slab_b = jnp.full((B, Tw, HD), -3.0, jnp.bfloat16)
    _, _, y_a = spec_attention_update(
        q, k, v, slab_a, slab_a, ks, vs, cp, lengths, cursor,
        n_head=2, interpret=True)
    _, _, y_b = spec_attention_update(
        q, k, v, slab_b, slab_b, ks, vs, cp, lengths, cursor,
        n_head=2, interpret=True)
    assert not np.array_equal(np.asarray(y_a, np.float32),
                              np.asarray(y_b, np.float32))


def test_kernel_ignores_dead_columns():
    """Dead (INVALID_POS) columns must not leak even with poisoned values."""
    q, k, v, ks, vs, col_pos, lengths = make_inputs(T=4, quantized=True, seed=9)
    dead = np.asarray(col_pos) == INVALID
    k = jnp.where(jnp.asarray(dead)[:, :, None], jnp.int8(127), k)
    ks = jnp.where(jnp.asarray(dead)[:, None, :], jnp.bfloat16(1e4), ks)
    vs = jnp.where(jnp.asarray(dead)[:, None, :], jnp.bfloat16(1e4), vs)
    out = spec_attention(q, k, v, ks, vs, col_pos, lengths,
                         n_head=2, interpret=True)
    ref = spec_attention_reference(q, k, v, ks, vs, col_pos, lengths, n_head=2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2,
    )


def test_kernel_respects_within_step_causality():
    """Query t must see fresh columns 0..t but not t+1.. (col_pos <= q_pos):
    perturbing fresh column t+1's K/V must not change query t's output."""
    q, k, v, ks, vs, col_pos, lengths = make_inputs(
        B=2, T=4, quantized=False, seed=3)
    cursor = k.shape[1] - 4
    out1 = spec_attention(q, k, v, ks, vs, col_pos, lengths,
                          n_head=2, interpret=True)
    k2 = k.at[:, cursor + 2, :].set(jnp.bfloat16(5.0))
    v2 = v.at[:, cursor + 2, :].set(jnp.bfloat16(-5.0))
    out2 = spec_attention(q, k2, v2, ks, vs, col_pos, lengths,
                          n_head=2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(out1[:, :2], np.float32), np.asarray(out2[:, :2], np.float32))
    assert not np.array_equal(np.asarray(out1[:, 2:], np.float32),
                              np.asarray(out2[:, 2:], np.float32))


@pytest.mark.nightly  # opt-in spec plumbing; kernel contract stays in tier
@pytest.mark.parametrize("quantized", [False, True])
def test_model_spec_path_uses_flat_cache(quantized):
    """End-to-end through GPT.apply: the spec cache is flat [B, S, H*D]
    with [B, H, S] scales, logits match a cache-free forward, and the
    within-step causal mask holds at the model level."""
    cfg = GPTConfig(block_size=32, vocab_size=17, n_layer=2, n_head=2,
                    n_embd=32, dropout=0.0, bias=False, dtype=jnp.float32,
                    kv_quantized=quantized)
    model = GPT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    B, T = 3, 5
    idx = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)

    cache = KVCache.create(cfg, B, max_len=cfg.block_size, spec=True)
    HD = cfg.n_head * cfg.head_dim
    # FLAT [B, S, H*D]: the kernel operand shape, carried with no
    # alternate view (views of a carried buffer materialize as full-cache
    # copies); writes are 8-aligned sublane-dim DUS
    assert cache.k[0].shape == (B, cfg.block_size, HD)
    if quantized:
        # spec scales are kernel-layout [B, H, S] (lane dim = S, not H —
        # H=6 lanes would be physically padded to 128 on TPU); updated via
        # elementwise where
        assert cache.k_scale[0].shape == (B, cfg.n_head, cfg.block_size)

    logits, _, new_cache = model.apply(
        params, idx, cache=cache, return_all_logits=True)
    assert new_cache.k[0].shape == (B, cfg.block_size, HD)
    # cursor advances by the 8-aligned write width, not T
    assert int(new_cache.cursor) == -(-T // 8) * 8
    # fresh columns tentatively marked with their logical positions;
    # alignment-pad columns stay dead
    np.testing.assert_array_equal(
        np.asarray(new_cache.col_pos[:, :T]),
        np.tile(np.arange(T), (B, 1)))
    assert int(new_cache.col_pos[0, T]) == KVCache.INVALID_POS

    if not quantized:
        # spec-path logits == plain full-forward logits (exact math off-TPU)
        full, _, _ = model.apply(params, idx, return_all_logits=True)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full), atol=1e-5, rtol=1e-5)

"""Ring attention: exact causal attention over a sequence-sharded axis.

Context parallelism for training sequences longer than one chip wants to
hold: the [B, T, ...] activations are sharded over a mesh ``seq`` axis in
contiguous chunks (device i holds global positions ``i*Tl .. (i+1)*Tl-1``),
and attention is computed by rotating the K/V chunks around the ring with
``jax.lax.ppermute`` while each device folds every visiting block into a
flash-style online softmax. Per-device attention memory is O(Tl * T_global /
n) scores and the K/V traffic rides the ICI ring — no [B, H, T, T] global
tensor ever exists on any chip.

The reference has no analogue (nanoGPT trains full attention replicated per
rank, ref: nanoGPT/model.py:60-76); this is the TPU-native capability that
makes block sizes beyond one chip's HBM trainable at all.

Numerics: the online-softmax recurrence is algebraically identical to
softmax(QK^T)V — tests/test_sequence.py asserts loss/grad parity with the
plain einsum path to fp32 tolerance on every mesh factorization.

Scheduling note: causal masking means blocks from ring-future devices
contribute nothing, but every device walks all ``n`` steps in lockstep (SPMD)
— on average half the block matmuls are masked waste. The standard fix
(zig-zag / striped chunk placement) trades that for interleaved position
ownership; we keep contiguous chunks because the music models' block sizes
(256-1024) make attention a small FLOP fraction (docs/PERF.md roofline) and
contiguous chunks keep the wpe/loss layouts trivial.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

# Finite stand-in for -inf: keeps max/subtract arithmetic NaN-free when a
# whole block is masked (exp(_NEG - m) underflows to exactly 0.0 in fp32).
_NEG = -1e30


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    axis_name: str,
    scale: float | None = None,
) -> Array:
    """Causal attention with K/V ring-rotated over ``axis_name``.

    Args:
      q, k, v: ``[B, Tl, H, D]`` local chunks; the global position of local
        row ``t`` is ``axis_index(axis_name) * Tl + t``.
      axis_name: mesh axis the sequence is sharded over (inside shard_map).
      scale: attention scale; defaults to ``1/sqrt(D)``.

    Returns:
      ``[B, Tl, H, D]`` attention output in ``q.dtype``.
    """
    B, Tl, H, D = q.shape
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    if scale is None:
        scale = 1.0 / math.sqrt(D)

    q_pos = idx * Tl + jnp.arange(Tl)  # [Tl] global positions of queries
    local = jnp.arange(Tl)

    # online-softmax state, fp32 (matches the plain path's fp32 softmax)
    m = jnp.full((B, H, Tl), _NEG, jnp.float32)  # running row max
    l = jnp.zeros((B, H, Tl), jnp.float32)  # running normalizer
    acc = jnp.zeros((B, H, Tl, D), jnp.float32)  # running weighted values

    kb, vb = k, v
    perm = [(i, (i + 1) % n) for i in range(n)]

    for step in range(n):
        # after `step` rotations we hold the chunk born on device idx-step
        src = jnp.mod(idx - step, n)
        k_pos = src * Tl + local  # [Tl] global positions of this K block
        # score block in compute dtype (MXU), mask+softmax math in fp32
        s = jnp.einsum("bthd,bshd->bhts", q, kb).astype(jnp.float32) * scale
        mask = q_pos[:, None] >= k_pos[None, :]  # [Tl, Tl] causal
        s = jnp.where(mask[None, None], s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])  # masked entries: exactly 0
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum(
            "bhts,bshd->bhtd", p, vb.astype(jnp.float32))
        m = m_new
        if step < n - 1:
            kb = jax.lax.ppermute(kb, axis_name, perm)
            vb = jax.lax.ppermute(vb, axis_name, perm)

    # every query row sees at least itself (step 0 visits the own block), so
    # l >= exp(0) > 0 — no division guard needed
    out = acc / l[..., None]  # [B, H, Tl, D]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)

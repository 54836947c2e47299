"""Pallas fused decode attention over an int8 KV cache.

Combines the two measured decode-bandwidth levers:

- int8 cache storage (half the HBM traffic of bf16 — the bf16->int8 switch
  alone took the decode bench 260k -> 360k tok/s), and
- valid-prefix-only chunk DMA (positions past ``length`` are never fetched;
  up to 50% fewer reads during the first half of each refresh window).

Quantization here is PER-POSITION (one fp32 scale per cache row, stored
[B, 1, S] — fp32 because bf16's packed (2,1) sublane tiling forbids slicing
a size-1 dim) rather than per-(position, head): a row scale multiplies a whole
scores column (k) or folds into the probs (v), so the kernel never needs a
per-head scale gather —

    scores[h, s] = (q_bd @ k_int8^T)[h, s] * k_scale[s] * sm_scale
    out[h, :]    = sum_s (probs[h, s] * v_scale[s]) * v_int8[s, :]

Layout contract: q bf16 [B, H*D]; k/v int8 [B, S, H*D]; scales fp32
[B, 1, S]. CHUNK=128 keeps every DMA slice tile-aligned for int8 (32, 128)
and bf16 (16, 128) operands. The block-diagonal q trick (see
decode_attention.py) computes all heads' scores in one MXU dot.

VERDICT (measured on v5e, B=1024, H=6, S=256): the kernel is correct and
~1.4x faster than a standalone XLA dequant+attention, but it does NOT beat
the production path — the model's per-(position,head) int8 cache with
XLA-fused dequantized einsums (GPTConfig.kv_quantized) runs the ENTIRE
6-layer decode step in ~1.4 ms while one kernel invocation costs ~4.4 ms:
with 1024 single-row grid programs the per-program overhead (4 serial DMA
waits, tiny dots) dominates. Kept as the validated scaffold; the bench configuration remains
kv_quantized + XLA attention.

The multi-row variant below (R rows per program, slab DMA) was the obvious
next step and is implemented + correctness-tested; measured honestly
(pipelined dispatch, distinct inputs to defeat the axon result cache) it
reaches ~2.2 ms/call at R=8 — still above the fused XLA whole-step cost
(~1.4 ms for all 6 layers). Remaining gap: serial per-chunk DMA chains and
un-double-buffered compute; closing it needs DMA/compute overlap across
chunks, queued for a future round.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128


def _kernel(S: int, H: int, HD: int):
    D = HD // H
    n_chunks = pl.cdiv(S, CHUNK)

    def kernel(len_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
               k_buf, v_buf, ks_buf, vs_buf, sems):
        b = pl.program_id(0)
        L = len_ref[0]

        for c in range(n_chunks):
            start = c * CHUNK
            size = min(CHUNK, S - start)

            @pl.when(start < L)
            def _(c=c, start=start, size=size):
                pltpu.make_async_copy(
                    k_hbm.at[b, pl.ds(start, size), :],
                    k_buf.at[pl.ds(start, size), :], sems.at[4 * c],
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[b, pl.ds(start, size), :],
                    v_buf.at[pl.ds(start, size), :], sems.at[4 * c + 1],
                ).start()
                pltpu.make_async_copy(
                    ks_hbm.at[b, :, pl.ds(start, size)],
                    ks_buf.at[:, pl.ds(start, size)], sems.at[4 * c + 2],
                ).start()
                pltpu.make_async_copy(
                    vs_hbm.at[b, :, pl.ds(start, size)],
                    vs_buf.at[:, pl.ds(start, size)], sems.at[4 * c + 3],
                ).start()

        for c in range(n_chunks):
            start = c * CHUNK
            size = min(CHUNK, S - start)

            @pl.when(start < L)
            def _(c=c, start=start, size=size):
                pltpu.make_async_copy(
                    k_hbm.at[b, pl.ds(start, size), :],
                    k_buf.at[pl.ds(start, size), :], sems.at[4 * c]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[b, pl.ds(start, size), :],
                    v_buf.at[pl.ds(start, size), :], sems.at[4 * c + 1]).wait()
                pltpu.make_async_copy(
                    ks_hbm.at[b, :, pl.ds(start, size)],
                    ks_buf.at[:, pl.ds(start, size)], sems.at[4 * c + 2]).wait()
                pltpu.make_async_copy(
                    vs_hbm.at[b, :, pl.ds(start, size)],
                    vs_buf.at[:, pl.ds(start, size)], sems.at[4 * c + 3]).wait()

        sm_scale = 1.0 / math.sqrt(D)
        q = q_ref[0, 0]  # [HD] bf16
        head_of_col = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // D
        row = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
        head_mask = (head_of_col == row).astype(q.dtype)
        q_bd = q[None, :] * head_mask  # [H, HD]

        k_bf = k_buf[...].astype(q.dtype)  # [S, HD]
        scores = jax.lax.dot_general(
            q_bd, k_bf,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, S]
        k_scale = ks_buf[...].astype(jnp.float32)  # [1, S]
        col = jax.lax.broadcasted_iota(jnp.int32, (H, S), 1)
        scores = jnp.where(col < L, scores * k_scale * sm_scale, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)

        v_scale = vs_buf[...].astype(jnp.float32)  # [1, S]
        p_scaled = jnp.where(col < L, probs * v_scale, 0.0)
        v_bf = v_buf[...].astype(q.dtype)
        out_all = jax.lax.dot_general(
            p_scaled.astype(q.dtype), v_bf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [H, HD]
        out = jnp.sum(out_all * head_mask.astype(out_all.dtype), axis=0)
        o_ref[0, 0] = out.astype(o_ref.dtype)

    return kernel


def decode_attention_int8(q, k_int8, v_int8, k_scale, v_scale, length,
                          n_head: int = 6, interpret: bool = False):
    """q [B, H*D] bf16; k/v [B, S, H*D] int8; scales [B, 1, S]; -> [B, H*D]."""
    interpret = interpret or jax.default_backend() != "tpu"
    return _decode_attention_int8(
        q, k_int8, v_int8, k_scale, v_scale, length, n_head, interpret
    )


@functools.partial(jax.jit, static_argnames=("n_head", "interpret"))
def _decode_attention_int8(q, k_int8, v_int8, k_scale, v_scale, length,
                           n_head, interpret):
    B, S, HD = k_int8.shape
    n_chunks = pl.cdiv(S, CHUNK)
    # L=0 would mask every score to -inf and softmax to NaN; decode
    # always has >=1 valid position, so clamp defensively
    length_arr = jnp.maximum(jnp.asarray(length, jnp.int32), 1).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, HD), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((1, 1, HD), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S, HD), jnp.int8),
            pltpu.VMEM((S, HD), jnp.int8),
            pltpu.VMEM((1, S), k_scale.dtype),
            pltpu.VMEM((1, S), v_scale.dtype),
            pltpu.SemaphoreType.DMA((4 * n_chunks,)),
        ],
    )
    out = pl.pallas_call(
        _kernel(S, n_head, HD),
        out_shape=jax.ShapeDtypeStruct((B, 1, HD), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(length_arr, q.reshape(B, 1, HD), k_int8, v_int8, k_scale, v_scale)
    return out.reshape(B, HD)


def decode_attention_int8_reference(q, k_int8, v_int8, k_scale, v_scale,
                                    length, n_head: int = 6):
    """Pure-XLA reference with identical quantization semantics."""
    B, S, HD = k_int8.shape
    D = HD // n_head
    sm_scale = 1.0 / math.sqrt(D)
    kf = k_int8.astype(jnp.float32) * k_scale.reshape(B, S, 1).astype(jnp.float32)
    vf = v_int8.astype(jnp.float32) * v_scale.reshape(B, S, 1).astype(jnp.float32)
    q4 = q.astype(jnp.float32).reshape(B, n_head, D)
    k4 = kf.reshape(B, S, n_head, D)
    v4 = vf.reshape(B, S, n_head, D)
    scores = jnp.einsum("bhd,bshd->bhs", q4, k4) * sm_scale
    mask = jnp.arange(S)[None, None, :] < jnp.maximum(length, 1)
    scores = jnp.where(mask, scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    v_valid = jnp.where(mask[0, 0][:, None, None], v4, 0)
    out = jnp.einsum("bhs,bshd->bhd", probs, v_valid)
    return out.reshape(B, HD).astype(q.dtype)


# ---------------------------------------------------------------------------
# multi-row variant: R batch rows per grid program (amortizes the
# per-program overhead that sank the single-row kernel end-to-end)


def _kernel_multirow(S: int, H: int, HD: int, R: int):
    D = HD // H
    n_chunks = pl.cdiv(S, CHUNK)

    def kernel(len_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
               k_buf, v_buf, ks_buf, vs_buf, sems):
        g = pl.program_id(0)
        L = len_ref[0]
        row0 = g * R

        for c in range(n_chunks):
            start = c * CHUNK
            size = min(CHUNK, S - start)

            @pl.when(start < L)
            def _(c=c, start=start, size=size):
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(row0, R), pl.ds(start, size), :],
                    k_buf.at[:, pl.ds(start, size), :], sems.at[4 * c],
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(row0, R), pl.ds(start, size), :],
                    v_buf.at[:, pl.ds(start, size), :], sems.at[4 * c + 1],
                ).start()
                pltpu.make_async_copy(
                    ks_hbm.at[pl.ds(row0, R), pl.ds(start, size)],
                    ks_buf.at[:, pl.ds(start, size)], sems.at[4 * c + 2],
                ).start()
                pltpu.make_async_copy(
                    vs_hbm.at[pl.ds(row0, R), pl.ds(start, size)],
                    vs_buf.at[:, pl.ds(start, size)], sems.at[4 * c + 3],
                ).start()

        for c in range(n_chunks):
            start = c * CHUNK
            size = min(CHUNK, S - start)

            @pl.when(start < L)
            def _(c=c, start=start, size=size):
                pltpu.make_async_copy(
                    k_hbm.at[pl.ds(row0, R), pl.ds(start, size), :],
                    k_buf.at[:, pl.ds(start, size), :], sems.at[4 * c]).wait()
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(row0, R), pl.ds(start, size), :],
                    v_buf.at[:, pl.ds(start, size), :], sems.at[4 * c + 1]).wait()
                pltpu.make_async_copy(
                    ks_hbm.at[pl.ds(row0, R), pl.ds(start, size)],
                    ks_buf.at[:, pl.ds(start, size)], sems.at[4 * c + 2]).wait()
                pltpu.make_async_copy(
                    vs_hbm.at[pl.ds(row0, R), pl.ds(start, size)],
                    vs_buf.at[:, pl.ds(start, size)], sems.at[4 * c + 3]).wait()

        sm_scale = 1.0 / math.sqrt(D)
        head_of_col = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 1) // D
        hrow = jax.lax.broadcasted_iota(jnp.int32, (H, HD), 0)
        head_mask = (head_of_col == hrow)
        col = jax.lax.broadcasted_iota(jnp.int32, (H, S), 1)

        for r in range(R):
            q = q_ref[r, 0]  # [HD]
            q_bd = q[None, :] * head_mask.astype(q.dtype)
            k_bf = k_buf[r].astype(q.dtype)  # [S, HD]
            scores = jax.lax.dot_general(
                q_bd, k_bf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            k_scale = ks_buf[r][None, :].astype(jnp.float32)  # [1, S]
            scores = jnp.where(col < L, scores * k_scale * sm_scale, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1)
            v_scale = vs_buf[r][None, :].astype(jnp.float32)
            p_scaled = jnp.where(col < L, probs * v_scale, 0.0)
            v_bf = v_buf[r].astype(q.dtype)
            out_all = jax.lax.dot_general(
                p_scaled.astype(q.dtype), v_bf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = jnp.sum(out_all * head_mask.astype(out_all.dtype), axis=0)
            o_ref[r, 0] = out.astype(o_ref.dtype)

    return kernel


def decode_attention_int8_multirow(q, k_int8, v_int8, k_scale, v_scale,
                                   length, n_head: int = 6,
                                   rows_per_program: int = 8,
                                   interpret: bool = False):
    """Multi-row variant: q [B, H*D]; k/v [B, S, H*D] int8; scales [B, S] f32."""
    interpret = interpret or jax.default_backend() != "tpu"
    return _decode_attention_int8_multirow(
        q, k_int8, v_int8, k_scale, v_scale, length, n_head,
        rows_per_program, interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("n_head", "rows_per_program", "interpret")
)
def _decode_attention_int8_multirow(q, k_int8, v_int8, k_scale, v_scale,
                                    length, n_head, rows_per_program, interpret):
    B, S, HD = k_int8.shape
    R = rows_per_program
    assert B % R == 0, f"rows_per_program {R} must divide batch {B}"
    n_chunks = pl.cdiv(S, CHUNK)
    length_arr = jnp.maximum(jnp.asarray(length, jnp.int32), 1).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, 1, HD), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((R, 1, HD), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, S, HD), jnp.int8),
            pltpu.VMEM((R, S, HD), jnp.int8),
            pltpu.VMEM((R, S), k_scale.dtype),
            pltpu.VMEM((R, S), v_scale.dtype),
            pltpu.SemaphoreType.DMA((4 * n_chunks,)),
        ],
    )
    out = pl.pallas_call(
        _kernel_multirow(S, n_head, HD, R),
        out_shape=jax.ShapeDtypeStruct((B, 1, HD), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(length_arr, q.reshape(B, 1, HD), k_int8, v_int8, k_scale, v_scale)
    return out.reshape(B, HD)

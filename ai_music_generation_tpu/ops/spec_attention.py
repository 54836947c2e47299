"""Pallas multi-query (speculative verify) attention over a flat KV cache.

Why this kernel exists — the one place XLA's fused decode attention breaks
down. The plain T=1 decode step lowers its cache attention as VPU
multiply-reduce fusions, so the per-step ``dynamic_update_slice`` cache
write fuses in-place and the step runs at the HBM cache-read roofline
(docs/PERF.md). A speculative verify step carries T = n_draft+1 query
tokens, which XLA lowers as a real MXU dot — and layout assignment then
pins the cache operand to an S-minor (position-on-lanes) layout. Every
per-step slab write becomes a full-buffer tile rewrite: measured 5.6-7.4
ms/step at [1024, 256, 6, 64] bf16 regardless of einsum output order or
8-aligned cursors (probed 2026-08-18; einsum-order and alignment variants
all within noise of each other).

Routing every cache READ through this kernel removes the layout pressure:
Mosaic custom calls take their operands in the default (row-major tiled)
layout, so the cache carried through the decode ``while_loop`` keeps the
same layout the plain decoder enjoys and the slab write fuses in-place
again.

Contract (all shapes static):

- ``q``        [B, T, H*D] — the T verify queries per row;
- ``k``,``v``  [B, S, H*D] int8 or dense — the flat spec cache
  (position-major, heads*head_dim on lanes: H*D is a 128-multiple so every
  slab write is lane-aligned — see ops/decode_attention.py layout notes);
- ``k_scale``,``v_scale`` [B, H, S] bf16/fp32 or None — per-(position,
  head) int8 scales, stored TRANSPOSED relative to the XLA path's
  [B, S, H] so the kernel can slice a clean [1, S] lane-major row per
  head; factored onto the scores/probs exactly like the in-model XLA
  dequant (q.(k_int8*ks) == (q.k_int8)*ks, models/gpt.py cached_att);
- ``col_pos``  [B, S] int32 — logical position of each cache column
  (KVCache.INVALID_POS marks dead columns);
- ``lengths``  [B] int32 — logical position of each row's FIRST query
  (query t sits at position lengths[b] + t, the invariant the model's
  spec mode maintains — models/gpt.py GPT.__call__ spec branch);
- attendability: query t of row b may read column s iff
  ``col_pos[b, s] <= lengths[b] + t`` — identical to the mask the XLA
  fallback builds.

Mosaic-compatibility notes (probed on v5e via the axon AOT compiler,
2026-08-18): 4D vectors and sublane-dim reshapes ([R, T] -> [R, T, 1, 1])
fail ``infer-vector-layout``, so the kernel never forms a rank>3 value.
Compute is an unrolled loop over (row, head) in pure 2D — per-head masked
q ([T, HD] with other heads' lanes zeroed) against the full [S, HD] cache
block, exactly the block-diagonal trick of decode_attention.py unrolled
one head at a time (identical MXU FLOPs: both inflate Q/PV dots H-fold),
[1, S] sublane broadcasts for scales/col_pos, and a scalar-prefetch
``lengths`` read per row. These are the exact patterns the shipping
decode_attention_int8 multirow kernel compiles with.

The reference has no speculative decoding at all (its sampler re-runs the
full forward per token, ref: nanoGPT/model.py:305-330). VERDICT (measured
2026-08-18, docs/PERF.md "Speculative decoding"): 2.0 ms/call device-side
at [4096, T<=8, 256, 384] int8 — 2x its ~1.0 ms DMA floor (the
block-diagonal trick pays H-fold MXU inflation plus the int8->bf16 cast);
end-to-end the verify step is 34.9 ms vs the plain decoder's 8.955, so at
the bandwidth-bound bench batch speculation currently delivers 0.46x plain
throughput despite 1.8-2.2 committed tokens/step. The mapped next levers:
int8xint8 MXU dots (kills the casts, halves MXU time), reduce-window
quantize on the XLA side, glue diet. The kernel already beats every XLA
alternative for this read (the einsum path rewrote the cache per step and
crashed the worker at batch 4096).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(B: int, T: int) -> int:
    """Rows per program: biggest block that divides B, keeps the
    auto-pipelined VMEM working set (2 double-buffered cache blocks +
    fp32 scores) under the ~16 MB budget, and bounds the unrolled
    per-row loop for sane Mosaic compile times."""
    cap = 16 if T <= 8 else 8 if T <= 32 else 2
    r = 1
    for cand in (2, 4, 8, 16):
        if cand > cap or B % cand:
            break
        r = cand
    return r


def _make_attend(S: int, T: int, H: int, HD: int, quantized: bool,
                 int8_dots: bool):
    """Per-row verify-attention compute shared by the read-only kernel
    (``_kernel``) and the write-owning kernel (``_kernel_update``).

    Returns ``attend(q_r, k_r_raw, v_r_raw, ks_rows, vs_rows, cp_row)``
    where q_r is [T, HD] (q dtype), k/v are the row's raw cache block
    [S, HD] (int8 or dense), ks_rows/vs_rows are callables h -> [1, S]
    scale rows, cp_row is [1, S] int32 (col_pos with the row's first-query
    position pre-subtracted), and the result is [T, HD] fp32."""
    D = HD // H
    sm_scale = 1.0 / math.sqrt(D)
    Tp = -(-T // 8) * 8  # pad each head's query block to a sublane tile

    def attend(q_r, k_raw, v_raw, ks_rows, vs_rows, cp_row):
        # h-major block-diagonal rows i = h*Tp + t, all slices tile-aligned.
        # Row i's query index is t = i % Tp (pad rows t >= T are dropped by
        # the selector E below; their mask stays finite so no NaN rows).
        t_full = jax.lax.broadcasted_iota(jnp.int32, (H * Tp, S), 0) % Tp
        # lane -> head map over one [Tp, HD] q block
        head_of_lane = jax.lax.broadcasted_iota(jnp.int32, (Tp, HD), 1) // D
        # block-diagonal lane ownership over the full [H*Tp, HD] stack
        bd_row_head = jax.lax.broadcasted_iota(
            jnp.int32, (H * Tp, HD), 0) // Tp
        bd_lane_head = jax.lax.broadcasted_iota(
            jnp.int32, (H * Tp, HD), 1) // D
        bd_mask = bd_row_head == bd_lane_head  # [H*Tp, HD]
        # E folds the per-head diagonal blocks of PV back to [T, HD] in one
        # tiny dot: out[t] = sum_i pv[i] where i % Tp == t
        sel_t = jax.lax.broadcasted_iota(jnp.int32, (T, H * Tp), 0)
        sel_i = jax.lax.broadcasted_iota(jnp.int32, (T, H * Tp), 1)
        E = (sel_i % Tp == sel_t).astype(jnp.float32)  # [T, H*Tp]

        if Tp != T:
            q_r = jnp.concatenate(
                [q_r, jnp.zeros((Tp - T, HD), q_r.dtype)], axis=0)
        # query t attends column s iff cp[s] <= t (cp is col_pos with
        # the row's first-query position pre-subtracted)
        valid = cp_row <= t_full  # [1, S] vs [H*Tp, S]
        # ONE MXU dot for all heads' scores: h-major block-diagonal q
        # (block h holds q masked to head h's lanes) — built by sublane
        # concat, no reshapes
        qb = jnp.concatenate(
            [jnp.where(head_of_lane == h, q_r, 0) for h in range(H)],
            axis=0)  # [H*Tp, HD]
        if int8_dots:
            # int8 x int8 MXU path: the cache operands feed the dots
            # UNCAST (the [S, HD] int8->bf16 casts are the kernel's
            # main VPU cost) and the MXU runs at its 2x int8 rate.
            # q is symmetrically quantized per block-diagonal row
            # (= per (head, query)); the row scale factors out of the
            # dot exactly: q.(k8*ks) == (q8.k8)*qs*ks + rounding.
            qbf = qb.astype(jnp.float32)
            qs = jnp.maximum(
                jnp.max(jnp.abs(qbf), axis=1, keepdims=True), 1e-20
            ) / 127.0  # [H*Tp, 1]
            q8 = jnp.clip(
                jnp.round(qbf / qs), -127, 127).astype(jnp.int8)
            scores = jax.lax.dot_general(
                q8, k_raw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * qs  # [H*Tp, S]
        else:
            k_r = k_raw.astype(q_r.dtype)  # [S, HD]
            scores = jax.lax.dot_general(
                qb, k_r, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H*Tp, S]
        if quantized:
            # full-height per-head scale stacks: H sublane-broadcasts
            # of [1, S] rows concatenated — never a sublane gather
            ks = jnp.concatenate(
                [jnp.broadcast_to(ks_rows(h), (Tp, S))
                 for h in range(H)], axis=0).astype(jnp.float32)
            scores = scores * ks
        scores = jnp.where(valid, scores * sm_scale, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)  # fp32 [H*Tp, S]
        if quantized:
            vs = jnp.concatenate(
                [jnp.broadcast_to(vs_rows(h), (Tp, S))
                 for h in range(H)], axis=0).astype(jnp.float32)
            probs = probs * vs
        if int8_dots:
            # probs carry the per-column v scales already; quantize the
            # scaled probs per row (non-negative, so [0, 127]) and dot
            # int8 x int8 against the uncast v cache
            ps = jnp.maximum(
                jnp.max(probs, axis=1, keepdims=True), 1e-20) / 127.0
            p8 = jnp.clip(
                jnp.round(probs / ps), 0, 127).astype(jnp.int8)
            pv = jax.lax.dot_general(
                p8, v_raw, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * ps  # [H*Tp, HD]
        else:
            v_r = v_raw.astype(q_r.dtype)
            pv = jax.lax.dot_general(
                probs.astype(q_r.dtype), v_r, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [H*Tp, HD]; row h*Tp+t wants only head h's lanes
        pv = jnp.where(bd_mask, pv, 0.0)
        return jax.lax.dot_general(
            E, pv, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [T, HD]

    return attend


def _kernel(R: int, S: int, T: int, H: int, HD: int, quantized: bool,
            int8_dots: bool = False):
    attend = _make_attend(S, T, H, HD, quantized, int8_dots)

    def kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, cp_ref, o_ref):
        for r in range(R):
            out = attend(
                q_ref[r], k_ref[r], v_ref[r],
                lambda h, r=r: ks_ref[r, h:h + 1],
                lambda h, r=r: vs_ref[r, h:h + 1],
                cp_ref[r])
            o_ref[r] = out.astype(o_ref.dtype)

    return kernel


def spec_attention(q, k, v, k_scale, v_scale, col_pos, lengths,
                   *, n_head: int, interpret: bool = False,
                   rows: int | None = None, int8_dots: bool = False):
    """Masked multi-query attention over the flat spec KV cache.

    q [B, T, HD]; k/v [B, S, HD] (int8 + [B, H, S] bf16 scales, or dense
    with scales None); col_pos [B, S] int32; lengths [B] int32 (query t of
    row b sits at logical position lengths[b] + t).
    Returns [B, T, HD] in q.dtype. Off-TPU this routes to the pure-XLA
    reference (op-for-op the math models/gpt.py's einsum decode paths run,
    so CPU-mesh tests keep bit-exact parity with the plain Generator);
    ``interpret=True`` forces the Pallas kernel in interpret mode for
    kernel-correctness tests."""
    if not interpret and jax.default_backend() != "tpu":
        return spec_attention_reference(
            q, k, v, k_scale, v_scale, col_pos, lengths, n_head=n_head)
    quantized = k_scale is not None
    assert quantized or not int8_dots, (
        "int8_dots needs the int8 cache (quantized mode)")
    if not quantized:
        # uniform kernel signature: dummy [B, 1, 1] scale operands (never
        # read — `quantized` is static) keep one code path
        B = q.shape[0]
        k_scale = jnp.zeros((B, 1, 1), jnp.float32)
        v_scale = jnp.zeros((B, 1, 1), jnp.float32)
    return _spec_attention(q, k, v, k_scale, v_scale, col_pos, lengths,
                           n_head, quantized, interpret, rows, int8_dots)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "quantized", "interpret", "rows", "int8_dots"))
def _spec_attention(q, k, v, k_scale, v_scale, col_pos, lengths,
                    n_head, quantized, interpret, rows=None,
                    int8_dots=False):
    B, T, HD = q.shape
    S = k.shape[1]
    H = n_head
    R = rows or _pick_rows(B, T)
    sH, sS = k_scale.shape[1], k_scale.shape[2]
    # fold each row's first-query position into its column positions: the
    # kernel's mask becomes cp_rel[s] <= t — no per-row scalar operand, no
    # 4D broadcast (the INVALID_POS sentinel stays far above any t)
    cp_rel = (jnp.asarray(col_pos, jnp.int32)
              - jnp.asarray(lengths, jnp.int32)[:, None])

    grid_spec = pl.GridSpec(
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, T, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, sH, sS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, sH, sS), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # col_pos carried as [B, 1, S]: the trailing (1, S) block dims
            # equal the array dims, which keeps the block legal at any R
            # (a [R<8, S] block violates the (8, 128) divisibility rule)
            pl.BlockSpec((R, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, T, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel(R, S, T, H, HD, quantized, int8_dots),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(q, k, v, k_scale, v_scale, cp_rel[:, None, :])


def _kernel_update(R: int, S: int, T: int, Tw: int, H: int, HD: int,
                   quantized: bool, int8_dots: bool, interpret: bool):
    attend = _make_attend(S, T, H, HD, quantized, int8_dots)

    def kernel(cur_ref, q_ref, k_ref, v_ref, kslab_ref, vslab_ref,
               ks_ref, vs_ref, cp_ref, ko, vo, o_ref, sems):
        # k_ref/v_ref are AUTO-PIPELINED VMEM blocks of the cache rows
        # (double-buffered reads for free — the manual read->wait chain of
        # the first cut cost +1.1 ms/call at batch 4096); ko/vo are the
        # HBM outputs ALIASED to the cache inputs, written only in the Tw
        # slab columns.
        g = pl.program_id(0)
        row0 = g * R
        # the scalar operand carries cursor//8: reconstructing the offset
        # as 8*x lets Mosaic PROVE the sublane slice is tile-aligned (a raw
        # dynamic cursor fails "tile index divisible by 8" at compile)
        cur = cur_ref[0] * 8
        # 1) patch the fresh slab into the VMEM block (what attention
        # reads); writing an input block is kernel-local
        pk = pltpu.make_async_copy(
            kslab_ref, k_ref.at[:, pl.ds(cur, Tw), :], sems.at[0])
        pv_ = pltpu.make_async_copy(
            vslab_ref, v_ref.at[:, pl.ds(cur, Tw), :], sems.at[1])
        pk.start()
        pv_.start()
        # 2) persist: on TPU only the Tw slab columns are written back (the
        # rest of the output IS the input buffer — input_output_aliases).
        # Rows are disjoint across grid programs, so the write never races
        # the pipeline's prefetch of later blocks.
        wk = pltpu.make_async_copy(
            kslab_ref, ko.at[pl.ds(row0, R), pl.ds(cur, Tw), :], sems.at[2])
        wv = pltpu.make_async_copy(
            vslab_ref, vo.at[pl.ds(row0, R), pl.ds(cur, Tw), :], sems.at[3])
        wk.start()
        wv.start()
        pk.wait()
        pv_.wait()
        # 3) attention over the patched VMEM blocks, overlapping the
        # HBM writeback
        for r in range(R):
            out = attend(
                q_ref[r], k_ref[r], v_ref[r],
                lambda h, r=r: ks_ref[r, h:h + 1],
                lambda h, r=r: vs_ref[r, h:h + 1],
                cp_ref[r])
            o_ref[r] = out.astype(o_ref.dtype)
        wk.wait()
        wv.wait()
        if interpret:
            # interpret mode doesn't carry the aliased input through to the
            # untouched output columns: write the full patched rows so the
            # kernel-correctness tests see the real contract
            fk = pltpu.make_async_copy(
                k_ref, ko.at[pl.ds(row0, R)], sems.at[0])
            fv = pltpu.make_async_copy(
                v_ref, vo.at[pl.ds(row0, R)], sems.at[1])
            fk.start()
            fv.start()
            fk.wait()
            fv.wait()

    return kernel


def spec_attention_update(q, k, v, k_slab, v_slab, k_scale, v_scale,
                          col_pos, lengths, cursor, *, n_head: int,
                          interpret: bool = False, rows: int | None = None,
                          int8_dots: bool = False):
    """Fused spec-cache slab write + verify attention; returns
    ``(k_new, v_new, y)``.

    Same contract as :func:`spec_attention` plus: ``k_slab``/``v_slab``
    [B, Tw, HD] (Tw 8-aligned, cache dtype) are written into the cache at
    the 8-aligned scalar ``cursor`` before attending, and the cache buffers
    are ALIASED in/out — the kernel owns the write, so the decode loop
    carries the cache straight through ``pallas_call`` with no XLA-side
    ``dynamic_update_slice`` on it. Motivation (traced on v5e, batch 4096,
    round-4 compiler): any XLA DUS/reshape view of the loop-carried cache
    materialized full-buffer copies — pad_bitcast fusions, copy-start/
    copy-done pairs, copy+DUS fusions — totalling ~20 ms/step, 2x the
    entire verify attention. In-kernel the write is a [B, Tw, HD] DMA
    (~150 MB at batch 4096 vs 4.8 GB of copies).

    Scales stay XLA-side operands (pre-updated [B, H, S]): they are small
    (lane-major S), and their elementwise window update fuses cleanly."""
    if not interpret and jax.default_backend() != "tpu":
        k_new = jax.lax.dynamic_update_slice(k, k_slab.astype(k.dtype),
                                             (0, cursor, 0))
        v_new = jax.lax.dynamic_update_slice(v, v_slab.astype(v.dtype),
                                             (0, cursor, 0))
        y = spec_attention_reference(
            q, k_new, v_new, k_scale, v_scale, col_pos, lengths,
            n_head=n_head)
        return k_new, v_new, y
    quantized = k_scale is not None
    assert quantized or not int8_dots, (
        "int8_dots needs the int8 cache (quantized mode)")
    if not quantized:
        B = q.shape[0]
        k_scale = jnp.zeros((B, 1, 1), jnp.float32)
        v_scale = jnp.zeros((B, 1, 1), jnp.float32)
    return _spec_attention_update(
        q, k, v, k_slab, v_slab, k_scale, v_scale, col_pos, lengths, cursor,
        n_head, quantized, interpret, rows, int8_dots)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "quantized", "interpret", "rows", "int8_dots"))
def _spec_attention_update(q, k, v, k_slab, v_slab, k_scale, v_scale,
                           col_pos, lengths, cursor, n_head, quantized,
                           interpret, rows=None, int8_dots=False):
    B, T, HD = q.shape
    S = k.shape[1]
    Tw = k_slab.shape[1]
    H = n_head
    R = rows or _pick_rows(B, T)
    sH, sS = k_scale.shape[1], k_scale.shape[2]
    cp_rel = (jnp.asarray(col_pos, jnp.int32)
              - jnp.asarray(lengths, jnp.int32)[:, None])
    # carried as cursor//8 so the kernel can reconstruct a provably
    # 8-aligned offset (see _kernel_update)
    cur = (jnp.asarray(cursor, jnp.int32) // 8).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, T, HD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # cache reads: auto-pipelined VMEM blocks (aliased to the HBM
            # outputs; the in-kernel slab write touches disjoint rows)
            pl.BlockSpec((R, S, HD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S, HD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Tw, HD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Tw, HD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, sH, sS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, sH, sS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, S), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((R, T, HD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    # operand indices include the scalar prefetch: cur=0, q=1, k=2, v=3
    return pl.pallas_call(
        _kernel_update(R, S, T, Tw, H, HD, quantized, int8_dots, interpret),
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        ],
        grid_spec=grid_spec,
        input_output_aliases={2: 0, 3: 1},
        interpret=interpret,
    )(cur, q, k, v, k_slab, v_slab, k_scale, v_scale, cp_rel[:, None, :])


def spec_attention_reference(q, k, v, k_scale, v_scale, col_pos, lengths,
                             *, n_head: int):
    """Pure-XLA reference. Mirrors models/gpt.py ``cached_att`` op-for-op
    (same op order and dtypes: dot in q.dtype, scale factors cast to
    q.dtype, fp32 softmax) so that off-TPU the speculative decode path is
    bit-identical to the plain Generator's einsum decode — the invariant
    tests/test_speculative.py::test_greedy_matches_generator pins."""
    B, T, HD = q.shape
    S = k.shape[1]
    H = n_head
    D = HD // H
    q4 = q.reshape(B, T, H, D)
    k4 = k.reshape(B, S, H, D).astype(q.dtype)
    v4 = v.reshape(B, S, H, D).astype(q.dtype)
    scale = jnp.asarray(1.0 / jnp.sqrt(D), q.dtype)
    att = jnp.einsum("bthd,bshd->bhts", q4, k4) * scale
    if k_scale is not None:
        att = att * k_scale[:, :, None, :].astype(q.dtype)
    q_pos = lengths[:, None] + jnp.arange(T)[None, :]  # [B, T]
    mask = col_pos[:, None, None, :] <= q_pos[:, None, :, None]
    att = jnp.where(mask, att, jnp.asarray(-jnp.inf, att.dtype))
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(q.dtype)
    if v_scale is not None:
        att = att * v_scale[:, :, None, :].astype(q.dtype)
    out = jnp.einsum("bhts,bshd->bthd", att, v4)
    return out.reshape(B, T, HD)

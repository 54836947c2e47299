"""Pallas grouped-query decode attention over a flat S-major KV cache.

Why this kernel exists — the measured GQA layout trap (docs/PERF.md
"Grouped-query attention", models/gpt.py ``cached_att`` notes): with any
G > 1 free dim on the query side, XLA lowers the T=1 QK product as an MXU
matmul and pins the loop-carried cache to an S-minor (position-on-lanes)
layout, so every decode step's single-column write becomes a full-buffer
rewrite (traced: 20 of 27.6 ms/step at batch 4096, KH=2) — the 3x smaller
GQA cache decoded 3x SLOWER than MHA. Like the speculative verify kernel
(ops/spec_attention.py), routing both the cache READ and the per-step
WRITE through one Pallas call takes the buffer out of XLA's layout
assignment entirely: the cache stays position-major (S on sublanes,
KH*D on lanes) and the write is a tiny in-kernel DMA.

Contract (all shapes static):

- ``q_bd``   [B, H, KH*D] — queries pre-FOLDED into grouped lanes: row h
  holds query head h's D values in kv-head ``h // G``'s lane slice, zeros
  elsewhere (the XLA-side fold is an exact 0/1-placement einsum,
  models/gpt.py ``_gqa_placement``). One MXU dot against the [S, KH*D]
  cache block then yields ALL H heads' scores — the block-diagonal trick
  of ops/decode_attention.py at kv-head granularity.
- ``k``, ``v``   [B, S, KH*D] int8 or dense — the flat GQA cache
  (position-major; KH*D must be a 128-multiple so lanes tile exactly).
  ALIASED in/out: the kernel owns the write.
- ``k_slab``, ``v_slab`` [B, 1, KH*D] — the step's fresh column. In int8
  mode these are the RAW (float) projections: the kernel owns the
  quantize too — per-(row, kv-head) abs-max/127 scales computed in fp32
  in VMEM, bit-exact with ``models/gpt.py::_quantize_int8`` (same cast,
  same max(·,1e-6), same round/clip). Round 4 traced the XLA-side
  quantize + one-hot scale-write fusions at ~0.6 of the 4.9 ms decode
  step; in-kernel they ride data already resident in VMEM.
- ``k_scale``, ``v_scale`` [B, KH, S] bf16 or None — per-(position,
  kv-head) int8 scales, factored onto scores/probs exactly like the XLA
  path (q.(k8*ks) == (q.k8)*ks). ALIASED in/out in int8 mode: the kernel
  merges the fresh column's scale and writes the block back, so the
  quantized call returns ``(k, v, k_scale, v_scale, out)``.
- ``mask_rel`` [B, 1, S] int32 — ring mode only: column s of row b is
  attendable iff ``mask_rel[b, 0, s] >= 0`` (the caller encodes the ring
  window ``length[b] - (pos - s) mod S``). Scalar lockstep mode passes a
  dummy [B, 1, 1] and the kernel masks ``col <= pos`` itself.
- ``pos`` scalar int32 — the buffer column written this step (lockstep:
  the shared cache length; ring/serving: the shared cursor). Carried as
  ``(pos // 8, pos % 8)`` scalar-prefetch so Mosaic can PROVE the
  writeback window's sublane offset is 8-aligned (the spec kernel's
  ``cur_ref[0] * 8`` trick).

Write mechanics: the fresh column is merged in the SCORE/PROB domain
(``where(col == pos, q.k_new, scores)`` and a probs split for PV) — never
a full [S, KH*D] blend, which would cost 2 x 32k VPU selects per row.
Persistence writes back the 8-aligned window ``[8*(pos//8), +8)``: the 7
neighbor columns are re-written with their unchanged HBM values (extracted
from the already-cast VMEM block by a one-hot [8, S] dot — integers <= 127
are exact in bf16), the slab row replaces position ``pos``, and everything
outside the window rides the input/output alias.

The reference has no GQA at all (full multi-head attention,
ref: nanoGPT/model.py:29-76); this kernel is what makes the framework's
``GPTConfig(n_kv_head=...)`` a throughput lever rather than only a
memory/capacity one. Measured numbers live in docs/PERF.md.

Sharding contract: the kernel itself is single-device — a
``pallas_call`` is a custom call the GSPMD partitioner cannot shard
(under a plain multi-device pjit it would gather the full cache per
device, and under tensor parallelism the per-shard KV-head slice breaks
the 128-lane tiling). Multi-chip decode therefore goes through
``jax.shard_map`` over the DATA axis (round 5, serve/engine.py
``_scan``): batch rows are independent, each device invokes the kernel
on its local rows with KV heads whole, so the lane contract holds;
byte parity vs single-chip is pinned in tests/test_gqa_flat.py.
Tensor-parallel meshes are rejected loudly and fall back to the einsum
branch (the measured trap `decode/generate.py::_warn_if_gqa_einsum_trap`
warns about).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(B: int) -> int:
    """Rows per grid program: amortize per-program overhead while keeping
    the double-buffered cache blocks well under the VMEM budget and the
    unrolled per-row loop compile-friendly."""
    r = 1
    for cand in (2, 4, 8, 16):
        if B % cand:
            break
        r = cand
    return r


def _kernel(R: int, S: int, H: int, KH: int, KHD: int, quantized: bool,
            ring: bool, interpret: bool):
    D = KHD // KH
    G = H // KH
    sm_scale = 1.0 / math.sqrt(D)

    def kernel(pos_ref, q_ref, k_ref, v_ref, kslab_ref, vslab_ref,
               ks_ref, vs_ref, mask_ref, *outs):
        if quantized:
            ko, vo, kso, vso, o_ref, wk_scr, wv_scr, sems = outs
        else:
            ko, vo, o_ref, wk_scr, wv_scr, sems = outs
        g = pl.program_id(0)
        G_PROGS = pl.num_programs(0)
        row0 = g * R
        w0 = pos_ref[0] * 8  # provably 8-aligned window start
        pos = w0 + pos_ref[1]

        # previous program's writeback DMA reads the scratch this program
        # is about to overwrite: wait for it HERE (not at issue time) so
        # the copy overlaps a full program of compute (traced: the
        # issue-time wait serialized ~2 us x B/R programs per layer)
        @pl.when(g > 0)
        def _wait_prev():
            pltpu.make_async_copy(wk_scr, wk_scr, sems.at[0]).wait()
            pltpu.make_async_copy(wv_scr, wv_scr, sems.at[1]).wait()

        col_hs = jax.lax.broadcasted_iota(jnp.int32, (R, H, S), 2)
        # folded-output lane ownership: row h keeps only kv-head h//G's
        # lane slice (the PV dot fills every lane; zeroing the rest makes
        # the output exactly the placement-folded form the caller unfolds)
        lane_kh = jax.lax.broadcasted_iota(jnp.int32, (R, H, KHD), 2) // D
        row_kh = jax.lax.broadcasted_iota(jnp.int32, (R, H, KHD), 1) // G
        fold_mask = lane_kh == row_kh
        win_row = jax.lax.broadcasted_iota(jnp.int32, (R, 8, KHD), 1)

        q_b = q_ref[:]  # [R, H, KHD]
        k_bf = k_ref[:].astype(q_b.dtype)  # [R, S, KHD]
        v_bf = v_ref[:].astype(q_b.dtype)

        if quantized:
            # ---- kernel-owned quantize of the fresh column: bit-exact
            # models/gpt.py::_quantize_int8 on the [R, KH, D] view (fp32
            # abs-max per (row, kv-head) lane slice, max(·,1e-6)/127,
            # round-half-even, clip ±127). The XLA-side version of this
            # (+ its one-hot scale writes) traced at ~0.6 ms of the
            # 4.9 ms decode step at batch 4096; here it's a few VPU ops
            # on a [R, 1, KHD] block already in VMEM.
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1, KHD), 2) // D

            def _quant_col(slab_ref):
                xf = slab_ref[:].astype(jnp.float32)  # [R, 1, KHD]
                ax = jnp.abs(xf)
                s_exp = jnp.zeros_like(xf)
                s_list = []
                for kh in range(KH):
                    m = jnp.max(jnp.where(lane1 == kh, ax, 0.0),
                                axis=2, keepdims=True)  # [R, 1, 1] fp32
                    s = jnp.maximum(m, 1e-6) / 127.0
                    s_exp = jnp.where(lane1 == kh, s, s_exp)
                    s_list.append(s.astype(jnp.bfloat16))
                q8 = jnp.clip(jnp.round(xf / s_exp), -127, 127)
                return q8.astype(jnp.int8), s_list

            kq_col, ksl = _quant_col(kslab_ref)
            vq_col, vsl = _quant_col(vslab_ref)
            # merge the fresh column's scale per kv-head as [R, 1, S]
            # slices (a [R, KH, S] mask on the 2-wide sublane dim trips a
            # Mosaic "invalid relayout" on the i1 vector; lane-dim masks
            # are the kernel's known-good pattern) and write the aliased
            # scale outputs slice-wise; the merged rows also feed the
            # score/prob factoring below
            col_r1s = jax.lax.broadcasted_iota(jnp.int32, (R, 1, S), 2)
            ks_rows, vs_rows = [], []
            for kh in range(KH):
                mk = jnp.where(col_r1s == pos, ksl[kh],
                               ks_ref[:, kh:kh + 1, :])  # [R, 1, S] bf16
                mv = jnp.where(col_r1s == pos, vsl[kh],
                               vs_ref[:, kh:kh + 1, :])
                kso[:, kh:kh + 1, :] = mk
                vso[:, kh:kh + 1, :] = mv
                ks_rows.append(mk)
                vs_rows.append(mv)
            kslab_b = kq_col.astype(q_b.dtype)  # [R, 1, KHD]
            vslab_b = vq_col.astype(q_b.dtype)
            kslab_w, vslab_w = kq_col, vq_col  # window write values
        else:
            kslab_b = kslab_ref[:].astype(q_b.dtype)  # [R, 1, KHD]
            vslab_b = vslab_ref[:].astype(q_b.dtype)
            kslab_w, vslab_w = kslab_ref[:], vslab_ref[:]

        # ---- persist: blend the fresh column into the 8-wide aligned
        # window and stage it for the HBM writeback DMA. The window rows
        # come straight off the VMEM block as an 8-aligned dynamic slice
        # in the CACHE dtype (the one-hot-dot extraction this replaces
        # cost 2 small MXU dots per row — the kernel's top hotspot in the
        # round-4 device trace).
        wk = jnp.where(win_row == pos_ref[1], kslab_w,
                       k_ref[:, pl.ds(w0, 8), :])
        wv = jnp.where(win_row == pos_ref[1], vslab_w,
                       v_ref[:, pl.ds(w0, 8), :])
        wk_scr[:] = wk
        wv_scr[:] = wv

        # ---- scores: one MXU dot per row for all H heads (q pre-folded
        # into grouped lanes), fresh column merged in the score domain
        scores = jax.lax.dot_general(
            q_b, k_bf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [R, H, S]
        # fresh column's scores: elementwise multiply-reduce (a
        # dot_general against the 1-row slab trips a Mosaic
        # vector.broadcast dtype verifier bug)
        s_new = jnp.sum(
            q_b.astype(jnp.float32) * kslab_b.astype(jnp.float32),
            axis=2, keepdims=True)  # [R, H, 1]
        scores = jnp.where(col_hs == pos, s_new, scores)
        if quantized:
            ks = jnp.concatenate(
                [jnp.broadcast_to(ks_rows[kh], (R, G, S))
                 for kh in range(KH)], axis=1).astype(jnp.float32)
            scores = scores * ks
        if ring:
            valid = mask_ref[:] >= 0  # [R, 1, S] vs [R, H, S]
        else:
            valid = col_hs <= pos
        scores = jnp.where(valid, scores * sm_scale, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)  # fp32 [R, H, S]
        if quantized:
            vs = jnp.concatenate(
                [jnp.broadcast_to(vs_rows[kh], (R, G, S))
                 for kh in range(KH)], axis=1).astype(jnp.float32)
            probs = probs * vs
        # ---- PV with the fresh column split out (v_bf[pos] is stale):
        # pv = probs_without_pos @ v_old + probs[:, pos] (x) v_new
        # (column extraction and the rank-1 outer product are
        # elementwise — size-1 dot operands trip Mosaic, see s_new)
        p_at = jnp.sum(jnp.where(col_hs == pos, probs, 0.0),
                       axis=2, keepdims=True)  # [R, H, 1]
        probs_np = jnp.where(col_hs == pos, 0.0, probs)
        pv = jax.lax.dot_general(
            probs_np.astype(q_b.dtype), v_bf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # [R, H, KHD]
        pv = pv + p_at * vslab_b.astype(jnp.float32)
        o_ref[:] = jnp.where(fold_mask, pv, 0.0).astype(o_ref.dtype)

        # ---- writeback: only the 8-wide window columns are written (the
        # rest of the output IS the input buffer — input_output_aliases).
        # Rows are disjoint across grid programs, so this never races the
        # pipeline's prefetch of later blocks (spec_attention pattern).
        wk_dma = pltpu.make_async_copy(
            wk_scr, ko.at[pl.ds(row0, R), pl.ds(w0, 8), :], sems.at[0])
        wv_dma = pltpu.make_async_copy(
            wv_scr, vo.at[pl.ds(row0, R), pl.ds(w0, 8), :], sems.at[1])
        wk_dma.start()
        wv_dma.start()

        @pl.when(g == G_PROGS - 1)
        def _wait_last():
            wk_dma.wait()
            wv_dma.wait()
        if interpret:
            # interpret mode doesn't carry the aliased input through to the
            # untouched output columns: write the full patched rows so the
            # kernel-correctness tests see the real contract
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (S, KHD), 0)
            for r in range(R):
                ko[row0 + r] = jnp.where(
                    row_iota == pos,
                    jnp.broadcast_to(kslab_w[r], (S, KHD)), k_ref[r])
                vo[row0 + r] = jnp.where(
                    row_iota == pos,
                    jnp.broadcast_to(vslab_w[r], (S, KHD)), v_ref[r])

    return kernel


def gqa_decode_update(q_bd, k, v, k_slab, v_slab, k_scale, v_scale,
                      mask_rel, pos, *, n_head: int, n_kv_head: int,
                      interpret: bool = False, rows: int | None = None):
    """Fused single-column cache write (+ int8 quantize) + GQA attention.

    Returns ``(k_new, v_new, out)`` — or, with int8 scales,
    ``(k_new, v_new, k_scale_new, v_scale_new, out)``: in quantized mode
    ``k_slab``/``v_slab`` are the step's RAW float projections and the
    kernel owns quantize, column write, and scale write (module
    docstring). ``out`` is [B, H, KH*D] in q_bd's dtype, FOLDED like the
    query input (head h's values live in kv-head h//G's lane slice; the
    caller unfolds with the same placement einsum).
    ``mask_rel`` None selects scalar lockstep masking (``col <= pos``);
    a [B, S] int32 array selects ring masking (attendable iff >= 0).
    Off-TPU this routes to the pure-XLA reference, which mirrors the
    model's 4-D einsum path op-for-op (including _quantize_int8 and the
    one-hot scale write) so flat-cache decode on the CPU mesh stays
    bit-identical to the 4-D GQA path (the tests/test_gqa.py oracles)."""
    if not interpret and jax.default_backend() != "tpu":
        return gqa_decode_reference(
            q_bd, k, v, k_slab, v_slab, k_scale, v_scale, mask_rel, pos,
            n_head=n_head, n_kv_head=n_kv_head)
    B = q_bd.shape[0]
    ring = mask_rel is not None
    if not ring:
        mask_rel = jnp.zeros((B, 1), jnp.int32)  # dummy, never read
    quantized = k_scale is not None
    if not quantized:
        k_scale = jnp.zeros((B, 1, 1), jnp.bfloat16)
        v_scale = jnp.zeros((B, 1, 1), jnp.bfloat16)
    return _gqa_decode_update(
        q_bd, k, v, k_slab, v_slab, k_scale, v_scale, mask_rel, pos,
        n_head, n_kv_head, quantized, ring, interpret, rows)


@functools.partial(
    jax.jit,
    static_argnames=("n_head", "n_kv_head", "quantized", "ring",
                     "interpret", "rows"))
def _gqa_decode_update(q_bd, k, v, k_slab, v_slab, k_scale, v_scale,
                       mask_rel, pos, n_head, n_kv_head, quantized, ring,
                       interpret, rows=None):
    B, S, KHD = k.shape
    H = n_head
    R = rows or _pick_rows(B)
    sH, sS = k_scale.shape[1], k_scale.shape[2]
    pos = jnp.asarray(pos, jnp.int32)
    pos2 = jnp.stack([pos // 8, pos % 8])
    mS = mask_rel.shape[-1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, H, KHD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # cache reads: auto-pipelined VMEM blocks (aliased to the HBM
            # outputs; the in-kernel window write touches disjoint rows)
            pl.BlockSpec((R, S, KHD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, S, KHD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, KHD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1, KHD), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, sH, sS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, sH, sS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # mask carried as [B, 1, S]: trailing (1, S) block dims equal
            # the array dims — legal at any R (spec_attention pattern)
            pl.BlockSpec((R, 1, mS), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            [
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ]
            + (
                # aliased scale outputs: full [R, KH, S] blocks written
                # through the normal pipelined VMEM path (the blocks are
                # tiny — writing them whole costs ~10 us/step at batch
                # 4096 vs the ~0.6 ms XLA-side scale fusions it replaces)
                [
                    pl.BlockSpec((R, sH, sS), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((R, sH, sS), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                ]
                if quantized
                else []
            )
            + [
                pl.BlockSpec((R, H, KHD), lambda i, *_: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
        ),
        scratch_shapes=[
            pltpu.VMEM((R, 8, KHD), k.dtype),
            pltpu.VMEM((R, 8, KHD), v.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    # operand indices include the scalar prefetch: pos2=0, q=1, k=2, v=3,
    # kslab=4, vslab=5, k_scale=6, v_scale=7, mask=8
    out_shape = [
        jax.ShapeDtypeStruct(k.shape, k.dtype),
        jax.ShapeDtypeStruct(v.shape, v.dtype),
    ]
    aliases = {2: 0, 3: 1}
    if quantized:
        out_shape += [
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ]
        aliases.update({6: 2, 7: 3})
    out_shape.append(jax.ShapeDtypeStruct((B, H, KHD), q_bd.dtype))
    return pl.pallas_call(
        _kernel(R, S, H, n_kv_head, KHD, quantized, ring, interpret),
        out_shape=out_shape,
        grid_spec=grid_spec,
        input_output_aliases=aliases,
        interpret=interpret,
    )(pos2, q_bd, k, v, k_slab, v_slab, k_scale, v_scale,
      mask_rel.reshape(B, 1, mS))


def gqa_decode_reference(q_bd, k, v, k_slab, v_slab, k_scale, v_scale,
                         mask_rel, pos, *, n_head: int, n_kv_head: int):
    """Pure-XLA reference. Reconstructs the model's 4-D GQA einsum chain
    op-for-op (models/gpt.py ``cached_att`` G>1 branch: same einsum
    strings, same dtypes, fp32 softmax; quantized mode additionally
    mirrors _quantize_int8 + _scale_write) so flat-cache decode off-TPU
    is bit-identical to the 4-D cache path."""
    B, S, KHD = k.shape
    H, KH = n_head, n_kv_head
    D = KHD // KH
    G = H // KH
    dtype = q_bd.dtype
    quantized = k_scale is not None
    if quantized:
        # quantize the raw slab exactly like the 4-D cache path's caller
        # (the kernel does the same math in-VMEM — module docstring)
        from ai_music_generation_tpu.models.gpt import (
            _quantize_int8, _scale_write,
        )

        kq, ks_new = _quantize_int8(k_slab.reshape(B, KH, D))
        vq, vs_new = _quantize_int8(v_slab.reshape(B, KH, D))
        k_slab = kq.reshape(B, 1, KHD)
        v_slab = vq.reshape(B, 1, KHD)
        k_scale = _scale_write(k_scale, ks_new[:, None], pos)
        v_scale = _scale_write(v_scale, vs_new[:, None], pos)
    k_new = jax.lax.dynamic_update_slice(k, k_slab.astype(k.dtype),
                                         (0, pos, 0))
    v_new = jax.lax.dynamic_update_slice(v, v_slab.astype(v.dtype),
                                         (0, pos, 0))
    # unfold q_bd back to per-head queries (exact 0/1 placement extraction)
    P = _placement(H, KH, D, jnp.float32)
    q4 = jnp.einsum("bhc,hdc->bhd", q_bd.astype(jnp.float32), P)
    q4 = q4.astype(dtype)[:, None]  # [B, 1, H, D]
    ck = k_new.reshape(B, S, KH, D)
    cv = v_new.reshape(B, S, KH, D)
    scale = jnp.asarray(1.0 / jnp.sqrt(D), dtype)
    qf = q4.reshape(B, 1, KH, G, D).transpose(0, 1, 3, 2, 4)
    qf = qf.reshape(B, G, KH, D)
    att = jnp.einsum("bthd,bshd->bhts", qf, ck.astype(dtype)) * scale
    if k_scale is not None:
        att = att * k_scale[:, :, None, :].astype(dtype)
    if mask_rel is not None:
        valid = (mask_rel >= 0)[:, None, None, :]
    else:
        valid = (jnp.arange(S) <= pos)[None, None, None, :]
    att = jnp.where(valid, att, jnp.asarray(-jnp.inf, att.dtype))
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(dtype)
    if v_scale is not None:
        att = att * v_scale[:, :, None, :].astype(dtype)
    y = jnp.einsum("bhts,bshd->bthd", att, cv.astype(dtype))  # [B, G, KH, D]
    y = y.reshape(B, 1, G, KH, D).transpose(0, 1, 3, 2, 4)  # [B,1,KH,G,D]
    y_heads = y.reshape(B, H, D)
    out = jnp.einsum("bhd,hdc->bhc", y_heads.astype(jnp.float32), P)
    if quantized:
        return k_new, v_new, k_scale, v_scale, out.astype(dtype)
    return k_new, v_new, out.astype(dtype)


@functools.lru_cache(maxsize=None)
def _placement_np(H: int, KH: int, D: int):
    import numpy as np
    G = H // KH
    P = np.zeros((H, D, KH * D), np.float32)
    for h in range(H):
        kh = h // G
        P[h, np.arange(D), kh * D + np.arange(D)] = 1.0
    return P


def _placement(H: int, KH: int, D: int, dtype):
    """[H, D, KH*D] 0/1 placement: P[h, d, (h//G)*D + d] = 1. Folding a
    [B, H, D] tensor through ``einsum('bhd,hdc->bhc', x, P)`` places head
    h's values into kv-head h//G's lane slice (exact — each output element
    receives exactly one input, no summation)."""
    return jnp.asarray(_placement_np(H, KH, D), dtype)

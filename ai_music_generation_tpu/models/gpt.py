"""GPT-2 style decoder-only transformer, TPU-first (Flax/linen).

Feature-parity target: the reference's nanoGPT module (ref:
nanoGPT/model.py:18-330) — learned token+position embeddings, pre-LN blocks,
causal self-attention, 4x GELU MLP, weight-tied LM head, residual-projection
init std ``0.02/sqrt(2*n_layer)``, cross-entropy with ignore_index=-1, an
inference fast path that computes logits only for the final position, model
surgery via ``crop_block_size``, and PaLM-style MFU accounting.

Design differences (deliberate, TPU-native):
- bf16 activations / fp32 params (replaces torch AMP autocast + GradScaler,
  ref: nanoGPT/train.py:115-116,211 — no loss scaling needed in bf16).
- The autoregressive path uses an explicit functional KV cache
  (:class:`KVCache`) threaded through ``__call__`` so the whole decode loop
  can live inside one ``jax.lax`` loop under jit — the reference re-runs the
  full forward per generated token with no KV cache (ref: nanoGPT/model.py:305-330).
- Attention is expressed as batched einsums over a static causal mask so XLA
  tiles it onto the MXU; a Pallas flash-attention kernel in
  ``ai_music_generation_tpu.ops`` can be swapped in via ``attn_impl``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    """Architecture hyperparameters (defaults match ref nanoGPT/model.py:108-116)."""

    block_size: int = 1024
    vocab_size: int = 50304  # padded to a multiple of 64 (lane-friendly on TPU too)
    n_layer: int = 12
    n_head: int = 12
    n_embd: int = 768
    dropout: float = 0.0
    bias: bool = True
    # TPU-specific knobs (no reference equivalent):
    dtype: Any = jnp.bfloat16  # activation/compute dtype
    param_dtype: Any = jnp.float32
    attn_impl: str = "xla"  # "xla" | "pallas" | "flash"
    kv_quantized: bool = False  # int8 KV cache (halves decode HBM traffic)
    spec_int8_dots: bool = False  # speculative verify kernel: int8 x int8
    # MXU dots against the uncast int8 cache (q and the scaled probs are
    # re-quantized per row inside the kernel — ~1/127 extra rounding on the
    # verify logits; ops/spec_attention.py). Only meaningful with
    # kv_quantized on the speculative decode path.
    remat: bool = False  # rematerialize each Block in the backward pass:
    # ~+1/3 FLOPs for O(layers) less saved-activation HBM — the standard
    # jax.checkpoint trade for models that don't fit 16 GB at full batch
    n_expert: int = 0  # Mixture-of-Experts: replace every block's MLP with
    # n_expert routed expert MLPs (models/moe.py). 0 = dense (the reference
    # architecture, ref: nanoGPT/model.py:78-92). Experts shard over the
    # mesh model axis (expert parallelism, parallel/mesh.py rules).
    expert_top_k: int = 2  # experts per token (renormalized gate)
    capacity_factor: float = 1.25  # per-expert buffer slack; overflow
    # tokens fall through the residual connection (combine weight 0)
    moe_aux_coef: float = 0.01  # weight of the load-balance aux loss
    n_kv_head: Optional[int] = None  # grouped-query attention (GQA/MQA):
    # number of K/V heads; must divide n_head. None = n_head (the reference
    # architecture — full multi-head attention, ref: nanoGPT/model.py:29-76;
    # GQA has no reference analogue). Decode is HBM-bound on the per-step
    # KV-cache read, so n_kv_head = n_head/G cuts cache storage AND decode
    # traffic by G at identical query-side FLOPs — the one bandwidth lever
    # left after int8 (the XLA decode step is at the read roofline,
    # ops/decode_attention_int8.py verdict). Composes with kv_quantized.
    flat_kv: bool = False  # carry the decode KV cache FLAT [B, S, KH*D]
    # and route every T=1 cached step through the Pallas GQA decode kernel
    # (ops/gqa_decode.py), which owns both the cache read and the
    # single-column write. This is what makes n_kv_head a THROUGHPUT lever:
    # the XLA path's G>1 einsum pins the carried cache S-minor and rewrites
    # the full buffer every step (the measured layout trap below). Requires
    # kv_heads*head_dim % 128 == 0 and a %8 cache length; off-TPU the op
    # runs a reference that is bit-identical to the 4-D einsum path.
    seq_axis: Optional[str] = None  # sequence/context parallelism: name of
    # the mesh axis the [B, T] inputs are sharded over (set by
    # parallel/sequence.py, which applies the model under shard_map).
    # Training path only: positions offset by the shard index, attention
    # runs the ppermute ring (ops/ring_attention.py), the loss mean psums
    # across the axis. No reference analogue (nanoGPT replicates the full
    # sequence per rank, ref: nanoGPT/model.py:60-76).

    def __post_init__(self):
        if self.n_kv_head is not None and (
            self.n_kv_head < 1 or self.n_head % self.n_kv_head
        ):
            raise ValueError(
                f"n_kv_head={self.n_kv_head} must be a positive divisor of "
                f"n_head={self.n_head}")

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def kv_heads(self) -> int:
        """Number of K/V heads (== n_head unless GQA is enabled)."""
        return self.n_kv_head or self.n_head


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Per-layer key/value cache for autoregressive decode.

    ``k``/``v`` are TUPLES of per-layer [batch, max_len, n_head, head_dim]
    buffers (not one stacked array): each layer's buffer is a separate pytree
    leaf, so inside a ``lax.scan`` decode loop XLA updates it in place via
    buffer donation instead of materializing a stacked copy of the whole
    cache every step (the stack/unstack pattern costs GB/step of HBM traffic
    at eval-protocol batch sizes). Each decode step's write is one
    contiguous [B, 1, H, D] slab; the Pallas fused decode kernel
    (ops/decode_attention.py) views the same memory as [B, S, H*D] (a free
    reshape) so its position-chunk DMA slices stay tile-aligned.

    ``length`` is the number of valid positions already written. A shared
    scalar means lockstep decode across the batch (the batch-sampler path);
    a [batch] VECTOR gives every row its own logical position and causal
    horizon — the continuous-batching serving path (serve/engine.py), where
    slots sit at different sequence positions.

    Vector mode is a RING buffer with a shared scalar write ``cursor``:
    every decode tick writes all rows' new K/V as ONE contiguous
    [B, 1, H, D] slab at buffer column ``cursor`` (identical HBM traffic to
    the scalar path), and row i's valid keys are the columns within
    ``(cursor - j) mod S <= length[i]`` — a [B, S] comparison instead of a
    per-row scatter. Measured on v5e at batch 1024: a vmapped
    dynamic-update-slice (scatter) write made the decode tick ~25x slower
    than lockstep (101 ms vs 4 ms — scatter lowering serializes row
    updates); the ring write restores slab semantics. Consequences:
    - rows must advance in wall-clock lockstep (every apply() call writes
      every row; freeze a finished row by pinning length — its stale
      columns fall out of every live window as the cursor moves on);
    - a row's history is the last ``length[i]`` columns behind the cursor,
      so admission writes a request's prefilled K/V rolled to end at the
      current cursor (serve/engine.py ``_insert``);
    - ``length[i]`` must stay < S at tick start (the engine's windowed
      refresh guarantees it).

    With ``quantized=True`` the buffers are int8 with per-(position, head)
    fp scales (``k_scale``/``v_scale``, stored TRANSPOSED [B, KH, S]): HBM
    cache traffic — the decode bottleneck — halves. The scale layout puts S
    on the lane dim for the same reason spec mode does: position-major
    [B, S, H] pads H (6) to 128 lanes — ~21x physical tile inflation — and
    the decode step READS the full padded buffer every tick; measured at
    the bench shape (B=4096, S=256) the [B, S, H] layout cost ~3.2 GB/step
    of scale reads against ~4.8 GB of int8 K/V, i.e. the padding ate most
    of the int8 win. [B, KH, S] is ~16.8 MB per buffer and is consumed by
    the attention broadcast directly (no per-step swapaxes). Scale writes
    are elementwise window-selects (a DUS whose offset lands on the lane
    dim costs 0.4-0.8 ms/layer — see spec mode below). Quantization
    changes logits slightly, so sampled output differs from the bf16 cache
    (still fully deterministic at fixed seed); enable via
    ``GPTConfig(kv_quantized=True)``.

    SPECULATIVE mode (``col_pos`` is a [B, S] int32 array): rows advance at
    different rates (speculative decoding commits a variable number of
    tokens per step, decode/speculative.py) yet every step still writes all
    rows' T new K/V columns as ONE contiguous slab at the shared scalar
    ``cursor`` — per-column LOGICAL positions in ``col_pos`` replace the
    contiguous-suffix assumption of ring mode. Semantics:
    - ``length[i]`` is the logical position of row i's FIRST query token
      this call (== the position of its last committed token);
    - column s of row i is attendable by query j iff
      ``col_pos[i, s] <= length[i] + j`` (invalid columns hold a large
      positive sentinel and never match);
    - the model tentatively marks the T freshly written columns with
      positions ``length[i] + j`` (correct within-step causal masking);
      the caller re-marks columns of rejected draft tokens invalid after
      acceptance is known (decode/speculative.py);
    - ``cursor`` advances by T WITHOUT wrapping; the caller re-prefills
      (compacting committed tokens) before the buffer runs out.
    """

    k: tuple[Array, ...]
    v: tuple[Array, ...]
    length: Array  # scalar int32 (lockstep) or [batch] int32 (ring mode)
    k_scale: Optional[tuple[Array, ...]] = None
    v_scale: Optional[tuple[Array, ...]] = None
    cursor: Optional[Array] = None  # scalar int32 ring write column (vector mode)
    col_pos: Optional[Array] = None  # [B, S] logical position per cache column

    # col_pos sentinel for dead columns: LARGE POSITIVE so that the
    # attendability test ``col_pos[s] <= q_pos`` is false for every real
    # query position (a negative sentinel would satisfy <= and leak the
    # zero-K/V columns into every softmax — caught by
    # tests/test_spec_attention.py::test_model_spec_path_uses_flat_cache)
    INVALID_POS = 1 << 30

    @classmethod
    def create(cls, config: GPTConfig, batch: int, max_len: Optional[int] = None,
               dtype: Any = None, quantized: Optional[bool] = None,
               per_row: bool = False, spec: bool = False,
               flat: Optional[bool] = None) -> "KVCache":
        max_len = max_len or config.block_size
        quantized = config.kv_quantized if quantized is None else quantized
        dtype = jnp.int8 if quantized else (dtype or config.dtype)
        flat = config.flat_kv if flat is None else flat
        if flat and not spec:
            # FLAT GQA-kernel layout [B, S, KH*D] (see GPTConfig.flat_kv):
            # the decode step's attention AND column write go through
            # ops/gqa_decode.py, which requires exact lane tiling and
            # 8-aligned writeback windows
            khd = config.kv_heads * config.head_dim
            assert khd % 128 == 0, (
                f"flat_kv needs kv_heads*head_dim % 128 == 0, got {khd}")
            assert max_len % 8 == 0, "flat_kv cache length must be 8-aligned"
            shape = (batch, max_len, khd)
            scale_shape = (batch, config.kv_heads, max_len)
            mk = lambda: tuple(
                jnp.zeros(shape, dtype) for _ in range(config.n_layer))
            mks = lambda: tuple(
                jnp.zeros(scale_shape, jnp.bfloat16)
                for _ in range(config.n_layer))
            return cls(
                k=mk(), v=mk(),
                length=jnp.zeros((batch,) if per_row else (), jnp.int32),
                k_scale=mks() if quantized else None,
                v_scale=mks() if quantized else None,
                cursor=jnp.zeros((), jnp.int32) if per_row else None,
            )
        if spec:
            # spec mode stores the cache FLAT as [B, S//8, 8, H*D] — the
            # SAME linear bytes as [B, S, H*D] (both are row-major (8, 128)
            # tilings with H*D a 128-multiple), so the attention layer's
            # reshape to flat for the Pallas verify kernel is a free
            # bitcast. The extra split matters for the WRITE: a
            # dynamic-update-slice whose offset lands on a TILED dim
            # (sublanes or lanes) measured 0.4-0.8 ms per layer at batch
            # 4096 on v5e, while a leading-dim offset is a true in-place
            # slab write — so the cursor stays 8-aligned (writes pad to
            # Tw = ceil(T/8)*8 columns; col_pos marks pads dead) and
            # indexes dim 1. The kernel keeps the cache off XLA's einsum
            # layout assignment entirely (the T>1 einsum would pin an
            # S-minor layout and rewrite the full buffer every step).
            # Scales are stored TRANSPOSED [B, H, S] — the layout the verify
            # kernel consumes directly. Position-major [B, S, H] puts H=6 on
            # the LANE dim, which the TPU pads to 128: ~21x physical
            # inflation (268 MB per buffer at batch 4096), and the per-step
            # elementwise update then rewrites those padded bytes for all
            # four buffers per layer. [B, H, S] puts S=256 on lanes: 16.8 MB
            # per buffer, and no per-step swapaxes before the kernel call.
            # Update stays an elementwise where, never a DUS.
            #
            # The K/V buffers are carried FLAT [B, S, H*D] — exactly the
            # kernel operand shape, NO alternate 4-D view anywhere. The
            # round-4 compiler materializes reshape "views" of a loop-carried
            # buffer (observed: a [B,S//8,8,HD] carry + [B,S,HD] kernel
            # operand emitted full-cache pad_bitcast fusions, copy-start/
            # copy-done pairs AND copy+DUS fusions — ~20 ms/step at batch
            # 4096, dwarfing the attention itself). The slab write is a DUS
            # at an 8-ALIGNED SUBLANE offset (cursor stays 8-aligned, writes
            # pad to Tw columns), which keeps the update tile-aligned.
            assert max_len % 8 == 0, "spec cache length must be 8-aligned"
            assert config.kv_heads == config.n_head, (
                "speculative decode's Pallas verify kernel assumes full "
                "multi-head K/V; train GQA models decode via the plain "
                "Generator/serving paths")
            shape = (batch, max_len, config.n_head * config.head_dim)
            scale_shape = (batch, config.n_head, max_len)
        else:
            # GQA: the cache holds kv_heads (<= n_head) heads — the whole
            # point of the knob is the smaller per-step cache read
            shape = (batch, max_len, config.kv_heads, config.head_dim)
            scale_shape = (batch, config.kv_heads, max_len)
        mk = lambda: tuple(jnp.zeros(shape, dtype) for _ in range(config.n_layer))
        mks = lambda: tuple(
            jnp.zeros(scale_shape, jnp.bfloat16) for _ in range(config.n_layer)
        )
        vector = per_row or spec
        return cls(
            k=mk(), v=mk(),
            length=jnp.zeros((batch,) if vector else (), jnp.int32),
            k_scale=mks() if quantized else None,
            v_scale=mks() if quantized else None,
            cursor=jnp.zeros((), jnp.int32) if vector else None,
            col_pos=jnp.full((batch, max_len), cls.INVALID_POS, jnp.int32)
            if spec else None,
        )

    def tree_flatten(self):
        return (self.k, self.v, self.length, self.k_scale, self.v_scale,
                self.cursor, self.col_pos), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _init_normal(std: float):
    return nn.initializers.normal(stddev=std)


def _quantize_int8(x: Array) -> tuple[Array, Array]:
    """Symmetric per-(…, head) int8 quantization over the last axis;
    returns (int8 values, bf16 scales). Shared by the ring-mode and
    slab-mode cache writes."""
    x = x.astype(jnp.float32)
    s_ = jnp.maximum(jnp.max(jnp.abs(x), axis=-1), 1e-6) / 127.0
    q = jnp.clip(jnp.round(x / s_[..., None]), -127, 127)
    return q.astype(jnp.int8), s_.astype(jnp.bfloat16)


def _scale_write(buf: Array, new_s: Array, start: Array) -> Array:
    """Write a fresh [B, T, KH] scale slab into a TRANSPOSED [B, KH, S]
    scale buffer at columns ``start..start+T-1`` (caller guarantees no
    wrap). Elementwise window-select + one-hot dot rather than a
    dynamic-update-slice: the DUS offset would land on the LANE dim of
    [B, KH, S] (measured 0.4-0.8 ms/layer at batch 4096 — the spec-mode
    finding this layout inherits)."""
    T = new_s.shape[1]
    S = buf.shape[-1]
    sidx = jnp.arange(S)
    win = (sidx >= start) & (sidx < start + T)  # [S]
    onehot = (sidx[None, :] == (start + jnp.arange(T))[:, None])  # [T, S]
    full = jnp.einsum(
        "bth,ts->bhs", new_s.astype(buf.dtype), onehot.astype(buf.dtype))
    return jnp.where(win[None, None, :], full, buf)


def _quantize_int8_flat(x: Array, n_head: int) -> tuple[Array, Array]:
    """Per-(position, head) int8 quantization of a FLAT [B, T, H*D] slab.

    Bit-identical to ``_quantize_int8`` on the [B, T, H, D] view (same
    group maxes, same division), but never forms a rank-4 tensor: the
    group max is a reduce_window and the scale expansion a one-hot dot.
    Measured on v5e at batch 4096 this is a wash for the single verify
    step (23.7 vs 23.3 ms — XLA's group-max reduce keeps its layout
    quirks either way); kept because it matches the flat spec-cache
    shapes and sheds the rank-4 batch-minor intermediates the 4D form
    scattered through the decode loop's fusion choices."""
    B, T, C = x.shape
    D = C // n_head
    xf = x.astype(jnp.float32)
    m = jax.lax.reduce_window(
        jnp.abs(xf), -jnp.inf, jax.lax.max, (1, 1, D), (1, 1, D), "VALID")
    s_ = jnp.maximum(m, 1e-6) / 127.0  # [B, T, H]
    block = (jax.lax.broadcasted_iota(jnp.int32, (n_head, C), 1) // D
             == jax.lax.broadcasted_iota(jnp.int32, (n_head, C), 0))
    s_exp = jnp.einsum("bth,hc->btc", s_, block.astype(jnp.float32))
    q = jnp.clip(jnp.round(xf / s_exp), -127, 127)
    return q.astype(jnp.int8), s_.astype(jnp.bfloat16)


class CausalSelfAttention(nn.Module):
    """Multi-head causal attention (ref behavior: nanoGPT/model.py:29-76).

    Fused QKV projection; supports full-sequence (training) and incremental
    (KV-cache) modes. The incremental mode writes new keys/values at
    ``cache_len`` via a dynamic-update and masks attention to positions
    ``< cache_len + T``.
    """

    config: GPTConfig
    layer_idx: int = 0

    def _epilogue(self, y: Array, deterministic: bool) -> Array:
        """Shared output projection + dropout (all attention variants).
        Residual projections get the scaled init (ref: nanoGPT/model.py:140-144)."""
        cfg = self.config
        y = nn.Dense(
            cfg.n_embd,
            use_bias=cfg.bias,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=_init_normal(0.02 / math.sqrt(2 * cfg.n_layer)),
            name="c_proj",
        )(y)
        return nn.Dropout(cfg.dropout)(y, deterministic=deterministic)

    @nn.compact
    def __call__(
        self,
        x: Array,
        deterministic: bool = True,
        layer_cache: Optional[tuple[Array, Array]] = None,
        cache_len: Optional[Array] = None,
        cursor: Optional[Array] = None,
        spec_col_pos: Optional[Array] = None,
    ):
        cfg = self.config
        B, T, C = x.shape
        H, D = cfg.n_head, cfg.head_dim
        KH = cfg.kv_heads  # GQA: kv_heads <= n_head, G query heads per K/V head
        G = H // KH

        c_attn = nn.Dense(
            C + 2 * KH * D,  # == 3 * C when KH == H (the reference layout)
            use_bias=cfg.bias,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=_init_normal(0.02),
            name="c_attn",
        )
        if T == 1 and layer_cache is not None:
            # decode step: project in 2-D. A [B, 1, 3C] dot output gets a
            # packed (2,1) minor tiling whose consumers demand plain
            # (8,128) — XLA inserts a layout-conversion copy per layer per
            # step (traced 0.12 ms each at batch 4096, 15% of the whole
            # flat-kernel decode step). Slicing in 2-D and reshaping after
            # keeps every tensor on the default tiling.
            qkv = c_attn(x[:, 0])  # [B, C + 2*KH*D]
            q = qkv[:, :C].reshape(B, 1, H, D)
            k = qkv[:, C:C + KH * D].reshape(B, 1, KH, D)
            v = qkv[:, C + KH * D:].reshape(B, 1, KH, D)
        else:
            qkv = c_attn(x)
            q = qkv[..., :C].reshape(B, T, H, D)
            k = qkv[..., C:C + KH * D].reshape(B, T, KH, D)
            v = qkv[..., C + KH * D:].reshape(B, T, KH, D)
        if G > 1 and layer_cache is None:
            # training / no-cache forward: broadcast K/V to the full head
            # count and reuse every attention path unchanged. The repeat is
            # activation-sized ([B, T, H, D] — same as a non-GQA k), so
            # unlike the decode-cache read there is no bandwidth to save by
            # grouping here; the cached path below stays grouped.
            k = jnp.repeat(k, G, axis=2)
            v = jnp.repeat(v, G, axis=2)

        new_cache = None
        if layer_cache is not None:
            def cached_att(mask4, ck, cv, ck_scale, cv_scale):
                # int8: the per-(position, head) scales are factored OUT of
                # the einsums onto the small [B, H, T, S] attention tensor
                # (q.(k_q*ks) == (q.k_q)*ks exactly) — the int8 buffers feed
                # the dots directly and the dequantized [B, S, H, D] copy is
                # never materialized in HBM. Shared by the ring (per-row
                # mask) and scalar (causal [T, S] mask) branches so the
                # serving and batch decode paths cannot drift.
                scale = jnp.asarray(1.0 / jnp.sqrt(D), cfg.dtype)
                if G == 1:
                    # scales are stored [B, KH, S] (see KVCache docstring):
                    # one broadcast axis insert, no per-step swapaxes
                    att = jnp.einsum(
                        "bthd,bshd->bhts", q, ck.astype(cfg.dtype)) * scale
                    if ck_scale is not None:
                        att = att * ck_scale[:, :, None, :].astype(cfg.dtype)
                    att = jnp.where(
                        mask4, att, jnp.asarray(-jnp.inf, att.dtype))
                    att = jax.nn.softmax(
                        att.astype(jnp.float32), axis=-1).astype(cfg.dtype)
                    att = nn.Dropout(cfg.dropout)(
                        att, deterministic=deterministic)
                    if cv_scale is not None:
                        att = att * cv_scale[:, :, None, :].astype(cfg.dtype)
                    return jnp.einsum(
                        "bhts,bshd->bthd", att, cv.astype(cfg.dtype)
                    ).reshape(B, T, C)
                # GQA: fold the G query heads of each group into the query
                # TIME axis so the cache operand sees the EXACT same einsum
                # as the MHA branch ([B, T*G, KH, D] x [B, S, KH, D]) — XLA
                # reads only the small KH-head buffers from HBM and the
                # cache gets the same S-minor layout as the MHA decode step
                # (identical dot shape, one code path). Throughput parity
                # with the 5-D grouped einsum it replaces was measured (both
                # 147.8k tok/s at the bench shape, KH=2) — the fold is kept
                # for the shared einsum/mask path, not as a perf claim. The
                # [B,T,KH,G,D]<->[B,T,G,KH,D] transposes are
                # activation-sized (T*H*D per row) — noise next to the
                # cache read. Query head h uses kv head h//G (the
                # jnp.repeat train-path convention above).
                #
                # Measured no-go (v5e, KH=2, batch 4096): the GQA decode
                # gap vs MHA (148k vs 448k tok/s) is the carried cache
                # LAYOUT, not the dot — any G>1 free dim on the query side
                # makes the QK product an MXU matmul, which pins the
                # carried K/V to S-minor (lanes) and turns every step's
                # dynamic-update-slice into a full-buffer rewrite (traced:
                # 20 of 27.6 ms/step). A hand-written T==1 VPU
                # broadcast-multiply-reduce (the MHA matvec form) was
                # tried and measured WORSE (83k): XLA re-materialized the
                # [B,S,KH,G] product tensor in HBM. The FIX is
                # GPTConfig.flat_kv: carry the cache flat [B, S, KH*D] and
                # run the decode step inside ops/gqa_decode.py, which owns
                # the cache layout end-to-end — measured 702k tok/s at the
                # bench shape (1.57x the MHA headline; docs/PERF.md
                # "Grouped-query attention"). This einsum branch remains
                # the prefill / off-TPU / non-flat path. The same kernel
                # at G=1 (MHA) measured 337k vs XLA's 447k — MHA stays
                # here because its T=1 matvec is already layout-clean.
                qf = q.reshape(B, T, KH, G, D).transpose(0, 1, 3, 2, 4)
                qf = qf.reshape(B, T * G, KH, D)  # row t*G+g, t-major
                att = jnp.einsum(
                    "bthd,bshd->bhts", qf, ck.astype(cfg.dtype)) * scale
                if ck_scale is not None:
                    att = att * ck_scale[:, :, None, :].astype(cfg.dtype)
                # mask4's T axis (2) must repeat per group unless it
                # broadcasts (ring mode passes T==1 masks)
                m4 = mask4 if mask4.shape[2] == 1 else jnp.repeat(
                    mask4, G, axis=2)
                att = jnp.where(m4, att, jnp.asarray(-jnp.inf, att.dtype))
                att = jax.nn.softmax(
                    att.astype(jnp.float32), axis=-1).astype(cfg.dtype)
                att = nn.Dropout(cfg.dropout)(att, deterministic=deterministic)
                if cv_scale is not None:
                    att = att * cv_scale[:, :, None, :].astype(cfg.dtype)
                y = jnp.einsum(
                    "bhts,bshd->bthd", att, cv.astype(cfg.dtype))  # [B,TG,KH,D]
                return y.reshape(B, T, G, KH, D).transpose(
                    0, 1, 3, 2, 4).reshape(B, T, C)

            ck, cv = layer_cache[0], layer_cache[1]  # [B, S, H, D]
            ck_scale = layer_cache[2] if len(layer_cache) > 2 else None
            cv_scale = layer_cache[3] if len(layer_cache) > 2 else None
            S = ck.shape[1]
            per_row = cache_len.ndim == 1  # ring mode: per-slot positions
            if spec_col_pos is not None:
                # speculative mode: T >= 1 inputs per row, ALL rows' new K/V
                # written as one contiguous slab at the shared scalar
                # ``cursor``; attendability comes entirely from the logical
                # positions (query t of row i sits at cache_len[i] + t and
                # may read column s iff spec_col_pos[i, s] <= that — see
                # KVCache docstring) so rows at different logical positions
                # share one slab write. The cache is FLAT [B, S, H*D] with
                # TRANSPOSED [B, H, S] scales, and every read goes through
                # the Pallas verify kernel: XLA's T>1 einsum would pin the
                # cache to an S-minor layout and turn this slab write into
                # a full-buffer rewrite (ops/spec_attention.py docstring).
                assert cursor is not None, "spec mode requires a cursor"
                assert deterministic or cfg.dropout == 0.0, (
                    "speculative decode is an inference path; attention-prob "
                    "dropout is not applied here")
                from ai_music_generation_tpu.ops.spec_attention import (
                    spec_attention_update,
                )

                # ck/cv are FLAT [B, S, H*D] (see KVCache.create: no 4-D
                # view — reshape views of a carried buffer materialize as
                # full-cache copies under the round-4 compiler). The fresh
                # slab pads T to the 8-aligned write width Tw (pad columns
                # stay dead in col_pos) so the DUS is tile-aligned on the
                # sublane dim.
                S = ck.shape[1]
                Tw = -(-T // 8) * 8

                def pad_w(x):  # [B, T, C] -> [B, Tw, C], 8-aligned sublanes
                    if Tw == T:
                        return x
                    return jnp.concatenate(
                        [x, jnp.zeros((B, Tw - T, C), x.dtype)], axis=1)

                if ck_scale is not None:
                    # quantize the ALREADY-padded slab: every sublane dim in
                    # the quantize fusion is 8-aligned (a T=5 slab forces
                    # per-op tile relayouts), and pad columns quantize to
                    # harmless near-zero scales on dead (col_pos) columns
                    kq, ks = _quantize_int8_flat(pad_w(k.reshape(B, T, C)), H)
                    vq, vs = _quantize_int8_flat(pad_w(v.reshape(B, T, C)), H)
                    # scale updates are elementwise (a DUS whose offset hits
                    # a tiled dim costs 0.4-0.8 ms/layer — see KVCache):
                    # scatter the fresh [B, Tw, H] scales to their columns of
                    # the [B, H, S] buffers with a tiny one-hot dot, then
                    # select inside the window
                    sidx = jnp.arange(S)
                    win = ((sidx >= cursor) & (sidx < cursor + Tw))[None, None, :]
                    onehot = (sidx[None, :]
                              == (cursor + jnp.arange(Tw))[:, None])  # [Tw, S]
                    ks_full = jnp.einsum(
                        "bth,ts->bhs", ks, onehot.astype(ks.dtype))
                    vs_full = jnp.einsum(
                        "bth,ts->bhs", vs, onehot.astype(vs.dtype))
                    ck_scale = jnp.where(win, ks_full, ck_scale)
                    cv_scale = jnp.where(win, vs_full, cv_scale)
                    kslab, vslab = kq, vq
                else:
                    kslab = pad_w(k.reshape(B, T, C)).astype(ck.dtype)
                    vslab = pad_w(v.reshape(B, T, C)).astype(cv.dtype)
                # the kernel owns the cache write: the K/V buffers pass
                # through ALIASED (in-kernel slab DMA at `cursor`), never
                # touched by an XLA dynamic-update-slice — which the
                # round-4 compiler turns into full-cache copy fusions
                # (~20 ms/step at batch 4096; spec_attention_update
                # docstring)
                ck, cv, y = spec_attention_update(
                    q.reshape(B, T, C), ck, cv, kslab, vslab,
                    ck_scale, cv_scale,
                    spec_col_pos, cache_len, cursor, n_head=H,
                    int8_dots=cfg.spec_int8_dots and ck_scale is not None)
                new_cache = ((ck, cv) if ck_scale is None
                             else (ck, cv, ck_scale, cv_scale))
                return self._epilogue(y, deterministic), new_cache
            if ck.ndim == 3:
                # FLAT cache (GPTConfig.flat_kv): [B, S, KH*D]; the decode
                # step's attention AND single-column write run inside the
                # Pallas GQA kernel — ops/gqa_decode.py's docstring has the
                # measured layout-trap rationale. Prefill (T > 1) stays
                # XLA-side: its writes/reads happen once per generate call,
                # outside the decode loop, so layout churn is a one-time
                # cost there.
                assert deterministic or cfg.dropout == 0.0, (
                    "flat_kv decode is an inference path; attention-prob "
                    "dropout is not applied here")
                from ai_music_generation_tpu.ops.gqa_decode import (
                    _placement, gqa_decode_update,
                )

                KHD = KH * D
                if T == 1:
                    pos = cursor if per_row else cache_len
                    if ck_scale is not None:
                        # int8: the RAW bf16 projections go straight into
                        # the kernel, which owns the quantize AND the
                        # scale write (ops/gqa_decode.py docstring) —
                        # the XLA-side _quantize_int8 + _scale_write
                        # fusions this replaces traced at ~0.6 ms of the
                        # 4.9 ms decode step at batch 4096.
                        kslab = k.reshape(B, 1, KHD)
                        vslab = v.reshape(B, 1, KHD)
                    else:
                        kslab = k.reshape(B, 1, KHD).astype(ck.dtype)
                        vslab = v.reshape(B, 1, KHD).astype(cv.dtype)
                    if per_row:
                        # ring window: column s attendable iff its ring
                        # offset behind the cursor is <= length[b]
                        offset = jnp.mod(pos - jnp.arange(S), S)  # [S]
                        mask_rel = (cache_len[:, None]
                                    - offset[None, :]).astype(jnp.int32)
                    else:
                        mask_rel = None  # kernel masks col <= pos itself
                    # NOTE (round-5 probe): a bit-identical VPU
                    # broadcast-multiply fold (mask [H, KH], no MXU dot)
                    # measured 995k vs 1,035k at the bench protocol — the
                    # placement EINSUM stays. The ~0.21 ms/step of copies
                    # around it in the compiled HLO are S(1) alternate-
                    # memory staging for the pallas custom call, present
                    # under either formulation (docs/PERF.md HLO audit).
                    P = _placement(H, KH, D, cfg.dtype)
                    q_bd = jnp.einsum("bhd,hdc->bhc", q.reshape(B, H, D), P)
                    if ck_scale is not None:
                        ck, cv, ck_scale, cv_scale, out = gqa_decode_update(
                            q_bd, ck, cv, kslab, vslab, ck_scale, cv_scale,
                            mask_rel, pos, n_head=H, n_kv_head=KH)
                        new_cache = (ck, cv, ck_scale, cv_scale)
                    else:
                        ck, cv, out = gqa_decode_update(
                            q_bd, ck, cv, kslab, vslab, None, None,
                            mask_rel, pos, n_head=H, n_kv_head=KH)
                        new_cache = (ck, cv)
                    y = jnp.einsum(
                        "bhc,hdc->bhd", out, P.astype(out.dtype))
                    y = y.reshape(B, 1, C)
                    return self._epilogue(y, deterministic), new_cache
                # prefill: T > 1 at scalar cache_len — flat slab writes +
                # the shared einsum path over 4-D views (one-time cost)
                assert not per_row, "flat_kv ring decode is T=1"
                if ck_scale is not None:
                    kq, ks = _quantize_int8(k)
                    vq, vs = _quantize_int8(v)
                    ck = jax.lax.dynamic_update_slice(
                        ck, kq.reshape(B, T, KHD), (0, cache_len, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, vq.reshape(B, T, KHD), (0, cache_len, 0))
                    ck_scale = _scale_write(ck_scale, ks, cache_len)
                    cv_scale = _scale_write(cv_scale, vs, cache_len)
                    new_cache = (ck, cv, ck_scale, cv_scale)
                else:
                    ck = jax.lax.dynamic_update_slice(
                        ck, k.reshape(B, T, KHD).astype(ck.dtype),
                        (0, cache_len, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, v.reshape(B, T, KHD).astype(cv.dtype),
                        (0, cache_len, 0))
                    new_cache = (ck, cv)
                q_pos = cache_len + jnp.arange(T)[:, None]  # [T, 1]
                k_pos = jnp.arange(S)[None, :]  # [1, S]
                mask = k_pos <= q_pos  # [T, S]
                y = cached_att(
                    mask[None, None, :, :],
                    ck.reshape(B, S, KH, D), cv.reshape(B, S, KH, D),
                    ck_scale, cv_scale)
                return self._epilogue(y, deterministic), new_cache
            if per_row:
                # ring write: ALL rows' new K/V land at buffer column
                # ``cursor`` as one contiguous slab (see KVCache docstring
                # for why a per-row scatter is a 25x regression here)
                assert T == 1, "ring-mode (vector cache_len) decode is T=1"
                assert cursor is not None, "vector cache_len requires a cursor"
                if ck_scale is not None:
                    kq, ks = _quantize_int8(k)
                    vq, vs = _quantize_int8(v)
                    ck = jax.lax.dynamic_update_slice(ck, kq, (0, cursor, 0, 0))
                    cv = jax.lax.dynamic_update_slice(cv, vq, (0, cursor, 0, 0))
                    ck_scale = _scale_write(ck_scale, ks, cursor)
                    cv_scale = _scale_write(cv_scale, vs, cursor)
                    new_cache = (ck, cv, ck_scale, cv_scale)
                else:
                    ck = jax.lax.dynamic_update_slice(
                        ck, k.astype(ck.dtype), (0, cursor, 0, 0))
                    cv = jax.lax.dynamic_update_slice(
                        cv, v.astype(cv.dtype), (0, cursor, 0, 0))
                    new_cache = (ck, cv)
                # row i's valid keys: the just-written column (offset 0) plus
                # its last cache_len[i] ring columns behind the cursor
                offset = jnp.mod(cursor - jnp.arange(S), S)  # [S]
                mask = offset[None, :] <= cache_len[:, None]  # [B, S]
                cache4 = (new_cache if len(new_cache) == 4
                          else (*new_cache, None, None))
                y = cached_att(mask[:, None, None, :], *cache4)
                return self._epilogue(y, deterministic), new_cache
            if ck_scale is not None:
                # int8 cache: quantize the new slab per (position, head)
                kq, ks = _quantize_int8(k)
                vq, vs = _quantize_int8(v)
                ck = jax.lax.dynamic_update_slice(ck, kq, (0, cache_len, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, vq, (0, cache_len, 0, 0))
                ck_scale = _scale_write(ck_scale, ks, cache_len)
                cv_scale = _scale_write(cv_scale, vs, cache_len)
                new_cache = (ck, cv, ck_scale, cv_scale)
            else:
                # contiguous [B, T, H, D] slab write at position cache_len
                ck = jax.lax.dynamic_update_slice(
                    ck, k.astype(ck.dtype), (0, cache_len, 0, 0))
                cv = jax.lax.dynamic_update_slice(
                    cv, v.astype(cv.dtype), (0, cache_len, 0, 0))
                new_cache = (ck, cv)
            if (T == 1 and cfg.attn_impl == "pallas" and ck_scale is None
                    and G == 1):
                from ai_music_generation_tpu.ops.decode_attention import (
                    decode_attention,
                )

                y = decode_attention(
                    q.reshape(B, C), ck.reshape(B, S, C), cv.reshape(B, S, C),
                    cache_len + 1, n_head=H,
                ).reshape(B, 1, C).astype(cfg.dtype)
                return self._epilogue(y, deterministic), new_cache
            # positions of the T query tokens are cache_len .. cache_len+T-1
            q_pos = cache_len + jnp.arange(T)[:, None]  # [T, 1]
            k_pos = jnp.arange(S)[None, :]  # [1, S]
            mask = k_pos <= q_pos  # [T, S]
            cache4 = (new_cache if len(new_cache) == 4
                      else (*new_cache, None, None))
            y = cached_att(mask[None, None, :, :], *cache4)
        elif cfg.seq_axis is not None:
            # sequence-parallel training: this device holds a contiguous
            # [B, Tl] chunk of the global sequence; K/V blocks ring-rotate
            # over the seq axis (ops/ring_attention.py). Falling through to
            # the einsum path here would silently attend within the local
            # chunk only — structurally wrong, hence a dedicated branch.
            if not deterministic and cfg.dropout > 0.0:
                raise NotImplementedError(
                    "attention-prob dropout is not expressible under ring "
                    "attention; train sequence-parallel with dropout=0")
            from ai_music_generation_tpu.ops.ring_attention import (
                ring_attention,
            )

            y = ring_attention(q, k, v, cfg.seq_axis).reshape(B, T, C)
        elif (
            cfg.attn_impl == "flash"
            and jax.default_backend() == "tpu"
            and (deterministic or cfg.dropout == 0.0)
        ):
            # Pallas flash attention (JAX's stock TPU kernel): O(T) memory,
            # no [B,H,T,T] score materialization. Attention-prob dropout is
            # not expressible here, so training with dropout falls through
            # to the einsum path below.
            # Measured (v5e, 6L/6H/384d, batch 32, block 1024, fwd+bwd):
            # einsum 95 ms vs flash 180 ms with identical loss — at baby-GPT
            # widths attention is a small FLOP fraction and XLA's fusion
            # wins, so this stays opt-in for genuinely long-context models.
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention,
            )

            y = flash_attention(
                q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2),
                causal=True, sm_scale=1.0 / math.sqrt(D),
            ).swapaxes(1, 2).reshape(B, T, C).astype(cfg.dtype)
        else:
            mask = jnp.tril(jnp.ones((T, T), dtype=bool))
            scale = jnp.asarray(1.0 / jnp.sqrt(D), cfg.dtype)
            att = jnp.einsum("bthd,bshd->bhts", q, k) * scale
            att = jnp.where(mask[None, None, :, :], att, jnp.asarray(-jnp.inf, att.dtype))
            att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(cfg.dtype)
            att = nn.Dropout(cfg.dropout)(att, deterministic=deterministic)
            y = jnp.einsum("bhts,bshd->bthd", att, v).reshape(B, T, C)

        return self._epilogue(y, deterministic), new_cache


class MLP(nn.Module):
    """4x GELU MLP (ref behavior: nanoGPT/model.py:78-92)."""

    config: GPTConfig

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        cfg = self.config
        x = nn.Dense(
            4 * cfg.n_embd,
            use_bias=cfg.bias,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=_init_normal(0.02),
            name="c_fc",
        )(x)
        x = nn.gelu(x)
        x = nn.Dense(
            cfg.n_embd,
            use_bias=cfg.bias,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            kernel_init=_init_normal(0.02 / math.sqrt(2 * cfg.n_layer)),
            name="c_proj",
        )(x)
        return nn.Dropout(cfg.dropout)(x, deterministic=deterministic)


class Block(nn.Module):
    """Pre-LN transformer block (ref behavior: nanoGPT/model.py:94-106).

    With ``config.n_expert > 0`` the MLP is the routed MoE layer
    (models/moe.py) and the return gains a third element — the scalar
    load-balance aux loss — so the arity is fixed per config and existing
    dense call sites (pipeline.py, tunesformer.py) stay 2-tuples.
    """

    config: GPTConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, deterministic=True, layer_cache=None, cache_len=None,
                 cursor=None, spec_col_pos=None):
        cfg = self.config
        ln = lambda name: nn.LayerNorm(
            use_bias=cfg.bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            epsilon=1e-5, name=name,
        )
        attn_out, new_cache = CausalSelfAttention(cfg, self.layer_idx, name="attn")(
            ln("ln_1")(x), deterministic, layer_cache, cache_len, cursor,
            spec_col_pos,
        )
        x = x + attn_out
        if cfg.n_expert > 0:
            from ai_music_generation_tpu.models.moe import MoEMLP

            mlp_out, aux = MoEMLP(cfg, name="moe")(
                ln("ln_2")(x), deterministic)
            return x + mlp_out, new_cache, aux
        x = x + MLP(cfg, name="mlp")(ln("ln_2")(x), deterministic)
        return x, new_cache


class GPT(nn.Module):
    """Decoder-only LM with weight-tied head (ref behavior: nanoGPT/model.py:118-193).

    ``__call__`` returns ``(logits, loss, new_cache)``:

    - training (``targets`` given): logits over all positions, scalar mean
      cross-entropy loss ignoring ``targets == -1`` (ref: model.py:188-189).
    - inference (``targets=None``, no cache): logits for the LAST position
      only (ref fast path: model.py:191-193).
    - incremental decode (``cache`` given): logits for the last position and
      the updated :class:`KVCache`.
    """

    config: GPTConfig

    @nn.compact
    def __call__(
        self,
        idx: Array,  # [B, T] int32
        targets: Optional[Array] = None,
        deterministic: bool = True,
        cache: Optional[KVCache] = None,
        return_all_logits: bool = False,
    ):
        cfg = self.config
        B, T = idx.shape
        if T > cfg.block_size:
            # trace-time check (T is static): nn.Embed's clipping gather
            # would otherwise silently give every position past block_size
            # the LAST wpe row — corrupt logits instead of an error
            # (ref asserts the same bound, nanoGPT/model.py:172). With a
            # cache, keeping length+T <= block_size is the caller's
            # windowing invariant (decode/generate.py, serve/engine.py).
            raise ValueError(
                f"sequence length {T} exceeds block_size {cfg.block_size}")

        wte = nn.Embed(
            cfg.vocab_size, cfg.n_embd,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            embedding_init=_init_normal(0.02), name="wte",
        )
        wpe = nn.Embed(
            cfg.block_size, cfg.n_embd,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            embedding_init=_init_normal(0.02), name="wpe",
        )

        spec_col_pos = None
        new_col_pos = None
        if cache is not None and cache.col_pos is not None:
            # speculative mode: length[i] is the logical position of row i's
            # first query token; tentatively mark the T freshly written
            # columns with their positions (the caller invalidates rejected
            # draft columns afterwards — decode/speculative.py). Query j of
            # row i may attend cache column s iff col_pos[i, s] <= length[i]
            # + j — the attention layer (Pallas kernel on TPU) builds that
            # mask from (col_pos, length) itself.
            q_pos = cache.length[:, None] + jnp.arange(T)[None, :]  # [B, T]
            # elementwise window-select, NOT a dynamic-update-slice: the
            # DUS offset would land on col_pos's lane dim (a measured
            # 0.5 ms whole-buffer shift per step at batch 4096)
            rel = jnp.arange(cache.col_pos.shape[1])[None, :] - cache.cursor
            new_col_pos = jnp.where(
                (rel >= 0) & (rel < T),
                cache.length[:, None] + rel, cache.col_pos)
            spec_col_pos = new_col_pos
            x = wte(idx) + wpe(q_pos)
        elif cache is not None and cache.length.ndim == 1:
            # per-row positions (serving): row i's tokens sit at length[i]+t
            pos = cache.length[:, None] + jnp.arange(T)[None, :]  # [B, T]
            x = wte(idx) + wpe(pos)
        elif cfg.seq_axis is not None:
            if cache is not None:
                raise NotImplementedError(
                    "seq_axis is a training-path knob; decode stays on the "
                    "data/model axes (parallel/sequence.py docstring)")
            # local row t is global position axis_index*T + t; the caller
            # (parallel/sequence.py) asserts global T <= block_size — the
            # trace-time check above only sees the local chunk
            pos = jax.lax.axis_index(cfg.seq_axis) * T + jnp.arange(T)
            x = wte(idx) + wpe(pos)[None, :, :]
        else:
            pos = cache.length + jnp.arange(T) if cache is not None else jnp.arange(T)
            x = wte(idx) + wpe(pos)[None, :, :]
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)

        new_k: list[Array] = []
        new_v: list[Array] = []
        new_ks: list[Array] = []
        new_vs: list[Array] = []
        aux_total = jnp.zeros((), jnp.float32)
        quantized = cache is not None and cache.k_scale is not None
        # remat only makes sense on the training path (no cache to thread)
        block_cls = (
            nn.remat(Block, static_argnums=(2, 3, 4, 5, 6))
            if cfg.remat and cache is None else Block
        )
        for i in range(cfg.n_layer):
            if cache is None:
                layer_cache = None
            elif quantized:
                layer_cache = (cache.k[i], cache.v[i],
                               cache.k_scale[i], cache.v_scale[i])
            else:
                layer_cache = (cache.k[i], cache.v[i])
            cache_len = None if cache is None else cache.length
            out = block_cls(cfg, i, name=f"h_{i}")(
                x, deterministic, layer_cache, cache_len,
                None if cache is None else cache.cursor, spec_col_pos)
            if cfg.n_expert > 0:
                x, lc, layer_aux = out
                aux_total = aux_total + layer_aux
            else:
                x, lc = out
            if lc is not None:
                new_k.append(lc[0])
                new_v.append(lc[1])
                if len(lc) > 2:
                    new_ks.append(lc[2])
                    new_vs.append(lc[3])

        x = nn.LayerNorm(
            use_bias=cfg.bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            epsilon=1e-5, name="ln_f",
        )(x)

        new_cache = None
        if cache is not None:
            if cache.col_pos is not None:
                # spec mode: cursor advances WITHOUT wrapping (the caller
                # re-prefills before overflow) and stays 8-aligned — the
                # write consumed Tw = ceil(T/8)*8 columns (pads are dead);
                # length advances as if every token were accepted — the
                # caller rewinds it per row
                new_cursor = cache.cursor + (-(-T // 8) * 8)
            elif cache.cursor is not None:
                new_cursor = jnp.mod(cache.cursor + T, new_k[0].shape[1])
            else:
                new_cursor = None
            new_cache = KVCache(
                tuple(new_k), tuple(new_v), cache.length + T,
                tuple(new_ks) if new_ks else None,
                tuple(new_vs) if new_vs else None,
                new_cursor,
                new_col_pos,
            )

        if targets is not None:
            logits = wte.attend(x)  # weight tying (ref: model.py:138)
            loss = cross_entropy_ignore_index(
                logits, targets, axis_name=cfg.seq_axis)
            if cfg.n_expert > 0:
                # load-balance aux (models/moe.py), averaged over layers so
                # moe_aux_coef is depth-independent
                loss = loss + cfg.moe_aux_coef * aux_total / cfg.n_layer
            return logits, loss, new_cache

        if return_all_logits:
            # serving prefill on right-padded prompts reads the logits at
            # each request's true last prompt position, not the pad end
            return wte.attend(x), None, new_cache
        # inference fast path: last position only
        logits = wte.attend(x[:, -1:, :])
        return logits, None, new_cache


def cross_entropy_ignore_index(
    logits: Array,
    targets: Array,
    ignore_index: int = -1,
    axis_name: Optional[str] = None,
) -> Array:
    """Mean token cross-entropy skipping ``ignore_index`` targets (fp32 accumulation).

    Computed as ``logsumexp(logits) - logits[target]`` — identical math to
    gathering from ``log_softmax`` but without materializing the full
    [B, T, V] log-probability tensor (at GPT-2's 50304 vocab that tensor is
    the single largest activation; skipping it is a measured MFU win, see
    docs/PERF.md round-2 notes).

    With ``axis_name`` (sequence parallelism), the nll total and the
    non-ignored count are psum'd across that mesh axis before dividing, so
    every shard returns the GLOBAL mean — bit-identical in expectation to
    the unsharded loss regardless of how ignore_index tokens distribute
    across shards.
    """
    logits = logits.astype(jnp.float32)
    mask = targets != ignore_index
    safe_targets = jnp.where(mask, targets, 0)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, safe_targets[..., None], axis=-1)[..., 0]
    nll = lse - tgt
    total = jnp.sum(nll * mask)
    count = jnp.sum(mask)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        count = jax.lax.psum(count, axis_name)
    return total / jnp.maximum(count, 1)


def num_params(params, non_embedding: bool = True) -> int:
    """Parameter count; optionally exclude position embeddings (ref: model.py:150-160)."""
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if non_embedding:
        total -= params["params"]["wpe"]["embedding"].size
    return total


def crop_block_size(params, config: GPTConfig, block_size: int) -> tuple[Any, GPTConfig]:
    """Model surgery: shrink the position table (ref: nanoGPT/model.py:195-204)."""
    assert block_size <= config.block_size
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy
    wpe = params["params"]["wpe"]["embedding"]
    params["params"]["wpe"]["embedding"] = wpe[:block_size]
    return params, dataclasses.replace(config, block_size=block_size)


# Peak bf16 TFLOP/s per chip for MFU accounting (replaces the reference's
# hard-coded 312 TFLOPS A100 constant, ref: nanoGPT/model.py:289-303).
TPU_PEAK_FLOPS = {
    "tpu v4": 275e12,
    "tpu v5 lite": 197e12,  # v5e
    "tpu v5": 459e12,       # v5p
    "tpu v6 lite": 918e12,  # v6e (trillium)
    "cpu": 1e12,
}


def peak_flops_for(device=None) -> float:
    kind = (device or jax.devices()[0]).device_kind.lower()
    for key, val in TPU_PEAK_FLOPS.items():
        if key in kind:
            return val
    return 197e12


def estimate_mfu(config: GPTConfig, n_params: int, fwdbwd_per_iter: float,
                 dt: float, peak_flops: Optional[float] = None) -> float:
    """PaLM-appendix-B MFU estimate (ref formula: nanoGPT/model.py:289-303)."""
    L, H, Q, T = config.n_layer, config.n_head, config.head_dim, config.block_size
    flops_per_token = 6 * n_params + 12 * L * H * Q * T
    flops_per_iter = flops_per_token * T * fwdbwd_per_iter
    return (flops_per_iter / dt) / (peak_flops or peak_flops_for())

"""Continuous-batching generation engine (production serving path).

The reference serves generation only as batch scripts (ref:
nanoGPT/sample.py:146-169 — fixed batch, all sequences start together).
This engine is the TPU-native serving counterpart: requests arrive at any
time, run concurrently in fixed SLOTS of one compiled decode program, and
leave as they finish — iteration-level (continuous) batching on top of the
per-row KV cache (models/gpt.py KVCache vector-``length`` mode).

Design — everything the XLA way:

- ONE decode program, fixed shapes. ``[n_slots]`` rows tick in lockstep
  wall-clock-wise but each row sits at its OWN sequence position (per-row
  cache lengths + per-row position embeddings + per-row causal masks).
  ``ticks_per_call`` steps run per host round-trip via ``lax.scan``; the
  host demultiplexes the emitted ``[K, B]`` token block to request streams.
- Admission = insert-prefill: a new request's prompt (or a window-refresh
  context) runs a batch-1 prefill padded to a power-of-two bucket, and its
  K/V rows are inserted into the big cache at the slot index with
  ``dynamic_update_slice``. No other slot is disturbed; the slot then
  decodes from its true position on the next tick.
- Per-request sampling params: ``temperature`` / ``top_k`` / ``top_p`` /
  ``stop_token`` / ``max_new_tokens`` are [B] arrays, so one program serves
  mixed configs.
- Deterministic per-request RNG: token ``g`` of request with seed ``s`` is
  sampled with ``fold_in(PRNGKey(s), g)`` — a request's output is
  byte-identical regardless of slot placement, batch composition, or
  arrival timing (a stronger contract than the batch sampler's, which
  folds by absolute position).
- Long generations use the same windowed-refresh contract as
  ``decode/generate.py``: when a slot's cache approaches ``cache_len``
  (= ``block_size`` by default; smaller = the decode-window throughput
  lever, docs/PERF.md "Decode-window contract") the host re-prefills its
  trailing ``cache_len - refresh`` tokens and
  decoding continues; quality-vs-speed numbers for the contract are in
  docs/PERF.md.

Slots whose request finished keep ticking masked (``active=False`` freezes
their cache length and logits) until the host admits new work — the cost
of an idle slot is already paid by the rectangular batch.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
import time as _time
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ai_music_generation_tpu.models.gpt import GPT, KVCache

Array = jax.Array


class ServeState(struct.PyTreeNode):
    cache: KVCache  # per-row length [B]
    last_logits: Array  # [B, V] f32 — logits each slot samples from next
    gen: Array  # [B] i32 — generated-token count (RNG fold index)
    max_new: Array  # [B] i32
    temperature: Array  # [B] f32
    top_k: Array  # [B] i32
    top_p: Array  # [B] f32, >= 1.0 = no nucleus filter
    stop_token: Array  # [B] i32, -1 = none
    seed: Array  # [B] u32 — per-request RNG seed
    active: Array  # [B] bool


@dataclasses.dataclass(eq=False)  # identity equality: queue removal must
class Request:                    # never confuse two same-parameter requests
    id: int
    prompt: list[int]
    max_new_tokens: int
    temperature: float
    top_k: int
    seed: int
    stop_token: int  # -1 = none
    top_p: float = 1.0  # >= 1.0 disables the nucleus filter
    generated: list[int] = dataclasses.field(default_factory=list)
    done: bool = False
    internal: bool = False  # engine-internal (slot deactivation); never reported
    submitted_at: float = 0.0  # perf_counter at submit()
    finished_at: float = 0.0  # perf_counter when demuxed as done

    @property
    def tokens(self) -> list[int]:
        return self.prompt + self.generated


def _per_slot_sample(logits, keys, temperature, top_k, top_p):
    """Per-row temperature + top-k + top-p categorical (vector analogue of
    decode/generate.py::sample_logits; ref: nanoGPT/model.py:318-327 for
    temperature/top-k; nucleus is the same framework extension as the batch
    sampler's ``apply_top_p`` and the tunes engine's per-request top_p).

    Per-row ``top_k`` means ``lax.top_k`` (static k) doesn't apply; instead
    sort values descending once and gather each row's k-th value as its
    mask threshold. Values-only sort — an earlier argsort + rank-scatter
    formulation put a [B, V] scatter in every decode tick, and scatters
    serialize on TPU (measured in the scan-tick cost at batch 2048).
    Tie behavior matches the lockstep sampler: all logits >= the k-th
    value survive; nucleus ties at the mass threshold are all kept."""
    V = logits.shape[-1]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    vals_desc = -jnp.sort(-scaled, axis=-1)  # [B, V]
    # top_k <= 0 disables the filter (kth = the minimum), matching the
    # tunes engine's convention — clip-to-0 alone would silently mean
    # "greedy" for a top_k=0 request
    eff_k = jnp.where(top_k > 0, top_k, V)
    kth = jnp.take_along_axis(
        vals_desc, jnp.clip(eff_k[:, None] - 1, 0, V - 1), axis=-1)  # [B, 1]
    masked = jnp.where(scaled < kth, -jnp.inf, scaled)
    # nucleus on top of the top-k mask (same transform order as
    # sample_logits: temperature -> top-k -> top-p). No second sort: the
    # top-k mask removes exactly the values < kth, which occupy the TAIL
    # of the already-sorted vals_desc (ties at kth are all kept, so the
    # survivor count is sum(scaled >= kth), not k) — so the sorted masked
    # row is vals_desc with everything past that count set to -inf.
    # Softmax is row-monotone, so "probability < the k_p-th sorted
    # probability" is exactly "logit < the k_p-th sorted masked logit" —
    # identical keep-set to apply_top_p without a softmax in prob space.
    n_kept = jnp.sum((scaled >= kth).astype(jnp.int32), axis=-1,
                     keepdims=True)  # [B, 1]
    sorted_masked = jnp.where(
        jnp.arange(V)[None, :] < n_kept, vals_desc, -jnp.inf)  # [B, V]
    csum = jnp.cumsum(jax.nn.softmax(sorted_masked, axis=-1), axis=-1)
    k_p = jnp.sum(csum < top_p[:, None], axis=-1, keepdims=True)
    thr = jnp.take_along_axis(sorted_masked, jnp.clip(k_p, 0, V - 1), axis=-1)
    masked = jnp.where(
        (top_p < 1.0)[:, None] & (masked < thr), -jnp.inf, masked)
    sampled = jax.vmap(jax.random.categorical)(keys, masked).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


class EngineHostBase:
    """Host bookkeeping shared by both serving engines (GenerationServer
    and serve/tunes_engine.py::TunesServer): finished-queue draining,
    idle-driving, cancellation plumbing, and latency observability. The
    engines differ only in their device programs and demux logic."""

    # subclasses create: _queue, _slots, _finished, _live, _cancelled,
    # _latencies (deque), and optionally a `stats` dict of counters

    def _drain_finished(self) -> list:
        out = list(self._finished)
        self._finished.clear()
        return out

    @property
    def busy(self) -> bool:
        return bool(self._queue) or any(r is not None for r in self._slots)

    def run_until_idle(self) -> list:
        """Drive :meth:`step` until queue and slots drain; returns all
        finished requests (arrival order not guaranteed)."""
        out = []
        while self.busy:
            out.extend(self.step())
        return out

    def cancel(self, rid: int) -> bool:
        """Request cancellation of a queued or in-flight request; returns
        True if the request is live. Safe from any thread: only the engine
        thread mutates queue/slots, applying pending cancellations at the
        start of its next step."""
        req = self._live.get(rid)
        if req is None or req.done:
            return False
        self._cancelled.add(rid)
        return True

    def reset_stats(self) -> None:
        """Zero the phase accounting (if any) and latency window
        (benchmarks call this between warm-up and timed passes so
        compile-time latencies don't pollute the report)."""
        for k, v in getattr(self, "stats", {}).items():
            self.stats[k] = type(v)()
        self._latencies.clear()

    def latency_stats(self) -> dict:
        """p50/p95/p99/mean request completion latency (submit -> finished
        demux, seconds) over the last <=10k finished requests. Production
        observability the batch scripts never needed (reported by /health
        and serve_bench)."""
        if not self._latencies:
            return {"count": 0}
        lat = np.sort(np.asarray(self._latencies, np.float64))
        q = lambda p: float(lat[min(int(p * len(lat)), len(lat) - 1)])
        return {
            "count": len(lat),
            "p50_s": round(q(0.50), 4),
            "p95_s": round(q(0.95), 4),
            "p99_s": round(q(0.99), 4),
            "mean_s": round(float(lat.mean()), 4),
            "max_s": round(float(lat[-1]), 4),
        }


class GenerationServer(EngineHostBase):
    """Continuous-batching decode server over a GPT checkpoint.

    Usage::

        srv = GenerationServer(model, params, n_slots=64)
        rid = srv.submit([1, 2, 3], max_new_tokens=100, seed=7)
        for req in srv.run_until_idle():
            print(req.id, req.generated)

    or drive incrementally with :meth:`step` (admits queued work, runs
    ``ticks_per_call`` decode steps, returns requests finished so far).
    """

    def __init__(
        self,
        model: GPT,
        params,
        n_slots: int = 64,
        ticks_per_call: int = 32,
        refresh: Optional[int] = None,
        admit_group: int = 64,
        cache_len: Optional[int] = None,
        mesh=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — slot state (cache
        rows, per-slot sampling vectors) rides the data axis and params
        take the TP rule layout (parallel/mesh.py); the jitted scan and
        admission programs inherit those shardings from their inputs, so
        decode bandwidth scales with the data-axis size. The reference has
        no serving counterpart; its multi-device decode story is one
        process per GPU (ref: nanoGPT/train.py:86-99 is training-only).
        Requires ``n_slots`` divisible by the data-axis size."""
        from ai_music_generation_tpu.decode.generate import (
            _warn_if_gqa_einsum_trap,
        )

        cfg = model.config
        _warn_if_gqa_einsum_trap(cfg)
        self.model = model
        self.params = params
        self.n_slots = n_slots
        self.block_size = cfg.block_size
        # ``cache_len`` is the ring-cache length (default: block_size, the
        # parity setting). The decode tick is HBM-bound on the per-tick
        # cache read, which scales with the cache length, so a SHORTER
        # cache trades guaranteed context (every decoded token still sees
        # >= cache_len - refresh committed tokens) for tick bandwidth —
        # the serving analogue of Generator(window=...); measured contract
        # in docs/PERF.md "Decode-window contract".
        self.cache_len = cache_len or cfg.block_size
        if not 8 <= self.cache_len <= cfg.block_size:
            raise ValueError(
                f"cache_len={self.cache_len} must be in [8, block_size="
                f"{cfg.block_size}] (positions are embedded at their true "
                "in-window index, which the wpe table must cover)")
        self.refresh = refresh or max(1, self.cache_len // 2)
        if ticks_per_call > self.refresh:
            raise ValueError(
                f"ticks_per_call={ticks_per_call} must be <= refresh="
                f"{self.refresh} (a slot must survive one scan without "
                "overflowing its cache window)")
        if self.refresh >= self.cache_len:
            raise ValueError(
                f"refresh={self.refresh} must be < cache_len="
                f"{self.cache_len} (window = cache_len - refresh is the "
                "context kept across a refresh; 0 would disable prompt "
                "truncation and overflow the ring cache)")
        self.ticks_per_call = ticks_per_call
        self.admit_group = admit_group
        self.window = self.cache_len - self.refresh

        self._queue: deque[Request] = deque()
        self._slots: list[Optional[Request]] = [None] * n_slots
        self._ids = itertools.count()
        self._finished: deque[Request] = deque()
        # host-side mirror of cache.length (admission plen + one per active
        # tick, reconstructed exactly from demux) — avoids a blocking
        # device_get round trip per step for the refresh check
        self._lengths = np.zeros(n_slots, np.int64)
        # cancellation: producer threads only touch these two structures
        # (atomic dict/set ops under the GIL); the engine thread applies
        # them at the next step — no shared-deque mutation races
        self._live: dict[int, Request] = {}
        self._cancelled: set[int] = set()
        # wall-clock accounting per step phase (observability; serve_bench
        # prints it — the axon tunnel's dispatch/transfer latencies dominate
        # in ways device-side reasoning alone cannot explain)
        self.stats = {"steps": 0, "admit_waves": 0, "admit_s": 0.0,
                      "scan_s": 0.0, "fetch_s": 0.0, "demux_s": 0.0}
        # per-request completion latency (submit -> finished demux), bounded
        self._latencies: deque = deque(maxlen=10_000)

        V = cfg.vocab_size
        self.state = ServeState(
            cache=KVCache.create(cfg, n_slots, max_len=self.cache_len,
                                 per_row=True),
            last_logits=jnp.zeros((n_slots, V), jnp.float32),
            gen=jnp.zeros((n_slots,), jnp.int32),
            max_new=jnp.zeros((n_slots,), jnp.int32),
            temperature=jnp.ones((n_slots,), jnp.float32),
            top_k=jnp.full((n_slots,), V, jnp.int32),
            top_p=jnp.ones((n_slots,), jnp.float32),
            stop_token=jnp.full((n_slots,), -1, jnp.int32),
            seed=jnp.zeros((n_slots,), jnp.uint32),
            active=jnp.zeros((n_slots,), bool),
        )
        # flat-kv multi-chip mode: when set, ``_scan`` runs under
        # ``jax.shard_map`` over the data axis (see below)
        self._flat_mesh = None
        self._flat_state_specs = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ai_music_generation_tpu.parallel import mesh as pmesh

            if cfg.flat_kv and mesh.devices.size > 1:
                # The flat decode step is a Pallas custom call, which the
                # GSPMD partitioner cannot shard (it would gather the full
                # cache onto every device) — so the decode scan runs under
                # ``jax.shard_map`` over the DATA axis instead: slot rows
                # are independent, each device invokes the kernel on its
                # local rows with the KV heads whole (the 128-lane tiling
                # contract holds shard-locally), and the shared ring
                # cursor replicates. Sampling is per-slot
                # (``fold_in(PRNGKey(seed), gen)``), so a request's bytes
                # are invariant to slot placement AND shard count — the
                # byte-parity test vs the single-chip engine is
                # tests/test_serve.py::test_engine_flat_kv_sharded_over_mesh.
                # Tensor parallelism stays unsupported: the per-shard
                # KV-head slice would break the kernel's 128-lane tiling.
                if mesh.shape[pmesh.MODEL_AXIS] > 1:
                    raise ValueError(
                        "flat_kv serving shards over the data axis only "
                        "(Pallas kernel KV-head lanes cannot split under "
                        "tensor parallelism); use a mesh with model axis "
                        "size 1 or the einsum path (flat_kv=False)")
                self._flat_mesh = mesh
            n_data = mesh.shape[pmesh.DATA_AXIS]
            if n_slots % n_data != 0:
                raise ValueError(
                    f"n_slots={n_slots} must divide evenly over the data "
                    f"axis ({n_data}) for sharded serving")
            # every slot-major leaf (leading dim == n_slots: cache K/V/
            # scales/length, logits, sampling vectors) shards on data;
            # scalars (ring cursor) replicate
            slot_spec = jax.tree.map(
                lambda leaf: (
                    P(pmesh.DATA_AXIS, *([None] * (leaf.ndim - 1)))
                    if leaf.ndim >= 1 and leaf.shape[0] == n_slots else P()),
                self.state)
            slot_sh = jax.tree.map(
                lambda s: NamedSharding(mesh, s), slot_spec,
                is_leaf=lambda x: isinstance(x, P))
            self.state = jax.device_put(self.state, slot_sh)
            if self._flat_mesh is not None:
                # data-only mesh: params replicate (shard_map in_specs P())
                self._flat_state_specs = slot_spec
                self.params = jax.device_put(params, pmesh.replicated(mesh))
            else:
                self.params = jax.device_put(
                    params, pmesh.shardings_for_tree(mesh, params))

    # -- jitted programs ----------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _scan(self, params, state: ServeState):
        """Run ``ticks_per_call`` decode ticks; emit [K, B] tokens/masks.

        In flat-kv multi-chip mode (``self._flat_mesh``) the whole scan runs
        under ``jax.shard_map`` over the data axis: each device executes the
        Pallas decode kernel on its LOCAL slot rows (row independence is the
        kernel's own grid axis, so the shard-local call is just a smaller
        B), params and the ring cursor replicate, and no collective is
        needed anywhere in the tick. This is what the GSPMD path cannot do
        with a custom call (ops/gqa_decode.py "Sharding contract")."""
        pack = self.model.config.vocab_size <= 16384

        def body(params, state: ServeState):
            state, (toks, emitted, done) = jax.lax.scan(
                self._make_tick(params), state, None,
                length=self.ticks_per_call,
            )
            if pack:
                # pack (tok, emitted, done) into ONE uint16 [K, B] download:
                # the tunnel charges a ~30 ms round trip per device_get plus
                # ~10-20 MB/s, so 3 arrays (one of them int32) per step cost
                # more than the decode itself at large slot counts
                packed = (toks.astype(jnp.uint16)
                          | (emitted.astype(jnp.uint16) << 14)
                          | (done.astype(jnp.uint16) << 15))
                return state, (packed,)
            return state, (toks, emitted, done)

        if self._flat_mesh is not None:
            from jax.sharding import PartitionSpec as P

            from ai_music_generation_tpu.parallel.mesh import DATA_AXIS

            n_out = 1 if pack else 3
            # check_vma=False: pallas_call's out_shape carries no
            # varying-mesh-axes annotation, so jax's replication checker
            # cannot see through the kernel; the specs above are the
            # ground truth (slot-major leaves vary over data, scalars —
            # the ring cursor — replicate by identical arithmetic)
            body = jax.shard_map(
                body, mesh=self._flat_mesh,
                in_specs=(P(), self._flat_state_specs),
                out_specs=(self._flat_state_specs,
                           (P(None, DATA_AXIS),) * n_out),
                check_vma=False)
        state, outs = body(params, state)
        if pack:
            return state, outs[0], None, None
        return state, outs[0], outs[1], outs[2]

    def _make_tick(self, params):
        def tick(state: ServeState, _):
            keys = jax.vmap(
                lambda s, g: jax.random.fold_in(jax.random.PRNGKey(s), g)
            )(state.seed, state.gen)
            tok = _per_slot_sample(
                state.last_logits, keys, state.temperature, state.top_k,
                state.top_p)
            tok = jnp.where(state.active, tok, 0)
            logits, _, new_cache = self.model.apply(
                params, tok[:, None], cache=state.cache)
            # freeze inactive rows: length pinned, logits kept (their stale
            # ring columns drift out of the window — they are dead anyway)
            length = jnp.where(state.active, new_cache.length,
                               state.cache.length)
            cache = KVCache(new_cache.k, new_cache.v, length,
                            new_cache.k_scale, new_cache.v_scale,
                            new_cache.cursor)
            last_logits = jnp.where(
                state.active[:, None], logits[:, 0].astype(jnp.float32),
                state.last_logits)
            gen = state.gen + state.active.astype(jnp.int32)
            hit_stop = (state.stop_token >= 0) & (tok == state.stop_token)
            done = state.active & ((gen >= state.max_new) | hit_stop)
            emitted = state.active
            new_state = state.replace(
                cache=cache, last_logits=last_logits, gen=gen,
                active=state.active & ~done)
            return new_state, (tok, emitted, done)

        return tick

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _insert_many(self, params, state: ServeState, packed):
        """Admit up to G requests in ONE device call with ONE host→device
        transfer: ``packed`` is [G, Pc + 10] int32 — each row is the padded
        prompt followed by (slot, plen, max_new, top_k, stop_token, g0,
        valid, seed:u32-bits, top_p:f32-bits, temperature:f32-bits).
        Batch-G prefill of the
        prompts, each request's K/V rows rolled so its prompt ends at the
        ring cursor, then scattered to the slot indices (padding entries
        carry slot index == n_slots and are dropped). One call AND one
        upload per admission wave — under the axon tunnel both per-call
        dispatch (~25 ms) and per-array upload (~30 ms × 11 arrays)
        dominated serving throughput when done per request / per field."""
        cfg = self.model.config
        G = packed.shape[0]
        ctx = packed[:, :-10]
        slots = packed[:, -10]
        plens = packed[:, -9]
        max_new = packed[:, -8]
        top_k = packed[:, -7]
        stop_token = packed[:, -6]
        g0 = packed[:, -5]
        valid = packed[:, -4].astype(bool)
        seed = jax.lax.bitcast_convert_type(packed[:, -3], jnp.uint32)
        top_p = jax.lax.bitcast_convert_type(packed[:, -2], jnp.float32)
        temperature = jax.lax.bitcast_convert_type(packed[:, -1], jnp.float32)
        pre = KVCache.create(cfg, G, max_len=self.cache_len)
        logits, _, pre = self.model.apply(
            params, ctx, cache=pre, return_all_logits=True)
        last = logits[jnp.arange(G), plens - 1].astype(jnp.float32)

        cache = state.cache
        # prefill wrote prompt token p at column p; the ring window expects
        # it at (cursor - plen + p) mod S
        shifts = jnp.mod(cache.cursor - plens, self.cache_len)
        slots_safe = jnp.where(valid, slots, self.n_slots)  # drop padding

        def ins(buf, new, axis=0):
            # axis: the position (ring) axis of one row — 0 for [S, H, D]
            # K/V rows, 1 for the TRANSPOSED [KH, S] scale rows
            rolled = jax.vmap(
                lambda r, s: jnp.roll(r, s, axis=axis))(new, shifts)
            return buf.at[slots_safe].set(rolled.astype(buf.dtype),
                                          mode="drop")

        new_k = tuple(ins(b, p) for b, p in zip(cache.k, pre.k))
        new_v = tuple(ins(b, p) for b, p in zip(cache.v, pre.v))
        new_ks = new_vs = None
        if cache.k_scale is not None:
            new_ks = tuple(
                ins(b, p, 1) for b, p in zip(cache.k_scale, pre.k_scale))
            new_vs = tuple(
                ins(b, p, 1) for b, p in zip(cache.v_scale, pre.v_scale))
        set_ = lambda arr, val: arr.at[slots_safe].set(val, mode="drop")
        return state.replace(
            cache=KVCache(new_k, new_v, set_(cache.length, plens),
                          new_ks, new_vs, cache.cursor),
            last_logits=set_(state.last_logits, last),
            gen=set_(state.gen, g0),
            max_new=set_(state.max_new, max_new),
            temperature=set_(state.temperature, temperature),
            top_k=set_(state.top_k, top_k),
            top_p=set_(state.top_p, top_p),
            stop_token=set_(state.stop_token, stop_token),
            seed=set_(state.seed, seed),
            active=set_(state.active, jnp.ones((G,), bool)),
        )

    # -- host orchestration --------------------------------------------------

    def submit(self, prompt, max_new_tokens: int = 500,
               temperature: float = 0.8, top_k: int = 200,
               seed: int = 1337, stop_token: int = -1,
               top_p: float = 1.0) -> int:
        """Queue a request; returns its id. Thread-safe enough for a
        producer thread + one engine thread (deque append/popleft)."""
        if not prompt:
            raise ValueError("prompt must contain at least one token")
        if max_new_tokens < 1:
            # the decode scan samples a token before testing gen >= max_new,
            # so a 0 budget would still emit one token; reject instead. (The
            # internal cancel dummy builds its Request directly.)
            raise ValueError("max_new_tokens must be >= 1")
        # numeric-range validation: these land in packed int32/uint32 numpy
        # buffers on the ENGINE thread — an out-of-range value there raises
        # OverflowError mid-step and kills the whole server, so reject (or
        # coerce, for seed) at the submit boundary instead
        prompt = [int(t) for t in prompt]
        V = self.model.config.vocab_size
        if any(t < 0 or t >= V for t in prompt):
            raise ValueError(f"prompt tokens must be in [0, {V})")
        if not (1 <= int(max_new_tokens) < 2**31):
            raise ValueError("max_new_tokens out of int32 range")
        if not (-2**31 <= int(top_k) < 2**31):
            raise ValueError("top_k out of int32 range")
        if not (-2**31 <= int(stop_token) < 2**31):
            raise ValueError("stop_token out of int32 range")
        temperature = float(temperature)
        if not np.isfinite(temperature):
            raise ValueError("temperature must be finite")
        top_p = float(top_p)
        if not (np.isfinite(top_p) and top_p > 0.0):
            # top_p <= 0 would mask every token (csum never < p keeps only
            # the argmax by the clip, but 0/negative is a caller bug);
            # >= 1.0 is the documented "disabled" setting
            raise ValueError("top_p must be finite and > 0")
        req = Request(
            id=next(self._ids), prompt=prompt,
            max_new_tokens=int(max_new_tokens), temperature=temperature,
            top_k=int(top_k), top_p=top_p,
            seed=int(seed) & 0xFFFFFFFF,  # fold into uint32 (negatives ok)
            stop_token=int(stop_token),
            submitted_at=_time.perf_counter(),
        )
        self._live[req.id] = req
        self._queue.append(req)
        return req.id

    def cancel(self, rid: int) -> bool:
        """Request cancellation of a queued or in-flight request; returns
        True if the request is live. Safe to call from any thread: only the
        engine thread mutates the queue/slots, applying pending
        cancellations at the start of its next step. A cancelled in-flight
        slot is deactivated on device via an internal zero-length admit, so
        it stops paying decode compute and its cache length resets."""
        req = self._live.get(rid)
        if req is None or req.done:
            return False
        self._cancelled.add(rid)
        return True

    def prewarm(self) -> None:
        """Compile every admission program (both padded wave sizes x every
        prompt bucket) plus the decode scan BEFORE taking traffic.

        The program space is deliberately tiny — waves pad to G=8 or
        admit_group and prompts bucket to powers of two — but a novel
        (wave, bucket) combination appearing mid-traffic stalls that step
        for its compile (measured: one 5x-slow wave in the 16k-request
        soak, docs/experiments/serve_soak.py). A production server calls
        this once at startup (cli/serve.py --prewarm=True)."""
        buckets, b = [], 8
        while b <= self.window:
            buckets.append(b)
            b *= 2
        if not buckets or buckets[-1] < self.window:
            buckets.append(self.window)  # non-power-of-two window bucket
        sizes = [1] + ([self.admit_group] if self.admit_group > 8 else [])
        for plen in buckets:
            for count in sizes:
                for _ in range(min(count, self.n_slots)):
                    self.submit([1] * plen, max_new_tokens=1,
                                temperature=0.0, top_k=1, seed=0)
                self.run_until_idle()
        self.reset_stats()  # prewarm compiles pollute phase/latency stats

    def _bucket(self, n: int) -> int:
        p = 8
        while p < n:
            p *= 2
        return min(p, self.cache_len)

    def _admit_wave(self, admits: list[tuple[int, Request, list[int], int]]):
        """Admit (slot, req, context, g0) entries in jitted chunks of
        ``admit_group`` (padded; one compile per (group, prompt-bucket)
        pair). Bigger groups amortize per-call dispatch latency (the
        dominant admit cost under the axon tunnel) at the price of more
        prefill padding waste."""
        group = self.admit_group
        all_ctxs = [c[2][-self.window:] for c in admits]
        # ONE padded prompt bucket and ONE [W*G', pc+9] host->device upload
        # for the whole admit list; waves then slice the device array (zero
        # further uploads — the tunnel charges ~30 ms per upload, and
        # per-wave uploads were the dominant serving cost after the
        # per-field uploads were packed)
        pc = self._bucket(max(len(c) for c in all_ctxs))
        # two padded wave sizes only (compile economy): G=8 or admit_group
        G = 8 if len(admits) <= 8 else group
        n_waves = -(-len(admits) // G)
        packed = np.zeros((n_waves * G, pc + 10), np.int32)
        packed[:, -10] = self.n_slots  # padding rows -> dropped
        packed[:, -9] = 1
        packed[:, -6] = -1
        packed[:, -2] = np.float32(1.0).view(np.int32)
        packed[:, -1] = np.float32(1.0).view(np.int32)
        for i, ((slot, req, _, g0_i), ctx) in enumerate(zip(admits, all_ctxs)):
            packed[i, :len(ctx)] = ctx
            packed[i, -10] = slot
            packed[i, -9] = len(ctx)
            packed[i, -8] = req.max_new_tokens
            packed[i, -7] = req.top_k
            packed[i, -6] = req.stop_token
            packed[i, -5] = g0_i
            packed[i, -4] = 1
            packed[i, -3] = np.uint32(req.seed).view(np.int32)
            packed[i, -2] = np.float32(req.top_p).view(np.int32)
            packed[i, -1] = np.float32(req.temperature).view(np.int32)
            self._slots[slot] = req
            self._lengths[slot] = len(ctx)
        packed_dev = jnp.asarray(packed.reshape(n_waves, G, pc + 10))
        for w in range(n_waves):
            self.stats["admit_waves"] += 1
            self.state = self._insert_many(
                self.params, self.state, packed_dev[w])

    def step(self) -> list[Request]:
        """Admit queued requests, run one scan, return finished requests."""
        self.stats["steps"] += 1
        admits: list[tuple[int, Request, list[int], int]] = []

        # 0. apply pending cancellations (engine thread only — see cancel())
        for rid in list(self._cancelled):
            self._cancelled.discard(rid)
            req = self._live.pop(rid, None)
            if req is None:
                continue
            if req in self._queue:
                self._queue.remove(req)
                continue
            for slot, r in enumerate(self._slots):
                if r is req:
                    # deactivate the device row: a zero-length internal
                    # admit finishes on its first tick (gen 1 >= max_new 0),
                    # resetting length and flipping active off
                    dummy = Request(id=-1, prompt=[0], max_new_tokens=0,
                                    temperature=1.0, top_k=1, seed=0,
                                    stop_token=-1, internal=True)
                    admits.append((slot, dummy, dummy.prompt, 0))
                    self._slots[slot] = dummy
                    break

        # 1. fill free slots
        reserved = {slot for slot, *_ in admits}
        for slot in range(self.n_slots):
            if slot not in reserved and self._slots[slot] is None and self._queue:
                req = self._queue.popleft()
                admits.append((slot, req, req.prompt, 0))
                self._slots[slot] = req  # reserve; _admit_wave re-sets it

        if not admits and not any(r is not None for r in self._slots):
            return self._drain_finished()

        # 2. proactive window refresh: a slot must fit ticks_per_call more
        #    writes before its cache hits cache_len (host-mirrored lengths
        #    — a device_get here would add a blocking tunnel round trip per
        #    step)
        reserved = {slot for slot, *_ in admits}
        for slot, req in enumerate(self._slots):
            if req is not None and slot not in reserved and (
                self._lengths[slot] + self.ticks_per_call > self.cache_len
            ):
                admits.append((slot, req, req.tokens, len(req.generated)))
        if admits:
            t0 = _time.perf_counter()
            self._admit_wave(admits)
            self.stats["admit_s"] += _time.perf_counter() - t0

        # 3. decode
        t0 = _time.perf_counter()
        self.state, toks, emitted, done = self._scan(self.params, self.state)
        self.stats["scan_s"] += _time.perf_counter() - t0
        t0 = _time.perf_counter()
        if emitted is None:  # packed uint16 fast path (one download)
            packed = np.asarray(jax.device_get(toks))
            toks = (packed & 0x3FFF).astype(np.int32)
            emitted = (packed & 0x4000) != 0
            done = (packed & 0x8000) != 0
        else:
            toks = np.asarray(jax.device_get(toks))
            emitted = np.asarray(jax.device_get(emitted))
            done = np.asarray(jax.device_get(done))
        self.stats["fetch_s"] += _time.perf_counter() - t0

        # 4. demultiplex (vectorized per slot: one numpy mask op per slot
        #    instead of a K x B python loop — measured demux cost at
        #    4096 slots x 64 ticks dominated the host side otherwise)
        t0 = _time.perf_counter()
        K = self.ticks_per_call
        done_tick = np.where(done.any(axis=0), done.argmax(axis=0), K)
        for slot, req in enumerate(self._slots):
            if req is None or req.done:
                continue
            # mirror the device's length update: +1 per tick the row was
            # active (the finishing tick still writes; see _scan's tick)
            self._lengths[slot] += int(min(done_tick[slot] + 1, K))
            if req.internal:  # slot-deactivation dummy: free silently
                if done_tick[slot] < K:
                    self._slots[slot] = None
                continue
            upto = done_tick[slot] + 1  # include the finishing token's tick
            col = emitted[:upto, slot]
            if col.any():
                req.generated.extend(toks[:upto, slot][col].tolist())
            if done_tick[slot] < K:
                req.done = True
                req.finished_at = _time.perf_counter()
                self._latencies.append(req.finished_at - req.submitted_at)
                self._live.pop(req.id, None)
                self._finished.append(req)
                self._slots[slot] = None
        self.stats["demux_s"] += _time.perf_counter() - t0
        return self._drain_finished()



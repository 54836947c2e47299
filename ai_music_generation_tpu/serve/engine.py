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
- Per-request sampling params: ``temperature`` / ``top_k`` / ``stop_token``
  / ``max_new_tokens`` are [B] arrays, so one program serves mixed configs.
- Deterministic per-request RNG: token ``g`` of request with seed ``s`` is
  sampled with ``fold_in(PRNGKey(s), g)`` — a request's output is
  byte-identical regardless of slot placement, batch composition, or
  arrival timing (a stronger contract than the batch sampler's, which
  folds by absolute position).
- Long generations use the same windowed-refresh contract as
  ``decode/generate.py``: when a slot's cache approaches ``block_size``
  the host re-prefills its trailing ``block_size - refresh`` tokens and
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
    stop_token: Array  # [B] i32, -1 = none
    seed: Array  # [B] u32 — per-request RNG seed
    active: Array  # [B] bool


@dataclasses.dataclass
class Request:
    id: int
    prompt: list[int]
    max_new_tokens: int
    temperature: float
    top_k: int
    seed: int
    stop_token: int  # -1 = none
    generated: list[int] = dataclasses.field(default_factory=list)
    done: bool = False

    @property
    def tokens(self) -> list[int]:
        return self.prompt + self.generated


def _per_slot_sample(logits, keys, temperature, top_k):
    """Per-row temperature + top-k categorical (vector analogue of
    decode/generate.py::sample_logits; ref: nanoGPT/model.py:318-327)."""
    B, V = logits.shape
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    order = jnp.argsort(-scaled, axis=-1)  # [B, V] descending
    ranks = jnp.zeros((B, V), jnp.int32).at[
        jnp.arange(B)[:, None], order
    ].set(jnp.arange(V, dtype=jnp.int32)[None, :])
    masked = jnp.where(ranks < top_k[:, None], scaled, -jnp.inf)
    sampled = jax.vmap(jax.random.categorical)(keys, masked).astype(jnp.int32)
    return jnp.where(temperature <= 0.0, greedy, sampled)


class GenerationServer:
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
    ):
        cfg = model.config
        self.model = model
        self.params = params
        self.n_slots = n_slots
        self.block_size = cfg.block_size
        self.refresh = refresh or max(1, cfg.block_size // 2)
        if ticks_per_call > self.refresh:
            raise ValueError(
                f"ticks_per_call={ticks_per_call} must be <= refresh="
                f"{self.refresh} (a slot must survive one scan without "
                "overflowing its cache window)")
        self.ticks_per_call = ticks_per_call
        self.window = self.block_size - self.refresh

        self._queue: deque[Request] = deque()
        self._slots: list[Optional[Request]] = [None] * n_slots
        self._ids = itertools.count()
        self._finished: deque[Request] = deque()

        V = cfg.vocab_size
        self.state = ServeState(
            cache=KVCache.create(cfg, n_slots, max_len=self.block_size,
                                 per_row=True),
            last_logits=jnp.zeros((n_slots, V), jnp.float32),
            gen=jnp.zeros((n_slots,), jnp.int32),
            max_new=jnp.zeros((n_slots,), jnp.int32),
            temperature=jnp.ones((n_slots,), jnp.float32),
            top_k=jnp.full((n_slots,), V, jnp.int32),
            stop_token=jnp.full((n_slots,), -1, jnp.int32),
            seed=jnp.zeros((n_slots,), jnp.uint32),
            active=jnp.zeros((n_slots,), bool),
        )

    # -- jitted programs ----------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _scan(self, params, state: ServeState):
        """Run ``ticks_per_call`` decode ticks; emit [K, B] tokens/masks."""

        def tick(state: ServeState, _):
            keys = jax.vmap(
                lambda s, g: jax.random.fold_in(jax.random.PRNGKey(s), g)
            )(state.seed, state.gen)
            tok = _per_slot_sample(
                state.last_logits, keys, state.temperature, state.top_k)
            tok = jnp.where(state.active, tok, 0)
            logits, _, new_cache = self.model.apply(
                params, tok[:, None], cache=state.cache)
            # freeze inactive rows: length pinned, logits kept
            length = jnp.where(state.active, new_cache.length,
                               state.cache.length)
            cache = KVCache(new_cache.k, new_cache.v, length,
                            new_cache.k_scale, new_cache.v_scale)
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

        state, (toks, emitted, done) = jax.lax.scan(
            tick, state, None, length=self.ticks_per_call)
        return state, toks, emitted, done

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _insert(self, params, state: ServeState, slot, ctx, plen,
                max_new, temperature, top_k, stop_token, seed, g0):
        """Admit into ``slot``: batch-1 prefill of ``ctx`` (padded [1, Pc]),
        K/V rows inserted at the slot index, metadata set."""
        cfg = self.model.config
        pre = KVCache.create(cfg, 1, max_len=self.block_size)
        logits, _, pre = self.model.apply(
            params, ctx, cache=pre, return_all_logits=True)
        last = logits[0, plen - 1].astype(jnp.float32)

        ins = lambda buf, new: jax.lax.dynamic_update_slice(
            buf, new, (slot,) + (0,) * (buf.ndim - 1))
        cache = state.cache
        new_k = tuple(ins(b, p) for b, p in zip(cache.k, pre.k))
        new_v = tuple(ins(b, p) for b, p in zip(cache.v, pre.v))
        new_ks = new_vs = None
        if cache.k_scale is not None:
            new_ks = tuple(ins(b, p) for b, p in zip(cache.k_scale, pre.k_scale))
            new_vs = tuple(ins(b, p) for b, p in zip(cache.v_scale, pre.v_scale))
        return state.replace(
            cache=KVCache(new_k, new_v, cache.length.at[slot].set(plen),
                          new_ks, new_vs),
            last_logits=state.last_logits.at[slot].set(last),
            gen=state.gen.at[slot].set(g0),
            max_new=state.max_new.at[slot].set(max_new),
            temperature=state.temperature.at[slot].set(temperature),
            top_k=state.top_k.at[slot].set(top_k),
            stop_token=state.stop_token.at[slot].set(stop_token),
            seed=state.seed.at[slot].set(seed),
            active=state.active.at[slot].set(True),
        )

    # -- host orchestration --------------------------------------------------

    def submit(self, prompt, max_new_tokens: int = 500,
               temperature: float = 0.8, top_k: int = 200,
               seed: int = 1337, stop_token: int = -1) -> int:
        """Queue a request; returns its id. Thread-safe enough for a
        producer thread + one engine thread (deque append/popleft)."""
        if not prompt:
            raise ValueError("prompt must contain at least one token")
        req = Request(
            id=next(self._ids), prompt=list(map(int, prompt)),
            max_new_tokens=int(max_new_tokens), temperature=float(temperature),
            top_k=int(top_k), seed=int(seed), stop_token=int(stop_token),
        )
        self._queue.append(req)
        return req.id

    def _bucket(self, n: int) -> int:
        p = 8
        while p < n:
            p *= 2
        return min(p, self.block_size)

    def _admit(self, slot: int, req: Request, context: list[int], g0: int):
        ctx = context[-self.window:]  # crop to the decode window
        plen = len(ctx)
        pc = self._bucket(plen)
        padded = np.zeros((1, pc), np.int32)
        padded[0, :plen] = ctx
        self.state = self._insert(
            self.params, self.state, jnp.int32(slot), jnp.asarray(padded),
            jnp.int32(plen), jnp.int32(req.max_new_tokens),
            jnp.float32(req.temperature), jnp.int32(req.top_k),
            jnp.int32(req.stop_token), jnp.uint32(req.seed), jnp.int32(g0))
        self._slots[slot] = req

    def step(self) -> list[Request]:
        """Admit queued requests, run one scan, return finished requests."""
        # 1. fill free slots
        for slot in range(self.n_slots):
            if self._slots[slot] is None and self._queue:
                req = self._queue.popleft()
                self._admit(slot, req, req.prompt, g0=0)

        if not any(r is not None for r in self._slots):
            return self._drain_finished()

        # 2. proactive window refresh: a slot must fit ticks_per_call more
        #    writes before its cache hits block_size
        lengths = np.asarray(jax.device_get(self.state.cache.length))
        for slot, req in enumerate(self._slots):
            if req is not None and (
                lengths[slot] + self.ticks_per_call > self.block_size
            ):
                self._admit(slot, req, req.tokens, g0=len(req.generated))

        # 3. decode
        self.state, toks, emitted, done = self._scan(self.params, self.state)
        toks = np.asarray(jax.device_get(toks))
        emitted = np.asarray(jax.device_get(emitted))
        done = np.asarray(jax.device_get(done))

        # 4. demultiplex
        for k in range(self.ticks_per_call):
            for slot, req in enumerate(self._slots):
                if req is None or req.done:
                    continue
                if emitted[k, slot]:
                    req.generated.append(int(toks[k, slot]))
                if done[k, slot]:
                    req.done = True
        for slot, req in enumerate(self._slots):
            if req is not None and req.done:
                self._finished.append(req)
                self._slots[slot] = None
        return self._drain_finished()

    def _drain_finished(self) -> list[Request]:
        out = list(self._finished)
        self._finished.clear()
        return out

    @property
    def busy(self) -> bool:
        return bool(self._queue) or any(r is not None for r in self._slots)

    def run_until_idle(self) -> list[Request]:
        """Drive :meth:`step` until queue and slots drain; returns all
        finished requests (arrival order not guaranteed)."""
        out = []
        while self.busy:
            out.extend(self.step())
        return out

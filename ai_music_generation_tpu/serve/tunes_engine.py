"""Continuous-batching TunesFormer serving engine.

The GPT engine (serve/engine.py) serves flat-token models; this is the
serving counterpart for the hierarchical patch/char TunesFormer. The
reference generates one tune at a time in a Python char loop
(ref: tunesformer/generate.py:114-153, utils.py:221-255); the batch
generator (decode/tunes_generate.py) already runs bars for a whole batch
lockstep — this engine extends that to a SERVER: requests with different
prompts, sampling params, and arrival times share the fixed-shape bar
program, entering and leaving slots as they finish.

Design:

- ONE jitted bar program over a per-row patch-core KV CACHE (ring buffer,
  ``[n_slots, L, heads, dim]`` per layer — the same vector-length cache
  contract as the GPT engine). Committed patches never change, so each bar
  feeds only every slot's NEWEST patch through ``TunesFormer.patch_step``
  — O(1) patch positions per slot per bar. (The first engine re-encoded
  the full [n_slots, L, S] patch stack per bar, the reference's own
  structure, ref: generate.py:136-140; at 512 slots that full forward was
  ~12x the char scan's FLOPs and dominated the bar step.) Admission is an
  insert-prefill fused into the bar program: one batch-G patch prefill,
  each prompt's K/V rolled to end at the ring cursor, scattered to slot
  rows — the GPT engine's ``_insert_many`` pattern.
- Per-request sampling: ``top_p`` / ``top_k`` / ``temperature`` are [B]
  vectors inside the program (the batch generator specializes them as
  compile-time constants; a server cannot).
- Deterministic per-request RNG: char ``j`` of bar ``i`` of a request
  with seed ``s`` samples with ``fold_in(fold_in(PRNGKey(s), i), j)`` —
  output depends only on the request's own fields, never on slot
  placement or concurrent traffic (same contract as the GPT engine).
- Host demux per bar: eos patch / empty bar / ``max_patch`` stop rules
  and S:/B:/E: control-code filtering follow the batch generator
  (ref: generate.py:114-126,141-147).
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

from ai_music_generation_tpu.decode.tunes_generate import (
    char_bar_scan,
    filter_control_codes,
    filter_generated_bar,
    prepare_patch_state,
)
from ai_music_generation_tpu.models.gpt import KVCache
from ai_music_generation_tpu.models.tunesformer import TunesFormer
from ai_music_generation_tpu.serve.engine import EngineHostBase
from ai_music_generation_tpu.tokenizers.patchilizer import Patchilizer

Array = jax.Array


def sample_ptk_vec(
    probs: Array,  # [B, V] probabilities
    keys: Array,  # [B] PRNG keys
    top_p: Array,  # [B]
    top_k: Array,  # [B] (<=0 disables)
    temperature: Array,  # [B]
) -> Array:
    """Per-row nucleus -> top-k -> temperature sampling; the [B]-vector
    analogue of decode/tunes_generate.py::sample_top_p_top_k_temperature
    (ref chain: tunesformer utils.py:246-248)."""
    V = probs.shape[-1]
    sorted_probs, sorted_idx = jax.lax.top_k(probs, V)  # descending
    cum = jnp.cumsum(sorted_probs, axis=-1)
    keep = (cum - sorted_probs) < top_p[:, None]
    keep = keep.at[:, 0].set(True)
    rank = jnp.arange(V)[None, :]
    eff_k = jnp.where(top_k > 0, top_k, V)[:, None]
    keep = keep & (rank < eff_k)
    filtered = jnp.where(keep, sorted_probs, 0.0)
    inv_t = 1.0 / jnp.maximum(temperature, 1e-6)[:, None]
    filtered = jnp.where(filtered > 0, filtered ** inv_t, 0.0)
    logp = jnp.where(filtered > 0, jnp.log(jnp.maximum(filtered, 1e-30)),
                     -jnp.inf)
    choice = jax.vmap(jax.random.categorical)(keys, logp)
    return jnp.take_along_axis(sorted_idx, choice[:, None], axis=-1)[:, 0]


@dataclasses.dataclass(eq=False)  # identity equality for safe queue removal
class TuneRequest:
    id: int
    prompt: str
    max_patch: int
    top_p: float
    top_k: int
    temperature: float
    seed: int
    show_control_code: bool
    text: str = ""  # visible output (prompt + generated bars)
    done: bool = False
    submitted_at: float = 0.0  # perf_counter at submit()
    finished_at: float = 0.0


class _SlotState:
    """Host-side per-slot patch bookkeeping (mirrors generate_tunes)."""

    def __init__(self, req: TuneRequest, patchilizer: Patchilizer,
                 L: int, S: int):
        self.req = req
        prompt_patches, self.carried = prepare_patch_state(
            patchilizer, req.prompt, L, S)
        self.patches = np.zeros((L, S), np.int32)
        self.patches[: len(prompt_patches)] = np.asarray(prompt_patches, np.int32)
        self.n_patches = len(prompt_patches)
        self.bars = 0  # RNG fold index


class TunesServer(EngineHostBase):
    """Continuous-batching TunesFormer server.

    Usage mirrors :class:`serve.engine.GenerationServer`::

        srv = TunesServer(model, params, n_slots=16)
        rid = srv.submit("S:2\\nB:9\\n...", max_patch=64, seed=7)
        for req in srv.run_until_idle():
            print(req.id, req.text)
    """

    def __init__(self, model: TunesFormer, params, n_slots: int = 16,
                 mesh=None, admit_group: int = 256):
        """``mesh``: optional jax.sharding.Mesh — slot state rides the data
        axis, params take the TP rule layout (parallel/mesh.py), and the
        jitted bar program inherits those shardings from its inputs. The
        reference's TunesFormer parallelism is DataParallel scatter
        (ref: tunesformer/train.py:35-36); this is the serving analogue."""
        self.model = model
        self.params = params
        self.cfg = model.config
        self.n_slots = n_slots
        # admissions per step are capped: the fused insert-prefill builds a
        # transient [G, L, H, D] patch cache per layer, and an uncapped
        # G = n_slots bucket OOMs HBM at 2048 slots (measured: 19.5 GB vs
        # 15.75 — the main ring cache is 7.2 GB and the admission transient
        # another 7.2). Leftover queue admits on subsequent bars; bars are
        # fast, so a full queue drains the cap in a few steps.
        self.admit_group = min(admit_group, n_slots)
        self.patchilizer = Patchilizer()
        self._queue: deque[TuneRequest] = deque()
        self._slots: list[Optional[_SlotState]] = [None] * n_slots
        self._ids = itertools.count()
        self._finished: deque[TuneRequest] = deque()
        self._latencies: deque = deque(maxlen=10_000)
        # cancellation registry (same thread contract as serve/engine.py:
        # producers touch only these; the engine thread applies them)
        self._live: dict[int, TuneRequest] = {}
        self._cancelled: set[int] = set()
        # DEVICE-RESIDENT patch-core KV cache (per-row ring, the GPT
        # engine's vector-length contract): each slot's committed patches
        # live as K/V rows at its own logical positions; per bar the device
        # sees only one [B, S] feed-patch row + admission rows — the full
        # [B, L, S] stack never crosses the tunnel and is never re-encoded.
        self._patch_cache = KVCache.create(
            self.cfg.patch_core_config(), n_slots,
            max_len=self.cfg.patch_length, per_row=True, quantized=False)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ai_music_generation_tpu.parallel import mesh as pmesh

            if n_slots % mesh.shape[pmesh.DATA_AXIS] == 0:
                slot_sh = jax.tree.map(
                    lambda leaf: NamedSharding(
                        mesh,
                        P(pmesh.DATA_AXIS, *([None] * (leaf.ndim - 1)))
                        if leaf.ndim >= 1 and leaf.shape[0] == n_slots
                        else P()),
                    self._patch_cache)
                self._patch_cache = jax.device_put(self._patch_cache, slot_sh)
            self.params = jax.device_put(
                params, pmesh.shardings_for_tree(mesh, params))

    # -- jitted bar program --------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _bar_step(self, params, cache, adm_rows, adm_slots, adm_plens,
                  packed):
        """Admit, advance the patch cache one position, decode one bar —
        ONE dispatch AND one small upload per step (separate write
        programs / per-field arrays each cost a tunnel round trip; same
        packing rationale as the GPT engine's _insert_many).

        cache: donated per-row patch-core KVCache (ring, [B, L, H, D]);
        adm_rows [G, L, S] + adm_slots [G] (== n_slots padding → dropped)
        + adm_plens [G]: this step's admissions — batch-G patch prefill,
        rows rolled so each prompt's first ``plen = n_patches - 1``
        patches end at the ring cursor (the newest prompt patch is NOT
        prefilled: it is this bar's feed row, so every bar — including a
        slot's first — runs the same one-position program);
        packed [B, 2S+7] i32: columns [0:S] init_tokens (bos + carried),
        [S:2S] feed rows (each slot's newest committed patch), then
        active, init_lens (>=1), bar_idx (per-request RNG fold), top_k,
        seed:u32-bits, top_p:f32-bits, temperature:f32-bits.
        Returns (cache, tokens [B, S], lens [B]).
        """
        S = self.cfg.patch_size
        L = self.cfg.patch_length
        init_tokens = packed[:, :S]
        feed = packed[:, S:2 * S]
        active = packed[:, 2 * S].astype(bool)
        init_lens = packed[:, 2 * S + 1]
        bar_idx = packed[:, 2 * S + 2]
        top_k = packed[:, 2 * S + 3]
        seeds = jax.lax.bitcast_convert_type(packed[:, 2 * S + 4], jnp.uint32)
        top_p = jax.lax.bitcast_convert_type(packed[:, 2 * S + 5], jnp.float32)
        temperature = jax.lax.bitcast_convert_type(
            packed[:, 2 * S + 6], jnp.float32)

        # admission insert-prefill (runs every step at the padded G bucket;
        # at G=8 the [G, L] patch forward is ~1% of the full-stack forward
        # this engine used to pay per bar, and fusing it into the bar
        # program keeps the step at one dispatch)
        G = adm_rows.shape[0]
        pre = KVCache.create(self.cfg.patch_core_config(), G, max_len=L,
                             quantized=False)
        _, pre = self.model.apply(
            params, adm_rows, pre, method=self.model.encode_patches_cached)
        # prefill wrote prompt patch p at column p; the ring window expects
        # it at (cursor - plen + p) mod L
        shifts = jnp.mod(cache.cursor - adm_plens, L)

        def ins(buf, new):
            rolled = jax.vmap(lambda r, s: jnp.roll(r, s, axis=0))(new, shifts)
            return buf.at[adm_slots].set(rolled.astype(buf.dtype),
                                         mode="drop")

        cache = KVCache(
            tuple(ins(b, p) for b, p in zip(cache.k, pre.k)),
            tuple(ins(b, p) for b, p in zip(cache.v, pre.v)),
            cache.length.at[adm_slots].set(adm_plens, mode="drop"),
            cursor=cache.cursor)

        # one cached patch position for every slot (ring write at cursor);
        # inactive rows' lengths stay pinned — their stale columns drift
        # out of the window, and re-admission rewrites the row
        last, new_cache = self.model.apply(
            params, feed, cache, method=self.model.patch_step)
        cache = KVCache(
            new_cache.k, new_cache.v,
            jnp.where(active, new_cache.length, cache.length),
            cursor=new_cache.cursor)

        row_keys = jax.vmap(
            lambda s, i: jax.random.fold_in(jax.random.PRNGKey(s), i)
        )(seeds, bar_idx)

        def sample_fn(probs, idx):
            keys = jax.vmap(jax.random.fold_in)(row_keys, idx)
            return sample_ptk_vec(probs, keys, top_p, top_k, temperature)

        tokens, lens = char_bar_scan(self.model, params, last,
                                     init_tokens, init_lens, sample_fn)
        return cache, tokens, lens

    # -- host orchestration --------------------------------------------------

    def prewarm(self) -> None:
        """Compile the bar program before taking traffic (one program —
        fixed [n_slots, L, S] patch state, host-only admission; the GPT
        engine's bucketed analogue is GenerationServer.prewarm)."""
        self.submit("K:C\nC|", max_patch=2, seed=0)
        self.run_until_idle()
        self.reset_stats()

    def submit(self, prompt: str, max_patch: int = 128, top_p: float = 0.8,
               top_k: int = 8, temperature: float = 1.2, seed: int = 0,
               show_control_code: bool = True) -> int:
        if not prompt:
            raise ValueError("prompt must be non-empty")
        # range validation: these land in packed int32 numpy buffers on the
        # engine thread — out-of-range values would raise OverflowError
        # mid-step and kill the server (same boundary as GenerationServer)
        if not (1 <= int(max_patch) < 2**31):
            raise ValueError("max_patch must be >= 1 (and fit int32)")
        if not (-2**31 <= int(top_k) < 2**31):
            raise ValueError("top_k out of int32 range")
        top_p, temperature = float(top_p), float(temperature)
        if not (np.isfinite(top_p) and np.isfinite(temperature)):
            raise ValueError("top_p/temperature must be finite")
        req = TuneRequest(
            id=next(self._ids), prompt=str(prompt), max_patch=int(max_patch),
            top_p=top_p, top_k=int(top_k),
            temperature=temperature,
            seed=int(seed) & 0xFFFFFFFF,  # fold into uint32 (negatives ok)
            show_control_code=bool(show_control_code),
            submitted_at=_time.perf_counter(),
        )
        self._live[req.id] = req
        self._queue.append(req)
        return req.id

    def cancel(self, rid: int) -> bool:
        """Request cancellation; returns True if the request is live. Safe
        from any thread — the engine thread applies it at its next step
        (admission is host-only here, so a cancelled slot is simply freed)."""
        req = self._live.get(rid)
        if req is None or req.done:
            return False
        self._cancelled.add(rid)
        return True

    def step(self) -> list[TuneRequest]:
        """Admit queued requests (host-only), run one bar, demux."""
        L, S = self.cfg.patch_length, self.cfg.patch_size
        # apply pending cancellations (engine thread only)
        for rid in list(self._cancelled):
            self._cancelled.discard(rid)
            req = self._live.pop(rid, None)
            if req is None:
                continue
            if req in self._queue:
                self._queue.remove(req)
                continue
            for slot, st in enumerate(self._slots):
                if st is not None and st.req is req:
                    self._slots[slot] = None  # host-only state: free now
                    break
        admitted: list[tuple[int, "_SlotState"]] = []
        for slot in range(self.n_slots):
            if len(admitted) >= self.admit_group:
                break
            if self._slots[slot] is None and self._queue:
                req = self._queue.popleft()
                st = _SlotState(req, self.patchilizer, L, S)
                req.text = filter_control_codes(req.prompt,
                                                req.show_control_code)
                self._slots[slot] = st
                admitted.append((slot, st))
        if not any(s is not None for s in self._slots):
            return self._drain_finished()

        B = self.n_slots
        # admission args (padded to a G bucket for compile economy): the
        # full prompt rows prefill the patch cache inside _bar_step; the
        # newest prompt patch is NOT prefilled (plen = n_patches - 1) — it
        # is the slot's feed row this bar
        G = 8 if len(admitted) <= 8 else self.admit_group
        adm_rows = np.zeros((G, L, S), np.int32)
        adm_slots = np.full((G,), self.n_slots, np.int32)
        adm_plens = np.zeros((G,), np.int32)
        for i, (slot, st) in enumerate(admitted):
            adm_rows[i] = st.patches
            adm_slots[i] = slot
            adm_plens[i] = max(st.n_patches, 1) - 1
        # one [B, 2S+7] int32 upload (layout documented in _bar_step)
        packed = np.zeros((B, 2 * S + 7), np.int32)
        packed[:, 0] = Patchilizer.bos_token_id
        packed[:, 2 * S + 1] = 1  # init_lens >= 1
        packed[:, 2 * S + 5] = np.float32(1.0).view(np.int32)
        packed[:, 2 * S + 6] = np.float32(1.0).view(np.int32)
        init_lens = np.ones((B,), np.int32)
        for b, st in enumerate(self._slots):
            if st is None:
                continue
            # every occupied slot feeds its newest committed patch: the
            # prompt's last patch on its first bar, the bar committed at
            # the previous demux afterwards (device length is n_patches-1
            # either way, so the feed lands at its true position)
            packed[b, S:2 * S] = st.patches[max(st.n_patches, 1) - 1]
            packed[b, 2 * S] = 1  # active
            # cap at S-2 so at least one char can still be sampled (see the
            # matching note in decode/tunes_generate.py::generate_tunes)
            chars = [ord(c) for c in st.carried][: S - 2]
            packed[b, 1 : 1 + len(chars)] = chars
            init_lens[b] = 1 + len(chars)
            packed[b, 2 * S + 1] = init_lens[b]
            packed[b, 2 * S + 2] = st.bars
            packed[b, 2 * S + 3] = st.req.top_k
            packed[b, 2 * S + 4] = np.uint32(st.req.seed).view(np.int32)
            packed[b, 2 * S + 5] = np.float32(st.req.top_p).view(np.int32)
            packed[b, 2 * S + 6] = np.float32(st.req.temperature).view(np.int32)

        self._patch_cache, tokens, lens = self._bar_step(
            self.params, self._patch_cache, jnp.asarray(adm_rows),
            jnp.asarray(adm_slots), jnp.asarray(adm_plens),
            jnp.asarray(packed))
        tokens = np.asarray(jax.device_get(tokens))
        lens = np.asarray(jax.device_get(lens))

        p = self.patchilizer
        for b, st in enumerate(self._slots):
            if st is None:
                continue
            req = st.req
            st.bars += 1
            new_tokens = tokens[b, init_lens[b]: lens[b]]
            finish = False
            if st.n_patches >= min(req.max_patch, L):
                finish = True
            elif len(new_tokens) and new_tokens[0] == Patchilizer.eos_token_id:
                finish = True
            else:
                bar = p.patch2bar(new_tokens)
                if bar == "":
                    finish = True
                else:
                    req.text += filter_generated_bar(
                        bar, req.show_control_code)
                    full_bar = st.carried + bar
                    st.carried = ""
                    patch_row = np.asarray(p.bar2patch(full_bar, S), np.int32)
                    st.patches[st.n_patches] = patch_row  # next bar's feed
                    st.n_patches += 1
                    if st.n_patches >= min(req.max_patch, L):
                        finish = True
            if finish:
                req.done = True
                req.finished_at = _time.perf_counter()
                self._latencies.append(req.finished_at - req.submitted_at)
                self._live.pop(req.id, None)
                self._finished.append(req)
                self._slots[b] = None
        return self._drain_finished()

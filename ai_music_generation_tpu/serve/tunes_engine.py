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

- ONE jitted bar program over ``[n_slots, L, S]`` patch state. Per-slot
  prompts/positions/params: the patch encoder re-encodes the padded patch
  sequence each bar (the model's own contract — patch-level attention is
  over <=128 patch embeddings, so re-encoding is cheap relative to the
  char scan), so admission is pure host bookkeeping: no prefill program,
  a freed slot is reusable immediately.
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
from collections import deque
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.decode.tunes_generate import (
    bar_scan,
    filter_control_codes,
    prepare_patch_state,
)
from ai_music_generation_tpu.models.tunesformer import TunesFormer
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


class TunesServer:
    """Continuous-batching TunesFormer server.

    Usage mirrors :class:`serve.engine.GenerationServer`::

        srv = TunesServer(model, params, n_slots=16)
        rid = srv.submit("S:2\\nB:9\\n...", max_patch=64, seed=7)
        for req in srv.run_until_idle():
            print(req.id, req.text)
    """

    def __init__(self, model: TunesFormer, params, n_slots: int = 16):
        self.model = model
        self.params = params
        self.cfg = model.config
        self.n_slots = n_slots
        self.patchilizer = Patchilizer()
        self._queue: deque[TuneRequest] = deque()
        self._slots: list[Optional[_SlotState]] = [None] * n_slots
        self._ids = itertools.count()
        self._finished: deque[TuneRequest] = deque()
        # cancellation registry (same thread contract as serve/engine.py:
        # producers touch only these; the engine thread applies them)
        self._live: dict[int, TuneRequest] = {}
        self._cancelled: set[int] = set()
        # DEVICE-RESIDENT patch state: uploading the full [B, L, S] stack
        # every bar (the naive approach) moves ~2 MB/step over the tunnel
        # and dominated the bar step at 128 slots; instead the device array
        # is updated incrementally — one [B, S] bar-patch write per step
        # plus full-row writes only at admission.
        self._dev_patches = jnp.zeros(
            (n_slots, self.cfg.patch_length, self.cfg.patch_size), jnp.int32)
        # (slot, patch_row [S] int32, position) produced by the previous
        # step's demux, applied on device at the start of the next step
        self._pending: list[tuple[int, np.ndarray, int]] = []

    # -- jitted bar program --------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _bar_step(self, params, dev, adm_rows, adm_slots, upd_rows, upd_pos,
                  upd_mask, n_patches, init_tokens, init_lens,
                  seeds, bar_idx, top_p, top_k, temperature):
        """Sync device patch state, then one bar for every slot — ONE
        dispatch per step (separate write programs each cost a tunnel
        round trip, measured ~60 ms/step of the host side at 128 slots).

        dev [B, L, S] i32 (donated device-resident patch stacks);
        adm_rows [G, L, S] + adm_slots [G] (== n_slots padding → dropped):
        full-row replacement for this step's admissions;
        upd_rows [B, S] + upd_pos [B] + upd_mask [B]: the previous step's
        new bar patches; n_patches [B] (>=1), init_tokens [B, S],
        init_lens [B] (>=1), seeds [B] u32, bar_idx [B] i32 (per-request
        bar counter for RNG folding), top_p/temperature [B] f32,
        top_k [B] i32. Returns (dev, tokens [B, S], lens [B]).
        """
        B = dev.shape[0]
        dev = dev.at[adm_slots].set(adm_rows, mode="drop")
        cur = dev[jnp.arange(B), upd_pos]
        new = jnp.where(upd_mask[:, None], upd_rows, cur)
        dev = dev.at[jnp.arange(B), upd_pos].set(new)

        row_keys = jax.vmap(
            lambda s, i: jax.random.fold_in(jax.random.PRNGKey(s), i)
        )(seeds, bar_idx)

        def sample_fn(probs, idx):
            keys = jax.vmap(jax.random.fold_in)(row_keys, idx)
            return sample_ptk_vec(probs, keys, top_p, top_k, temperature)

        tokens, lens = bar_scan(self.model, params, dev, n_patches,
                                init_tokens, init_lens, sample_fn)
        return dev, tokens, lens

    # -- host orchestration --------------------------------------------------

    def submit(self, prompt: str, max_patch: int = 128, top_p: float = 0.8,
               top_k: int = 8, temperature: float = 1.2, seed: int = 0,
               show_control_code: bool = True) -> int:
        if not prompt:
            raise ValueError("prompt must be non-empty")
        req = TuneRequest(
            id=next(self._ids), prompt=str(prompt), max_patch=int(max_patch),
            top_p=float(top_p), top_k=int(top_k),
            temperature=float(temperature), seed=int(seed),
            show_control_code=bool(show_control_code),
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
        admitted: list[tuple[int, np.ndarray]] = []
        for slot in range(self.n_slots):
            if self._slots[slot] is None and self._queue:
                req = self._queue.popleft()
                st = _SlotState(req, self.patchilizer, L, S)
                req.text = filter_control_codes(req.prompt,
                                                req.show_control_code)
                self._slots[slot] = st
                admitted.append((slot, st.patches))
                # stale incremental writes must not clobber the fresh row
                self._pending = [p for p in self._pending if p[0] != slot]
        if not any(s is not None for s in self._slots):
            return self._drain_finished()

        B = self.n_slots
        # device-state sync args: full rows for admitted slots (padded to a
        # G bucket for compile economy) + the previous step's bar patches —
        # both applied inside _bar_step (one dispatch)
        G = 8 if len(admitted) <= 8 else self.n_slots
        adm_rows = np.zeros((G, L, S), np.int32)
        adm_slots = np.full((G,), self.n_slots, np.int32)
        for i, (slot, row) in enumerate(admitted):
            adm_rows[i] = row
            adm_slots[i] = slot
        upd_rows = np.zeros((B, S), np.int32)
        upd_pos = np.zeros((B,), np.int32)
        upd_mask = np.zeros((B,), bool)
        for slot, row, position in self._pending:
            upd_rows[slot] = row
            upd_pos[slot] = position
            upd_mask[slot] = True
        self._pending.clear()

        n_patches = np.ones((B,), np.int32)
        init_tokens = np.zeros((B, S), np.int32)
        init_tokens[:, 0] = Patchilizer.bos_token_id
        init_lens = np.ones((B,), np.int32)
        seeds = np.zeros((B,), np.uint32)
        bar_idx = np.zeros((B,), np.int32)
        top_p = np.ones((B,), np.float32)
        top_k = np.zeros((B,), np.int32)
        temp = np.ones((B,), np.float32)
        for b, st in enumerate(self._slots):
            if st is None:
                continue
            n_patches[b] = max(st.n_patches, 1)
            chars = [ord(c) for c in st.carried][: S - 1]
            init_tokens[b, 1 : 1 + len(chars)] = chars
            init_lens[b] = 1 + len(chars)
            seeds[b] = np.uint32(st.req.seed)
            bar_idx[b] = st.bars
            top_p[b] = st.req.top_p
            top_k[b] = st.req.top_k
            temp[b] = st.req.temperature

        self._dev_patches, tokens, lens = self._bar_step(
            self.params, self._dev_patches, jnp.asarray(adm_rows),
            jnp.asarray(adm_slots), jnp.asarray(upd_rows),
            jnp.asarray(upd_pos), jnp.asarray(upd_mask),
            jnp.asarray(n_patches),
            jnp.asarray(init_tokens), jnp.asarray(init_lens),
            jnp.asarray(seeds), jnp.asarray(bar_idx), jnp.asarray(top_p),
            jnp.asarray(top_k), jnp.asarray(temp))
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
                    visible = (
                        bar if req.show_control_code
                        or bar[:2] not in ("S:", "B:", "E:") else "")
                    req.text += visible
                    full_bar = st.carried + bar
                    st.carried = ""
                    patch_row = np.asarray(p.bar2patch(full_bar, S), np.int32)
                    st.patches[st.n_patches] = patch_row  # host mirror
                    self._pending.append((b, patch_row, st.n_patches))
                    st.n_patches += 1
                    if st.n_patches >= min(req.max_patch, L):
                        finish = True
            if finish:
                req.done = True
                self._live.pop(req.id, None)
                self._finished.append(req)
                self._slots[b] = None
        return self._drain_finished()

    def _drain_finished(self) -> list[TuneRequest]:
        out = list(self._finished)
        self._finished.clear()
        return out

    @property
    def busy(self) -> bool:
        return bool(self._queue) or any(s is not None for s in self._slots)

    def run_until_idle(self) -> list[TuneRequest]:
        out = []
        while self.busy:
            out.extend(self.step())
        return out

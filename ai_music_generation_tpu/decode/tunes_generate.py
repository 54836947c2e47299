"""TunesFormer two-level generation, batched and jit-compiled.

The reference generates one tune at a time, one char at a time, with a
GPU->CPU numpy round trip per character and a full re-encode of the patch
sequence per bar (ref: tunesformer/utils.py:221-255, generate.py:134-153).
Here:

- bars for ALL tunes in the batch are generated lockstep: one jitted call
  per bar feeds the newest committed patch through a patch-core KV cache
  (``TunesFormer.patch_step`` — O(1) patch positions per bar; the
  reference's full re-encode is O(P) and dominates its bar cost) and scans
  the char decoder over the 31 in-bar positions with on-device sampling;
- the host only handles per-bar string bookkeeping (patch re-encoding,
  control-code filtering, stop conditions) — 1-2 device calls per BAR
  instead of per char;
- sampling = nucleus (top-p) filter, then top-k filter, then
  temperature-reshape, matching the reference chain
  top_p_sampling -> top_k_sampling -> temperature_sampling
  (ref: utils.py:246-248, `samplings` package). RNG is JAX counter-based;
  the reference's `random.randint` reseed chain is torch/numpy-specific and
  not reproducible bit-for-bit — this framework's seed contract is its own
  (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.models.tunesformer import CHAR_VOCAB, TunesFormer
from ai_music_generation_tpu.tokenizers.patchilizer import Patchilizer

Array = jax.Array


def sample_top_p_top_k_temperature(
    probs: Array,  # [B, V] probabilities
    rng: Array,
    top_p: float = 1.0,
    top_k: int = 0,
    temperature: float = 1.0,
) -> Array:
    """Chained nucleus -> top-k -> temperature sampling (ref: utils.py:246-248)."""
    V = probs.shape[-1]
    sorted_probs, sorted_idx = jax.lax.top_k(probs, V)  # descending
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # nucleus: keep tokens whose preceding cumulative mass is < top_p
    keep = (cum - sorted_probs) < top_p
    keep = keep.at[..., 0].set(True)
    if top_k and top_k > 0:
        rank = jnp.arange(V)[None, :]
        keep = keep & (rank < top_k)
    filtered = jnp.where(keep, sorted_probs, 0.0)
    if temperature != 1.0:
        # temperature re-shape: p^(1/T) renormalized (samplings semantics)
        filtered = jnp.where(filtered > 0, filtered ** (1.0 / temperature), 0.0)
    logp = jnp.log(jnp.maximum(filtered, 1e-30))
    logp = jnp.where(filtered > 0, logp, -jnp.inf)
    choice = jax.random.categorical(rng, logp, axis=-1)  # index into sorted order
    return jnp.take_along_axis(sorted_idx, choice[..., None], axis=-1)[..., 0]


def filter_control_codes(text: str, show_control_code: bool) -> str:
    """Hide S:/B:/E: lines from visible output (ref: generate.py:114-126);
    they still condition the model. Shared by the batch generator and the
    serving engine."""
    if show_control_code:
        return text
    return "".join(
        line for line in text.splitlines(keepends=True)
        if line[:2] not in ("S:", "B:", "E:")
    )


def filter_generated_bar(bar: str, show_control_code: bool) -> str:
    """Hide a *generated* bar iff its first two chars are a control code
    (ref: generate.py:143-146 checks ``patch[:2]`` on the whole bar, unlike
    the per-line prompt filter above — a multi-line bar whose first line is
    ``S:`` is hidden entirely). Shared by the batch generator and the
    serving engine."""
    if show_control_code:
        return bar
    return "" if bar[:2] in ("S:", "B:", "E:") else bar


def prepare_patch_state(patchilizer: Patchilizer, prompt: str, L: int, S: int):
    """Patch-encode a prompt; returns (prompt_patches, carried_chars).

    ``carried`` is the prompt tail past the last patch boundary, which must
    seed the first generated bar. The decoded patch view is only a string
    prefix of the prompt when no line/bar was truncated by patch_size or
    stripped by unidecode; otherwise carrying text would duplicate content
    already encoded. Shared by the batch generator and the serving engine."""
    from ai_music_generation_tpu.tokenizers.patchilizer import _ascii

    prompt_patches = patchilizer.encode(
        prompt, L, S, add_special_patches=True)
    # Drop the trailing special eos patch so generation continues the tune.
    # Deliberate deviation from the reference's unconditional [:-1]
    # (ref generate.py:128): when the prompt fills all L patches, encode()'s
    # truncation has ALREADY removed the eos patch, and [:-1] would silently
    # drop the prompt's last real bar from conditioning.
    eos_patch = ([Patchilizer.bos_token_id]
                 + [Patchilizer.eos_token_id] * (S - 1))
    if prompt_patches and list(prompt_patches[-1]) == eos_patch:
        prompt_patches = prompt_patches[:-1]
    prefix = patchilizer.decode(prompt_patches)
    norm = _ascii(prompt)
    carried = norm[len(prefix):] if norm.startswith(prefix) else ""
    return prompt_patches, carried


def bar_scan(model, params, patches, n_patches, init_tokens, init_lens,
             sample_fn):
    """One generated bar for each tune in the batch, conditioning computed
    by a FULL patch-core forward over the whole (padded) patch stack —
    the reference's per-bar re-encode (ref: generate.py:136-140). The
    incremental path (``TunesFormer.patch_step`` + :func:`char_bar_scan`)
    produces byte-identical output at O(1) patch positions per bar; this
    full-forward wrapper is kept as its exactness oracle and for callers
    that don't carry a patch cache.

    patches:      [B, L, S] int32 (zero-padded patch sequences)
    n_patches:    [B] valid patch counts (>=1)
    (remaining args/returns: see :func:`char_bar_scan`)
    """
    encoded = model.apply(
        params, patches, method=model.encode_patches
    )  # [B, L, C]
    last = jnp.take_along_axis(
        encoded, (n_patches - 1)[:, None, None], axis=1
    )[:, 0, :]  # [B, C]
    return char_bar_scan(model, params, last, init_tokens, init_lens,
                         sample_fn)


def char_bar_scan(model, params, last, init_tokens, init_lens, sample_fn):
    """Decode one bar's chars for each tune, given the conditioning vector
    (traced; callers jit).

    last:         [B, C] encoded-patch conditioning (position 0's embedding
                  in the char decoder, ref: utils.py:146-149)
    init_tokens:  [B, S] int32 (bos + any carried partial-bar chars)
    init_lens:    [B] number of valid init tokens (>=1)
    sample_fn:    (probs [B, 128], idx [B]) -> [B] int32 sampled chars,
                  where ``idx`` is each row's sampled-token count so far
                  (the RNG fold index) — the only thing that differs
                  between the batch generator (static params, shared rng)
                  and the serving engine (per-row params/keys).
    Returns tokens [B, S] including init prefix and sampled chars, lens [B].

    KV-cached position-lockstep decode: positions 0..S-1 advance together
    through a scalar-length char-core cache; position j's input is the
    init token while j < init_len[row], else the token just sampled from
    position j-1's logits. Char-core cost per bar is O(S) tokens — the
    earlier full-forward-per-char formulation recomputed all S positions
    per step (O(S^2); measured as the dominant bar-program cost).
    """
    from ai_music_generation_tpu.models.gpt import KVCache

    B, S = init_tokens.shape

    char_cfg = model.config.char_core_config()
    cache = KVCache.create(char_cfg, B, max_len=S, quantized=False)

    def step(carry, j):
        cache, last_logits, tokens, lens, finished = carry
        probs = jax.nn.softmax(last_logits.astype(jnp.float32), axis=-1)
        idx = jnp.maximum(j - init_lens, 0)  # sampled-count fold index
        sampled = sample_fn(probs, idx).astype(jnp.int32)
        in_init = j < init_lens
        can_write = (~finished) & (~in_init)
        col = jnp.where(in_init, init_tokens[:, j],
                        jnp.where(can_write, sampled, tokens[:, j]))
        tokens = tokens.at[:, j].set(col)
        lens = jnp.where(can_write, lens + 1, lens)
        finished = finished | (can_write & (sampled == Patchilizer.eos_token_id)) | (lens >= S)
        logits_j, cache = model.apply(
            params, last, col, cache, method=model.char_step)
        return (cache, logits_j.astype(jnp.float32), tokens, lens,
                finished), None

    carry0 = (cache, jnp.zeros((B, CHAR_VOCAB), jnp.float32),
              init_tokens, init_lens, jnp.zeros((B,), bool))
    # unroll=2 is a MISCOMPILE workaround, not a perf knob: on the TPU
    # (axon) backend this exact body at trip count 32 with unroll=1
    # produced NaN logits from step 0 (lengths <= 24, any unroll >= 2, and
    # CPU were all correct — isolated 2026-08 with the 9+3/768 model;
    # char_step outside scan is bit-correct). Keep the regression test
    # tests/test_serve_tunes.py::test_bar_scan_finite_at_full_scale green
    # before touching this.
    (_, _, tokens, lens, _), _ = jax.lax.scan(
        step, carry0, jnp.arange(S), unroll=2)
    return tokens, lens


class TunesGenerator:
    """Compiled batched bar-by-bar generator.

    Hashable by (model config, sampling params) so jit's static-self
    caching reuses the compiled bar program across instances with equal
    settings — identity hashing silently recompiled the whole program per
    instance (same failure Generator in decode/generate.py guards
    against; minutes per compile on the axon tunnel)."""

    def __init__(self, model: TunesFormer, top_p=0.8, top_k=8, temperature=1.2):
        self.model = model
        self.cfg = model.config
        self.top_p = top_p
        self.top_k = top_k
        self.temperature = temperature
        self.patchilizer = Patchilizer()

    def _jit_key(self):
        return (self.cfg, self.top_p, self.top_k, self.temperature)

    def __eq__(self, other):
        return (type(other) is TunesGenerator
                and self._jit_key() == other._jit_key())

    def __hash__(self):
        return hash(self._jit_key())

    @functools.partial(jax.jit, static_argnums=0)
    def _prefill(self, params, patches, n0):
        """Fill the patch-core KV cache from the prompt patches: ONE
        canonical [B, L, S] patch forward, then the scalar cache length is
        rewound to ``n0 - 1`` so the first bar step re-feeds the prompt's
        LAST patch — every bar (including the first) then runs the same
        one-position program. The column at n0-1 is overwritten by that
        step with identical K/V, so the rewind trades nothing."""
        from ai_music_generation_tpu.models.gpt import KVCache

        B, L = patches.shape[0], patches.shape[1]
        cache = KVCache.create(
            self.cfg.patch_core_config(), B, max_len=L, quantized=False)
        _, cache = self.model.apply(
            params, patches, cache, method=self.model.encode_patches_cached)
        return KVCache(cache.k, cache.v, (n0 - 1).astype(jnp.int32))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=2)
    def _bar_step(self, params, cache, new_patch, init_tokens, init_lens,
                  rng):
        """One cached patch-decoder position (the just-committed patch) +
        the char bar scan, with this generator's static sampling params and
        one shared rng folded by sampled-char index. All rows share a
        prompt here, so the per-row fold indices are uniform — ``idx[0]``
        keeps the single-key batched-categorical draw (one key, independent
        per-row samples) of the original formulation. The patch cache is
        donated: XLA updates the K/V buffers in place across bars."""
        last, cache = self.model.apply(
            params, new_patch, cache, method=self.model.patch_step)

        def sample_fn(probs, idx):
            return sample_top_p_top_k_temperature(
                probs, jax.random.fold_in(rng, idx[0]),
                self.top_p, self.top_k, self.temperature,
            )

        tokens, lens = char_bar_scan(self.model, params, last,
                                     init_tokens, init_lens, sample_fn)
        return tokens, lens, cache

    def generate_tunes(
        self,
        params,
        prompt: str,
        num_tunes: int = 1,
        max_patch: int = 128,
        seed: Optional[int] = None,
        show_control_code: bool = True,
    ) -> list[str]:
        """Generate ``num_tunes`` continuations of ``prompt`` in one batch.

        Mirrors the reference bar loop (ref: generate.py:114-153): the prompt
        is patch-encoded (special patches, eos dropped); leftover chars past
        the last patch boundary seed the first bar; generation stops per tune
        at an eos patch, an empty bar, or ``max_patch`` patches. S:/B:/E:
        control-code bars are hidden from output unless ``show_control_code``
        (they still condition the model).
        """
        p = self.patchilizer
        S = self.cfg.patch_size
        L = self.cfg.patch_length
        B = num_tunes
        base_rng = jax.random.PRNGKey(0 if seed is None else seed)

        prompt_patches, remaining = prepare_patch_state(p, prompt, L, S)

        patches = np.zeros((B, L, S), np.int32)
        patches[:, : len(prompt_patches)] = np.asarray(prompt_patches, np.int32)
        n_patches = np.full((B,), len(prompt_patches), np.int32)

        # prefill the patch-core KV cache once; each bar then feeds only the
        # newest committed patch (TunesFormer.patch_step) — O(1) patch
        # positions per bar instead of the reference's full re-encode
        # (ref: generate.py:136-140). Exactness vs the full forward is
        # pinned by tests/test_tunes_decode.py.
        patch_cache = self._prefill(
            params, jnp.asarray(patches),
            jnp.asarray(len(prompt_patches), jnp.int32))
        # the patch each row feeds this bar: the prompt's last patch first,
        # then the bar just committed (stale for done rows — their cache row
        # is never read again)
        new_patch = patches[:, len(prompt_patches) - 1].copy()  # [B, S]

        # visible text per tune (control codes filtered like ref :114-126)
        filter_cc = lambda text: filter_control_codes(text, show_control_code)
        tunes = [filter_cc(prompt) for _ in range(B)]
        done = np.zeros((B,), bool)
        carried = [remaining for _ in range(B)]

        # clamp to the model's patch capacity: patches is [B, L, S] and the
        # append below indexes row n_patches — an unclamped -max_patch flag
        # larger than L would index out of bounds
        patch_limit = min(max_patch, L)
        for bar_idx in range(patch_limit):
            if done.all() or (n_patches >= patch_limit).all():
                break
            init_tokens = np.zeros((B, S), np.int32)
            init_lens = np.ones((B,), np.int32)
            init_tokens[:, 0] = Patchilizer.bos_token_id
            for b in range(B):
                if done[b]:
                    # no carried injection for finished rows: init_lens must
                    # stay UNIFORM across the batch — _bar_step folds the
                    # shared rng by idx[0], and a dead row retaining a longer
                    # carried prefix would make live rows reuse the same key
                    # for several consecutive sampled chars
                    continue
                # cap at S-2 so at least one char can still be sampled (a
                # >= S-1 char un-delimited prompt tail would otherwise set
                # init_lens == S, trip the lens >= S stop at step 0, and
                # silently end the tune; bar2patch applies the same
                # S-bounded truncation to the stored patch)
                chars = [ord(c) for c in carried[b]][: S - 2]
                init_tokens[b, 1 : 1 + len(chars)] = chars
                init_lens[b] = 1 + len(chars)

            rng = jax.random.fold_in(base_rng, bar_idx)
            tokens, lens, patch_cache = self._bar_step(
                params, patch_cache, jnp.asarray(new_patch),
                jnp.asarray(init_tokens), jnp.asarray(init_lens), rng,
            )
            tokens = np.asarray(jax.device_get(tokens))
            lens = np.asarray(jax.device_get(lens))

            for b in range(B):
                if done[b] or n_patches[b] >= patch_limit:
                    done[b] = True
                    continue
                new_tokens = tokens[b, init_lens[b] : lens[b]]
                if len(new_tokens) and new_tokens[0] == Patchilizer.eos_token_id:
                    done[b] = True
                    continue
                bar = p.patch2bar(new_tokens)
                if bar == "":
                    done[b] = True
                    continue
                tunes[b] += filter_generated_bar(bar, show_control_code)
                full_bar = carried[b] + bar
                carried[b] = ""
                patch = p.bar2patch(full_bar, S)
                patches[b, n_patches[b]] = patch
                new_patch[b] = patch  # feeds the next bar's patch_step
                n_patches[b] += 1

        return tunes

"""Distribution-exact speculative decoding with prompt-lookup drafting.

Decode throughput at eval-protocol batch sizes is bound by the per-step KV
cache read (docs/PERF.md "Known roofline positions"), which is paid ONCE per
step regardless of how many query tokens the step carries. Speculative
decoding exploits that: each step verifies ``n_draft`` cheap draft tokens
plus samples one token in a single forward, committing between 1 and
``n_draft + 1`` tokens for one cache read. ABC music text is highly
repetitive (bars, refrains, ``|``-delimited cells), so drafts looked up from
the sequence's own history have high acceptance on trained models.

Two properties make this a free lunch rather than a quality trade:

- **Drafting is prompt-lookup** (self n-gram): the most recent earlier
  occurrence of the last two committed tokens proposes the tokens that
  followed it. No draft model, no extra weights, no extra HBM traffic
  beyond a [B, total] integer scan per step.
- **Acceptance is exact rejection sampling** (the Leviathan et al. /
  Chen et al. scheme specialised to a deterministic point-mass proposal):
  draft token d with model probability p(d) is accepted with probability
  p(d); on rejection the replacement is drawn from the residual
  distribution p with d masked out and renormalised. The committed token's
  marginal distribution is exactly p — the SAME temperature/top-k
  distribution ``decode.generate.sample_logits`` draws from — so the output
  distribution is identical to non-speculative decoding (verified
  empirically in tests/test_speculative.py; with ``temperature=0`` the
  output is token-for-token identical to the plain Generator inside one
  context window).

The whole loop is ONE jitted program: drafting, the (n_draft+1)-token
verify forward, acceptance, residual sampling, and buffer writes all run on
device inside a ``lax.while_loop`` — zero host round-trips per step, same
as decode/generate.py.

Rows accept different numbers of drafts per step, so the batch
desynchronises — yet every step still writes all rows' new K/V as one
contiguous slab (the 25x scatter lesson, models/gpt.py KVCache docstring)
using the spec cache mode: per-column logical positions (``col_pos``)
express each row's attendable history, and rejected drafts' columns are
simply marked invalid. Cache columns are consumed at n_draft+1 per step
regardless of acceptance; the windowed refresh (same window contract as
decode/generate.py) re-prefills the last ``block_size - refresh`` committed
tokens, which also compacts the invalid columns away.

The reference has no speculative decoding (its sampler re-runs the full
forward per token with no KV cache at all, ref: nanoGPT/model.py:305-330);
this is a new capability measured in docs/PERF.md.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ai_music_generation_tpu.models.gpt import GPT, KVCache

Array = jax.Array


def _roll_rows_left(x: Array, shift: Array) -> Array:
    """Per-row variable left-roll: ``out[b, j] = x[b, (j + shift[b]) % n]``.

    Replaces every per-row ``take_along_axis`` in the decode loop: TPU
    lowers those as serialized gathers — the [4096, 508] token-buffer
    gather alone traced at 14-16 ms/step (bytes_accessed 33 MB, i.e.
    ~2 GB/s effective), 1.5x the cost of the entire 6-layer verify
    attention. A binary decomposition of the shift into ceil(log2 n)
    static rolls + selects is pure VPU work at full bandwidth."""
    B, n = x.shape
    shift = jnp.mod(jnp.asarray(shift, jnp.int32), n)
    bit = 1
    while bit < n:
        x = jnp.where((shift & bit != 0)[:, None],
                      jnp.roll(x, -bit, axis=1), x)
        bit <<= 1
    return x


def _select_columns(x: Array, j: Array) -> Array:
    """``x[b, j[b]]`` for small static width x [B, W] — a one-hot
    sum, not a gather."""
    W = x.shape[1]
    oh = jnp.arange(W)[None, :] == j[:, None]
    return jnp.sum(jnp.where(oh, x, 0), axis=1)


def prompt_lookup_drafts(tokens: Array, lens: Array, prompt_lens: Array,
                         n_draft: int) -> tuple[Array, Array]:
    """Propose ``n_draft`` draft tokens per row from the sequence's own
    history, plus the forced (teacher-forcing) mask for in-prompt positions.

    The most recent position m in [1, lens-2] whose bigram
    ``(tokens[m-1], tokens[m])`` equals the final committed bigram proposes
    ``tokens[m+1 : m+1+n_draft]``; rows with no match repeat their last
    token (a cheap proposal that simply gets rejected). Positions still
    inside the prompt draft the known prompt token and are force-accepted.
    """
    drafts, forced, _ = _drafts_and_rolled(tokens, lens, prompt_lens, n_draft)
    return drafts, forced


def _drafts_and_rolled(tokens: Array, lens: Array, prompt_lens: Array,
                       n_draft: int) -> tuple[Array, Array, Array]:
    """prompt_lookup_drafts plus the lens-rolled token buffer (column j =
    ``tokens[(lens + j) % total]``), which the caller reuses for the
    step's other history reads."""
    B, total = tokens.shape
    K = n_draft
    rolled_lens = _roll_rows_left(tokens, lens)
    last1 = rolled_lens[:, total - 1:total]  # tokens[lens - 1]
    # tokens[(lens - 2) % total]: for lens < 2 this wraps instead of the
    # old clip-to-0 read, but every use below is guarded by lens >= 3
    last2 = rolled_lens[:, total - 2:total - 1]
    # match position m in [1, lens-2]: committed bigram equal to the
    # final bigram (m == lens-1 is the final bigram itself)
    m_idx = jnp.arange(1, total)
    match = ((tokens[:, 1:] == last1) & (tokens[:, :-1] == last2)
             & (m_idx[None, :] <= (lens - 2)[:, None])
             & (lens[:, None] >= 3))
    best = jnp.max(jnp.where(match, m_idx[None, :], 0), axis=1)
    has = best > 0
    # tokens[(best + 1 + k) % total]: wraps where the old code clipped —
    # harmless, these are PROPOSALS (rejection sampling corrects any
    # proposal), and rows near the buffer end are about to stop anyway
    cand = _roll_rows_left(tokens, best + 1)[:, :K]
    drafts = jnp.where(has[:, None], cand, last1)  # fallback: repeat
    # teacher forcing: positions still inside the prompt draft the
    # known prompt token and are force-accepted (same conditioning
    # semantics as Generator's in-prompt commit)
    pos = lens[:, None] + jnp.arange(K)[None, :]
    forced = pos < prompt_lens[:, None]
    prompt_tok = rolled_lens[:, :K]  # in-range wherever forced is True
    return jnp.where(forced, prompt_tok, drafts), forced, rolled_lens


class SpecGenerator:
    """Compiled batched speculative generator for a GPT model.

    Drop-in alternative to :class:`decode.generate.Generator` (same public
    ``generate`` contract) committing up to ``n_draft + 1`` tokens per model
    step. The sampled-token distribution is exactly the Generator's
    (temperature + top-k); the token STREAM at a given seed differs because
    the RNG is consumed per step rather than per position.
    """

    def __init__(
        self,
        model: GPT,
        max_new_tokens: int = 500,
        temperature: float = 0.8,
        top_k: Optional[int] = 200,
        n_draft: int = 4,
        refresh: Optional[int] = None,
        top_p: Optional[float] = None,
    ):
        assert n_draft >= 1
        self.model = model
        self.block_size = model.config.block_size
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        self.n_draft = n_draft
        self.refresh = refresh or max(1, self.block_size // 2)
        # context re-prefilled at refresh — same window as Generator
        self.window = self.block_size - self.refresh
        assert self.window >= 1
        # the cache cursor is 8-aligned (models/gpt.py KVCache): after a
        # refresh it sits at ceil(window/8)*8, and each step consumes
        # ceil((n_draft+1)/8)*8 columns — at least one step must fit
        cw = -(-self.window // 8) * 8
        tw = -(-(n_draft + 1) // 8) * 8
        assert cw + tw <= self.block_size, (
            "refresh window leaves no room for a draft chain; "
            "lower n_draft or raise refresh")

    # value-keyed jit cache (see decode/generate.py Generator._jit_key)
    def _jit_key(self):
        return (self.model, self.max_new_tokens, self.temperature,
                self.top_k, self.n_draft, self.refresh, self.top_p)

    def __eq__(self, other):
        return (type(other) is SpecGenerator and
                self._jit_key() == other._jit_key())

    def __hash__(self):
        return hash(self._jit_key())

    # -- jitted core -------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _generate(self, params, prompts, prompt_lens, prefill_len, rng):
        model, cfg = self.model, self.model.config
        B, P = prompts.shape
        K = self.n_draft
        T = K + 1
        S = self.block_size
        C = self.window
        V = cfg.vocab_size
        F = prefill_len  # static; 1 <= F <= min(prompt_lens)
        total = P + self.max_new_tokens

        tokens = jnp.zeros((B, total), jnp.int32).at[:, :P].set(prompts)
        # every row fills the whole buffer — shorter prompts generate more
        # than max_new tokens, matching Generator's lockstep contract
        targets = jnp.full((B,), total, jnp.int32)

        # Invariant maintained throughout: the cache holds K/V for the
        # window-relative positions [0, length[i]) of row i's committed
        # tokens, and the LAST committed token (buffer index lens[i]-1,
        # window position length[i]) is NOT yet cached — it is always this
        # step's first input, because every step ends with a freshly
        # sampled token (replacement on rejection, bonus on full
        # acceptance) whose K/V has not been computed.
        cache = KVCache.create(cfg, B, max_len=S, spec=True)
        if F >= 2:
            _, _, cache = model.apply(params, tokens[:, :F - 1], cache=cache)
        lens0 = jnp.full((B,), F, jnp.int32)

        def spec_step(state):
            tokens, lens, cache, ctr = state
            step_rng = jax.random.fold_in(rng, ctr)
            r_acc, r_sample = jax.random.split(step_rng)

            drafts, forced, rolled_lens = _drafts_and_rolled(
                tokens, lens, prompt_lens, K)  # [B, K]
            tok0 = rolled_lens[:, -1:]  # tokens[lens - 1]
            x = jnp.concatenate([tok0, drafts], axis=1)  # [B, T]

            logits, _, new_cache = model.apply(
                params, x, cache=cache, return_all_logits=True)
            lg = logits.astype(jnp.float32)
            if self.temperature > 0:
                lg = lg / self.temperature
                if self.top_k is not None and self.top_k < V:
                    kth = jax.lax.top_k(lg, self.top_k)[0][..., -1:]
                    lg = jnp.where(lg < kth, -jnp.inf, lg)
                if self.top_p is not None and self.top_p < 1.0:
                    # the SAME nucleus transform sample_logits applies —
                    # exactness needs p_draft and the residual to come from
                    # the transformed distribution
                    from ai_music_generation_tpu.decode.generate import (
                        apply_top_p,
                    )
                    lg = apply_top_p(lg, self.top_p)
                probs = jax.nn.softmax(lg, axis=-1)  # [B, T, V]
                # p_{j-1}(d_j): the model's probability of draft j under the
                # SAME temp/top-k transform sample_logits applies.
                # One-hot multiply-reduce, NOT take_along_axis (serialized
                # gather on TPU — _roll_rows_left docstring)
                oh_d = (jnp.arange(V)[None, None, :]
                        == drafts[:, :, None])  # [B, K, V]
                p_draft = jnp.sum(
                    jnp.where(oh_d, probs[:, :K, :], 0.0), axis=-1)
            else:
                am = jnp.argmax(lg, axis=-1)  # [B, T]
                p_draft = (drafts == am[:, :K]).astype(jnp.float32)

            # exact rejection sampling with a point-mass proposal:
            # accept draft d with probability p(d) ...
            u = jax.random.uniform(r_acc, (B, K))
            ok = forced | (u < p_draft)
            a = jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)

            # ... on rejection, sample the replacement from the residual
            # p with d masked out and renormalised (categorical over the
            # -inf-masked logits IS that residual); on full acceptance,
            # sample the bonus token from the unmasked distribution at K
            oh_a = jnp.arange(T)[None, :, None] == a[:, None, None]
            lg_a = jnp.sum(jnp.where(oh_a, lg, 0.0), axis=1)  # lg[b, a[b]]
            rej_tok = _select_columns(drafts, jnp.minimum(a, K - 1))
            lg_res = jnp.where(
                (a < K)[:, None] & (jnp.arange(V)[None, :] == rej_tok[:, None]),
                -jnp.inf, lg_a)
            if self.temperature > 0:
                s = jax.random.categorical(r_sample, lg_res).astype(jnp.int32)
            else:
                s = jnp.argmax(lg_res, axis=-1).astype(jnp.int32)
            # teacher forcing for the sampled slot too, if still in-prompt:
            # tokens[lens + a] = column a of the lens-rolled buffer (in
            # range wherever the forcing condition holds)
            s_pos = lens + a
            prompt_next = _select_columns(rolled_lens[:, :K + 1], a)
            s = jnp.where(s_pos < prompt_lens, prompt_next, s)

            # rows at their target stop committing (and stop advancing)
            commits = jnp.minimum(a + 1, jnp.maximum(targets - lens, 0))

            # committed tokens -> buffer positions lens .. lens+commits-1:
            # offsets 0..commits-1 hold d_1..d_a then the sampled token.
            # wvals[b, i] = drafts[b, i - lens[b]] via a variable RIGHT
            # roll of the zero-padded drafts (the [B, total] gather here
            # was the single hottest op of the whole verify step:
            # 14-16 ms at batch 4096 — _roll_rows_left docstring); the
            # j_rel == a slot is overwritten with s either way
            j_rel = jnp.arange(total)[None, :] - lens[:, None]
            wmask = (j_rel >= 0) & (j_rel < commits[:, None])
            drafts_pad = jnp.concatenate(
                [drafts, jnp.zeros((B, total - K), jnp.int32)], axis=1)
            wvals = _roll_rows_left(drafts_pad, total - lens)
            wvals = jnp.where(j_rel == a[:, None], s[:, None], wvals)
            tokens = jnp.where(wmask, wvals, tokens)

            # cache bookkeeping: the model tentatively marked all T new
            # columns valid; keep exactly the first `commits` of them
            # (input0 + accepted drafts short of the commit clamp — the
            # LAST committed token stays uncached per the invariant) and
            # rewind length to the next step's first-query position.
            # Elementwise window-select, not a dynamic-update-slice (a DUS
            # offset on col_pos's lane dim costs ~0.5 ms/step at batch
            # 4096 — models/gpt.py KVCache docstring)
            rel = jnp.arange(S)[None, :] - cache.cursor
            col_pos = jnp.where(
                (rel >= 0) & (rel < T),
                jnp.where(rel < commits[:, None],
                          cache.length[:, None] + rel,
                          KVCache.INVALID_POS),
                new_cache.col_pos)
            cache = dataclasses.replace(
                new_cache, length=cache.length + commits, col_pos=col_pos)
            return (tokens, lens + commits, cache, ctr + 1)

        def refresh_fn(state):
            """Re-prefill the last `window` committed tokens (minus the
            always-uncached last one) at window positions 0.. — compacting
            rejected-draft columns away. Same context-window contract as
            Generator's windowed refresh."""
            tokens, lens, cache, ctr = state
            start = jnp.maximum(lens - 1 - C, 0)
            # tokens[start + j], j < C: start + C - 1 <= max(lens - 2, C - 1)
            # < total, so the roll never wraps into used columns
            ctx = _roll_rows_left(tokens, start)[:, :C]
            fresh = dataclasses.replace(
                cache,
                length=jnp.zeros((B,), jnp.int32),
                cursor=jnp.zeros((), jnp.int32),
                col_pos=jnp.full((B, S), KVCache.INVALID_POS, jnp.int32))
            _, _, cache2 = model.apply(params, ctx, cache=fresh)
            # rows shorter than the window prefilled garbage past their
            # length: invalidate those columns and clamp their position
            nvalid = jnp.minimum(lens - 1, C)
            col_pos = jnp.where(
                jnp.arange(S)[None, :] < nvalid[:, None],
                cache2.col_pos, KVCache.INVALID_POS)
            cache2 = dataclasses.replace(
                cache2, length=nvalid, col_pos=col_pos)
            return (tokens, lens, cache2, ctr)

        # The refresh cadence is STATIC (the cursor advances exactly T per
        # step from a known start), so the loop nest is refresh-free on the
        # inside: an outer window loop refreshes once, then an inner
        # while_loop runs verify steps until the buffer fills. A per-step
        # ``lax.cond(need, refresh_fn, identity)`` measured 4.5 ms/step at
        # batch 4096 on v5e — XLA copies the whole carried state (caches
        # included) through the conditional — and it also broke the
        # in-place slab-write aliasing of the cache dynamic-update-slices
        # (0.8 ms full-buffer rewrites each); both vanish with the cond.
        # the cache cursor stays 8-ALIGNED (writes consume Tw = ceil/8
        # columns, models/gpt.py KVCache docstring), so the per-window
        # step budget is counted in Tw-column strides
        Tw = -(-T // 8) * 8

        def window(state, first):
            start = (-(-(F - 1) // 8) * 8 if F >= 2 else 0) if first \
                else (-(-C // 8) * 8)
            n_steps = (S - start) // Tw  # cursor + Tw <= S throughout

            def inner_cond(st):
                return (st[3] < st[4]) & jnp.any(st[1] < targets)

            def inner_body(st):
                tokens, lens, cache, i, stop, ctr = (
                    st[0], st[1], st[2], st[3], st[4], st[5])
                tokens, lens, cache, ctr = spec_step(
                    (tokens, lens, cache, ctr))
                return (tokens, lens, cache, i + 1, stop, ctr)

            tokens, lens, cache, ctr = state
            st = jax.lax.while_loop(
                inner_cond,
                inner_body,
                (tokens, lens, cache, jnp.zeros((), jnp.int32),
                 jnp.asarray(n_steps, jnp.int32), ctr))
            return (st[0], st[1], st[2], st[5])

        def outer_cond(state):
            return jnp.any(state[1] < targets)

        def outer_body(state):
            return window(refresh_fn(state), first=False)

        state = (tokens, lens0, cache, jnp.zeros((), jnp.int32))
        state = window(state, first=True)
        state = jax.lax.while_loop(outer_cond, outer_body, state)
        # n_steps lets callers compute the realized speculation win:
        # mean committed tokens/step = (total - F) / n_steps (vs 1 for the
        # plain Generator); returned alongside so instrumentation is free.
        return state[0], state[3]

    # -- public API --------------------------------------------------------

    def generate(self, params, prompts, prompt_lens=None, seed: int = 1337):
        """Same contract as decode.generate.Generator.generate."""
        return self.generate_with_stats(params, prompts, prompt_lens, seed)[0]

    def generate_with_stats(self, params, prompts, prompt_lens=None,
                            seed: int = 1337):
        """(tokens, n_steps): n_steps is the number of verify forwards run;
        committed-per-step = (buffer_len - prefill) / n_steps measures the
        realized acceptance (1.0 = no speculation win)."""
        prompts = jnp.asarray(prompts, jnp.int32)
        if prompts.ndim == 1:
            prompts = prompts[None, :]
        B, P = prompts.shape
        if prompt_lens is None:
            prompt_lens = jnp.full((B,), P, jnp.int32)
        else:
            prompt_lens = jnp.asarray(prompt_lens, jnp.int32)
        prefill_len = int(min(int(jax.device_get(jnp.min(prompt_lens))),
                              self.window))
        prefill_len = max(prefill_len, 1)
        # power-of-two bucket, same rationale as Generator.generate
        prefill_len = 1 << (prefill_len.bit_length() - 1)
        rng = jax.random.PRNGKey(seed)
        # decode-time params live in the model's compute dtype: the
        # in-model fp32->bf16 casts otherwise re-run INSIDE the decode
        # while_loop every step (~4.4 ms/step of layout-converting copies
        # at batch 4096, traced on v5e); pre-casting makes them no-ops.
        # Values are bit-identical — the model applies the same cast.
        dt = self.model.config.dtype
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            params)
        return self._generate(params, prompts, prompt_lens, prefill_len, rng)

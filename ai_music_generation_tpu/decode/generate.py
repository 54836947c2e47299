"""Batched autoregressive generation with a KV cache and on-device sampling.

Replaces the reference's per-token full-context re-forward with no KV cache
(ref: nanoGPT/model.py:305-330, noted in SURVEY.md §3.2 as the main perf gap):

- the whole decode loop is ONE jit program: prefill + ``lax.scan`` over
  decode steps, KV cache in HBM, temperature/top-k sampling on device —
  zero host round-trips per token;
- ragged prompts are handled by lockstep "commit" decoding: every sequence
  advances through the same positions; while position ``t`` is still inside
  sequence i's prompt, the prompt token is committed instead of the sample
  (teacher forcing), so each sequence is conditioned on exactly its own
  prefix, in one rectangular batch;
- contexts longer than ``block_size`` (the eval protocol generates 500
  tokens at block 256, ref: nanoGPT/sample.py:33) use *windowed refresh*:
  when the cache fills, the last ``block_size - refresh`` tokens are
  re-prefilled at positions ``0..`` and decoding continues for ``refresh``
  cheap steps. The reference slides its window by one token every step
  (ref: model.py:313-314); refresh trades ≤``refresh`` tokens of context for
  an O(block) amortized speedup. Set ``refresh=1``-equivalence is not
  provided — the framework's own seed/window contract is the compatibility
  target (SURVEY.md §7 "hard parts").

Sampling parity: temperature scaling then top-k truncation then categorical
(ref: nanoGPT/model.py:318-327). Fixed-seed determinism comes from
counter-based keys: ``fold_in(rng, position)`` per step.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ai_music_generation_tpu.models.gpt import GPT, KVCache

Array = jax.Array


def apply_top_p(logits: Array, top_p: float) -> Array:
    """Nucleus truncation: keep the smallest token set whose probability
    mass reaches ``top_p`` (ties at the threshold all kept), mask the rest
    to -inf. No reference analogue (nanoGPT samples temperature/top-k
    only, ref: nanoGPT/model.py:318-327); order of transforms matches the
    de-facto standard: temperature -> top-k -> top-p. Works on [..., V]."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    sorted_p = jnp.flip(jnp.sort(probs, axis=-1), axis=-1)
    csum = jnp.cumsum(sorted_p, axis=-1)
    # keep tokens 0..k where k is the first index with cumsum >= top_p
    k = jnp.sum(csum < top_p, axis=-1, keepdims=True)
    thr = jnp.take_along_axis(sorted_p, k, axis=-1)
    return jnp.where(probs < thr, -jnp.inf, logits)


def sample_logits(
    logits: Array,  # [B, V] float
    rng: Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[float] = None,
) -> Array:
    """Temperature + top-k (+ optional nucleus/top-p) categorical sampling
    (ref: nanoGPT/model.py:318-327; top-p is a framework extension)."""
    logits = logits.astype(jnp.float32)
    if temperature == 0.0:  # greedy
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_k is not None and top_k < logits.shape[-1]:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]  # [B, 1]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        logits = apply_top_p(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def _warn_if_gqa_einsum_trap(cfg) -> None:
    """Make the measured GQA layout trap LOUD (VERDICT r4 #5): on TPU, a
    grouped-query model decoded WITHOUT ``flat_kv`` takes the XLA einsum
    branch, whose loop-carried cache XLA pins S-minor — measured 147.8k
    tok/s at the bench shape vs 447k for MHA and 906k for the flat Pallas
    kernel (docs/PERF.md "Grouped-query attention"). Until round 5 this
    regression was silent; now every decode entry point
    (Generator / GenerationServer) says so at construction."""
    if (jax.default_backend() == "tpu"
            and cfg.kv_heads < cfg.n_head and not cfg.flat_kv):
        import warnings

        warnings.warn(
            f"GQA decode (n_kv_head={cfg.kv_heads} < n_head={cfg.n_head}) "
            "without flat_kv runs the XLA einsum branch — measured 3x "
            "SLOWER than MHA at bench scale (147.8k vs 447.4k tok/s; the "
            "flat Pallas kernel reaches 906k — docs/PERF.md 'Grouped-query "
            "attention'). Pass flat_kv=True (GPTConfig.flat_kv / "
            "--flat_kv); it now also composes with data-parallel meshes "
            "(serve/engine.py shard_map). Tensor-parallel meshes cannot "
            "use the flat kernel (KV-head lanes do not split) and are the "
            "one case where this branch is the intended fallback.",
            stacklevel=3)


class Generator:
    """Compiled batched generator for a GPT model.

    One instance caches the jitted decode program per (batch, prompt_len)
    shape. Use :meth:`generate` with right-padded prompts.
    """

    def __init__(
        self,
        model: GPT,
        max_new_tokens: int = 500,
        temperature: float = 0.8,
        top_k: Optional[int] = 200,
        refresh: Optional[int] = None,
        top_p: Optional[float] = None,
        window: Optional[int] = None,
    ):
        self.model = model
        self.block_size = model.config.block_size
        _warn_if_gqa_einsum_trap(model.config)
        self.max_new_tokens = max_new_tokens
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p
        # ``window`` is the decode KV-cache length (default: block_size).
        # Decode at batch is HBM-bound on the per-step cache read, which
        # scales with the cache length, so a window SMALLER than block_size
        # trades guaranteed context (every decoded token still sees at least
        # ``window - refresh`` committed tokens) for read bandwidth — one
        # more step of the windowed-refresh contract this Generator already
        # applies beyond block_size (docs/PERF.md "Windowed-refresh decode"
        # measured NLL flat down to 32 tokens of context; the
        # window-throughput/quality table lives in the same section). The
        # reference slides per token at full block context
        # (ref: nanoGPT/model.py:313-314); window=block_size (the default)
        # is the parity setting.
        self.window = window or self.block_size
        assert self.window <= self.block_size, (
            "decode window cannot exceed block_size (position table size)")
        # refresh budget for windowed decode beyond the cache window
        self.refresh = refresh or max(1, self.window // 2)
        assert self.refresh < self.window, "refresh must leave context"

    # jit treats `self` as a static argument: key it by VALUE so two
    # Generators with the same settings share one compiled program.
    # (Measured: protocol-scale cli/sample.py runs silently recompiled the
    # whole decode program per invocation before this — docs/PERF.md.)
    def _jit_key(self):
        return (self.model, self.max_new_tokens, self.temperature,
                self.top_k, self.refresh, self.top_p, self.window)

    def __eq__(self, other):
        return (type(other) is Generator and
                self._jit_key() == other._jit_key())

    def __hash__(self):
        return hash(self._jit_key())

    # -- jitted core -------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _generate(self, params, prompts, prompt_lens, prefill_len, rng):
        """prompts: [B, P] right-padded; prompt_lens: [B]; returns [B, total]."""
        model, cfg = self.model, self.model.config
        B, P = prompts.shape
        total = P + self.max_new_tokens
        bs = self.window  # decode cache length (== block_size by default)

        tokens = jnp.zeros((B, total), jnp.int32).at[:, :P].set(prompts)

        def step_fn(carry, t):
            """One decode step at absolute position t (committing token t)."""
            cache, last_logits, tokens = carry
            step_rng = jax.random.fold_in(rng, t)
            sampled = sample_logits(
                last_logits[:, -1, :], step_rng, self.temperature,
                self.top_k, self.top_p,
            )
            cur = jax.lax.dynamic_slice(tokens, (0, t), (B, 1))[:, 0]
            next_tok = jnp.where(t < prompt_lens, cur, sampled)
            tokens = jax.lax.dynamic_update_slice(tokens, next_tok[:, None], (0, t))
            logits, _, cache = model.apply(params, next_tok[:, None], cache=cache)
            return (cache, logits, tokens), None

        # ---- phase 0: prefill the common prompt prefix -------------------
        cache = KVCache.create(cfg, B, max_len=bs)
        logits, _, cache = model.apply(
            params, tokens[:, :prefill_len], cache=cache
        )

        # positions prefill_len .. min(total, bs) - 1 fit in the first window
        first_end = min(total, bs)
        if first_end > prefill_len:
            (cache, logits, tokens), _ = jax.lax.scan(
                step_fn, (cache, logits, tokens),
                jnp.arange(prefill_len, first_end),
            )

        # ---- windowed refresh phases beyond block_size -------------------
        t = first_end
        window = bs - self.refresh
        while t < total:
            # re-prefill the last `window` tokens at positions 0..window-1
            ctx = jax.lax.dynamic_slice(tokens, (0, t - window), (B, window))
            cache = KVCache.create(cfg, B, max_len=bs)
            logits, _, cache = model.apply(params, ctx, cache=cache)
            n_steps = min(self.refresh, total - t)
            (cache, logits, tokens), _ = jax.lax.scan(
                step_fn, (cache, logits, tokens), jnp.arange(t, t + n_steps)
            )
            t += n_steps

        return tokens

    # -- public API --------------------------------------------------------

    def generate(self, params, prompts, prompt_lens=None, seed: int = 1337):
        """Generate continuations for right-padded prompts.

        Args:
          params: model params.
          prompts: int32 [B, P], right-padded with any token (pad ignored).
          prompt_lens: int32 [B] true lengths (default: all P).
          seed: RNG seed; same seed + same inputs => identical output tokens.

        Returns:
          int32 [B, P + max_new_tokens]; sequence i's generation occupies
          positions [prompt_lens[i], ...); everything is committed text.
        """
        prompts = jnp.asarray(prompts, jnp.int32)
        if prompts.ndim == 1:
            prompts = prompts[None, :]
        B, P = prompts.shape
        if prompt_lens is None:
            prompt_lens = jnp.full((B,), P, jnp.int32)
        else:
            prompt_lens = jnp.asarray(prompt_lens, jnp.int32)
        prefill_len = int(min(int(jax.device_get(jnp.min(prompt_lens))), self.window))
        prefill_len = max(prefill_len, 1)
        # prefill_len is a STATIC jit arg (it shapes the prefill slice and
        # the scan trip count): bucket it down to a power of two so ragged
        # prompt batches compile O(log block_size) programs, not one per
        # distinct min-length — each extra program costs minutes on the
        # axon tunnel. Correctness is unchanged: positions from the bucket
        # to each prompt's true length are replayed by the scan's
        # in-prompt branch (t < prompt_lens keeps the prompt token).
        prefill_len = 1 << (prefill_len.bit_length() - 1)
        rng = jax.random.PRNGKey(seed)
        return self._generate(params, prompts, prompt_lens, prefill_len, rng)

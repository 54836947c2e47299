"""Decode feature-flag compose matrix (VERDICT r4 #8).

The decode flags form a matrix — {flat_kv, n_kv_head, kv_quantized,
window, n_expert} x {Generator, GenerationServer} — and silent wrongness
lives in the untested corners (the INVALID_POS sentinel bug came from
exactly such a corner). This file sweeps every VALID combination for byte
parity against the plain (einsum, full-window) path on the same weights,
and pins LOUD errors for the structurally-invalid ones.

Parity semantics: the reference has one sampler and no modes
(ref: nanoGPT/model.py:305-330); every opt-in decode layout must
reproduce the non-flat path's bytes at the same (seed, window) — except
kv_quantized, which is documented to change logits slightly (still
deterministic), so the quantized rows compare flat-vs-einsum at FIXED
quantization rather than quantized-vs-bf16.

Includes the ADVICE r4 #2 corner explicitly: flat_kv x window <
block_size (the composed 1.0M-config), whose windowed re-prefill path had
no token-level pin before round 5.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig

pytestmark = pytest.mark.nightly  # compile-heavy sweep (CI/judge tier)

BASE = GPTConfig(block_size=32, vocab_size=96, n_layer=2, n_head=6,
                 n_embd=384, dropout=0.0)


import functools


@functools.lru_cache(maxsize=None)
def _params_for(kh, n_expert=0):
    """GQA changes the c_attn kernel shape (H*D + 2*KH*D columns), so each
    kv-head count needs its own init; decode-layout flags (flat_kv,
    kv_quantized, window) do NOT touch weights and share it."""
    cfg = dataclasses.replace(
        BASE, n_kv_head=kh, n_expert=n_expert,
        expert_top_k=1 if n_expert else 2)
    return GPT(cfg).init(jax.random.PRNGKey(0), jnp.zeros((2, 8), jnp.int32))


PROMPTS = np.array([[1, 2, 3, 0, 0], [5, 6, 7, 8, 9], [10, 11, 0, 0, 0],
                    [20, 21, 22, 23, 0]], np.int32)
LENS = np.array([3, 5, 2, 4], np.int32)


def _gen(params, cfg, window=None, max_new=40, seed=7):
    g = Generator(GPT(cfg), max_new_tokens=max_new, temperature=0.8,
                  top_k=20, window=window)
    return np.asarray(jax.device_get(
        g.generate(params, PROMPTS, LENS, seed=seed)))


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("kh", [None, 2])  # None = MHA
@pytest.mark.parametrize("window", [None, 16])
def test_generator_flat_matches_einsum_across_matrix(quant, kh, window):
    """Every (kv_quantized, n_kv_head, window) cell: the flat-kernel path
    must be byte-identical to the einsum path on the same weights —
    including window=16 at block 32 (forces windowed re-prefills inside
    the flat path: the ADVICE r4 #2 corner) and 40 new tokens at block 32
    (forces the beyond-block refresh too)."""
    params = _params_for(kh)
    cfg_e = dataclasses.replace(BASE, kv_quantized=quant, n_kv_head=kh)
    cfg_f = dataclasses.replace(cfg_e, flat_kv=True)
    np.testing.assert_array_equal(
        _gen(params, cfg_e, window), _gen(params, cfg_f, window))


def test_generator_window_moe_compose():
    """MoE x flat x window: the expert MLP composes with the flat
    attention cache (attention and MLP are independent sublayers) — byte
    parity vs the MoE einsum path."""
    moe_params = _params_for(2, n_expert=2)
    cfg_e = dataclasses.replace(BASE, n_expert=2, expert_top_k=1,
                                n_kv_head=2)
    cfg_f = dataclasses.replace(cfg_e, flat_kv=True)
    np.testing.assert_array_equal(
        _gen(moe_params, cfg_e, 16), _gen(moe_params, cfg_f, 16))


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("kh", [None, 2])
@pytest.mark.parametrize("cache_len", [None, 16])
def test_server_flat_matches_einsum_across_matrix(quant, kh, cache_len):
    """The serving matrix: same cells through GenerationServer (ring
    cache + admission + per-slot sampling), flat vs einsum byte parity.
    cache_len=16 is the serving window lever (forces mid-request
    refreshes at max_new=20)."""
    from ai_music_generation_tpu.serve.engine import GenerationServer

    params = _params_for(kh)
    outs = []
    for flat in (False, True):
        cfg = dataclasses.replace(BASE, kv_quantized=quant, n_kv_head=kh,
                                  flat_kv=flat)
        srv = GenerationServer(GPT(cfg), params, n_slots=4,
                               ticks_per_call=4, cache_len=cache_len)
        rids = [srv.submit([1, 2, 3], max_new_tokens=20, seed=11),
                srv.submit([5] * 9, max_new_tokens=14, seed=22,
                           temperature=1.2, top_p=0.9),
                srv.submit([7, 8], max_new_tokens=8, temperature=0.0,
                           seed=3)]
        done = {r.id: r.generated for r in srv.run_until_idle()}
        outs.append([done[r] for r in rids])
    assert outs[0] == outs[1]


# ---- invalid corners must fail LOUD, not silently fall back ---------------

def test_speculative_rejects_gqa():
    """The spec verify kernel assumes full multi-head K/V; a GQA model
    must be rejected at cache creation, not silently mis-decoded."""
    from ai_music_generation_tpu.models.gpt import KVCache

    cfg = dataclasses.replace(BASE, n_kv_head=2)
    with pytest.raises(AssertionError, match="multi-head"):
        KVCache.create(cfg, 2, spec=True)


def test_flat_rejects_bad_lane_tiling():
    from ai_music_generation_tpu.models.gpt import KVCache

    cfg = dataclasses.replace(BASE, n_embd=96, flat_kv=True, n_kv_head=2)
    with pytest.raises(AssertionError, match="128"):
        KVCache.create(cfg, 2)


def test_generator_rejects_window_beyond_block():
    with pytest.raises(AssertionError, match="window"):
        Generator(GPT(BASE), window=64)


def test_server_rejects_bad_cache_len():
    from ai_music_generation_tpu.serve.engine import GenerationServer

    with pytest.raises(ValueError, match="cache_len"):
        GenerationServer(GPT(BASE), None, n_slots=2, ticks_per_call=1,
                         cache_len=4)


# ---- the GQA einsum-branch trap warning (VERDICT r4 #5) -------------------

def test_gqa_einsum_trap_warns_on_tpu(monkeypatch):
    """On TPU, constructing a decode entry point for a GQA model without
    flat_kv warns loudly (the measured 3x regression was silent before);
    flat_kv and MHA configs stay quiet."""
    import warnings as W

    from ai_music_generation_tpu.decode import generate as G

    monkeypatch.setattr(G.jax, "default_backend", lambda: "tpu")
    cfg = dataclasses.replace(BASE, n_kv_head=2)
    with pytest.warns(UserWarning, match="einsum branch"):
        Generator(GPT(cfg))
    with W.catch_warnings():
        W.simplefilter("error")
        Generator(GPT(dataclasses.replace(cfg, flat_kv=True)))
        Generator(GPT(BASE))


def test_gqa_einsum_trap_quiet_off_tpu():
    """CPU/virtual-mesh runs (every test in this suite) must not spam."""
    import warnings as W

    cfg = dataclasses.replace(BASE, n_kv_head=2)
    with W.catch_warnings():
        W.simplefilter("error")
        Generator(GPT(cfg))

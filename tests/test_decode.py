"""Decode/generation tests: determinism, conditioning, windowed refresh, sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.decode.generate import Generator, sample_logits
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject)

CFG = GPTConfig(block_size=32, vocab_size=64, n_layer=2, n_head=2, n_embd=32,
                dropout=0.0, dtype=jnp.float32)


@pytest.fixture(scope="module")
def model_and_params():
    model = GPT(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return model, params


def test_sample_logits_greedy_and_topk():
    logits = jnp.array([[0.0, 5.0, 1.0, 2.0]])
    assert int(sample_logits(logits, jax.random.PRNGKey(0), temperature=0.0)[0]) == 1
    # top_k=1 is greedy regardless of temperature
    for s in range(5):
        tok = sample_logits(logits, jax.random.PRNGKey(s), temperature=2.0, top_k=1)
        assert int(tok[0]) == 1
    # top_k=2 only ever samples indices {1, 3}
    seen = {int(sample_logits(logits, jax.random.PRNGKey(s), 1.0, 2)[0]) for s in range(20)}
    assert seen <= {1, 3}


def test_sample_logits_top_p():
    from ai_music_generation_tpu.decode.generate import apply_top_p

    # probs ~ [0.643, 0.237, 0.087, 0.032] for logits [3, 2, 1, 0]
    logits = jnp.array([[3.0, 2.0, 1.0, 0.0]])
    # top_p=0.7: {0} covers 0.643 < 0.7 -> keep {0, 1}
    masked = np.asarray(apply_top_p(logits, 0.7))[0]
    assert np.isfinite(masked[[0, 1]]).all() and np.isinf(masked[[2, 3]]).all()
    # top_p=0.5: the top token alone already covers it
    masked = np.asarray(apply_top_p(logits, 0.5))[0]
    assert np.isfinite(masked[0]) and np.isinf(masked[1:]).all()
    # top_p=1.0 keeps everything (and sample_logits treats it as off)
    assert np.isfinite(np.asarray(apply_top_p(logits, 1.0))).all()
    seen = {int(sample_logits(logits, jax.random.PRNGKey(s), 1.0, None, 0.7)[0])
            for s in range(40)}
    assert seen <= {0, 1} and len(seen) == 2
    # empirical marginal matches the renormalized nucleus distribution
    B = 4000
    toks = np.asarray(sample_logits(
        jnp.broadcast_to(logits, (B, 4)), jax.random.PRNGKey(9), 1.0, None, 0.7))
    p0 = (toks == 0).mean()
    assert abs(p0 - 0.643 / (0.643 + 0.237)) < 0.04


def test_generate_top_p_restricts_support(model_and_params):
    """Nucleus decoding only emits tokens the unrestricted run could emit,
    stays deterministic, and a tight nucleus equals greedy."""
    model, params = model_and_params
    prompts = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    gen_p = Generator(model, max_new_tokens=12, temperature=1.0, top_k=None,
                      top_p=0.9)
    out1 = np.asarray(gen_p.generate(params, prompts, seed=3))
    out2 = np.asarray(gen_p.generate(params, prompts, seed=3))
    np.testing.assert_array_equal(out1, out2)
    # top_p -> 0 keeps only the argmax: equals greedy decoding exactly
    gen_tiny = Generator(model, max_new_tokens=12, temperature=1.0,
                         top_k=None, top_p=1e-9)
    greedy = Generator(model, max_new_tokens=12, temperature=0.0, top_k=None)
    np.testing.assert_array_equal(
        np.asarray(gen_tiny.generate(params, prompts, seed=5)),
        np.asarray(greedy.generate(params, prompts, seed=5)))


def test_generate_deterministic(model_and_params):
    model, params = model_and_params
    gen = Generator(model, max_new_tokens=10, temperature=0.8, top_k=20)
    prompts = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    out1 = np.asarray(gen.generate(params, prompts, seed=7))
    out2 = np.asarray(gen.generate(params, prompts, seed=7))
    np.testing.assert_array_equal(out1, out2)
    out3 = np.asarray(gen.generate(params, prompts, seed=8))
    assert not np.array_equal(out1, out3)


def test_generate_preserves_ragged_prompts(model_and_params):
    model, params = model_and_params
    gen = Generator(model, max_new_tokens=5, temperature=1.0, top_k=None)
    prompts = np.zeros((3, 6), np.int32)
    prompts[0, :6] = [9, 8, 7, 6, 5, 4]
    prompts[1, :3] = [11, 12, 13]
    prompts[2, :1] = [20]
    lens = np.array([6, 3, 1], np.int32)
    out = np.asarray(gen.generate(params, prompts, lens, seed=0))
    assert out.shape == (3, 11)
    # each sequence's prompt region is preserved exactly
    np.testing.assert_array_equal(out[0, :6], prompts[0, :6])
    np.testing.assert_array_equal(out[1, :3], prompts[1, :3])
    np.testing.assert_array_equal(out[2, :1], prompts[2, :1])


def test_conditioning_matches_unbatched(model_and_params):
    """A ragged sequence in a batch decodes identically to the same sequence
    decoded alone with the same absolute seed (greedy => rng-independent)."""
    model, params = model_and_params
    gen = Generator(model, max_new_tokens=6, temperature=0.0)
    long_p = np.array([[3, 1, 4, 1, 5]], np.int32)
    batch = np.zeros((2, 5), np.int32)
    batch[0] = long_p[0]
    batch[1, :2] = [2, 7]
    lens = np.array([5, 2], np.int32)
    solo = np.asarray(gen.generate(params, long_p, seed=0))
    both = np.asarray(gen.generate(params, batch, lens, seed=0))
    np.testing.assert_array_equal(solo[0], both[0])


def test_windowed_refresh_beyond_block_size(model_and_params):
    model, params = model_and_params
    # block_size=32; prompt 4 + 60 new = 64 total => refresh path exercised
    gen = Generator(model, max_new_tokens=60, temperature=0.9, top_k=10)
    prompts = jnp.array([[1, 2, 3, 4]], dtype=jnp.int32)
    out = np.asarray(gen.generate(params, prompts, seed=3))
    assert out.shape == (1, 64)
    assert (out >= 0).all() and (out < CFG.vocab_size).all()
    out2 = np.asarray(gen.generate(params, prompts, seed=3))
    np.testing.assert_array_equal(out, out2)


@pytest.mark.nightly
def test_greedy_matches_naive_recompute(model_and_params):
    """KV-cache decode must equal the reference-style full-reforward loop."""
    model, params = model_and_params
    gen = Generator(model, max_new_tokens=8, temperature=0.0)
    prompt = [5, 9, 2]
    out = np.asarray(gen.generate(params, np.array([prompt], np.int32), seed=0))[0]

    seq = list(prompt)
    for _ in range(8):
        logits, _, _ = model.apply(params, jnp.asarray([seq], jnp.int32))
        seq.append(int(jnp.argmax(logits[0, -1])))
    np.testing.assert_array_equal(out, np.asarray(seq))


def test_int8_kv_cache_decode(model_and_params):
    """Quantized KV cache: runs, deterministic, and close to the fp32 path."""
    import dataclasses

    model, params = model_and_params
    cfg_q = dataclasses.replace(CFG, kv_quantized=True)
    gen_q = Generator(GPT(cfg_q), max_new_tokens=8, temperature=0.0)
    gen_f = Generator(model, max_new_tokens=8, temperature=0.0)
    prompt = np.array([[5, 9, 2, 7]], np.int32)
    out_q = np.asarray(gen_q.generate(params, prompt, seed=0))
    out_q2 = np.asarray(gen_q.generate(params, prompt, seed=0))
    out_f = np.asarray(gen_f.generate(params, prompt, seed=0))
    np.testing.assert_array_equal(out_q, out_q2)  # deterministic
    # greedy decode from a random-init model: quantization noise may flip
    # some tokens, but the prompt region must be identical
    np.testing.assert_array_equal(out_q[:, :4], out_f[:, :4])
    assert out_q.shape == out_f.shape


def test_generator_jit_cache_is_value_keyed():
    """Two Generators with identical settings must be equal and hash-equal,
    so jit reuses one compiled decode program across cli/sample.py calls
    (regression: identity-keyed self caused a silent recompile per call,
    measured 3x slower protocol sampling)."""
    from ai_music_generation_tpu.models.gpt import GPT, GPTConfig

    cfg = GPTConfig(block_size=32, vocab_size=16, n_layer=1, n_head=1, n_embd=16)
    a = Generator(GPT(cfg), max_new_tokens=8, temperature=0.8, top_k=4)
    b = Generator(GPT(cfg), max_new_tokens=8, temperature=0.8, top_k=4)
    c = Generator(GPT(cfg), max_new_tokens=9, temperature=0.8, top_k=4)
    assert a == b and hash(a) == hash(b)
    assert a != c


def _windowed_greedy_oracle(model, params, prompt, prompt_len, max_new,
                            window, refresh):
    """Reference loop for the decode-window contract: replicate Generator's
    phase structure (prefill / scan / re-prefill) with full re-forwards over
    the tokens currently in the cache window, greedy sampling."""
    total = len(prompt) + max_new
    tokens = list(prompt) + [0] * max_new
    prefill_len = 1 << (min(prompt_len, window).bit_length() - 1)
    cache_toks = tokens[:prefill_len]

    # One jitted canonical shape: right-pad to `window` and read the logits
    # at the true last position (causal attention ignores the pad; dummy
    # targets disable the last-position-only inference fast path so the
    # full [T, vocab] logits exist). The eager per-length variant cost
    # ~27 s of dispatch overhead alone.
    apply_j = jax.jit(
        lambda p, idx: model.apply(p, idx, jnp.zeros_like(idx))[0])

    def logits_last(toks):
        padded = list(toks) + [0] * (window - len(toks))
        out = apply_j(params, jnp.asarray([padded], jnp.int32))
        return out[0, len(toks) - 1]

    t = prefill_len
    first_end = min(total, window)
    while t < total:
        nxt = int(jnp.argmax(logits_last(cache_toks)))
        if t < prompt_len:
            nxt = tokens[t]
        tokens[t] = nxt
        cache_toks = cache_toks + [nxt]
        t += 1
        if t == first_end or (t > first_end and
                              (t - first_end) % refresh == 0):
            if t < total:
                cache_toks = tokens[t - (window - refresh):t]
    return tokens


def test_decode_window_matches_oracle(model_and_params):
    """window < block_size: the fused decode must equal the full-reforward
    oracle implementing the same refresh contract (greedy)."""
    model, params = model_and_params
    window, refresh, max_new = 16, 8, 40
    gen = Generator(model, max_new_tokens=max_new, temperature=0.0,
                    window=window, refresh=refresh)
    prompt = [5, 9, 2, 7]
    out = np.asarray(
        gen.generate(params, np.array([prompt], np.int32), seed=0))[0]
    ref = _windowed_greedy_oracle(
        model, params, prompt, len(prompt), max_new, window, refresh)
    np.testing.assert_array_equal(out, np.asarray(ref))


def test_decode_window_deterministic_and_ragged(model_and_params):
    """Sampled small-window decode: deterministic, prompt-preserving."""
    model, params = model_and_params
    gen = Generator(model, max_new_tokens=30, temperature=0.9, top_k=10,
                    window=16)
    prompts = np.array([[1, 2, 3, 4], [7, 7, 0, 0]], np.int32)
    lens = np.array([4, 2], np.int32)
    out = np.asarray(gen.generate(params, prompts, lens, seed=3))
    out2 = np.asarray(gen.generate(params, prompts, lens, seed=3))
    np.testing.assert_array_equal(out, out2)
    np.testing.assert_array_equal(out[0, :4], prompts[0])
    np.testing.assert_array_equal(out[1, :2], prompts[1, :2])
    assert (out >= 0).all() and (out < CFG.vocab_size).all()
    # the window is part of the jit/value key
    assert gen != Generator(model, max_new_tokens=30, temperature=0.9,
                            top_k=10, window=32)

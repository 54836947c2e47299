"""Randomized stress/property tests for the continuous-batching engines.

The hand-written serving tests pin specific scenarios (cancel, refresh,
chunked admission, stop tokens). This module hammers the same invariants
under a seeded random workload — interleaved submission waves, mid-flight
cancels, mixed budgets crossing the block-size refresh boundary — the way
production traffic actually arrives. The reference has no serving stack;
the invariants mirror its per-request generation contract
(ref: nanoGPT/sample.py:146-169 — each sample depends only on its own
prompt/seed/flags) lifted onto the batched engine.

Invariants checked:
  1. every submitted-and-not-cancelled request completes EXACTLY once;
  2. token accounting: len(generated) == budget, or the generation ends at
     the first occurrence of the request's stop token;
  3. batch-composition independence: a sample of survivors, re-run solo on
     a fresh server, reproduce their under-load output byte for byte.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from ai_music_generation_tpu.models.gpt import GPT, GPTConfig
from ai_music_generation_tpu.serve.engine import GenerationServer

pytestmark = [pytest.mark.slow, pytest.mark.nightly]  # fuzz workloads: many distinct tiny-program compiles


@pytest.fixture(scope="module")
def tiny():
    cfg = GPTConfig(block_size=64, vocab_size=50, n_layer=2, n_head=2,
                    n_embd=32, dropout=0.0, dtype=jnp.float32)
    model = GPT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return cfg, model, params


def _random_request(rng, vocab):
    plen = rng.randint(1, 40)
    kw = dict(
        prompt=[rng.randrange(1, vocab) for _ in range(plen)],
        # budgets up to 90 at block 64 force window refreshes mid-request
        max_new_tokens=rng.randint(1, 90),
        temperature=rng.choice([0.0, 0.7, 1.0, 1.4]),
        seed=rng.randint(0, 2**31 - 1),
    )
    if rng.random() < 0.3:
        kw["top_k"] = rng.choice([1, 5, 40])
    if rng.random() < 0.25:
        kw["stop_token"] = rng.randrange(0, vocab)
    return kw


def _check_budget(req, kw):
    stop = kw.get("stop_token", -1)
    stop = None if stop < 0 else stop
    gen = req.generated
    if stop is not None and stop in gen:
        assert gen[-1] == stop, (kw, gen)
        assert stop not in gen[:-1], (kw, gen)
        assert len(gen) <= kw["max_new_tokens"]
    else:
        assert len(gen) == kw["max_new_tokens"], (kw, gen)


@pytest.mark.parametrize("workload_seed", [0, 1])
def test_gpt_engine_random_workload(tiny, workload_seed):
    _, model, params = tiny
    rng = random.Random(workload_seed)
    vocab = 50
    srv = GenerationServer(model, params, n_slots=4, ticks_per_call=4,
                           admit_group=4)

    specs = {}          # rid -> submit kwargs
    cancelled = set()   # rids whose cancel() returned True
    completed = {}      # rid -> Request
    n_requests = 24

    def drain(reqs):
        for r in reqs:
            assert r.id not in completed, f"duplicate completion {r.id}"
            assert r.id not in cancelled, f"cancelled id surfaced {r.id}"
            completed[r.id] = r

    pending = n_requests
    while pending or srv.busy:
        action = rng.random()
        if pending and (action < 0.5 or not srv.busy):
            # submit a wave of 1-5 requests
            for _ in range(min(pending, rng.randint(1, 5))):
                kw = _random_request(rng, vocab)
                specs[srv.submit(**kw)] = kw
                pending -= 1
        elif action < 0.65 and specs:
            # try to cancel a random known rid; any answer is legal, but a
            # successful cancel means the id must never surface
            victim = rng.choice(list(specs))
            if victim not in completed and srv.cancel(victim):
                cancelled.add(victim)
        else:
            drain(srv.step())
    drain(srv.run_until_idle())

    assert set(completed) == set(specs) - cancelled
    for rid, req in completed.items():
        _check_budget(req, specs[rid])

    # byte-determinism of survivors, re-run alone on a fresh server
    sample = rng.sample(sorted(completed), min(4, len(completed)))
    for rid in sample:
        kw = specs[rid]
        solo_srv = GenerationServer(model, params, n_slots=4, ticks_per_call=4)
        solo_id = solo_srv.submit(**kw)
        solo = {r.id: r for r in solo_srv.run_until_idle()}[solo_id]
        assert solo.generated == completed[rid].generated, kw


def test_tunes_engine_random_workload():
    """Same random-workload invariants for the TunesFormer bar engine:
    exactly-once completion, prompt-prefix preservation, and solo-rerun
    determinism for a sample (ref contract: tunesformer/generate.py:114-153,
    one independent tune per iteration)."""
    from ai_music_generation_tpu.models.tunesformer import (
        TunesFormer,
        TunesFormerConfig,
    )
    from ai_music_generation_tpu.serve.tunes_engine import TunesServer

    cfg = TunesFormerConfig(patch_length=16, patch_size=16, patch_layers=2,
                            char_layers=2, n_embd=32, n_head=2, dropout=0.0,
                            dtype=jnp.float32)
    model = TunesFormer(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16), jnp.int32))

    rng = random.Random(7)
    prompts = ["L:1/8\nM:4/4\nK:C\nCDEF GABc|", "L:1/8\nK:D\nde fg|",
               "L:1/4\nK:G\nGA|", "S:1\nB:2\nL:1/8\nM:3/4\nK:F\nFA|"]
    srv = TunesServer(model, params, n_slots=3)
    specs, completed = {}, {}
    for _ in range(8):
        kw = dict(prompt=rng.choice(prompts),
                  max_patch=rng.randint(4, 10),
                  seed=rng.randint(0, 2**31 - 1),
                  temperature=rng.choice([0.7, 1.0, 1.2]))
        specs[srv.submit(**kw)] = kw
        if rng.random() < 0.5:
            for r in srv.step():
                assert r.id not in completed
                completed[r.id] = r
    for r in srv.run_until_idle():
        assert r.id not in completed
        completed[r.id] = r

    assert set(completed) == set(specs)
    for rid, req in completed.items():
        assert req.text.startswith(specs[rid]["prompt"]), rid

    for rid in rng.sample(sorted(completed), 2):
        kw = specs[rid]
        solo_srv = TunesServer(model, params, n_slots=3)
        sid = solo_srv.submit(**kw)
        solo = {r.id: r for r in solo_srv.run_until_idle()}[sid]
        assert solo.text == completed[rid].text, kw

"""Serving path: per-row KV cache mode, continuous-batching engine, HTTP."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig, KVCache
from ai_music_generation_tpu.serve.engine import GenerationServer


@pytest.fixture(scope="module")
def tiny():
    cfg = GPTConfig(block_size=64, vocab_size=50, n_layer=2, n_head=2,
                    n_embd=32, dropout=0.0, dtype=jnp.float32)
    model = GPT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    return cfg, model, params


@pytest.mark.nightly
@pytest.mark.parametrize("quantized", [False, True])
def test_vector_cache_matches_scalar_and_batch1(tiny, quantized):
    """Per-row cache lengths: uniform == lockstep scalar; staggered rows ==
    independent batch-1 decodes (exact, both bf16 and int8 cache modes)."""
    cfg0, _, _ = tiny
    import dataclasses
    cfg = dataclasses.replace(cfg0, kv_quantized=quantized)
    model = GPT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    B, T = 3, 10
    toks = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, cfg.vocab_size)

    cache_s = KVCache.create(cfg, B)
    cache_v = KVCache.create(cfg, B, per_row=True)
    for t in range(T):
        ls, _, cache_s = model.apply(params, toks[:, t:t + 1], cache=cache_s)
        lv, _, cache_v = model.apply(params, toks[:, t:t + 1], cache=cache_v)
        assert jnp.max(jnp.abs(ls - lv)) == 0.0

    # staggered positions go through the engine's ring admissions: greedy
    # requests with different prompt lengths, admitted into a shared server,
    # must each bit-match an independent lockstep Generator run
    srv = GenerationServer(model, params, n_slots=B, ticks_per_call=4)
    prompts = [list(map(int, toks[i, : 3 + 2 * i])) for i in range(B)]
    rids = [srv.submit(p, max_new_tokens=12, temperature=0.0, seed=0)
            for p in prompts]
    done = {r.id: r for r in srv.run_until_idle()}
    gen = Generator(model, max_new_tokens=12, temperature=0.0, top_k=None)
    for rid, p in zip(rids, prompts):
        ref = jax.device_get(
            gen.generate(params, jnp.array([p], jnp.int32)))[0, len(p):]
        assert done[rid].generated == list(ref)


# nightly (VERDICT r4 #6 re-tier): mixed-length + refresh interaction —
# the cache_len oracle and composition-independence tests keep the
# refresh semantics covered in the verification tier.
@pytest.mark.nightly
def test_engine_mixed_requests_and_refresh(tiny):
    _, model, params = tiny
    srv = GenerationServer(model, params, n_slots=4, ticks_per_call=8)
    r_short = srv.submit([1, 2, 3], max_new_tokens=20, seed=11)
    # 100 tokens at block 64 forces at least one window refresh
    r_long = srv.submit([5, 6], max_new_tokens=100, seed=22)
    r_greedy = srv.submit([7] * 30, max_new_tokens=10, seed=33, temperature=0.0)
    by_id = {r.id: r for r in srv.run_until_idle()}
    assert len(by_id[r_short].generated) == 20
    assert len(by_id[r_long].generated) == 100
    assert len(by_id[r_greedy].generated) == 10

    # greedy is RNG-free: must match the lockstep batch Generator exactly
    gen = Generator(model, max_new_tokens=10, temperature=0.0, top_k=None)
    ref = jax.device_get(
        gen.generate(params, jnp.array([[7] * 30], jnp.int32)))[0, 30:]
    assert by_id[r_greedy].generated == list(ref)


@pytest.mark.nightly  # per-slot RNG equivalence proof; stable since r2
def test_per_slot_sample_matches_batch_sampler():
    """The per-row temperature/top-k/top-p pipeline must pick the exact
    token the lockstep batch sampler's transforms pick row-by-row (same
    key + same masked logits -> same categorical draw)."""
    from ai_music_generation_tpu.decode.generate import apply_top_p
    from ai_music_generation_tpu.serve.engine import _per_slot_sample

    B, V = 6, 37
    logits = jax.random.normal(jax.random.PRNGKey(3), (B, V)) * 3.0
    temps = jnp.array([0.7, 1.0, 1.3, 0.9, 0.0, 0.8])
    top_k = jnp.array([5, 0, 200, 3, 10, 1])
    top_p = jnp.array([0.8, 0.9, 1.0, 0.5, 0.95, 0.6])
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(B, dtype=jnp.uint32))
    got = jax.device_get(_per_slot_sample(logits, keys, temps, top_k, top_p))

    for i in range(B):
        if float(temps[i]) == 0.0:
            ref = int(jnp.argmax(logits[i]))
        else:
            scaled = logits[i] / temps[i]
            k = int(top_k[i]) if int(top_k[i]) > 0 else V
            kth = jnp.sort(scaled)[::-1][min(k, V) - 1]
            masked = jnp.where(scaled < kth, -jnp.inf, scaled)
            if float(top_p[i]) < 1.0:
                masked = apply_top_p(masked[None], float(top_p[i]))[0]
            ref = int(jax.random.categorical(keys[i], masked))
        assert int(got[i]) == ref, f"row {i}"


def test_engine_top_p_near_zero_is_greedy(tiny):
    """top_p -> 0 shrinks the nucleus to the argmax: a tiny-top_p sampled
    request must byte-match the greedy request through the real engine."""
    _, model, params = tiny
    srv = GenerationServer(model, params, n_slots=2, ticks_per_call=8)
    r_p = srv.submit([3, 1, 4], max_new_tokens=24, seed=9, temperature=0.8,
                     top_p=1e-6)
    r_g = srv.submit([3, 1, 4], max_new_tokens=24, seed=77, temperature=0.0)
    by_id = {r.id: r for r in srv.run_until_idle()}
    assert by_id[r_p].generated == by_id[r_g].generated


@pytest.mark.nightly  # 8s solo; cache_len/cancel/stop oracles stay in tier
def test_engine_batch_composition_independence(tiny):
    """A request's tokens depend only on its own fields — rerunning it alone
    reproduces the output it had amid concurrent traffic."""
    _, model, params = tiny
    srv = GenerationServer(model, params, n_slots=4, ticks_per_call=8)
    rid = srv.submit([1, 2, 3], max_new_tokens=20, seed=11)
    srv.submit([9, 9], max_new_tokens=37, seed=44, temperature=1.3)
    srv.submit([4] * 12, max_new_tokens=55, seed=45)
    crowded = {r.id: r for r in srv.run_until_idle()}[rid]

    srv2 = GenerationServer(model, params, n_slots=4, ticks_per_call=8)
    rid2 = srv2.submit([1, 2, 3], max_new_tokens=20, seed=11)
    alone = {r.id: r for r in srv2.run_until_idle()}[rid2]
    assert crowded.generated == alone.generated


@pytest.mark.nightly  # admission-wave soak; cancel/queueing stay in tier
def test_engine_multi_chunk_admission(tiny):
    """An admit wave larger than ``admit_group`` splits into chunks; results
    must not depend on the chunking (same bytes as one-wave admission)."""
    _, model, params = tiny
    prompts = [[1 + i, 2 + i, 3] for i in range(12)]

    def run(admit_group):
        srv = GenerationServer(model, params, n_slots=12, ticks_per_call=4,
                               admit_group=admit_group)
        rids = [srv.submit(p, max_new_tokens=9, seed=i)
                for i, p in enumerate(prompts)]
        done = {r.id: r for r in srv.run_until_idle()}
        return [done[r].generated for r in rids]

    assert run(8) == run(64)


def test_engine_stop_token_and_queueing(tiny):
    _, model, params = tiny
    # more requests than slots: queueing + slot reuse
    srv = GenerationServer(model, params, n_slots=2, ticks_per_call=8)
    rids = [srv.submit([1 + i], max_new_tokens=12, seed=i) for i in range(5)]
    done = {r.id: r for r in srv.run_until_idle()}
    assert sorted(done) == sorted(rids)
    assert all(len(done[r].generated) == 12 for r in rids)

    srv2 = GenerationServer(model, params, n_slots=2, ticks_per_call=8)
    rs = srv2.submit([1], max_new_tokens=200, seed=5, temperature=2.0,
                     top_k=50, stop_token=0)
    req = {r.id: r for r in srv2.run_until_idle()}[rs]
    if len(req.generated) < 200:
        assert req.generated[-1] == 0
        assert 0 not in req.generated[:-1]


@pytest.mark.nightly  # >uint16 vocab fallback; exercised by GPT-2 configs
def test_large_vocab_unpacked_path(tiny):
    """vocab > 16384 disables the uint16 packing: the 3-array download path
    must produce the same contract (exercised nowhere else — every other
    fixture uses a small vocab)."""
    import dataclasses
    cfg0, _, _ = tiny
    cfg = dataclasses.replace(cfg0, vocab_size=16390)
    model = GPT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    srv = GenerationServer(model, params, n_slots=2, ticks_per_call=4)
    rid = srv.submit([1, 2, 3], max_new_tokens=10, seed=3, temperature=0.0)
    done = {r.id: r for r in srv.run_until_idle()}
    gen = Generator(model, max_new_tokens=10, temperature=0.0, top_k=None)
    ref = jax.device_get(
        gen.generate(params, jnp.array([[1, 2, 3]], jnp.int32)))[0, 3:]
    assert done[rid].generated == list(ref)


def test_engine_cancel(tiny):
    """Cancelling a queued or in-flight request frees capacity and never
    surfaces the cancelled id; survivors are unaffected (byte-identical to
    an uncancelled run of the same request)."""
    _, model, params = tiny
    srv = GenerationServer(model, params, n_slots=2, ticks_per_call=4)
    keep = srv.submit([1, 2, 3], max_new_tokens=16, seed=11)
    running = srv.submit([4, 5], max_new_tokens=40, seed=22)
    queued = srv.submit([6], max_new_tokens=16, seed=33)
    srv.step()  # admits keep+running; queued waits
    assert srv.cancel(queued)
    assert srv.cancel(running)
    assert not srv.cancel(9999)
    done = {r.id: r for r in srv.run_until_idle()}
    assert set(done) == {keep}
    srv2 = GenerationServer(model, params, n_slots=2, ticks_per_call=4)
    rid2 = srv2.submit([1, 2, 3], max_new_tokens=16, seed=11)
    alone = {r.id: r for r in srv2.run_until_idle()}[rid2]
    assert done[keep].generated == alone.generated


def test_submit_rejects_zero_budget(tiny):
    """max_new_tokens=0 would still emit one token (scan samples before the
    budget test); submit must reject it up front."""
    _, model, params = tiny
    srv = GenerationServer(model, params, n_slots=2, ticks_per_call=4)
    with pytest.raises(ValueError, match="max_new_tokens"):
        srv.submit([1, 2], max_new_tokens=0)
    with pytest.raises(ValueError, match="prompt"):
        srv.submit([], max_new_tokens=4)


def test_runner_engine_crash_fails_waiters(tiny):
    """A raised exception in engine.step() must fail pending waiters and mark
    the runner dead (not hang until timeout while /health looks green)."""
    from ai_music_generation_tpu.serve.http import EngineRunner

    _, model, params = tiny
    srv = GenerationServer(model, params, n_slots=2, ticks_per_call=4)

    def boom():
        raise RuntimeError("injected device error")

    srv.step = boom  # type: ignore[assignment]
    runner = EngineRunner(srv)
    rid = runner.submit([1, 2, 3], max_new_tokens=8, seed=1)
    req = runner.wait(rid, timeout=10)
    assert req is None
    assert runner.error is not None and "injected device error" in runner.error
    assert "engine_error" in runner.stats()
    with pytest.raises(RuntimeError, match="engine thread dead"):
        runner.submit([1, 2], max_new_tokens=8)
    runner.shutdown()


def test_http_server_generate_and_health(tiny):
    from ai_music_generation_tpu.serve.http import EngineRunner, serve

    _, model, params = tiny
    runner = EngineRunner(GenerationServer(model, params, n_slots=2,
                                           ticks_per_call=8))
    encode = lambda s: [ord(c) % 50 for c in s]
    decode = lambda toks: "".join(chr(65 + (t % 26)) for t in toks)
    httpd = serve(runner, encode, decode, port=0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        out1 = post({"tokens": [1, 2, 3], "max_new_tokens": 15, "seed": 3})
        assert len(out1["tokens"]) == 15
        assert isinstance(out1["text"], str) and len(out1["text"]) == 15
        out2 = post({"tokens": [1, 2, 3], "max_new_tokens": 15, "seed": 3})
        assert out2["tokens"] == out1["tokens"]  # reproducible under reuse

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["slots"] == 2

        # text prompt goes through the codec
        out3 = post({"prompt": "abc", "max_new_tokens": 5, "seed": 1})
        assert len(out3["tokens"]) == 5
    finally:
        httpd.shutdown()
        runner.shutdown()


def test_http_streaming_sse(tiny):
    """`"stream": true` returns Server-Sent Events: incremental chunks
    per engine step, a final done event, and the concatenation byte-equal
    to the non-streamed response for the same (prompt, seed)."""
    from ai_music_generation_tpu.serve.http import EngineRunner, serve

    _, model, params = tiny
    runner = EngineRunner(GenerationServer(model, params, n_slots=2,
                                           ticks_per_call=8))
    decode = lambda toks: "".join(chr(65 + (t % 26)) for t in toks)
    httpd = serve(runner, lambda s: [1], decode, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        body = {"tokens": [1, 2, 3], "max_new_tokens": 30, "seed": 3}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(body | {"stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        events, streamed = [], []
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "text/event-stream"
            for line in r:
                if line.startswith(b"data: "):
                    events.append(json.loads(line[6:]))
        assert events[-1].get("done") is True
        for ev in events[:-1]:
            assert ev["text"] == decode(ev["tokens"])
            streamed.extend(ev["tokens"])
        # 30 tokens at 8 ticks/call -> at least 4 incremental chunks
        assert len(events) >= 5
        assert streamed == events[-1]["tokens"] and len(streamed) == 30

        # non-streamed run of the same request must give the same bytes
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req2, timeout=120) as r:
            plain = json.loads(r.read())
        assert plain["tokens"] == streamed
    finally:
        httpd.shutdown()
        runner.shutdown()


@pytest.mark.nightly
def test_engine_sharded_over_mesh(tiny, mesh8):
    """DP serving via the first-class ``mesh=`` kwarg: slot state sharded
    over the mesh data axis, params replicated (or TP-sharded) — same bytes
    as the single-device engine, including a nucleus-filtered request."""
    _, model, params = tiny

    def run(shard: bool):
        srv = GenerationServer(model, params, n_slots=8, ticks_per_call=8,
                               mesh=mesh8 if shard else None)
        a = srv.submit([1, 2, 3], max_new_tokens=24, seed=11)
        b = srv.submit([5] * 9, max_new_tokens=40, seed=22, temperature=1.2,
                       top_p=0.9)
        return {r.id: r.generated for r in srv.run_until_idle()}, (a, b)

    plain, ids = run(False)
    sharded, ids2 = run(True)
    assert plain[ids[0]] == sharded[ids2[0]]
    assert plain[ids[1]] == sharded[ids2[1]]


def test_engine_mesh_rejects_uneven_slots(tiny, mesh8):
    _, model, params = tiny
    with pytest.raises(ValueError, match="divide evenly"):
        GenerationServer(model, params, n_slots=6, mesh=mesh8)


def test_latency_stats(tiny):
    """Per-request completion latency: stamped at submit and finished-demux,
    percentile summary exposed via latency_stats() (and /health, serve_bench)."""
    cfg, model, params = tiny
    srv = GenerationServer(model, params, n_slots=4, ticks_per_call=8)
    assert srv.latency_stats() == {"count": 0}
    for i in range(6):
        srv.submit([1, 2, 3], max_new_tokens=5, seed=i)
    done = srv.run_until_idle()
    assert len(done) == 6
    for r in done:
        assert r.finished_at > r.submitted_at > 0.0
    stats = srv.latency_stats()
    assert stats["count"] == 6
    assert 0.0 < stats["p50_s"] <= stats["p95_s"] <= stats["p99_s"] <= stats["max_s"]
    assert stats["mean_s"] > 0.0


def test_submit_validates_numeric_ranges(tiny):
    """Out-of-range params must be rejected (or coerced, for seed) at the
    submit boundary: they land in packed int32/uint32 numpy buffers on the
    ENGINE thread, where an OverflowError would kill the whole server
    (found by review; repro'd under NumPy 2)."""
    cfg, model, params = tiny
    srv = GenerationServer(model, params, n_slots=2, ticks_per_call=4)
    with pytest.raises(ValueError):
        srv.submit([1, 2], max_new_tokens=2**40)
    with pytest.raises(ValueError):
        srv.submit([1, 2], top_k=2**31)
    with pytest.raises(ValueError):
        srv.submit([1, 2], stop_token=-2**40)
    with pytest.raises(ValueError):
        srv.submit([1, 2], temperature=float("inf"))
    with pytest.raises(ValueError):
        srv.submit([1, cfg.vocab_size], max_new_tokens=3)  # token >= vocab
    # negative seed folds into uint32 instead of crashing the engine thread
    rid = srv.submit([1, 2], max_new_tokens=3, seed=-1)
    done = srv.run_until_idle()
    assert len(done) == 1 and done[0].id == rid
    assert len(done[0].generated) >= 1

    # refresh >= block_size would zero the context window (ring overflow)
    with pytest.raises(ValueError):
        GenerationServer(model, params, n_slots=2, ticks_per_call=4,
                         refresh=cfg.block_size)


@pytest.mark.nightly  # request-validation matrix; spins a full server
def test_tunes_submit_validates_ranges():
    from ai_music_generation_tpu.models.tunesformer import (
        TunesFormer,
        TunesFormerConfig,
    )
    from ai_music_generation_tpu.serve.tunes_engine import TunesServer

    cfg = TunesFormerConfig(patch_length=8, patch_size=8, patch_layers=1,
                            char_layers=1, n_embd=16, n_head=2, dropout=0.0,
                            dtype=jnp.float32)
    model = TunesFormer(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8), jnp.int32))
    srv = TunesServer(model, params, n_slots=2)
    with pytest.raises(ValueError):
        srv.submit("K:C\nab|", max_patch=0)
    with pytest.raises(ValueError):
        srv.submit("K:C\nab|", top_k=2**31)
    with pytest.raises(ValueError):
        srv.submit("K:C\nab|", temperature=float("nan"))
    rid = srv.submit("K:C\nab|", max_patch=4, seed=-7)  # coerced, not fatal
    done = srv.run_until_idle()
    assert len(done) == 1 and done[0].id == rid


@pytest.mark.nightly
def test_prewarm_compiles_and_leaves_engine_clean(tiny):
    """prewarm() walks every (wave, bucket) admission program and returns
    the engine to an empty state; traffic afterwards behaves identically
    (soak finding: a novel combination mid-traffic stalls a wave)."""
    cfg, model, params = tiny
    srv = GenerationServer(model, params, n_slots=4, ticks_per_call=4,
                           admit_group=4)
    srv.prewarm()
    assert not srv.busy and not srv._live and not srv._queue
    assert srv.latency_stats() == {"count": 0}  # stats reset
    rid = srv.submit([1, 2, 3], max_new_tokens=5, seed=11)
    done = srv.run_until_idle()
    assert [r.id for r in done] == [rid] and len(done[0].generated) >= 1


@pytest.mark.slow
def test_engine_cache_len_matches_cropped_model(tiny):
    """Sub-block cache oracle: a GenerationServer(cache_len=W) on a block-64
    model must byte-match a full-cache server on the crop_block_size(W)
    model — identical wpe rows < W, identical refresh cadence (refresh
    defaults to cache_len//2 in both), identical per-request RNG (folds
    (seed, gen), cache-independent). Exercises the refresh path: 60
    generated tokens at W=32 forces multiple window refreshes."""
    from ai_music_generation_tpu.models.gpt import crop_block_size

    cfg, model, params = tiny
    W = 32
    params_c, cfg_c = crop_block_size(params, cfg, W)
    reqs = [  # (prompt, max_new, temperature, top_k, seed)
        ([1, 2, 3], 60, 0.0, 0, 0),          # greedy, forces refreshes
        ([5] * 20, 40, 0.9, 10, 7),          # sampled across a refresh
        ([9, 4], 10, 1.2, 0, 3),             # short, no refresh
    ]

    def run(srv):
        rids = [srv.submit(p, max_new_tokens=n, temperature=t, top_k=k,
                           seed=s) for p, n, t, k, s in reqs]
        done = {r.id: r for r in srv.run_until_idle()}
        return [done[r].generated for r in rids]

    sub = run(GenerationServer(model, params, n_slots=4, ticks_per_call=8,
                               cache_len=W))
    full = run(GenerationServer(GPT(cfg_c), params_c, n_slots=4,
                                ticks_per_call=8))
    assert sub == full
    assert all(len(g) == n for g, (_, n, *_rest) in zip(sub, reqs))


def test_engine_cache_len_validation(tiny):
    cfg, model, params = tiny
    with pytest.raises(ValueError):  # cache_len > block_size
        GenerationServer(model, params, n_slots=2, ticks_per_call=4,
                         cache_len=cfg.block_size * 2)
    with pytest.raises(ValueError):  # refresh must stay < cache_len
        GenerationServer(model, params, n_slots=2, ticks_per_call=4,
                         cache_len=16, refresh=16)
    with pytest.raises(ValueError):  # ticks_per_call > default refresh (W/2)
        GenerationServer(model, params, n_slots=2, ticks_per_call=16,
                         cache_len=16)
    # default (cache_len omitted) is exact parity: full-block ring cache
    srv = GenerationServer(model, params, n_slots=2, ticks_per_call=4)
    assert srv.cache_len == cfg.block_size
    assert srv.state.cache.k[0].shape[1] == cfg.block_size

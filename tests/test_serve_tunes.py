"""TunesFormer serving: continuous-batching bar engine + HTTP front."""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import pytest

from ai_music_generation_tpu.models.tunesformer import TunesFormer, TunesFormerConfig
from ai_music_generation_tpu.serve.tunes_engine import TunesServer

pytestmark = pytest.mark.slow  # compile-heavy bar program

TINY_CFG = TunesFormerConfig(
    patch_length=16, patch_size=16, patch_layers=2, char_layers=2,
    n_embd=32, n_head=2, dropout=0.0, dtype=jnp.float32,
)

ABC = "S:1\nB:2\nL:1/8\nM:4/4\nK:C\nCDEF GABc|cBAG FEDC|"


@pytest.fixture(scope="module")
def tiny_model():
    model = TunesFormer(TINY_CFG)
    dummy = jnp.zeros((1, 16, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy)
    return model, params


@pytest.mark.nightly
def test_tunes_server_batch_composition_independence(tiny_model):
    """A request's tune depends only on its own fields — rerunning it alone
    (different slot population) reproduces the crowded output."""
    model, params = tiny_model
    srv = TunesServer(model, params, n_slots=3)
    rid = srv.submit(ABC, max_patch=10, seed=11)
    srv.submit("L:1/8\nK:D\nde fg|", max_patch=8, seed=22, temperature=0.9)
    srv.submit("L:1/4\nK:G\nGA|", max_patch=6, seed=33, top_k=4)
    crowded = {r.id: r for r in srv.run_until_idle()}[rid]

    srv2 = TunesServer(model, params, n_slots=3)
    rid2 = srv2.submit(ABC, max_patch=10, seed=11)
    alone = {r.id: r for r in srv2.run_until_idle()}[rid2]
    assert crowded.text == alone.text
    assert crowded.text.startswith(ABC)


def test_tunes_server_matches_full_forward_oracle(tiny_model):
    """The patch-KV-cached engine must byte-match a full-forward oracle
    (patch stack re-encoded per bar — the engine's original structure and
    the reference's, ref: generate.py:136-140) across staggered admissions
    and mixed sampling params."""
    import numpy as np

    from ai_music_generation_tpu.decode.tunes_generate import bar_scan
    from ai_music_generation_tpu.serve.tunes_engine import sample_ptk_vec

    model, params = tiny_model

    class FullForwardOracle(TunesServer):
        def _bar_step(self, params_, cache, adm_rows, adm_slots, adm_plens,
                      packed):
            B, L = self.n_slots, self.cfg.patch_length
            S = self.cfg.patch_size
            stacks = np.zeros((B, L, S), np.int32)
            n_vec = np.ones((B,), np.int32)
            for b, st in enumerate(self._slots):
                if st is not None:
                    stacks[b] = st.patches
                    n_vec[b] = max(st.n_patches, 1)
            packed = np.asarray(packed)
            init_tokens = jnp.asarray(packed[:, :S])
            init_lens = jnp.asarray(packed[:, 2 * S + 1])
            bar_idx = packed[:, 2 * S + 2]
            top_k = jnp.asarray(packed[:, 2 * S + 3])
            seeds = packed[:, 2 * S + 4].view(np.uint32)
            top_p = jnp.asarray(packed[:, 2 * S + 5].view(np.float32))
            temperature = jnp.asarray(packed[:, 2 * S + 6].view(np.float32))
            row_keys = jax.vmap(
                lambda s, i: jax.random.fold_in(jax.random.PRNGKey(s), i)
            )(jnp.asarray(seeds), jnp.asarray(bar_idx))

            def sample_fn(probs, idx):
                keys = jax.vmap(jax.random.fold_in)(row_keys, idx)
                return sample_ptk_vec(probs, keys, top_p, top_k, temperature)

            tokens, lens = bar_scan(
                self.model, params_, jnp.asarray(stacks), jnp.asarray(n_vec),
                init_tokens, init_lens, sample_fn)
            return cache, tokens, lens

    def drive(cls):
        srv = cls(model, params, n_slots=2)  # 4 requests -> queueing
        rids = [
            srv.submit(ABC, max_patch=10, seed=11),
            srv.submit("L:1/8\nK:D\nde fg|", max_patch=8, seed=22,
                       temperature=0.9),
            srv.submit("L:1/4\nK:G\nGA|", max_patch=6, seed=33, top_k=4),
            srv.submit(ABC, max_patch=7, seed=44, top_p=0.5),
        ]
        done = {r.id: r.text for r in srv.run_until_idle()}
        return [done[rid] for rid in rids]

    assert drive(TunesServer) == drive(FullForwardOracle)


def test_tunes_server_queueing_and_determinism(tiny_model):
    """More requests than slots: queueing + slot reuse; same-seed requests
    are byte-identical, different seeds (almost surely) differ."""
    model, params = tiny_model
    srv = TunesServer(model, params, n_slots=2)
    rids = [srv.submit(ABC, max_patch=8, seed=s) for s in (5, 5, 7, 9, 5)]
    done = {r.id: r for r in srv.run_until_idle()}
    assert sorted(done) == sorted(rids)
    texts = [done[r].text for r in rids]
    assert texts[0] == texts[1] == texts[4]
    # max_patch bounds the patch count: text is finite and non-empty
    assert all(t.startswith(ABC) for t in texts)


def test_tunes_server_control_code_filtering(tiny_model):
    model, params = tiny_model
    srv = TunesServer(model, params, n_slots=1)
    rid_show = srv.submit(ABC, max_patch=8, seed=3, show_control_code=True)
    rid_hide = srv.submit(ABC, max_patch=8, seed=3, show_control_code=False)
    done = {r.id: r for r in srv.run_until_idle()}
    assert "S:1" in done[rid_show].text
    assert not any(line.startswith(("S:", "B:", "E:"))
                   for line in done[rid_hide].text.splitlines())
    # filtering is display-only: the generated music is identical
    strip = lambda t: "".join(
        line for line in t.splitlines(keepends=True)
        if line[:2] not in ("S:", "B:", "E:"))
    assert strip(done[rid_show].text) == done[rid_hide].text


@pytest.mark.nightly
def test_bar_scan_finite_at_full_scale():
    """Full-scale (9+3/768) jitted bar_scan must produce finite logits and
    varied sampled chars. Guards the scan body whose TPU compilation
    produced NaN at trip count 32 with unroll=1 (see the unroll=2
    workaround note in decode/tunes_generate.py::bar_scan)."""
    import numpy as np

    from ai_music_generation_tpu.decode.tunes_generate import (
        bar_scan,
        prepare_patch_state,
        sample_top_p_top_k_temperature,
    )
    from ai_music_generation_tpu.tokenizers.patchilizer import Patchilizer

    cfg = TunesFormerConfig(dropout=0.0, dtype=jnp.bfloat16)
    model = TunesFormer(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 32), jnp.int32))
    p = Patchilizer()
    L, S = cfg.patch_length, cfg.patch_size
    pp, _ = prepare_patch_state(p, ABC, L, S)
    B = 2
    patches = np.zeros((B, L, S), np.int32)
    patches[:, : len(pp)] = np.asarray(pp)
    init_tokens = np.zeros((B, S), np.int32)
    init_tokens[:, 0] = Patchilizer.bos_token_id
    init_lens = jnp.ones((B,), jnp.int32)
    rng = jax.random.PRNGKey(5)

    @jax.jit
    def run(params):
        def fn(probs, idx):
            return sample_top_p_top_k_temperature(
                probs, jax.random.fold_in(rng, idx[0]), 0.8, 8, 1.2)

        return bar_scan(model, params, jnp.asarray(patches),
                        jnp.full((B,), len(pp), jnp.int32),
                        jnp.asarray(init_tokens), init_lens, fn)

    toks, lens = run(params)
    toks = np.asarray(toks)
    assert (np.asarray(lens) > 1).all()
    # sampled chars must vary (the miscompile produced constant zeros)
    assert len(set(toks[0, 1:16].tolist())) > 2


def test_tunes_server_cancel(tiny_model):
    model, params = tiny_model
    srv = TunesServer(model, params, n_slots=1)
    keep = srv.submit(ABC, max_patch=8, seed=3)
    queued = srv.submit(ABC, max_patch=8, seed=4)
    finished = list(srv.step())
    assert srv.cancel(queued)
    assert not srv.cancel(12345)
    finished += srv.run_until_idle()
    assert {r.id for r in finished} == {keep}


def test_tunes_http_server(tiny_model):
    from ai_music_generation_tpu.serve.http import EngineRunner, serve_tunes

    model, params = tiny_model
    runner = EngineRunner(TunesServer(model, params, n_slots=2))
    httpd = serve_tunes(runner, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        def post(payload):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                return json.loads(r.read())

        out1 = post({"prompt": ABC, "max_patch": 8, "seed": 3})
        assert out1["text"].startswith(ABC)
        out2 = post({"prompt": ABC, "max_patch": 8, "seed": 3})
        assert out2["text"] == out1["text"]

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            health = json.loads(r.read())
        assert health["slots"] == 2
    finally:
        httpd.shutdown()
        runner.shutdown()


def test_tunes_prewarm(tiny_model):
    """prewarm() compiles the bar program via a dummy tune and leaves the
    engine empty (GPT analogue: GenerationServer.prewarm)."""
    model, params = tiny_model
    from ai_music_generation_tpu.serve.tunes_engine import TunesServer

    srv = TunesServer(model, params, n_slots=2)
    srv.prewarm()
    assert not srv.busy and not srv._live and not srv._queue
    assert srv.latency_stats() == {"count": 0}
    rid = srv.submit("K:C\nab|", max_patch=3, seed=5)
    done = srv.run_until_idle()
    assert [r.id for r in done] == [rid]

"""Serving soak test: one long-lived GPT engine under many load waves.

The serving benches measure one warm pass; production serving runs for
hours. This soak drives ONE GenerationServer through ``--waves``
differently-seeded full loads (relay replay-cache safe) and checks what a
long-lived process must keep true:

- every submitted request finishes, with generated tokens within its
  budget (host/device slot accounting cannot drift);
- engine bookkeeping returns to empty between waves (no leaked slots,
  queue entries, live-request table entries, or cancel markers);
- per-wave throughput and latency stay flat (no compile/layout creep);
- host RSS growth over the run is bounded (no per-request leaks — the
  10k-entry latency window is the only intentional accumulator).

Run:  python docs/experiments/serve_soak.py [--waves 8] [--requests 2048]
      [--n_slots 1024]
Results: appended at the bottom of this file after each run.
"""

from __future__ import annotations

import argparse
import resource
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.models.gpt import GPT, GPTConfig
from ai_music_generation_tpu.serve.engine import GenerationServer


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--waves", type=int, default=8)
    ap.add_argument("--requests", type=int, default=2048)
    ap.add_argument("--n_slots", type=int, default=1024)
    ap.add_argument("--max_new", type=int, default=128)
    ap.add_argument("--prewarm", action="store_true",
                    help="compile all admission/decode programs up front")
    a = ap.parse_args()

    cfg = GPTConfig(block_size=256, vocab_size=128, n_layer=6, n_head=6,
                    n_embd=384, dropout=0.0, kv_quantized=True)
    model = GPT(cfg)
    salt = int(time.time()) & 0x7FFFFF
    params = model.init(jax.random.PRNGKey(salt),
                        jnp.zeros((1, cfg.block_size), jnp.int32))
    srv = GenerationServer(model, params, n_slots=a.n_slots,
                           ticks_per_call=64, admit_group=64)
    if a.prewarm:
        t0 = time.perf_counter()
        srv.prewarm()
        print(f"prewarm: {time.perf_counter() - t0:.1f}s", flush=True)

    def load(seed: int) -> dict:
        gen = np.random.default_rng(seed)
        budgets = {}
        for i in range(a.requests):
            plen = int(gen.integers(4, 49))
            rid = srv.submit(
                gen.integers(1, cfg.vocab_size, size=plen).tolist(),
                max_new_tokens=int(gen.integers(a.max_new // 2, a.max_new + 1)),
                temperature=0.8, top_k=64, seed=i)
            budgets[rid] = None
        t0 = time.perf_counter()
        done = srv.run_until_idle()
        wall = time.perf_counter() - t0
        assert len(done) == a.requests, (len(done), a.requests)
        toks = 0
        for r in done:
            assert 1 <= len(r.generated) <= r.max_new_tokens, (
                r.id, len(r.generated), r.max_new_tokens)
            assert r.id in budgets
            toks += len(r.generated)
        # bookkeeping must return to empty between waves
        assert not srv.busy
        assert all(s is None for s in srv._slots), "leaked slot"
        assert not srv._queue and not srv._live and not srv._cancelled
        return {"tok_s": toks / wall, "wall": wall}

    print(f"salt {salt}  slots {a.n_slots}  {a.requests} req/wave", flush=True)
    base_rss = rss_mb()
    rows = []
    for w in range(a.waves):
        srv.reset_stats()
        r = load(salt + 1000 * (w + 1))
        lat = srv.latency_stats()
        rows.append(r["tok_s"])
        print(f"wave {w}: {r['tok_s']/1e3:.1f}k tok/s  wall {r['wall']:.2f}s"
              f"  p50 {lat.get('p50_s')}s p99 {lat.get('p99_s')}s"
              f"  rss +{rss_mb() - base_rss:.0f} MB", flush=True)

    warm = rows[1:] or rows
    spread = (max(warm) - min(warm)) / max(warm)
    print(f"soak ok: {a.waves} waves x {a.requests} requests; warm-wave "
          f"throughput spread {100 * spread:.1f}%; "
          f"rss growth {rss_mb() - base_rss:.0f} MB", flush=True)


if __name__ == "__main__":
    main()


# Soak log
# --------
# 2026-08-17 (round 3, follow-up with --prewarm): GenerationServer.prewarm()
#   compiles all (wave, bucket) admission programs + the decode scan in
#   81.7 s up front; the subsequent 6 x 2048-request soak then shows NO
#   mid-run compile stall (all waves 128-175k tok/s, warm spread 1.5%,
#   p50 0.91 s / p99 1.14 s) and ZERO RSS growth across the whole traffic
#   run. cli/serve.py --prewarm=True enables it at server startup.
# 2026-08-17 (round 3, v5e via axon tunnel): 8 waves x 2048 requests at
#   1024 slots. Every wave finished with exact accounting (no leaked
#   slots/queue/live entries; every generation within its budget). Wave 0
#   = compile (22.4 s, +310 MB RSS: XLA programs + runtime buffers).
#   Wave 3 ran at 34k with a +54 MB RSS step — a prompt-length mix that
#   first exercised an uncompiled (wave, bucket) admission program; all
#   other warm waves sat at 175.4-177.8k tok/s (~1.4% spread) with p50
#   0.90 s / p99 1.13 s and ZERO further RSS growth over waves 4-7: no
#   per-request leaks. Takeaway for production: pre-warm every admission
#   bucket (prompt lengths 4..block) before taking traffic, or accept one
#   slow wave per novel bucket.

"""Serving-throughput benchmark for the continuous-batching engine.

Measures aggregate decode throughput (generated tokens / wall second) of
``serve.engine.GenerationServer`` under a realistic open-loop load: many
requests with mixed prompt lengths and generation lengths, admitted as
slots free up. This is the serving analogue of ``bench.py``'s batch decode
number — the reference has no serving path at all (its closest shape is
the fixed-batch sampler, ref: nanoGPT/sample.py:146-169), so the comparison
target is our own lockstep batch-decode roofline.

Usage::

    python -m ai_music_generation_tpu.cli.serve_bench \
        --n_slots=2048 --requests=4096 --max_new=256

    python -m ai_music_generation_tpu.cli.serve_bench \
        --engine=tunes --n_slots=256 --requests=512

Prints one JSON line with tokens/sec (or tunes/min) plus the phase
breakdown. Both modes follow the warm-long-lived-server protocol
(docs/SERVING.md): a differently-seeded load compiles and converges
layouts; the second load on the SAME server is timed.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.models.gpt import GPT, GPTConfig
from ai_music_generation_tpu.serve.engine import GenerationServer


def bench_tunes(args) -> dict:
    """TunesFormer serving throughput (reference-scale 9+3/768 model)."""
    from ai_music_generation_tpu.models.tunesformer import (
        TunesFormer,
        TunesFormerConfig,
    )
    from ai_music_generation_tpu.serve.tunes_engine import TunesServer

    cfg = TunesFormerConfig(dropout=0.0, dtype=jnp.bfloat16)
    model = TunesFormer(cfg)
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, cfg.patch_length, cfg.patch_size), jnp.int32))
    prompt = "S:2\nB:9\nE:4\nB:9\nL:1/8\nM:3/4\nK:D\n de|"

    srv = TunesServer(model, params, n_slots=args.n_slots)
    for i in range(args.n_slots):  # warm pass: compiles + layout convergence
        srv.submit(prompt, max_patch=args.max_patch, seed=10_000 + i)
    srv.run_until_idle()
    srv.reset_stats()  # warm-pass latencies include compiles

    for i in range(args.requests):
        srv.submit(prompt, max_patch=args.max_patch, seed=i)
    t0 = time.perf_counter()
    finished = list(srv.run_until_idle())
    wall = time.perf_counter() - t0
    assert len(finished) == args.requests
    chars = sum(len(r.text) - len(prompt) for r in finished)
    result = {
        "metric": "tunesformer_serve_throughput",
        "value": round(len(finished) / wall * 60, 1),
        "unit": "tunes/min",
        "requests": len(finished),
        "gen_chars": chars,
        "wall_s": round(wall, 2),
        "n_slots": args.n_slots,
        "max_patch": args.max_patch,
        "latency": srv.latency_stats(),
    }
    print(json.dumps(result))
    return result


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--engine", choices=["gpt", "tunes"], default="gpt")
    ap.add_argument("--max_patch", type=int, default=32,
                    help="tunes engine: patches per tune")
    ap.add_argument("--n_slots", type=int, default=2048)
    ap.add_argument("--ticks_per_call", type=int, default=64)
    ap.add_argument("--admit_group", type=int, default=64)
    ap.add_argument("--requests", type=int, default=4096)
    ap.add_argument("--max_new", type=int, default=256)
    ap.add_argument("--block_size", type=int, default=256)
    ap.add_argument("--vocab_size", type=int, default=128)
    ap.add_argument("--n_layer", type=int, default=6)
    ap.add_argument("--n_head", type=int, default=6)
    ap.add_argument("--n_embd", type=int, default=384)
    ap.add_argument("--kv_quantized", action="store_true",
                    help="int8 KV cache (halves decode HBM traffic)")
    ap.add_argument("--n_kv_head", type=int, default=0,
                    help="GQA: KV heads (0 = n_head/MHA). With --flat_kv, "
                    "decode runs the Pallas flat-cache kernel "
                    "(docs/PERF.md 'Grouped-query attention')")
    ap.add_argument("--flat_kv", action="store_true",
                    help="flat [B,S,KH*D] ring cache owned by the GQA "
                    "decode kernel (requires KH*head_dim %% 128 == 0)")
    ap.add_argument("--cache_len", type=int, default=0,
                    help="ring-cache length; 0 = block_size (parity). "
                    "Smaller = decode-window lever, docs/PERF.md")
    # default is salted per process: the relay result-caches identical
    # program+input replays across processes, so a fixed-seed re-run of the
    # same load reports cache-hit times (verify skill, round-3 additions);
    # pass an explicit --seed only to reproduce a specific load shape
    ap.add_argument("--seed", type=int,
                    default=int(time.time()) & 0x7FFFFF)
    args = ap.parse_args(argv)
    if args.engine == "tunes":
        return bench_tunes(args)

    cfg = GPTConfig(
        block_size=args.block_size, vocab_size=args.vocab_size,
        n_layer=args.n_layer, n_head=args.n_head, n_embd=args.n_embd,
        dropout=0.0, kv_quantized=args.kv_quantized,
        n_kv_head=args.n_kv_head or None, flat_kv=args.flat_kv,
    )
    model = GPT(cfg)
    params = model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, args.block_size), jnp.int32))

    def submit_load(srv, load_seed: int) -> None:
        # mixed open-loop load: prompt lengths 4..48, generation lengths
        # 0.5x..1x max_new, all submitted upfront (admission happens as
        # slots free, exercising the wave-admit path repeatedly)
        gen = np.random.default_rng(load_seed)
        for i in range(args.requests):
            plen = int(gen.integers(4, 49))
            prompt = gen.integers(1, cfg.vocab_size, size=plen).tolist()
            srv.submit(
                prompt,
                max_new_tokens=int(
                    gen.integers(args.max_new // 2, args.max_new + 1)),
                temperature=0.8, top_k=64, seed=i)

    # ONE long-lived server (the production shape). Pass 1 compiles every
    # (wave, bucket) program AND pays the server's first-steps layout
    # convergence (the first jitted calls on fresh buffers trigger
    # relay-side layout-conversion work, measured ~9 s at 4096 slots);
    # pass 2 on the SAME server is the steady state and is timed.
    # DIFFERENT load seed per pass: the axon relay caches identical-input
    # program calls and would report impossible speeds on an exact replay
    # (docs/PERF.md "Environment caveats").
    srv = GenerationServer(
        model, params, n_slots=args.n_slots,
        ticks_per_call=args.ticks_per_call, admit_group=args.admit_group,
        cache_len=args.cache_len or None)
    submit_load(srv, args.seed + 1)
    t0 = time.perf_counter()
    srv.run_until_idle()
    cold_wall = time.perf_counter() - t0

    srv.reset_stats()  # warm-pass latencies include compiles
    submit_load(srv, args.seed)
    t0 = time.perf_counter()
    finished = list(srv.run_until_idle())
    wall = time.perf_counter() - t0
    stats = dict(srv.stats)
    assert len(finished) == args.requests, (len(finished), args.requests)

    gen_tokens = sum(len(r.generated) for r in finished)
    result = {
        "metric": "serve_decode_throughput",
        "value": round(gen_tokens / wall, 1),
        "unit": "tok/s",
        "requests": len(finished),
        "gen_tokens": gen_tokens,
        "wall_s": round(wall, 2),
        "cold_wall_s": round(cold_wall, 2),
        "n_slots": args.n_slots,
        "ticks_per_call": args.ticks_per_call,
        "admit_group": args.admit_group,
        "kv_quantized": args.kv_quantized,
        "n_kv_head": args.n_kv_head or args.n_head,
        "flat_kv": args.flat_kv,
        "cache_len": srv.cache_len,
        "phases": {k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in stats.items()},
        "latency": srv.latency_stats(),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()

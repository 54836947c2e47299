"""Headline benchmark: batched autoregressive ABC decode throughput per chip.

North-star target (BASELINE.md): >= 50,000 ABC tokens/sec/chip on a v5e.
Protocol mirrors the reference eval (ref: nanoGPT/sample.py:27,33-37):
baby-GPT music model (6L/6H/384d, the irishman/bach config scale,
ref: nanoGPT/config/bach_512_context.py), 500 new tokens per tune,
temperature 0.8, top_k 200 — but batched through the jitted KV-cache decode
loop instead of one tune at a time.

Flagship decode config (round 5): grouped-query attention KH=2 over the
flat-cache Pallas decode kernel (GPTConfig.n_kv_head=2, flat_kv=True,
ops/gqa_decode.py) at decode window 128 (Generator(window=128): every
token attends to >= 128 committed context tokens within the 256 block,
halving the per-step cache read — the measured HBM roofline of decode).
The reference model is MHA with full-block attention; both deltas are
disclosed and carry MEASURED quality contracts (docs/PERF.md):
  - GQA KH=2 vs KH=6 trained on the identical corpus/schedule/seed —
    final val loss 1.3022 vs 1.3016, teacher NLL and every
    inner/conditioned similarity delta inside the MHA 95% CIs
    ("Grouped-query attention"); 3x smaller KV cache.
  - window 128 vs 256 measured ON THE TRAINED KH=2 FLAGSHIP ITSELF
    (round 5, ADVICE r4 #1): teacher NLL 1.2988 vs 1.3093 (flat/better),
    87.6% same-seed token agreement, every structural-similarity delta
    inside the window-256 95% MoEs ("Decode-window contract").
Reference-architecture comparison points at this protocol, same barrier
discipline (docs/PERF.md): MHA einsum full-window 448.8k tok/s; flagship
at full window (256) 906.1k; composed with window 128: 1,035.9k
(docs/experiments/window_flat_probe.py). The 908k full-window figure
reproduces on a TRAINED checkpoint (realpath_bench_r5.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig

BASELINE_TOKENS_PER_SEC = 50_000.0

# flagship sampling config: baby GPT at irishman-char scale
BATCH = 4096
PROMPT_LEN = 8
MAX_NEW = 500
# int8 KV cache halves decode HBM traffic (the bottleneck): measured
# 363k tok/s vs 260k with the bf16 cache on v5e; GQA KH=2 shrinks it a
# further 3x and decodes through the flat-cache Pallas kernel with the
# 2-D decode-QKV layout fix and kernel-owned int8 quantize/scale writes
# (906.1k vs 447k MHA); window 128 halves the remaining per-step read
# (1,035.9k — see module docstring for both quality contracts).
# Deterministic at fixed seed; documented opt-ins (GPTConfig.kv_quantized
# / n_kv_head / flat_kv, Generator(window=...), models/gpt.py KVCache).
CONFIG = GPTConfig(
    block_size=256, vocab_size=128, n_layer=6, n_head=6, n_embd=384,
    dropout=0.0, bias=False, dtype=jnp.bfloat16, kv_quantized=True,
    n_kv_head=2, flat_kv=True,
)
WINDOW = 128


def main():
    model = GPT(CONFIG)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, CONFIG.block_size), jnp.int32)
    )
    gen = Generator(model, max_new_tokens=MAX_NEW, temperature=0.8, top_k=200,
                    window=WINDOW)

    # Per-process salt: the axon relay result-caches identical program+input
    # replays ACROSS processes, so a fixed seed re-run reports cache-hit
    # times, not device times (verify skill, round-3 additions).
    salt = int(time.time()) & 0x7FFFFFFF
    rng = jax.random.PRNGKey(salt)
    prompts = jax.random.randint(rng, (BATCH, PROMPT_LEN), 0, CONFIG.vocab_size)

    def barrier(x):
        # block_until_ready is acked before device completion under the
        # relay (observed 13x early, 2026-08-17); fetching a VALUE computed
        # from the output cannot be — the single device stream executes
        # dispatches in order, so this blocks until the queued work is done.
        return float(jnp.sum(x[:, -1]))

    # compile + warmup
    out = gen.generate(params, prompts, seed=salt)
    barrier(out)

    n_iters = 3
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = gen.generate(params, prompts, seed=salt + 1 + i)
    barrier(out)
    dt = (time.perf_counter() - t0) / n_iters

    tokens_per_sec = BATCH * MAX_NEW / dt
    print(
        json.dumps(
            {
                "metric": "abc_decode_tokens_per_sec_per_chip",
                "value": round(tokens_per_sec, 1),
                "unit": "tokens/s",
                "vs_baseline": round(tokens_per_sec / BASELINE_TOKENS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

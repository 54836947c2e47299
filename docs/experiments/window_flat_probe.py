"""Window x flat-GQA-kernel composition probe + post-QKV-fix MHA refresh.

Two measurements at the headline bench protocol (bench.py: batch 4096,
500 new tokens, T=0.8/top-k 200, salted seeds, value-fetch barrier):

  (a) the round-4 flagship (GQA KH=2, flat_kv Pallas kernel, int8 cache)
      at decode window 256 (parity default) / 192 / 128 — the flagship is
      at its per-token cache-read bandwidth bound (PERF.md batch-8192
      probe), and ``Generator(window=W)`` shrinks exactly that read, so
      the two levers should multiply. The window quality contract
      (PERF.md "Decode-window contract": NLL +0.009 @192, +0.057 @128,
      structural metrics flat) is a property of the windowed-refresh
      SEMANTICS, not of the attention kernel — the flat path decodes the
      same token stream as the einsum path at equal window (greedy
      agreement 98.7%, bf16 fusion noise only), so the measured deltas
      carry over unchanged.

  (b) the MHA einsum path (KH=6, int8, window 256) re-measured: the
      round-3 447.4k number predates the 2-D decode-QKV layout fix
      (models/gpt.py), which the PERF.md ladder notes "benefits every
      other cached decode path" — this pins the post-fix MHA number.

Throughput-only (quality tables already exist for both levers).
Run: python docs/experiments/window_flat_probe.py   (real chip, ~20 min:
each (config, window) is a fresh multi-minute axon compile)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig

BATCH, PROMPT_LEN, MAX_NEW = 4096, 8, 500

CONFIGS = [
    # (label, GPTConfig kwargs, windows)
    ("flagship KH=2 flat", dict(n_kv_head=2, flat_kv=True), (256, 192, 128)),
    ("MHA KH=6 einsum", dict(), (256,)),
]

BASE = dict(block_size=256, vocab_size=128, n_layer=6, n_head=6, n_embd=384,
            dropout=0.0, bias=False, dtype=jnp.bfloat16, kv_quantized=True)

results = []
for label, extra, windows in CONFIGS:
    cfg = GPTConfig(**BASE, **extra)
    model = GPT(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.block_size), jnp.int32))
    for w in windows:
        gen = Generator(model, max_new_tokens=MAX_NEW, temperature=0.8,
                        top_k=200, window=w)
        salt = int(time.time()) & 0x7FFFFFFF
        prompts = jax.random.randint(
            jax.random.PRNGKey(salt), (BATCH, PROMPT_LEN), 0, cfg.vocab_size)

        def barrier(x):
            # value fetch == real completion barrier under the axon relay
            # (verify skill round-3 additions; block_until_ready lies)
            return float(jnp.sum(x[:, -1]))

        barrier(gen.generate(params, prompts, seed=salt))  # compile+warm
        n_iters = 3
        t0 = time.perf_counter()
        for i in range(n_iters):
            out = gen.generate(params, prompts, seed=salt + 1 + i)
        barrier(out)
        dt = (time.perf_counter() - t0) / n_iters
        tps = BATCH * MAX_NEW / dt
        row = {"config": label, "window": w, "tok_s": round(tps, 1),
               "s_per_call": round(dt, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

print(json.dumps({"all": results}))

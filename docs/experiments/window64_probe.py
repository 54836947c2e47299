"""Window-64 probe: is there headroom below the 1.0M window-128 config?

Round-5 question: window 128 composed with the flat GQA kernel measured
1,035.9k tok/s (window_flat_probe.py) with a MEASURED-FLAT quality
contract on the trained KH=2 flagship (realpath_bench_r5.py: NLL 1.2988
vs 1.3093 full-window). Window 64 halves the per-step cache read again
but doubles the windowed re-prefill cadence (refresh = window/2 = 32
decoded tokens per phase) — window 192 was already a measured WASH on
the flagship for exactly that reason, so this probes whether 64 still
wins and, separately, what it costs in quality.

Two measurements:
  (a) throughput at the headline bench protocol (bench.py: batch 4096,
      8-token prompts, 500 new tokens, T=0.8/top-k 200, salted seeds,
      value-fetch barrier) at window 64, random-init weights — directly
      comparable to the probe's 1,035.9k @128 / 906.1k @256 rows.
  (b) quality on the TRAINED KH=2 checkpoint (/tmp/r5_kh2, val 1.3022):
      64 conditioned 200-token generations at seed 42, window 64 vs the
      window-256 reference stream — same-seed token agreement + teacher
      NLL (the realpath_bench_r5.py method, same prompts/slice).

Run: python docs/experiments/window64_probe.py   (real chip; ~2 fresh
multi-minute axon compiles)
"""
import json
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig

BATCH, PROMPT_LEN, MAX_NEW = 4096, 8, 500
CFG = GPTConfig(block_size=256, vocab_size=128, n_layer=6, n_head=6,
                n_embd=384, dropout=0.0, bias=False, dtype=jnp.bfloat16,
                kv_quantized=True, n_kv_head=2, flat_kv=True)

# ---- (a) throughput at the bench protocol, window 64 ----------------------
model = GPT(CFG)
params = jax.jit(model.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, CFG.block_size), jnp.int32))
gen = Generator(model, max_new_tokens=MAX_NEW, temperature=0.8, top_k=200,
                window=64)
salt = int(time.time()) & 0x7FFFFFFF
prompts = jax.random.randint(
    jax.random.PRNGKey(salt), (BATCH, PROMPT_LEN), 0, CFG.vocab_size)
barrier = lambda x: float(jnp.sum(x[:, -1]))
barrier(gen.generate(params, prompts, seed=salt))  # compile + warm
t0 = time.perf_counter()
out = None
for i in range(3):
    out = gen.generate(params, prompts, seed=salt + 1 + i)
barrier(out)
dt = (time.perf_counter() - t0) / 3
tps = BATCH * MAX_NEW / dt
print(json.dumps({"window": 64, "tok_per_sec": round(tps, 1),
                  "ms_per_pass": round(dt * 1000, 1)}), flush=True)

# ---- (b) quality on the trained KH=2 checkpoint ---------------------------
OUT = "/tmp/r5_kh2"
DS = "/tmp/r5data/irishman"
if not (os.path.isdir(OUT) and os.path.isdir(DS)):
    print("trained checkpoint absent — retrain via realpath_bench_r5.py",
          flush=True)
    sys.exit(0)

import dataclasses

from ai_music_generation_tpu.cli import sample as sample_cli
from ai_music_generation_tpu.train import checkpoint as ckpt_lib

state, _meta = ckpt_lib.load_checkpoint(OUT, ckpt_lib.BEST)
tcfg = dataclasses.replace(
    sample_cli.load_model(OUT, "bfloat16", "resume", True, True)[0].config)
tmodel = GPT(tcfg)
tparams = jax.device_put(state["params"])

with open(os.path.join(DS, "meta.pkl"), "rb") as f:
    dmeta = pickle.load(f)
stoi = dmeta["stoi"]

# identical corpus recipe/seed to realpath_bench_r5.py — same prompts,
# same validation slice (tunes[2700:2700+NGEN])
import random

from ai_music_generation_tpu.cli.random_baselines import (
    KEY_SIGNATURES, TIME_SIGNATURES, random_note_seq)

rng_t = random.Random(7)
tunes = []
for i in range(3000):
    measures = [" ".join(random_note_seq(rng_t, rng_t.randint(3, 6)))
                for _ in range(rng_t.randint(8, 24))]
    tunes.append(
        f"X:{i}\nL:1/8\nM:{rng_t.choice(TIME_SIGNATURES)}\n"
        f"K:{rng_t.choice(KEY_SIGNATURES)}\n" + " | ".join(measures) + " |")

PROMPT, NEW, NGEN = 48, 200, 64
wprompts = np.stack([
    np.asarray([stoi[ch] for ch in tune[:PROMPT]], np.int32)
    for tune in tunes[2700:2700 + NGEN]])
gens = {}
for w in (256, 64):
    wgen = Generator(tmodel, max_new_tokens=NEW, temperature=0.8, top_k=200,
                     window=w)
    gens[w] = np.asarray(jax.device_get(
        wgen.generate(tparams, jnp.asarray(wprompts), seed=42)))
agree = float(np.mean(gens[256][:, PROMPT:] == gens[64][:, PROMPT:]))
print(f"[KH=2 window] token agreement 64 vs 256: {agree:.4f}", flush=True)

@jax.jit
def seq_nll(p, toks):
    logits, _, _ = tmodel.apply(p, toks[:, :-1], toks[:, 1:])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, toks[:, 1:, None], axis=2)[..., 0]
    return nll[:, PROMPT - 1:]

for w in (256, 64):
    nll = float(jnp.mean(seq_nll(tparams, jnp.asarray(gens[w]))))
    print(f"[KH=2 window] teacher NLL window {w}: {nll:.4f}", flush=True)
print("DONE", flush=True)

"""Round-5 real-path protocol bench on the FLAGSHIP (KH=2 flat-kv) config.

VERDICT r4 weak #1: every decode lever since round 2 (GQA flat kernel,
2-D QKV fix, kernel-owned quantize, window) was measured only through
bench.py (random weights, 8-token prompts); the user-facing number on
record was the round-2 MHA 153k tok/s. This script closes that gap:

 1. trains a KH=2 checkpoint at the bench config (6L/6H/384d, block 256 —
    the docs/experiments/gqa_quality.py recipe: same corpus generator,
    seed, schedule) with the dataset laid out so ``cli/sample.py``'s
    char-conditioning mode drives it exactly like the reference protocol
    (ref: nanoGPT/sample.py:27,33-37 — 1,000 samples x 500 new tokens,
    temperature 0.8, top_k 200, 4 conditioning measures, seed 1337);
 2. runs the REAL user path — ``cli.sample.main()`` with
    ``--kv_quantized --flat_kv`` — twice: pass 1 compiles + writes the
    protocol samples; pass 2 (different seed: the axon relay result-caches
    identical replays, verify skill) is the timed pass. Reported tok/s
    counts the 500 generated tokens per sample over the FULL wall time of
    the pass (checkpoint already loaded; includes tokenize, device decode,
    windowed refreshes, host decode, normalization, file writes);
 3. repeats at the microbench shape (batch 4096) for the decomposition
    against bench.py's headline, plus a bench.py-style random-prompt run
    on the SAME trained weights;
 4. re-measures the decode-window quality contract ON THIS KH=2 MODEL
    (ADVICE r4 #1: the published window numbers were measured on the MHA
    KH=6 model): teacher NLL + token agreement at window 128 vs 256.

Results land in docs/PERF.md "Real-path protocol bench (round 5)".
Run: python docs/experiments/realpath_bench_r5.py  [--reuse]
"""
import json
import os
import random
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ai_music_generation_tpu.cli.random_baselines import (
    KEY_SIGNATURES, TIME_SIGNATURES, random_note_seq)

# ---- corpus (identical generator recipe/seed to gqa_quality.py), laid out
# under data_root=/tmp/r5data with dataset name "irishman" so the sampler's
# char validation-conditioning mode applies (cli/sample.py prompt_iter)
rng = random.Random(7)
tunes = []
for i in range(3000):
    measures = [" ".join(random_note_seq(rng, rng.randint(3, 6)))
                for _ in range(rng.randint(8, 24))]
    tunes.append(
        f"X:{i}\nL:1/8\nM:{rng.choice(TIME_SIGNATURES)}\n"
        f"K:{rng.choice(KEY_SIGNATURES)}\n" + " | ".join(measures) + " |")

from ai_music_generation_tpu.data.prepare import prepare_char

DATA_ROOT = "/tmp/r5data"
DS = os.path.join(DATA_ROOT, "irishman")
os.makedirs(DS, exist_ok=True)
entries = [{"abc notation": t} for t in tunes]
prepare_char(entries[:2700], entries[2700:], DS)
VAL_JSON = os.path.join(DATA_ROOT, "validation.json")
with open(VAL_JSON, "w") as f:
    json.dump([{"id": i, "abc notation": t}
               for i, t in enumerate(tunes[2700:])], f)

# ---- train KH=2 at the bench config (gqa_quality.py schedule) -------------
from ai_music_generation_tpu.train.trainer import DEFAULTS, Trainer

OUT = "/tmp/r5_kh2"
c = dict(DEFAULTS)
c.update(dataset="irishman", data_root=DATA_ROOT, out_dir=OUT,
         n_layer=6, n_head=6, n_embd=384, block_size=256, batch_size=32,
         n_kv_head=2,
         gradient_accumulation_steps=1, max_iters=1500, eval_interval=500,
         eval_iters=20, log_interval=250, warmup_iters=40,
         lr_decay_iters=1500, learning_rate=1e-3, min_lr=1e-4,
         dtype="bfloat16", dropout=0.0)
if "--reuse" in sys.argv and os.path.exists(f"{OUT}/last_iter_ckpt"):
    c.update(init_from="resume", max_iters=0)
t = Trainer(c)
if t.iter_num < 1500:
    t.run()
losses = t.estimate_loss()
print(f"[KH=2 flagship] final train {losses['train']:.4f} "
      f"val {losses['val']:.4f}", flush=True)
del t  # free the train-state device buffers before protocol-scale decode

# ---- the real user path: cli.sample at the reference protocol -------------
from ai_music_generation_tpu.cli import sample as sample_cli

def run_protocol(num_samples, batch_size, seed, write):
    argv = [f"--out_dir={OUT}", f"--data_root={DATA_ROOT}",
            "--dataset=irishman", "--tokens_format=char",
            f"--validation_path={VAL_JSON}", "--n_conditional_measures=4",
            f"--num_samples={num_samples}", "--max_new_tokens=500",
            "--temperature=0.8", "--top_k=200", f"--seed={seed}",
            f"--batch_size={batch_size}", "--kv_quantized=True",
            "--flat_kv=True"]
    t0 = time.perf_counter()
    results = sample_cli.main(argv)
    dt = time.perf_counter() - t0
    return results, dt

# conditioning uses the first min(num_samples, len(val)) prompts; the
# protocol's 1000 samples fit the 300-tune val set by reuse? No — the
# reference conditions one sample per validation file (ref sample.py:
# 114-138); with 300 val tunes the protocol run is 300 prompts. To hold
# the SAMPLE COUNT at the protocol's 1000 (and the round-2 comparison's
# 4096), the val json above repeats prompts via sampler id reuse below.
with open(VAL_JSON) as f:
    val_entries = json.load(f)
def widen_val(n):
    reps = [dict(e, id=f"{e['id']}_{k}") for k in range(-(-n // len(val_entries)))
            for e in val_entries][:n]
    with open(VAL_JSON, "w") as f:
        json.dump(reps, f)

for label, n, b in (("protocol-1000", 1000, 1000),
                    ("microbench-shape-4096", 4096, 4096)):
    widen_val(n)
    # pass 1: compile + write protocol samples at the protocol seed
    _, dt_cold = run_protocol(n, b, 1337, True)
    # pass 2: warm, differently seeded (relay replay-cache defense)
    salt = 1337 + (int(time.time()) % 1000) + 1
    results, dt = run_protocol(n, b, salt, True)
    toks = n * 500
    print(f"[real-path {label}] cold {dt_cold:.1f}s, warm {dt:.1f}s -> "
          f"{toks / dt / 1000:.1f}k tok/s "
          f"({len(results)} samples)", flush=True)

# ---- same weights, bench.py protocol (random 8-token prompts) -------------
from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT
import dataclasses

state, meta = None, None
from ai_music_generation_tpu.train import checkpoint as ckpt_lib
state, meta = ckpt_lib.load_checkpoint(OUT, ckpt_lib.BEST)
cfg = dataclasses.replace(
    sample_cli.load_model(OUT, "bfloat16", "resume", True, True)[0].config)
model = GPT(cfg)
params = jax.device_put(state["params"])
BATCH, MAX_NEW = 4096, 500
salt = int(time.time()) & 0x7FFFFFFF
prompts = jax.random.randint(
    jax.random.PRNGKey(salt), (BATCH, 8), 0, cfg.vocab_size)
gen = Generator(model, max_new_tokens=MAX_NEW, temperature=0.8, top_k=200)
barrier = lambda x: float(jnp.sum(x[:, -1]))
barrier(gen.generate(params, prompts, seed=salt))  # compile
t0 = time.perf_counter()
out = None
for i in range(3):
    out = gen.generate(params, prompts, seed=salt + 1 + i)
barrier(out)
dt = (time.perf_counter() - t0) / 3
print(f"[microbench same-weights] {BATCH * MAX_NEW / dt / 1000:.0f}k tok/s "
      f"({dt * 1000:.0f} ms / {MAX_NEW} tok x {BATCH})", flush=True)

# ---- ADVICE r4 #1: window-quality re-measure ON the KH=2 flagship ---------
import pickle

with open(os.path.join(DS, "meta.pkl"), "rb") as f:
    dmeta = pickle.load(f)
itos = dmeta["itos"]
stoi = dmeta["stoi"]
PROMPT, NEW, NGEN = 48, 200, 64
wprompts = np.stack([
    np.asarray([stoi[ch] for ch in tune[:PROMPT]], np.int32)
    for tune in tunes[2700:2700 + NGEN]])
gens = {}
for w in (256, 128):
    wgen = Generator(model, max_new_tokens=NEW, temperature=0.8, top_k=200,
                     window=w)
    gens[w] = np.asarray(jax.device_get(
        wgen.generate(params, jnp.asarray(wprompts), seed=42)))
agree = float(np.mean(gens[256][:, PROMPT:] == gens[128][:, PROMPT:]))
print(f"[KH=2 window] token agreement 128 vs 256: {agree:.4f}", flush=True)

@jax.jit
def seq_nll(p, toks):
    logits, _, _ = model.apply(p, toks[:, :-1], toks[:, 1:])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, toks[:, 1:, None], axis=2)[..., 0]
    return nll[:, PROMPT - 1:]

for w in (256, 128):
    nll = float(jnp.mean(seq_nll(params, jnp.asarray(gens[w]))))
    print(f"[KH=2 window] teacher NLL window {w}: {nll:.4f}", flush=True)
print("DONE", flush=True)

"""Quality bound for the int8 KV-cache headline (VERDICT r3 #3).

The bench headline (BENCH_r03: 447k tok/s/chip) decodes with the
scale-factored int8 KV cache; tests tolerate token flips vs the bf16 cache
but no quality delta had been MEASURED on a trained model. This experiment
applies the refresh_quality.py methodology to the int8-vs-bf16 cache choice
at the bench config (6L/6H/384d, block 256 — ref protocol:
nanoGPT/sample.py:27,33-37):

  (a) token agreement between int8-cache and bf16-cache decodes
      (same params, same prompts, same seed);
  (b) teacher NLL of each generation set under the same trained model
      (full-forward scoring, fp32 log-softmax) — the "did quality move"
      axis;
  (c) structural metrics (inner + conditioned melodic/rhythmic similarity)
      of both generation sets through the eval pipeline — the reference's
      own quality harness (ref: abc_to_midi_wav_and_aesthetics.py:163-208);
  (d) decode throughput of BOTH cache types at the bench shape
      (batch 4096 x 500 new tokens), device-honest barriers + salted seeds
      per the verify skill. Skip with --no-bench (compile costs minutes).

Results land in docs/PERF.md next to the headline number.
"""
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

# ---- corpus + training (identical recipe to refresh_quality.py) -----------
rng = random.Random(7)
tunes = []
for i in range(3000):
    measures = [" ".join(random_note_seq(rng, rng.randint(3, 6)))
                for _ in range(rng.randint(8, 24))]
    tunes.append(
        f"X:{i}\nL:1/8\nM:{rng.choice(TIME_SIGNATURES)}\n"
        f"K:{rng.choice(KEY_SIGNATURES)}\n" + " | ".join(measures) + " |")

from ai_music_generation_tpu.data.prepare import prepare_char

os.makedirs("/tmp/int8_ds", exist_ok=True)
entries = [{"abc notation": t} for t in tunes]
prepare_char(entries[:2700], entries[2700:], "/tmp/int8_ds")

from ai_music_generation_tpu.train.trainer import DEFAULTS, Trainer

c = dict(DEFAULTS)
# the bench model shape (bench.py CONFIG), trained till the loss is real
c.update(dataset="int8_ds", data_root="/tmp", out_dir="/tmp/int8_out",
         n_layer=6, n_head=6, n_embd=384, block_size=256, batch_size=32,
         gradient_accumulation_steps=1, max_iters=1500, eval_interval=500,
         eval_iters=20, log_interval=250, warmup_iters=40,
         lr_decay_iters=1500, learning_rate=1e-3, min_lr=1e-4,
         dtype="bfloat16", dropout=0.0)
if "--reuse" in sys.argv and os.path.exists("/tmp/int8_out/last_iter_ckpt"):
    c.update(init_from="resume", max_iters=0)  # load, don't retrain
t = Trainer(c)
if t.iter_num < 1500:
    t.run()
params = jax.device_get(t.state.params)

import dataclasses

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT

cfg_bf16 = dataclasses.replace(t.gpt_config, kv_quantized=False)
cfg_int8 = dataclasses.replace(t.gpt_config, kv_quantized=True)
model_bf16, model_int8 = GPT(cfg_bf16), GPT(cfg_int8)

# ---- conditioned prompts from val tunes (ref sample.py prompt protocol) ---
import pickle

with open("/tmp/int8_ds/meta.pkl", "rb") as f:
    meta = pickle.load(f)
stoi, itos = meta["stoi"], meta["itos"]
PROMPT, NEW, NGEN = 48, 200, 64
val_tunes = tunes[2700:2700 + NGEN]
prompts = np.stack([
    np.asarray([stoi[ch] for ch in tune[:PROMPT]], np.int32)
    for tune in val_tunes])

gens = {}
for name, model in (("bf16", model_bf16), ("int8", model_int8)):
    gen = Generator(model, max_new_tokens=NEW, temperature=0.8, top_k=200)
    toks = jax.device_get(gen.generate(params, jnp.asarray(prompts), seed=42))
    gens[name] = np.asarray(toks)

agree = float(np.mean(gens["bf16"][:, PROMPT:] == gens["int8"][:, PROMPT:]))
print(f"token agreement int8 vs bf16 (same seed): {agree:.4f}")

# ---- teacher NLL of the generated tokens ----------------------------------
score_model = model_bf16


@jax.jit
def seq_nll(p, toks):
    # pass targets to get ALL-position logits (targets=None is the
    # last-position-only inference fast path, models/gpt.py:392-396)
    logits, _, _ = score_model.apply(p, toks[:, :-1], toks[:, 1:])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, toks[:, 1:, None], axis=2)[..., 0]
    return nll[:, PROMPT - 1:]  # NLL of generated positions only


for name in ("bf16", "int8"):
    nll = float(jnp.mean(seq_nll(params, jnp.asarray(gens[name]))))
    print(f"teacher NLL of {name}-cache generations: {nll:.4f}")

# ---- structural metrics via the eval pipeline -----------------------------
from ai_music_generation_tpu.eval.pipeline import EvalPipeline, PipelineConfig

for name in ("bf16", "int8"):
    d = f"/tmp/int8_abc_{name}"
    os.makedirs(d, exist_ok=True)
    for i, row in enumerate(gens[name]):
        text = "".join(itos[int(x)] for x in row)
        text = text.split("$")[0].rstrip()
        if not text.rstrip().endswith("|"):
            text += " |"
        with open(os.path.join(d, f"sample_{i}.abc"), "w") as f:
            f.write(text + "\n")
    # metrics_processes=1: this is a flat script with no __main__ guard —
    # the spawn Pool would re-import it and re-run the training from the top
    pipe = EvalPipeline(PipelineConfig(
        abc_input_folder=d, base_output_dir=f"/tmp/int8_eval_{name}",
        render_wav=False, n_conditioned_measures=2, metrics_processes=1))
    summary = pipe.run()
    agg = summary["aggregated_similarities"]
    print(f"structural metrics [{name}] (n_failed={summary['n_failed']}):")
    for mode in ("inner", "conditioned"):
        stats = agg.get(mode)
        if stats and "mean" in stats:
            print(f"  {mode}: " + "  ".join(
                f"{col} {stats['mean'][col]:.4f}±{stats['moe'][col]:.4f}"
                for col in stats["mean"]))

# ---- throughput at the bench shape (both caches) --------------------------
if "--no-bench" not in sys.argv:
    BATCH, MAX_NEW = 4096, 500
    salt = int(time.time()) & 0x7FFFFFFF
    bench_prompts = jax.random.randint(
        jax.random.PRNGKey(salt), (BATCH, 8), 0, t.gpt_config.vocab_size)

    def barrier(x):
        return float(jnp.sum(x[:, -1]))

    for name, model in (("bf16", model_bf16), ("int8", model_int8)):
        gen = Generator(model, max_new_tokens=MAX_NEW, temperature=0.8,
                        top_k=200)
        barrier(gen.generate(params, bench_prompts, seed=salt))  # compile
        t0 = time.perf_counter()
        out = None
        for i in range(3):
            out = gen.generate(params, bench_prompts, seed=salt + 1 + i)
        barrier(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"throughput [{name}]: {BATCH * MAX_NEW / dt / 1000:.0f}k tok/s"
              f" ({dt * 1000:.0f} ms / {MAX_NEW} tok x {BATCH})")
print("DONE")

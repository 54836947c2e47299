"""Quality contract for grouped-query attention (GQA, GPTConfig.n_kv_head).

GQA shrinks the decode KV cache by n_head/n_kv_head but — unlike the int8
cache or the decode window — it changes the MODEL: fewer K/V projections
are trained, so the question is whether the bench-scale architecture loses
quality, not whether a numeric approximation drifts. Protocol (the
int8_quality.py / refresh_quality.py methodology, adapted to an
architecture A/B):

  (a) train KH=6 (MHA baseline == the bench model recipe) and KH=2 on the
      IDENTICAL corpus / schedule / init seed; report final train/val loss;
  (b) generate 64 conditioned tunes from each (same val prompts, same
      sampling seed) and score BOTH sets under the KH=6 teacher
      (full-forward fp32 log-softmax NLL of generated positions) — a
      common yardstick across the two architectures;
  (c) structural metrics (inner + conditioned similarity) of both sets
      through the eval pipeline — the reference's own quality harness
      (ref: scripts/common/abc_to_midi_wav_and_aesthetics.py:163-208);
  (d) decode throughput of both at the bench shape (batch 4096 x 500 new,
      int8 cache, device-honest barriers + salted seeds per the verify
      skill). Skip with --no-bench (each new shape compiles for minutes).

Results land in docs/PERF.md ("Grouped-query attention" section).
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

# ---- corpus (identical recipe/seed to int8_quality.py) ---------------------
rng = random.Random(7)
tunes = []
for i in range(3000):
    measures = [" ".join(random_note_seq(rng, rng.randint(3, 6)))
                for _ in range(rng.randint(8, 24))]
    tunes.append(
        f"X:{i}\nL:1/8\nM:{rng.choice(TIME_SIGNATURES)}\n"
        f"K:{rng.choice(KEY_SIGNATURES)}\n" + " | ".join(measures) + " |")

from ai_music_generation_tpu.data.prepare import prepare_char

os.makedirs("/tmp/gqa_ds", exist_ok=True)
entries = [{"abc notation": t} for t in tunes]
prepare_char(entries[:2700], entries[2700:], "/tmp/gqa_ds")

from ai_music_generation_tpu.train.trainer import DEFAULTS, Trainer

BASE = dict(DEFAULTS)
BASE.update(dataset="gqa_ds", data_root="/tmp",
            n_layer=6, n_head=6, n_embd=384, block_size=256, batch_size=32,
            gradient_accumulation_steps=1, max_iters=1500, eval_interval=500,
            eval_iters=20, log_interval=250, warmup_iters=40,
            lr_decay_iters=1500, learning_rate=1e-3, min_lr=1e-4,
            dtype="bfloat16", dropout=0.0)

trainers = {}
for kh in (6, 2):
    c = dict(BASE)
    c.update(out_dir=f"/tmp/gqa_out_kh{kh}", n_kv_head=0 if kh == 6 else kh)
    if "--reuse" in sys.argv and os.path.exists(
            f"/tmp/gqa_out_kh{kh}/last_iter_ckpt"):
        c.update(init_from="resume", max_iters=0)
    t = Trainer(c)
    if t.iter_num < 1500:
        t.run()
    trainers[kh] = t
    losses = t.estimate_loss()
    print(f"[KH={kh}] final train loss {losses['train']:.4f} "
          f"val loss {losses['val']:.4f}")

import dataclasses

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT

models, params = {}, {}
for kh, t in trainers.items():
    models[kh] = GPT(dataclasses.replace(t.gpt_config, kv_quantized=True))
    params[kh] = jax.device_get(t.state.params)

# ---- conditioned prompts from val tunes (ref sample.py prompt protocol) ---
import pickle

with open("/tmp/gqa_ds/meta.pkl", "rb") as f:
    meta = pickle.load(f)
stoi, itos = meta["stoi"], meta["itos"]
PROMPT, NEW, NGEN = 48, 200, 64
val_tunes = tunes[2700:2700 + NGEN]
prompts = np.stack([
    np.asarray([stoi[ch] for ch in tune[:PROMPT]], np.int32)
    for tune in val_tunes])

gens = {}
for kh in (6, 2):
    gen = Generator(models[kh], max_new_tokens=NEW, temperature=0.8,
                    top_k=200)
    toks = jax.device_get(
        gen.generate(params[kh], jnp.asarray(prompts), seed=42))
    gens[kh] = np.asarray(toks)

# ---- teacher NLL under the MHA baseline (common yardstick) ----------------
score_model = GPT(dataclasses.replace(trainers[6].gpt_config,
                                      kv_quantized=False))


@jax.jit
def seq_nll(p, toks):
    # targets passed to get ALL-position logits (targets=None is the
    # last-position-only inference fast path, models/gpt.py)
    logits, _, _ = score_model.apply(p, toks[:, :-1], toks[:, 1:])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, toks[:, 1:, None], axis=2)[..., 0]
    return nll[:, PROMPT - 1:]  # NLL of generated positions only


for kh in (6, 2):
    nll = float(jnp.mean(seq_nll(params[6], jnp.asarray(gens[kh]))))
    print(f"KH=6-teacher NLL of KH={kh} generations: {nll:.4f}")

# ---- structural metrics via the eval pipeline -----------------------------
from ai_music_generation_tpu.eval.pipeline import EvalPipeline, PipelineConfig

for kh in (6, 2):
    d = f"/tmp/gqa_abc_kh{kh}"
    os.makedirs(d, exist_ok=True)
    for i, row in enumerate(gens[kh]):
        text = "".join(itos[int(x)] for x in row)
        text = text.split("$")[0].rstrip()
        if not text.rstrip().endswith("|"):
            text += " |"
        with open(os.path.join(d, f"sample_{i}.abc"), "w") as f:
            f.write(text + "\n")
    # metrics_processes=1: flat script, no __main__ guard (spawn Pool
    # would re-import and re-run the training from the top)
    pipe = EvalPipeline(PipelineConfig(
        abc_input_folder=d, base_output_dir=f"/tmp/gqa_eval_kh{kh}",
        render_wav=False, n_conditioned_measures=2, metrics_processes=1))
    summary = pipe.run()
    agg = summary["aggregated_similarities"]
    print(f"structural metrics [KH={kh}] (n_failed={summary['n_failed']}):")
    for mode in ("inner", "conditioned"):
        stats = agg.get(mode)
        if stats and "mean" in stats:
            print(f"  {mode}: " + "  ".join(
                f"{col} {stats['mean'][col]:.4f}±{stats['moe'][col]:.4f}"
                for col in stats["mean"]))

# ---- throughput at the bench shape (both architectures, int8 cache) -------
if "--no-bench" not in sys.argv:
    BATCH, MAX_NEW = 4096, 500
    salt = int(time.time()) & 0x7FFFFFFF
    bench_prompts = jax.random.randint(
        jax.random.PRNGKey(salt), (BATCH, 8), 0,
        trainers[6].gpt_config.vocab_size)

    def barrier(x):
        return float(jnp.sum(x[:, -1]))

    for kh in (6, 2):
        gen = Generator(models[kh], max_new_tokens=MAX_NEW, temperature=0.8,
                        top_k=200)
        barrier(gen.generate(params[kh], bench_prompts, seed=salt))  # compile
        t0 = time.perf_counter()
        out = None
        for i in range(3):
            out = gen.generate(params[kh], bench_prompts, seed=salt + 1 + i)
        barrier(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"throughput [KH={kh}]: "
              f"{BATCH * MAX_NEW / dt / 1000:.0f}k tok/s "
              f"({dt * 1000:.0f} ms / {MAX_NEW} tok x {BATCH})")
print("DONE")

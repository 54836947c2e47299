"""GQA quality + throughput contract at the bench config.

n_kv_head (models/gpt.py) shrinks the decode KV-cache read — the measured
HBM roofline of the decode step (ops/decode_attention_int8.py verdict) — by
n_head/n_kv_head. Unlike the int8/window levers it changes the ARCHITECTURE,
so the honest comparison is train-quality at equal recipe, not token
agreement: train full-MHA / GQA-2 / MQA-1 variants of the bench model
(6L/6H/384d, block 256) on the same corpus + seed for the same iters, then
compare (a) final val loss, (b) NLL of each model's conditioned generations
under the FULL-MHA teacher (one fixed scorer across variants — per-model
NLLs would not be comparable; the axis the reference protocol cares about
is whether samples look like the corpus to a strong scorer, ref:
nanoGPT/sample.py:27,33-37), (c) structural
similarity metrics through the eval pipeline, and (d) decode throughput at
the bench shape (batch 4096 x 500 new tokens, int8 cache — the headline
configuration).

Usage: python docs/experiments/gqa_quality.py [--reuse] [--no-bench]
Results land in docs/PERF.md ("GQA decode lever").
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

# ---- corpus (identical recipe to int8_quality.py / refresh_quality.py) ----
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

VARIANTS = {"mha6": 0, "gqa2": 2, "mqa1": 1}  # n_kv_head (0 = full)
ITERS = 1500

models, params_by, val_loss = {}, {}, {}
gpt_cfgs = {}
for name, kvh in VARIANTS.items():
    c = dict(DEFAULTS)
    c.update(dataset="gqa_ds", data_root="/tmp", out_dir=f"/tmp/gqa_out_{name}",
             n_layer=6, n_head=6, n_embd=384, block_size=256, batch_size=32,
             n_kv_head=kvh, gradient_accumulation_steps=1, max_iters=ITERS,
             eval_interval=500, eval_iters=20, log_interval=250,
             warmup_iters=40, lr_decay_iters=ITERS, learning_rate=1e-3,
             min_lr=1e-4, dtype="bfloat16", dropout=0.0, seed=1337)
    if "--reuse" in sys.argv and os.path.exists(
            f"/tmp/gqa_out_{name}/last_iter_ckpt"):
        c.update(init_from="resume", max_iters=0)
    t = Trainer(c)
    if t.iter_num < ITERS:
        t.run()
    losses = t.estimate_loss()
    val_loss[name] = float(losses["val"])
    params_by[name] = jax.device_get(t.state.params)
    gpt_cfgs[name] = t.gpt_config
    print(f"[{name}] n_kv_head={kvh or 6} val loss after {ITERS} it: "
          f"{val_loss[name]:.4f}")

import dataclasses

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT

# ---- conditioned generations, scored by the full-MHA teacher --------------
import pickle

with open("/tmp/gqa_ds/meta.pkl", "rb") as f:
    meta = pickle.load(f)
stoi, itos = meta["stoi"], meta["itos"]
PROMPT, NEW, NGEN = 48, 200, 64
val_tunes = tunes[2700:2700 + NGEN]
prompts = np.stack([
    np.asarray([stoi[ch] for ch in tune[:PROMPT]], np.int32)
    for tune in val_tunes])

teacher_cfg = dataclasses.replace(gpt_cfgs["mha6"], kv_quantized=False)
teacher = GPT(teacher_cfg)
teacher_params = params_by["mha6"]


@jax.jit
def teacher_nll(toks):
    logits, _, _ = teacher.apply(teacher_params, toks[:, :-1], toks[:, 1:])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, toks[:, 1:, None], axis=2)[..., 0]
    return nll[:, PROMPT - 1:]


gens = {}
for name in VARIANTS:
    model = GPT(dataclasses.replace(gpt_cfgs[name], kv_quantized=True))
    gen = Generator(model, max_new_tokens=NEW, temperature=0.8, top_k=200)
    toks = jax.device_get(
        gen.generate(params_by[name], jnp.asarray(prompts), seed=42))
    gens[name] = np.asarray(toks)
    nll = float(jnp.mean(teacher_nll(jnp.asarray(toks))))
    print(f"teacher(NLL by mha6) of {name} generations: {nll:.4f}")

# ---- structural metrics via the eval pipeline ------------------------------
from ai_music_generation_tpu.eval.pipeline import EvalPipeline, PipelineConfig

for name in VARIANTS:
    d = f"/tmp/gqa_abc_{name}"
    os.makedirs(d, exist_ok=True)
    for i, row in enumerate(gens[name]):
        text = "".join(itos[int(x)] for x in row)
        text = text.split("$")[0].rstrip()
        if not text.rstrip().endswith("|"):
            text += " |"
        with open(os.path.join(d, f"sample_{i}.abc"), "w") as f:
            f.write(text + "\n")
    # metrics_processes=1: flat script, no __main__ guard (verify skill)
    pipe = EvalPipeline(PipelineConfig(
        abc_input_folder=d, base_output_dir=f"/tmp/gqa_eval_{name}",
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

# ---- throughput at the bench shape (int8 cache, all variants) --------------
if "--no-bench" not in sys.argv:
    BATCH, MAX_NEW = 4096, 500
    salt = int(time.time()) & 0x7FFFFFFF
    bench_prompts = jax.random.randint(
        jax.random.PRNGKey(salt), (BATCH, 8),
        0, gpt_cfgs["mha6"].vocab_size)

    def barrier(x):
        return float(jnp.sum(x[:, -1]))

    for name in VARIANTS:
        model = GPT(dataclasses.replace(gpt_cfgs[name], kv_quantized=True))
        gen = Generator(model, max_new_tokens=MAX_NEW, temperature=0.8,
                        top_k=200)
        barrier(gen.generate(params_by[name], bench_prompts, seed=salt))
        t0 = time.perf_counter()
        out = None
        for i in range(3):
            out = gen.generate(params_by[name], bench_prompts,
                               seed=salt + 1 + i)
        barrier(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"throughput [{name}]: {BATCH * MAX_NEW / dt / 1000:.0f}k tok/s"
              f" ({dt * 1000:.0f} ms / {MAX_NEW} tok x {BATCH})")
print("DONE")

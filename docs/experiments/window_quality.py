"""Decode-window sweep: quality + throughput vs the KV-cache window size.

The batch-decode step is HBM-bound on the per-step cache read, which scales
with the cache window (docs/PERF.md roofline). ``Generator(window=W)``
decodes with a W-length cache (< block_size), guaranteeing every token at
least ``W - refresh`` committed tokens of context — one more step of the
windowed-refresh contract already measured in round 2 (NLL flat down to 32
tokens of context on this corpus class).

This sweep measures, on the trained bench-config model (/tmp/spec_out from
docs/experiments/spec_decode.py), for window in {256, 192, 128}:

  (a) teacher NLL of each window's generations (same prompts, seed) — the
      "did quality move" axis (ref protocol: nanoGPT/sample.py:27,33-37);
  (b) structural metrics (inner + conditioned similarities) via the eval
      pipeline (ref: abc_to_midi_wav_and_aesthetics.py:163-208);
  (c) decode throughput at the bench shape (batch 4096 x 500 new tokens),
      device-trace timed (wall clock lies under the axon relay).

Results land in docs/PERF.md "Decode-window contract". Skip the throughput
pass with --no-bench (each window is a fresh multi-minute compile).

Run: python docs/experiments/window_quality.py  (needs /tmp/spec_out)
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from ai_music_generation_tpu.train import checkpoint as ckpt_lib

assert ckpt_lib.checkpoint_exists("/tmp/spec_out", ckpt_lib.BEST), \
    "run docs/experiments/spec_decode.py first (trains /tmp/spec_out)"
state, meta = ckpt_lib.load_checkpoint("/tmp/spec_out", ckpt_lib.BEST)

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig

params = jax.device_put(state["params"])
cfg = GPTConfig(dropout=0.0, dtype=jnp.bfloat16, kv_quantized=True,
                **meta["model_args"])
model = GPT(cfg)
WINDOWS = tuple(int(w) for w in os.environ.get(
    "WINDOWS", "256,192,128").split(","))

# ---- conditioned prompts from the val corpus ------------------------------
import pickle

with open("/tmp/spec_ds/meta.pkl", "rb") as f:
    dmeta = pickle.load(f)
itos = dmeta["itos"]
val = np.memmap("/tmp/spec_ds/val.bin", dtype=np.uint16, mode="r")
PROMPT, NEW, NGEN = 48, 200, 64
rng = np.random.default_rng(7)
offs = rng.integers(0, len(val) - PROMPT, NGEN)
prompts = np.stack([np.asarray(val[o:o + PROMPT], np.int32) for o in offs])

gens = {}
for w in WINDOWS:
    gen = Generator(model, max_new_tokens=NEW, temperature=0.8, top_k=200,
                    window=w)
    toks = jax.device_get(gen.generate(params, jnp.asarray(prompts), seed=42))
    gens[w] = np.asarray(toks)
    if w != WINDOWS[0]:
        agree = float(np.mean(gens[WINDOWS[0]][:, PROMPT:] == gens[w][:, PROMPT:]))
        print(f"token agreement window {w} vs {WINDOWS[0]}: {agree:.4f}",
              flush=True)

# ---- teacher NLL of the generated tokens ----------------------------------
@jax.jit
def seq_nll(p, toks):
    logits, _, _ = model.apply(p, toks[:, :-1], toks[:, 1:])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, toks[:, 1:, None], axis=2)[..., 0]
    return nll[:, PROMPT - 1:]

for w in WINDOWS:
    nll = float(jnp.mean(seq_nll(params, jnp.asarray(gens[w]))))
    print(f"teacher NLL [window {w}]: {nll:.4f}", flush=True)

# ---- structural metrics via the eval pipeline -----------------------------
from ai_music_generation_tpu.eval.pipeline import EvalPipeline, PipelineConfig

for w in WINDOWS:
    d = f"/tmp/win_abc_{w}"
    os.makedirs(d, exist_ok=True)
    for i, row in enumerate(gens[w]):
        text = "".join(itos[int(x)] for x in row)
        text = text.split("$")[0].rstrip()
        if not text.rstrip().endswith("|"):
            text += " |"
        with open(os.path.join(d, f"sample_{i}.abc"), "w") as f:
            f.write(text + "\n")
    # metrics_processes=1: flat script, no __main__ guard (verify skill)
    pipe = EvalPipeline(PipelineConfig(
        abc_input_folder=d, base_output_dir=f"/tmp/win_eval_{w}",
        render_wav=False, n_conditioned_measures=2, metrics_processes=1))
    summary = pipe.run()
    agg = summary["aggregated_similarities"]
    print(f"structural metrics [window {w}] (n_failed={summary['n_failed']}):",
          flush=True)
    for mode in ("inner", "conditioned"):
        stats = agg.get(mode)
        if stats and "mean" in stats:
            print("  " + mode + ": " + "  ".join(
                f"{col} {stats['mean'][col]:.4f}±{stats['moe'][col]:.4f}"
                for col in stats["mean"]), flush=True)

# ---- throughput at the bench shape, device-trace timed --------------------
def device_ms_total(trace_root, name_substr="jit__generate"):
    path = sorted(
        glob.glob(f"{trace_root}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pidmap, tidmap = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidmap[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tidmap[(e["pid"], e["tid"])] = e["args"]["name"]
    tpu = [p for p, n in pidmap.items() if "TPU" in n]
    mod_tid = [t_ for (p, t_), n in tidmap.items()
               if p == tpu[0] and n == "XLA Modules"]
    tot = collections.defaultdict(float)
    for e in ev:
        if (e.get("pid") == tpu[0] and e.get("tid") == mod_tid[0]
                and e.get("ph") == "X" and name_substr in e.get("name", "")):
            tot[e["name"]] += e["dur"] / 1000.0
    return sum(tot.values())

if "--no-bench" not in sys.argv:
    BATCH, MAX_NEW = 4096, 500
    salt = int(time.time()) & 0x7FFFFFFF
    bench_prompts = jax.random.randint(
        jax.random.PRNGKey(salt), (BATCH, 8), 0, cfg.vocab_size)

    def barrier(x):
        return float(jnp.sum(x[:, -1]))

    for w in WINDOWS:
        gen = Generator(model, max_new_tokens=MAX_NEW, temperature=0.8,
                        top_k=200, window=w)
        barrier(gen.generate(params, bench_prompts, seed=salt))  # compile
        root = f"/tmp/win_trace_{w}_{salt}"
        with jax.profiler.trace(root):
            out = gen.generate(params, bench_prompts, seed=salt + 1)
            barrier(out)
        ms = device_ms_total(root)
        print(f"throughput [window {w}]: device {ms:.0f} ms / "
              f"{MAX_NEW} tok x {BATCH} -> "
              f"{BATCH * MAX_NEW / ms:.0f}k tok/s", flush=True)
print("DONE", flush=True)

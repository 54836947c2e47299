"""Device-side trace of the speculative verify step vs plain decode.

Reuses the /tmp/spec_out checkpoint trained by spec_decode.py and reports
the DEVICE "XLA Modules" duration per step (the only trustworthy timing
under the axon relay — verify skill, round-3 additions) for:

  - plain int8 Generator (the 448k headline path),
  - SpecGenerator with the bf16-dot verify kernel (int8_dots=False),
  - SpecGenerator with the int8 x int8 MXU verify kernel (int8_dots=True).

Env knobs: SPEC_BATCH (4096), SPEC_NEW (500), SPEC_DRAFTS ("7"),
SPEC_VARIANTS ("plain,bf16,int8dots").
"""
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.environ.get("SPEC_REPO", "/root/repo"))

import numpy as np
import jax
import jax.numpy as jnp

from ai_music_generation_tpu.train import checkpoint as ckpt_lib

assert ckpt_lib.checkpoint_exists("/tmp/spec_out", ckpt_lib.BEST), \
    "run docs/experiments/spec_decode.py first (trains /tmp/spec_out)"
state, meta = ckpt_lib.load_checkpoint("/tmp/spec_out", ckpt_lib.BEST)

import dataclasses

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.decode.speculative import SpecGenerator
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig

params = jax.device_put(state["params"])
base_cfg = GPTConfig(dropout=0.0, dtype=jnp.bfloat16, kv_quantized=True,
                     **meta["model_args"])

BATCH = int(os.environ.get("SPEC_BATCH", "4096"))
PROMPT, NEW = 8, int(os.environ.get("SPEC_NEW", "500"))
DRAFTS = tuple(int(k) for k in os.environ.get("SPEC_DRAFTS", "7").split(","))
VARIANTS = os.environ.get("SPEC_VARIANTS", "plain,bf16,int8dots").split(",")

val = np.memmap("/tmp/spec_ds/val.bin", dtype=np.uint16, mode="r")
salt = int(time.time()) & 0x7FFFFFFF
r = np.random.default_rng(salt)


def fresh_prompts():
    starts = r.integers(0, len(val) - PROMPT - 1, size=BATCH)
    return jnp.asarray(
        np.stack([val[s:s + PROMPT] for s in starts]).astype(np.int32))


def device_ms_per_module(trace_root):
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
    if not tpu:
        return {}
    mod_tid = [t_ for (p, t_), n in tidmap.items()
               if p == tpu[0] and n == "XLA Modules"]
    out = collections.defaultdict(list)
    for e in ev:
        if (e.get("pid") == tpu[0] and e.get("tid") == mod_tid[0]
                and e.get("ph") == "X"):
            out[e["name"]].append(e["dur"] / 1000.0)
    return {n: (sum(d) / len(d), len(d)) for n, d in out.items()}


def device_top_ops(trace_root, module_substr="jit__generate", top=18):
    """Aggregate device-side 'XLA Ops' durations by op name (ms summed
    over the trace), for the per-op breakdown inside one module."""
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
    ops_tid = [t_ for (p, t_), n in tidmap.items()
               if p == tpu[0] and n == "XLA Ops"]
    if not ops_tid:
        return []
    agg = collections.defaultdict(float)
    cnt = collections.defaultdict(int)
    for e in ev:
        if (e.get("pid") == tpu[0] and e.get("tid") == ops_tid[0]
                and e.get("ph") == "X"):
            agg[e["name"]] += e["dur"] / 1000.0
            cnt[e["name"]] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return [(nm, ms, cnt[nm]) for nm, ms in rows]


def barrier(x):
    return float(jnp.sum(x[:, -1]))


def trace_one(label, gen, stats=False):
    steps = None
    if stats:
        out, n = gen.generate_with_stats(params, fresh_prompts(), seed=salt)
        steps = int(n)
        barrier(out)
    else:
        barrier(gen.generate(params, fresh_prompts(), seed=salt))
        steps = NEW
    root = f"/tmp/spec_trace_{label.replace(' ', '_')}"
    with jax.profiler.trace(root):
        barrier(gen.generate(params, fresh_prompts(), seed=salt + 1))
    mods = device_ms_per_module(root)
    gen_mods = sorted(mods.items(), key=lambda kv: -kv[1][0])
    total = gen_mods[0][1][0]  # the _generate module dominates
    per_step = total / steps
    committed = (PROMPT + NEW - 8) / steps
    tps = BATCH * NEW / (total / 1000.0)
    print(f"{label}: device {total:.0f} ms total, {steps} steps -> "
          f"{per_step:.2f} ms/step, {committed:.2f} committed/step, "
          f"{tps / 1000:.0f}k tok/s  (top module {gen_mods[0][0].split('(')[0]})",
          flush=True)
    for nm, (ms, cnt) in gen_mods[1:4]:
        if ms > 1.0:
            print(f"    +{nm.split('(')[0]}: {ms:.1f} ms x{cnt}", flush=True)
    if os.environ.get("SPEC_OPS", "0") == "1":
        for nm, ms, cnt in device_top_ops(root):
            print(f"      op {nm}: {ms / steps:.3f} ms/step (x{cnt})",
                  flush=True)


print(f"devices={jax.devices()} salt={salt} batch={BATCH} new={NEW}",
      flush=True)
if "plain" in VARIANTS:
    trace_one("plain int8",
              Generator(GPT(base_cfg), max_new_tokens=NEW,
                        temperature=0.8, top_k=200))
for k in DRAFTS:
    if "bf16" in VARIANTS:
        trace_one(f"spec bf16dots k={k}",
                  SpecGenerator(GPT(base_cfg), max_new_tokens=NEW,
                                temperature=0.8, top_k=200, n_draft=k),
                  stats=True)
    if "int8dots" in VARIANTS:
        cfg = dataclasses.replace(base_cfg, spec_int8_dots=True)
        trace_one(f"spec int8dots k={k}",
                  SpecGenerator(GPT(cfg), max_new_tokens=NEW,
                                temperature=0.8, top_k=200, n_draft=k),
                  stats=True)
print("DONE")

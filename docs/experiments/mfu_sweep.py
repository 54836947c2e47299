"""124M MFU decomposition sweep (VERDICT r2 item 8).

Measures, on the real TPU chip, the GPT-2-124M training step broken into
components so the gap to peak is attributable with evidence instead of
analysis (ref MFU accounting: nanoGPT/model.py:289-303, bench harness:
nanoGPT/bench.py:96-117):

  fwd        — loss only (eval step)
  fwdbwd     — value_and_grad, no optimizer
  full       — complete train step (fast accum=1 path, train/step.py)
  full_b24   — same at batch 24 (MXU-fill probe; MFU normalized per-token)

TIMING METHOD: every variant runs under ``jax.profiler.trace`` and the
reported ms/iter is the DEVICE-side "XLA Modules" duration from the trace,
not wall clock. As of 2026-08-17 the axon relay acknowledges
``block_until_ready`` before device completion (observed: 9.2 ms wall for a
step the device trace shows at 123.4 ms, identical across 5 executions), so
wall-clock loops under-report by >10x. See .claude/skills/verify/SKILL.md.

Inputs are salted per process: the relay also result-caches identical
program+input replays ACROSS processes (observed: 5 ms replays of a 123 ms
step with the round-2 fixed seed).

Run:  python docs/experiments/mfu_sweep.py
Each distinct program costs minutes of axon remote compile; expect ~20 min.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from ai_music_generation_tpu.models.gpt import (
    GPT, GPTConfig, estimate_mfu, num_params, peak_flops_for,
)
from ai_music_generation_tpu.train.optimizer import make_optimizer
from ai_music_generation_tpu.train.step import TrainState, make_train_step

# --model=124m (default): the GPT-2 sweep from round 2.
# --model=music: the baby-GPT shape every music experiment trains
#   (6L/6H/384d, batch 64, block 256, vocab 95 — ref:
#   nanoGPT/config/bach_512_context_augmented.py:1-37 family), the
#   most-used training shape (VERDICT r3 #6: it ran at ~29% MFU with no
#   decomposition evidence). Batch-scaling probes go UP here (128/256/512)
#   since under-filled MXU is the suspected cause.
_MODEL = "124m"
for _a in sys.argv[1:]:
    if _a.startswith("--model="):
        _MODEL = _a.split("=", 1)[1]
if _MODEL == "music":
    B, T = 64, 256
    CFG = GPTConfig(block_size=T, vocab_size=95, n_layer=6, n_head=6,
                    n_embd=384, dropout=0.0, bias=False)
    BIG_BATCHES = (512, 256, 128)
else:
    B, T = 12, 1024
    CFG = GPTConfig(block_size=T, vocab_size=50304, n_layer=12, n_head=12,
                    n_embd=768, dropout=0.0, bias=False)
    BIG_BATCHES = (24, 16)


def batches(rng, n, batch, start=0):
    for it in range(start, start + n):
        r = jax.random.fold_in(rng, it)
        x = jax.random.randint(r, (1, batch, T), 0, CFG.vocab_size)
        y = jax.random.randint(jax.random.fold_in(r, 1), (1, batch, T), 0,
                               CFG.vocab_size)
        yield it, x, y


def device_ms_per_module(trace_root):
    """Mean device-side duration (ms) of each XLA module in a profiler trace."""
    path = sorted(glob.glob(f"{trace_root}/plugins/profile/*/*.trace.json.gz"))[-1]
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


def time_variant(name, fn, rng, batch, burn=3, steps=5):
    """Burn in, then trace `steps` executions; return device ms/iter."""
    out = None
    for it, x, y in batches(rng, burn, batch):
        out = fn(x, y, it)
    # block_until_ready is NOT a reliable barrier under the relay; fetching
    # the scalar VALUE is — it cannot be acked before the device produced it,
    # and the single device stream executes dispatches in order.
    float(out)
    root = f"/tmp/mfu_trace_{name}"
    with jax.profiler.trace(root):
        for it, x, y in batches(rng, steps, batch, start=burn):
            out = fn(x, y, it)
        float(out)
    mods = device_ms_per_module(root)
    main = [(ms, n_, nm) for nm, (ms, n_) in mods.items()
            if "randint" not in nm and "fold_in" not in nm
            and "convert_element" not in nm]
    main.sort(reverse=True)
    ms, n_, nm = main[0]
    print(f"  {name}: {ms:.1f} ms/iter device ({n_} executions of "
          f"{nm.split('(')[0]})", flush=True)
    return ms / 1000.0


def main():
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--variants="):
            only = set(a.split("=", 1)[1].split(","))
    want = lambda v: only is None or v in only

    salt = int(time.time()) & 0x7FFFFFFF
    print(f"run salt {salt}", flush=True)
    rng = jax.random.PRNGKey(salt)
    model = GPT(CFG)
    tx = make_optimizer(6e-4)
    params = jax.jit(model.init)(rng, jnp.zeros((1, T), jnp.int32))
    n = num_params(params)
    peak = peak_flops_for()
    print(f"params {n/1e6:.2f}M  peak {peak/1e12:.0f} TFLOP/s  "
          f"device {jax.devices()[0].device_kind}", flush=True)

    def loss_fn(p, xb, yb):
        _, loss, _ = model.apply(p, xb, yb, deterministic=True)
        return loss

    fwd = jax.jit(loss_fn)
    fwdbwd = jax.jit(jax.value_and_grad(loss_fn))
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    results = {}

    if want("fwd"):
        dt = time_variant("fwd", lambda x, y, it: fwd(params, x[0], y[0]),
                          rng, B)
        results["fwd (loss only)"] = (dt, B)

    if want("fwdbwd"):
        dt = time_variant("fwdbwd",
                          lambda x, y, it: fwdbwd(params, x[0], y[0])[0],
                          rng, B)
        results["fwdbwd (no optimizer)"] = (dt, B)

    # the train step donates its state; give each state its own param copy
    if want("full"):
        state = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)

        def full(x, y, it):
            nonlocal state
            state, m = step(state, x, y, jax.random.fold_in(rng, it))
            return m["loss"]

        dt = time_variant("full", full, rng, B)
        results["full step (accum-1 fast path)"] = (dt, B)
        state = None  # free the donated-through state before later variants

    if want("flash"):
        # same step with the Pallas flash-attention kernel: no [B,H,T,T]
        # materialization. The round-1 "flash loses" verdict was taken at
        # baby-GPT width (6L/6H/384d) where attention FLOPs are marginal;
        # at 124M the HBM saving may dominate.
        import dataclasses as _dc
        model_f = GPT(_dc.replace(CFG, attn_impl="flash"))
        step_f = jax.jit(make_train_step(model_f, tx), donate_argnums=(0,))
        state_f = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params), tx)

        def full_flash(x, y, it):
            nonlocal state_f
            state_f, m = step_f(state_f, x, y, jax.random.fold_in(rng, it))
            return m["loss"]

        dt = time_variant("flash", full_flash, rng, B)
        results["full step, flash attention"] = (dt, B)
        state_f = None

    if want("remat"):
        # full-block rematerialization: +1/3 FLOPs for O(layers) less
        # saved-activation HBM — wins only if the backward is bound on
        # re-reading saved activations
        import dataclasses as _dc
        model_r = GPT(_dc.replace(CFG, remat=True))
        step_r = jax.jit(make_train_step(model_r, tx), donate_argnums=(0,))
        state_r = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params), tx)

        def full_remat(x, y, it):
            nonlocal state_r
            state_r, m = step_r(state_r, x, y, jax.random.fold_in(rng, it))
            return m["loss"]

        dt = time_variant("remat", full_remat, rng, B)
        results["full step, block remat"] = (dt, B)
        state_r = None

    for big in BIG_BATCHES if want("big") else ():
        state_b = TrainState.create(jax.tree_util.tree_map(jnp.copy, params), tx)

        def full_b(x, y, it):
            nonlocal state_b
            state_b, m = step(state_b, x, y, jax.random.fold_in(rng, it))
            return m["loss"]

        try:
            dt = time_variant(f"full{big}", full_b, rng, big)
            results[f"full step @ batch {big}"] = (dt, big)
            break
        except Exception as exc:  # HBM exhausted at B=24 on 16 GB v5e
            print(f"  batch {big} failed: {type(exc).__name__}: "
                  f"{str(exc)[:120]}", flush=True)
            state_b = None

    print(f"\n{'variant':36s} {'ms/iter':>9s} {'MFU':>7s}")
    for name, (dt, batch) in results.items():
        mfu = estimate_mfu(CFG, n, batch, dt, peak)
        print(f"{name:36s} {dt*1e3:9.1f} {mfu*100:6.1f}%", flush=True)

    need = ("full step (accum-1 fast path)", "fwdbwd (no optimizer)",
            "fwd (loss only)")
    if all(k in results for k in need):
        full_dt = results[need[0]][0]
        bwdonly = results[need[1]][0] - results[need[2]][0]
        opt = full_dt - results[need[1]][0]
        print(f"\nbreakdown @ B={B}: fwd {results[need[2]][0]*1e3:.1f} ms, "
              f"bwd {bwdonly*1e3:.1f} ms, optimizer+state {opt*1e3:.1f} ms")


if __name__ == "__main__":
    main()

"""Training-step benchmark harness (parity: nanoGPT/bench.py:33-117).

Two modes, like the reference:
- profile: wraps timed steps in ``jax.profiler.trace`` emitting a
  TensorBoard-loadable trace (replaces torch.profiler, ref :66-94);
- simple: burn-in + timed loop reporting ms/iter and MFU against the TPU
  peak (ref :96-117; A100 constant replaced by device lookup).

Batches are real memmap samples when a dataset is given, else fixed random
tensors (ref :33-48).
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.data.memmap import BinDataset
from ai_music_generation_tpu.models.gpt import (
    GPT,
    GPTConfig,
    estimate_mfu,
    num_params,
    peak_flops_for,
)
from ai_music_generation_tpu.train.optimizer import make_optimizer
from ai_music_generation_tpu.train.step import TrainState, make_train_step
from ai_music_generation_tpu.utils.configurator import apply_overrides

DEFAULTS = dict(
    batch_size=12,
    block_size=1024,
    n_layer=12,
    n_head=12,
    n_embd=768,
    dropout=0.0,
    bias=False,
    vocab_size=50304,
    dataset="",  # optional: data_root/<dataset>/train.bin for real batches
    data_root="data",
    profile=False,
    trace_dir="bench_trace",
    burn_in=5,
    num_steps=20,
    seed=1337,
    dtype="bfloat16",
)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    c = apply_overrides(dict(DEFAULTS), argv)

    cfg = GPTConfig(
        block_size=c["block_size"], vocab_size=c["vocab_size"],
        n_layer=c["n_layer"], n_head=c["n_head"], n_embd=c["n_embd"],
        dropout=c["dropout"], bias=c["bias"],
        dtype=jnp.bfloat16 if c["dtype"] == "bfloat16" else jnp.float32,
    )
    model = GPT(cfg)
    tx = make_optimizer(6e-4)
    rng = jax.random.PRNGKey(c["seed"])

    if c["dataset"]:
        ds = BinDataset(os.path.join(c["data_root"], c["dataset"], "train.bin"))

        def get_batch(it):
            x, y = ds.sample(c["seed"], it, (1, c["batch_size"]), c["block_size"])
            return jnp.asarray(x), jnp.asarray(y)
    else:
        # batches MUST vary per iteration: the axon relay caches results by
        # input hash, so identical-input loops report impossible times
        # (.claude/skills/verify/SKILL.md)
        def get_batch(it):
            r = jax.random.fold_in(rng, it)
            x = jax.random.randint(
                r, (1, c["batch_size"], c["block_size"]), 0, c["vocab_size"]
            )
            y = jax.random.randint(
                jax.random.fold_in(r, 1),
                (1, c["batch_size"], c["block_size"]), 0, c["vocab_size"],
            )
            return x, y

    params = jax.jit(model.init)(rng, jnp.zeros((1, c["block_size"]), jnp.int32))
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    n_params = num_params(params)
    print(f"parameters: {n_params/1e6:.2f}M | peak {peak_flops_for()/1e12:.0f} TFLOP/s")

    x, y = get_batch(0)
    state, metrics = step(state, x, y, rng)  # compile
    float(metrics["loss"])  # value fetch: the only true barrier (see below)

    it_base = 1  # distinct iteration ids across loops (relay-cache defeat)

    def timed_loop(n):
        nonlocal state, it_base
        t0 = time.time()
        for it in range(it_base, it_base + n):
            x, y = get_batch(it)
            state, metrics = step(state, x, y, jax.random.fold_in(rng, it))
        # fetch the VALUE as the completion barrier: the axon relay acks
        # block_until_ready before device completion (observed 13x early,
        # 2026-08-17 — verify skill), but a value computed by the queued
        # work cannot be returned early, and the single device stream runs
        # dispatches in order. For exact per-op time use --profile and the
        # trace (docs/experiments/mfu_sweep.py::device_ms_per_module).
        loss = float(metrics["loss"])
        it_base += n
        return (time.time() - t0) / n, loss

    timed_loop(c["burn_in"])
    if c["profile"]:
        with jax.profiler.trace(c["trace_dir"]):
            dt, loss = timed_loop(c["num_steps"])
        print(f"trace written to {c['trace_dir']}")
    else:
        dt, loss = timed_loop(c["num_steps"])

    mfu = estimate_mfu(cfg, n_params, c["batch_size"], dt)
    print(f"time per iteration: {dt*1000:.4f}ms, MFU: {mfu*100:.2f}%, loss {loss:.4f}")
    return dt, mfu


if __name__ == "__main__":
    main()

"""TunesFormer training-step MFU on the real chip.

The reference never reports TunesFormer training throughput (its trainer is
an epoch loop over DataParallel GPUs, ref: tunesformer/train.py:77-121).
This probe gives the TPU rebuild a measured number: device-trace-timed
train-step latency for the reference-scale model (9 patch + 3 char layers,
768 wide, 128x32 patch grid, ref: tunesformer/config.py:1-9) and MFU with
the FLOP numerator taken from XLA's own cost analysis of the compiled step
(no hand-derived formula — the dual-stack architecture makes the PaLM
6N+12LHQT accounting inapplicable).

Timing follows docs/experiments/mfu_sweep.py: device-side "XLA Modules"
durations from a jax.profiler trace (wall clock under-reports >10x through
the axon relay), inputs salted per process (relay replay cache).

Run:  python docs/experiments/tunes_mfu.py [--batches=8,32]
Each batch size costs minutes of axon remote compile.

Results (2026-08-17, v5e via axon tunnel, bf16 activations / fp32 params,
XLA-cost-analysis FLOPs, device-trace ms):

  batch  8:  52.0 ms/iter device,  4.62 TFLOP/step -> 45.0% MFU
  batch 32: 219.0 ms/iter device, 18.47 TFLOP/step -> 42.8% MFU

The ref-default batch 8 already runs at the chip's practical training
plateau (the 124M GPT step sits at 43.2%, docs/PERF.md): the char stack
folds the patch axis into the batch (8x128 = 1024 rows of T=32), so its
matmuls are MXU-filling even at tiny user-visible batch — the bar-patch
hierarchy is not just a context-length trick, it is also what keeps the
training step dense. Larger batches add no fill (already saturated) and
slightly more attention overhead.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/docs/experiments")

import jax
import jax.numpy as jnp
import optax

from mfu_sweep import device_ms_per_module  # noqa: E402
from ai_music_generation_tpu.models.gpt import peak_flops_for  # noqa: E402
from ai_music_generation_tpu.models.tunesformer import (  # noqa: E402
    TunesFormer,
    TunesFormerConfig,
)
from ai_music_generation_tpu.train.tunes_step import (  # noqa: E402
    make_tunesformer_train_step,
)


def main():
    batches = [8, 32]
    for a in sys.argv[1:]:
        if a.startswith("--batches="):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]

    salt = int(time.time()) & 0x7FFFFFFF
    print(f"run salt {salt}", flush=True)
    rng = jax.random.PRNGKey(salt)

    cfg = TunesFormerConfig(dropout=0.0, dtype=jnp.bfloat16)
    model = TunesFormer(cfg)
    tx = optax.adamw(5e-5)  # ref lr, tunesformer/train.py AdamW
    L, S = cfg.patch_length, cfg.patch_size
    params = jax.jit(model.init)(rng, jnp.zeros((1, L, S), jnp.int32))
    opt_state = tx.init(params["params"])
    step = jax.jit(make_tunesformer_train_step(model, tx),
                   donate_argnums=(0, 1))
    peak = peak_flops_for()

    def batch_for(it: int, B: int):
        r = jax.random.fold_in(rng, it)
        # realistic patch content: ASCII bytes with bos/eos framing
        body = jax.random.randint(r, (B, L, S), 3, 128)  # ASCII char vocab
        return body.at[:, :, 0].set(1).at[:, :, S - 1].set(2)

    for B in batches:
        # FLOPs numerator from the compiled step itself — lower/compile the
        # SAME jitted `step` so this compile also populates its cache (one
        # remote compile per batch size, not two; minutes each on axon)
        lowered = step.lower(params, opt_state, batch_for(0, B), rng)
        cost = lowered.compile().cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) if cost else 0.0

        p = jax.tree_util.tree_map(jnp.copy, params)
        o = jax.tree_util.tree_map(jnp.copy, opt_state)
        loss = None
        for it in range(3):  # burn-in: compile + layout convergence
            p, o, loss = step(p, o, batch_for(it, B), jax.random.fold_in(rng, it))
        float(loss)  # value fetch = honest barrier (verify SKILL.md)
        root = f"/tmp/tunes_mfu_{B}"
        with jax.profiler.trace(root):
            for it in range(3, 8):
                p, o, loss = step(p, o, batch_for(it, B),
                                  jax.random.fold_in(rng, it))
            float(loss)
        mods = device_ms_per_module(root)
        main_mods = [(ms, n, nm) for nm, (ms, n) in mods.items()
                     if "randint" not in nm and "fold_in" not in nm
                     and "broadcast" not in nm and "init" not in nm]
        main_mods.sort(reverse=True)
        ms, n_execs, nm = main_mods[0]
        mfu = flops / (ms / 1000.0) / peak if flops else float("nan")
        print(f"batch {B}: {ms:.1f} ms/iter device ({n_execs} execs of "
              f"{nm.split('(')[0]}), {flops/1e12:.2f} TFLOP/step "
              f"-> {100*mfu:.1f}% MFU", flush=True)


if __name__ == "__main__":
    main()

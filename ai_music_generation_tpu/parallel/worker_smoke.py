"""Multi-process jax.distributed smoke: rendezvous, sharded train step, psum.

This is the TPU-native analogue of the reference's torchrun DDP rendezvous
(ref: nanoGPT/train.py:86-99): N OS processes each own a slice of the global
device set, `jax.distributed.initialize` replaces `init_process_group("nccl")`,
and the data-parallel gradient reduction is the psum XLA emits inside the
jitted train step rather than DDP's bucketed all-reduce.

Two entry points:

- ``run_smoke()`` — builds a global (data, model) mesh over ALL global
  devices, runs ONE sharded GPT train step on a deterministic batch plus an
  explicit shard_map psum, and returns scalar results. Works identically in
  a single process (process_count == 1, e.g. under the pytest 8-device CPU
  harness) and across processes — which is exactly the parity the test
  asserts.
- ``main()`` / ``python -m ai_music_generation_tpu.parallel.worker_smoke`` —
  per-process worker: forces the CPU backend, selects gloo cross-process
  collectives, calls ``initialize_distributed`` (argument path on process 0,
  env-var path on the rest, covering both resolution branches of
  parallel/distributed.py), runs the smoke, and prints one JSON line.

``launch_multiprocess_smoke`` spawns the workers and collects their reports;
tests/test_distributed.py asserts loss parity vs the single-process run and
that ``is_main_process`` gated exactly one writer.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
from typing import Optional

SMOKE_VOCAB = 64
SMOKE_BLOCK = 16
SMOKE_BATCH = 8
PSUM_EXPECTED = float(sum(range(8)))  # arange over the 8 data shards


def run_smoke() -> dict:
    """One sharded train step + explicit psum on a global mesh.

    Deterministic: params from PRNGKey(0), batch from arange — every process
    (and a single-process run) computes the same global program, so the loss
    is comparable across launch topologies (the reference's resume-anywhere
    DDP property, ref: nanoGPT/train.py:86-99,335-348).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ai_music_generation_tpu.models.gpt import GPT, GPTConfig
    from ai_music_generation_tpu.parallel import mesh as pmesh
    from ai_music_generation_tpu.train.optimizer import (
        cosine_warmup_schedule,
        make_optimizer,
    )
    from ai_music_generation_tpu.train.step import TrainState, make_train_step

    n_devices = len(jax.devices())
    mesh = pmesh.make_mesh(n_data=n_devices, n_model=1)

    config = GPTConfig(
        block_size=SMOKE_BLOCK, vocab_size=SMOKE_VOCAB, n_layer=2, n_head=2,
        n_embd=32, dropout=0.0, dtype=jnp.float32,
    )
    model = GPT(config)
    schedule = cosine_warmup_schedule(1e-3, 2, 10, 1e-4)
    tx = make_optimizer(schedule, 0.1, 0.9, 0.95, 1.0)

    # Deterministic global batch; each process contributes only the rows its
    # devices own (jax.make_array_from_process_local_data assembles the
    # global array — the jax replacement for DDP's per-rank DataLoader).
    full_x = (np.arange(SMOKE_BATCH * SMOKE_BLOCK, dtype=np.int64)
              .reshape(1, SMOKE_BATCH, SMOKE_BLOCK) % SMOKE_VOCAB).astype(np.int32)
    full_y = np.roll(full_x, -1, axis=-1)
    pidx, pcount = jax.process_index(), jax.process_count()
    rows = SMOKE_BATCH // pcount
    accum_batch_sh = NamedSharding(mesh, P(None, pmesh.DATA_AXIS))
    x = jax.make_array_from_process_local_data(
        accum_batch_sh, full_x[:, pidx * rows:(pidx + 1) * rows], full_x.shape)
    y = jax.make_array_from_process_local_data(
        accum_batch_sh, full_y[:, pidx * rows:(pidx + 1) * rows], full_y.shape)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((SMOKE_BATCH, SMOKE_BLOCK), np.int32))
    state = TrainState.create(jax.device_get(params), tx)
    state_sh = TrainState(
        params=pmesh.shardings_for_tree(mesh, state.params),
        opt_state=pmesh.shardings_for_tree(mesh, state.opt_state),
        step=pmesh.replicated(mesh),
    )
    state = jax.device_put(jax.device_get(state), state_sh)

    step = jax.jit(
        make_train_step(model, tx, schedule),
        in_shardings=(state_sh, accum_batch_sh, accum_batch_sh, None),
        out_shardings=(state_sh, None),
    )
    new_state, metrics = step(state, x, y, jax.random.PRNGKey(1))

    # Explicit cross-process collective (the raw analogue of DDP all-reduce).
    vec = np.arange(n_devices, dtype=np.float32)
    local = n_devices // pcount
    varr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(pmesh.DATA_AXIS)),
        vec[pidx * local:(pidx + 1) * local], vec.shape)
    psum_fn = jax.jit(jax.shard_map(
        lambda v: jax.lax.psum(jnp.sum(v), pmesh.DATA_AXIS),
        mesh=mesh, in_specs=P(pmesh.DATA_AXIS), out_specs=P()))
    psum_val = float(jax.device_get(psum_fn(varr)))

    return {
        "loss": float(jax.device_get(metrics["loss"])),
        "grad_norm": float(jax.device_get(metrics["grad_norm"])),
        "step": int(jax.device_get(new_state.step)),
        "psum": psum_val,
        "n_devices": n_devices,
    }


def main(argv: Optional[list] = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--out-dir", required=True)
    args = ap.parse_args(argv)

    # Force the CPU backend BEFORE any jax backend init (the axon
    # sitecustomize registers the TPU backend at interpreter start — env
    # alone is not enough, see tests/conftest.py).
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # Cross-process CPU collectives ride gloo (TPU pods use ICI instead; the
    # selection is the only backend-specific line in the whole path).
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from ai_music_generation_tpu.parallel.distributed import (
        initialize_distributed,
        is_main_process,
    )

    if args.process_id == 0:
        info = initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.num_processes,
            process_id=0,
        )
    else:
        # Exercise the env-var resolution branch (distributed.py:34-36).
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{args.port}"
        os.environ["JAX_NUM_PROCESSES"] = str(args.num_processes)
        os.environ["JAX_PROCESS_ID"] = str(args.process_id)
        info = initialize_distributed()

    result = run_smoke()
    # Master-only writer gate (replaces ref's master_process checkpointing,
    # nanoGPT/train.py:290-295,316-329): exactly one process may write.
    if is_main_process():
        with open(os.path.join(args.out_dir,
                               f"main_flag_{jax.process_index()}"), "w") as f:
            f.write("writer\n")
    print(json.dumps({**info, **result}), flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launch_multiprocess_smoke(
    num_processes: int = 2,
    local_devices: int = 4,
    out_dir: str = "/tmp/ai_music_dist_smoke",
    timeout: int = 600,
) -> list[dict]:
    """Spawn the worker in ``num_processes`` OS processes (the torchrun role,
    ref: nanoGPT/train.py:6-17) and return each process's report dict."""
    os.makedirs(out_dir, exist_ok=True)
    for name in os.listdir(out_dir):
        if name.startswith("main_flag_"):
            os.unlink(os.path.join(out_dir, name))
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={local_devices}"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    env.pop("JAX_NUM_PROCESSES", None)
    env.pop("JAX_PROCESS_ID", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "ai_music_generation_tpu.parallel.worker_smoke",
             "--port", str(port), "--process-id", str(i),
             "--num-processes", str(num_processes), "--out-dir", out_dir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(num_processes)
    ]
    reports = []
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {i} failed (rc={p.returncode}):\n{out}\n{err}")
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        reports.append(json.loads(line))
    flags = [n for n in os.listdir(out_dir) if n.startswith("main_flag_")]
    for r in reports:
        r["main_flags"] = sorted(flags)
    return reports


if __name__ == "__main__":
    main()

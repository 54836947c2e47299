"""Sequence (context) parallelism for GPT training.

Shards the TOKEN axis of the batch over a mesh ``seq`` axis: device i holds
the contiguous global positions ``i*Tl .. (i+1)*Tl - 1`` of every row, the
blocks' positionwise work (LN, MLP, embeddings, head, loss) runs purely
locally, and attention ring-rotates K/V chunks over the axis
(ops/ring_attention.py). Per-device activation memory scales 1/n_seq in the
sequence — the knob that makes block sizes beyond one chip's activation HBM
trainable, orthogonal to FSDP (weights) and pipeline (layers).

No reference analogue: nanoGPT replicates the full sequence per rank
(ref: nanoGPT/model.py:60-76, train.py:86-99). This module is the ``sp``
entry in the framework's dp/tp/pp/sp parallelism matrix (PARITY.md).

Built the same way as parallel/pipeline.py: the model's OWN Flax modules run
under ``jax.shard_map`` (GPTConfig.seq_axis switches attention to the ring
path and offsets wpe positions by the shard index), so there is no second
forward implementation to drift. The loss psums nll totals and token counts
over BOTH mesh axes, so ignore_index tokens may distribute arbitrarily
across shards and the mean still matches the unsharded loss exactly.

Numerical contract (tests/test_sequence.py): loss and every parameter
gradient match the plain single-device train step to fp32 tolerance for
every (data, seq) factorization.

Scope: the training path. Decode keeps its data/model-axis sharding — a
decode step's sequence axis is the KV cache, which is already distributed
work per request, and ring hops would only add per-token latency.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ai_music_generation_tpu.models.gpt import (
    GPT,
    cross_entropy_ignore_index,
)
from ai_music_generation_tpu.parallel.mesh import DATA_AXIS
from ai_music_generation_tpu.train.step import TrainState

SEQ_AXIS = "seq"


def make_seq_mesh(
    n_data: int = 1,
    n_seq: int = 1,
    devices=None,
) -> Mesh:
    """A ('data', 'seq') mesh. The ring's ppermute hops should ride ICI, so
    ``seq`` is the minor (fastest-varying) axis."""
    devices = list(devices if devices is not None else jax.devices())
    assert n_data * n_seq == len(devices), (
        f"mesh {n_data}x{n_seq} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_seq)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def make_seq_loss(model: GPT, mesh: Mesh) -> Callable:
    """``loss(params, x, y) -> scalar`` with x, y [B, T] global int32,
    sharded (data, seq); params replicated."""
    cfg = model.config
    assert cfg.dropout == 0.0, (
        "sequence-parallel training path requires dropout=0 "
        "(attention-prob dropout is not expressible under ring attention)")
    assert cfg.n_expert == 0, (
        "MoE under sequence parallelism needs cross-shard routing stats; "
        "use the dp/tp/fsdp paths for MoE models (parallel/mesh.py)")
    sp_model = GPT(dataclasses.replace(cfg, seq_axis=SEQ_AXIS))
    n_seq = mesh.shape[SEQ_AXIS]

    def local_loss(params, x, y):
        # all-position logits for the LOCAL chunk; the model's internal loss
        # path is bypassed so nll/count can psum over BOTH axes (exact
        # global mean even with ignore_index imbalance across data shards)
        logits, _, _ = sp_model.apply(
            params, x, targets=None, return_all_logits=True)
        return cross_entropy_ignore_index(
            logits, y, axis_name=(SEQ_AXIS, DATA_AXIS))

    sharded = jax.shard_map(
        local_loss, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS, SEQ_AXIS), P(DATA_AXIS, SEQ_AXIS)),
        out_specs=P(),
    )

    def loss_fn(params, x, y):
        T = x.shape[1]
        assert T % n_seq == 0, f"T {T} not divisible by {n_seq} seq shards"
        # the model's trace-time block_size check only sees the local chunk
        assert T <= cfg.block_size, (
            f"global sequence {T} exceeds block_size {cfg.block_size}")
        return sharded(params, x, y)

    return loss_fn


def make_seq_train_step(
    model: GPT,
    tx,
    mesh: Mesh,
    schedule: Optional[Callable] = None,
) -> Callable:
    """Build ``step(state, x, y) -> (state, metrics)``.

    Same contract as train/step.py's accum-1 fast path (state is a plain
    replicated :class:`TrainState`); only the loss is sequence-sharded.
    Gradients of the replicated params emerge psum'd across the mesh by the
    shard_map transpose — the same mechanism pipeline.py's shared params
    use, verified grad-exact there and here.
    """
    loss_fn = make_seq_loss(model, mesh)
    grad_fn = jax.value_and_grad(loss_fn)

    def step(state: TrainState, x, y):
        loss, grads = grad_fn(state.params, x, y)
        grad_norm = optax.global_norm(grads["params"])
        updates, new_opt_state = tx.update(
            grads["params"], state.opt_state, state.params["params"])
        new_params = {
            "params": optax.apply_updates(state.params["params"], updates)}
        new_state = TrainState(new_params, new_opt_state, state.step + 1)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        if schedule is not None:
            metrics["lr"] = schedule(state.step)
        return new_state, metrics

    return step

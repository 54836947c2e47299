"""GPipe-style pipeline parallelism for GPT training.

The reference scales only by replicating the whole model per rank (DDP,
ref: nanoGPT/train.py:86-99); once a model outgrows one chip's HBM that
strategy is dead. This module shards the transformer STACK itself over a
``pipe`` mesh axis: each stage owns ``n_layer / n_stages`` consecutive
blocks, microbatches flow stage-to-stage over ICI via
``jax.lax.ppermute``, and the classic GPipe schedule (M + S - 1 ticks for
M microbatches over S stages) emerges from one ``lax.scan``. Written
TPU-first:

- the schedule is a **forward-only** program under ``jax.shard_map``;
  ``jax.grad`` differentiates straight through the ``ppermute`` (its
  transpose is the reverse permute), so the backward pipeline needs no
  hand-written schedule at all;
- per-stage blocks are applied by a ``lax.scan`` over the stage's stacked
  layer params (one compiled Block body regardless of depth);
- embeddings / final LayerNorm / the tied head are replicated (they are
  O(vocab·d), small next to the stack) and applied with the SAME Flax
  modules the plain model uses — no re-implementation to drift;
- composes with data parallelism: a ('data', 'pipe') mesh runs an
  independent pipeline per data-shard, XLA inserting the gradient psums
  across BOTH axes via the AD transpose of replication.

Numerical contract (tests/test_pipeline.py): loss and every parameter
gradient match the plain single-program train step bit-tight (fp32), for
every (data, pipe) factorization tested.

Scope: the training path (the reference's DDP analogue). Decode stays on
the data/tensor axes — at music-model scale a decode step is HBM-bound on
the KV cache, and pipelining it would only add per-hop latency.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ai_music_generation_tpu.models.gpt import (
    GPT,
    Block,
    cross_entropy_ignore_index,
)
from ai_music_generation_tpu.parallel.mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def _shard_map(f, mesh, in_specs, out_specs):
    # jax >= 0.8 exports jax.shard_map (kw-only); keep check_vma on: the
    # psum/pmean in local_loss make the output genuinely replicated.
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def make_pipe_mesh(
    n_data: int = 1,
    n_pipe: int = 1,
    devices=None,
) -> Mesh:
    """A ('data', 'pipe') mesh. Stages should map to ICI-adjacent devices,
    so ``pipe`` is the minor (fastest-varying) axis."""
    devices = list(devices if devices is not None else jax.devices())
    assert n_data * n_pipe == len(devices), (
        f"mesh {n_data}x{n_pipe} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_pipe)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


# -- staged parameter layout -------------------------------------------------


def stack_block_params(params: dict, n_layer: int) -> tuple[dict, dict]:
    """Split a GPT param tree into (stacked blocks, shared).

    ``stacked`` leaves get a new leading layer dim of size ``n_layer``
    (sharded over ``pipe``); ``shared`` holds wte/wpe/ln_f (replicated).
    """
    p = params["params"]
    blocks = [p[f"h_{i}"] for i in range(n_layer)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    shared = {k: v for k, v in p.items() if not k.startswith("h_")}
    return stacked, shared


def unstack_block_params(stacked: dict, shared: dict) -> dict:
    """Inverse of :func:`stack_block_params` (e.g. for checkpoint export)."""
    n_layer = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    out = dict(shared)
    for i in range(n_layer):
        out[f"h_{i}"] = jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
    return {"params": out}


def staged_shardings(mesh: Mesh, stacked: dict, shared: dict):
    """(stacked, shared) NamedSharding trees: layer dim over pipe, rest
    replicated. Works for params and (by matching structure) optimizer
    moments."""
    st = jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, P(PIPE_AXIS, *([None] * (x.ndim - 1)))),
        stacked)
    sh = jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P()), shared)
    return st, sh


# -- the pipelined loss ------------------------------------------------------


def _make_pipeline_loss(model: GPT, mesh: Mesh, n_micro: int) -> Callable:
    cfg = model.config
    S = mesh.shape[PIPE_AXIS]
    n_data = mesh.shape[DATA_AXIS]
    assert cfg.n_layer % S == 0, (
        f"n_layer {cfg.n_layer} not divisible by {S} pipeline stages")
    assert cfg.dropout == 0.0, "pipeline training path requires dropout=0"
    assert cfg.n_expert == 0, (
        "MoE blocks return a third (aux-loss) element the GPipe schedule "
        "does not thread; use the dp/tp/fsdp paths for MoE models")
    block = Block(cfg, 0)  # layer_idx only affects init, not apply
    wte = nn.Embed(cfg.vocab_size, cfg.n_embd, dtype=cfg.dtype,
                   param_dtype=cfg.param_dtype, name="wte")
    wpe = nn.Embed(cfg.block_size, cfg.n_embd, dtype=cfg.dtype,
                   param_dtype=cfg.param_dtype, name="wpe")
    ln_f = nn.LayerNorm(use_bias=cfg.bias, dtype=cfg.dtype,
                        param_dtype=cfg.param_dtype, epsilon=1e-5)

    def apply_stage(stacked_local, x):
        def body(x, bp):
            y, _ = block.apply({"params": bp}, x)
            return y, None
        x, _ = jax.lax.scan(body, x, stacked_local)
        return x

    def local_loss(stacked_local, shared, idx, targets):
        """Runs on every device; idx/targets are the local [M, mb, T]
        microbatches of this data shard."""
        s = jax.lax.axis_index(PIPE_AXIS)
        M = idx.shape[0]
        pos = jnp.arange(idx.shape[-1])
        emb = (wte.apply({"params": shared["wte"]}, idx)
               + wpe.apply({"params": shared["wpe"]}, pos)[None, None])
        # GPipe schedule: tick t processes microbatch (t - stage) where
        # defined; stage 0 injects emb[t], the last stage retires
        # microbatch t-(S-1). Every stage runs every tick (bubbles compute
        # on stale activations whose results are never read).
        outs = jnp.zeros_like(emb)

        def tick(carry, t):
            act, outs = carry
            inj = jax.lax.dynamic_index_in_dim(
                emb, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x_in = jnp.where(s == 0, inj, act)
            x_out = apply_stage(stacked_local, x_in)
            # the write index is monotone: garbage lands in slot 0 during
            # fill ticks and is overwritten by the true microbatch 0 at
            # t = S-1, then 1, 2, ... in order
            widx = jnp.clip(t - (S - 1), 0, M - 1)
            outs = jax.lax.dynamic_update_index_in_dim(outs, x_out, widx, 0)
            act = jax.lax.ppermute(
                x_out, PIPE_AXIS, [(i, (i + 1) % S) for i in range(S)])
            return (act, outs), None

        # scan carries become device-varying inside the loop (axis_index /
        # ppermute); mark the zero-initialized carries as varying up front
        # so the carry type is loop-invariant (JAX vma typing).
        act0 = jax.lax.pcast(jnp.zeros(emb.shape[1:], emb.dtype),
                             (DATA_AXIS, PIPE_AXIS), to="varying")
        outs = jax.lax.pcast(outs, (PIPE_AXIS,), to="varying")
        (_, outs), _ = jax.lax.scan(
            tick, (act0, outs), jnp.arange(M + S - 1))

        # head + loss are only meaningful on the last stage; other stages
        # compute on garbage (finite: zeros flowed through LN/attn) and are
        # masked out BEFORE the mean so no NaN can leak into the psum.
        x = ln_f.apply({"params": shared["ln_f"]}, outs)
        logits = wte.apply(
            {"params": shared["wte"]}, x, method=nn.Embed.attend)
        loss_here = cross_entropy_ignore_index(logits, targets)
        loss = jax.lax.psum(
            jnp.where(s == S - 1, loss_here, 0.0), PIPE_AXIS)
        # mean over data shards (each shard's loss is a mean over its rows;
        # equal row counts make mean-of-means exact)
        return jax.lax.pmean(loss, DATA_AXIS)

    # stacked leaves: leading layer dim over pipe; a single P(PIPE_AXIS)
    # broadcasts as a pytree-prefix spec over the whole block tree.
    loss_fn = _shard_map(
        local_loss, mesh,
        in_specs=(P(PIPE_AXIS), P(), P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=P(),
    )
    return loss_fn


def make_pipeline_train_step(
    model: GPT,
    tx,
    mesh: Mesh,
    n_micro: int,
    schedule: Optional[Callable] = None,
) -> Callable:
    """Build ``step((stacked, shared, opt_state, it), x, y) -> (...)``.

    x, y: [batch, T] int32 global batch; rows are split into ``n_micro``
    microbatches (batch must divide evenly). The optimizer runs on the
    STAGED tree — its moments shard exactly like the params, i.e. ZeRO
    memory over the pipe axis for free. Convert to/from the plain layout
    with :func:`stack_block_params` / :func:`unstack_block_params`.
    """
    loss_fn = _make_pipeline_loss(model, mesh, n_micro)

    def split_micro(b):
        B = b.shape[0]
        assert B % n_micro == 0
        return b.reshape(n_micro, B // n_micro, *b.shape[1:])

    grad_fn = jax.value_and_grad(
        lambda st, sh, x, y: loss_fn(st, sh, x, y), argnums=(0, 1))

    def step(carry, x, y):
        stacked, shared, opt_state, it = carry
        loss, (g_st, g_sh) = grad_fn(
            stacked, shared, split_micro(x), split_micro(y))
        grads = (g_st, g_sh)
        updates, opt_state = tx.update(grads, opt_state, (stacked, shared))
        import optax

        stacked, shared = optax.apply_updates((stacked, shared), updates)
        metrics = {"loss": loss}
        if schedule is not None:
            metrics["lr"] = schedule(it)
        return (stacked, shared, opt_state, it + 1), metrics

    return step

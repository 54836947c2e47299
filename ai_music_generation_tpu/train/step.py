"""Jitted train/eval steps with on-device gradient accumulation.

Replaces the reference's micro-step loop with DDP sync suppression
(ref: nanoGPT/train.py:335-348): here the whole accumulation is a
``jax.lax.scan`` inside one jitted step, so gradients are reduced across the
data axis exactly once per optimizer step by XLA's psum — the semantics the
reference hand-builds with ``require_backward_grad_sync`` (ref :341).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ai_music_generation_tpu.models.gpt import GPT


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # scalar int32

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params=params, opt_state=tx.init(params["params"]),
                   step=jnp.zeros((), jnp.int32))


def make_train_step(
    model: GPT,
    tx: optax.GradientTransformation,
    schedule: Optional[Callable] = None,
) -> Callable:
    """Build ``train_step(state, x, y, rng) -> (state, metrics)``.

    x, y: [grad_accum, micro_batch, T] int32. Loss/grads are averaged over
    micro-steps (ref scales loss by 1/grad_accum, train.py:337-339).
    """
    use_dropout = model.config.dropout > 0.0

    def loss_fn(params, xb, yb, rng):
        rngs = {"dropout": rng} if use_dropout else None
        _, loss, _ = model.apply(
            params, xb, yb, deterministic=not use_dropout, rngs=rngs
        )
        return loss

    grad_fn = jax.value_and_grad(loss_fn)

    def train_step(state: TrainState, x, y, rng):
        accum = x.shape[0]

        if accum == 1:
            # Fast path: the scan below zero-inits and adds a full
            # param-sized fp32 tree (~1 GB of HBM traffic at 124M) that a
            # single micro-step never needs. Numerics are identical: the
            # scan body would use fold_in(rng, 0) and scale by 1.0.
            loss, grads = grad_fn(
                state.params, x[0], y[0], jax.random.fold_in(rng, 0)
            )
        else:
            def micro(carry, inp):
                g_acc, l_acc = carry
                xb, yb, i = inp
                step_rng = jax.random.fold_in(rng, i)
                loss, grads = grad_fn(state.params, xb, yb, step_rng)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                return (g_acc, l_acc + loss), None

            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            (grads, loss_sum), _ = jax.lax.scan(
                micro, (zero_grads, jnp.zeros((), jnp.float32)),
                (x, y, jnp.arange(accum)),
            )
            scale = 1.0 / accum
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            loss = loss_sum * scale

        grad_norm = optax.global_norm(grads["params"])
        updates, new_opt_state = tx.update(
            grads["params"], state.opt_state, state.params["params"]
        )
        new_params = {"params": optax.apply_updates(state.params["params"], updates)}
        new_state = TrainState(new_params, new_opt_state, state.step + 1)
        metrics = {"loss": loss, "grad_norm": grad_norm}
        if schedule is not None:
            metrics["lr"] = schedule(state.step)
        return new_state, metrics

    return train_step


def make_eval_step(model: GPT) -> Callable:
    def eval_step(params, x, y):
        _, loss, _ = model.apply(params, x, y, deterministic=True)
        return loss

    return eval_step

"""Optimizer + LR schedule (reference behavior: nanoGPT train.py / model.py).

- Cosine schedule with linear warmup and a min-LR floor
  (ref: nanoGPT/train.py:247-259).
- AdamW with weight decay applied only to rank>=2 params — matmul kernels and
  embeddings decay, biases/layernorms don't (ref: nanoGPT/model.py:263-287).
  The reference's "fused AdamW" speedup is inherent here: optax updates are
  fused by XLA into a handful of kernels.
- Global-norm gradient clipping (ref: nanoGPT/train.py:350-353).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import optax


def cosine_warmup_schedule(
    learning_rate: float,
    warmup_iters: int,
    lr_decay_iters: int,
    min_lr: float,
):
    """Exact reference LR curve (ref: nanoGPT/train.py:247-259):

    1. linear warmup: lr * (it + 1) / (warmup_iters + 1)
    2. cosine decay from lr to min_lr over [warmup_iters, lr_decay_iters]
    3. constant min_lr after lr_decay_iters
    """

    def schedule(it):
        import jax.numpy as jnp

        it = jnp.asarray(it, jnp.float32)
        warm = learning_rate * (it + 1) / (warmup_iters + 1)
        decay_ratio = jnp.clip(
            (it - warmup_iters) / max(lr_decay_iters - warmup_iters, 1), 0.0, 1.0
        )
        coeff = 0.5 * (1.0 + jnp.cos(math.pi * decay_ratio))
        cos = min_lr + coeff * (learning_rate - min_lr)
        return jnp.where(it < warmup_iters, warm, jnp.where(it > lr_decay_iters, min_lr, cos))

    return schedule


def make_optimizer(
    learning_rate: Any,
    weight_decay: float = 0.1,
    beta1: float = 0.9,
    beta2: float = 0.95,
    grad_clip: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """AdamW with the reference's decay/no-decay parameter grouping."""

    def decay_mask(params):
        return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)

    tx = optax.adamw(
        learning_rate=learning_rate,
        b1=beta1,
        b2=beta2,
        eps=1e-8,
        weight_decay=weight_decay,
        mask=decay_mask,
    )
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx

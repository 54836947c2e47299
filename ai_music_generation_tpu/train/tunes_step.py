"""Sharded TunesFormer train/eval steps.

The reference's only TunesFormer parallelism is single-process
``nn.DataParallel`` with batch_size = #GPUs (ref: tunesformer/train.py:35-36).
The TPU equivalent is a pjit'd step over a (data, model) mesh: the batch is
sharded on the data axis, parameters follow the Megatron-style rules in
``parallel/mesh.py`` (column-parallel c_attn/c_fc/patch_embedding,
row-parallel projections, vocab-sharded char_wte), and XLA inserts the
gradient psum / activation collectives over ICI.

``make_tunesformer_train_step`` carries the reference trainer's NaN-loss
guard (ref: tunesformer/train.py:95-96,134-135): a non-finite loss leaves
params and optimizer state untouched.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ai_music_generation_tpu.models.tunesformer import TunesFormer
from ai_music_generation_tpu.parallel import mesh as pmesh


def make_tunesformer_train_step(
    model: TunesFormer, tx: optax.GradientTransformation
) -> Callable:
    """Build ``train_step(params, opt_state, batch, rng, patch_indices)
    -> (params, opt_state, loss)``.

    batch: [B, P, S] int32 padded patch stacks; patch_indices: optional
    [B, K] conditioning-row subsample (the reference's
    PATCH_SAMPLING_BATCH_SIZE memory saver, ref: utils.py:126-135).
    """

    def train_step(params, opt_state, batch, rng, patch_indices=None):
        def loss_fn(p):
            return model.apply(p, batch, False, patch_indices,
                               rngs={"dropout": rng})

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads["params"], opt_state,
                                     params["params"])
        new_params = {"params": optax.apply_updates(params["params"], updates)}
        # NaN guard (ref skips nan batches, train.py:95-96)
        ok = jnp.isfinite(loss)
        new_params = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_params, params)
        new_opt = jax.tree_util.tree_map(
            lambda n, o: jnp.where(ok, n, o), new_opt, opt_state)
        return new_params, new_opt, loss

    return train_step


def make_tunesformer_eval_step(model: TunesFormer) -> Callable:
    def eval_step(params, batch):
        return model.apply(params, batch, True)

    return eval_step


def shard_tunesformer_step(
    mesh, model: TunesFormer, tx: optax.GradientTransformation,
    params, opt_state,
):
    """Jit the train/eval steps over ``mesh`` and place the state.

    Returns ``(train_step, eval_step, params, opt_state, batch_sharding)``
    with params/opt_state device_put to their rule shardings (TP over the
    model axis, moment buffers inheriting parameter layouts) and steps
    compiled with matching in/out shardings; the batch rides the data axis.
    """
    param_sh = pmesh.shardings_for_tree(mesh, params)
    opt_sh = pmesh.shardings_for_tree(mesh, opt_state)
    batch_sh = pmesh.batch_sharding(mesh)
    rep = pmesh.replicated(mesh)
    params = jax.device_put(params, param_sh)
    opt_state = jax.device_put(opt_state, opt_sh)
    train_step = jax.jit(
        make_tunesformer_train_step(model, tx),
        in_shardings=(param_sh, opt_sh, batch_sh, rep, batch_sh),
        out_shardings=(param_sh, opt_sh, rep),
    )
    # patch_indices=None variant (donating nothing; None can't be sharded)
    train_step_full = jax.jit(
        lambda p, o, b, r: make_tunesformer_train_step(model, tx)(p, o, b, r),
        in_shardings=(param_sh, opt_sh, batch_sh, rep),
        out_shardings=(param_sh, opt_sh, rep),
    )
    eval_step = jax.jit(
        make_tunesformer_eval_step(model),
        in_shardings=(param_sh, batch_sh),
        out_shardings=rep,
    )

    def train(params, opt_state, batch, rng, patch_indices=None):
        if patch_indices is None:
            return train_step_full(params, opt_state, batch, rng)
        return train_step(params, opt_state, batch, rng, patch_indices)

    return train, eval_step, params, opt_state, batch_sh

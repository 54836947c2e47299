"""Sharded TunesFormer: pjit'd train step + mesh-placed bar engine.

The reference's only TunesFormer parallelism is single-process
``nn.DataParallel`` (ref: tunesformer/train.py:35-36). Here the TPU
equivalent — batch over the data axis, Megatron-style TP over the model
axis — must produce the SAME numbers as the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ai_music_generation_tpu.models.tunesformer import TunesFormer, TunesFormerConfig
from ai_music_generation_tpu.parallel import mesh as pmesh
from ai_music_generation_tpu.train.tunes_step import (
    make_tunesformer_eval_step,
    make_tunesformer_train_step,
    shard_tunesformer_step,
)

TINY_CFG = TunesFormerConfig(
    patch_length=8, patch_size=16, patch_layers=2, char_layers=2,
    n_embd=32, n_head=2, dropout=0.0, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def tiny():
    model = TunesFormer(TINY_CFG)
    dummy = jnp.zeros((1, 8, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), dummy)
    return model, params


def _batch(b=8):
    rng = np.random.default_rng(7)
    patches = rng.integers(32, 120, size=(b, 8, 16), dtype=np.int32)
    patches[:, 5:] = 0  # padded tail rows
    return jnp.asarray(patches)


# nightly (18s solo, VERDICT r4 #6): sharded-tunes train parity also runs
# every driver dryrun (__graft_entry__.py tunes line).
@pytest.mark.nightly
def test_sharded_train_step_matches_single_device(tiny, mesh8):
    model, params = tiny
    tx = optax.adam(1e-3)
    opt_state = tx.init(params["params"])
    batch = _batch()
    rng = jax.random.PRNGKey(1)

    ref_step = jax.jit(make_tunesformer_train_step(model, tx))
    p_ref, o_ref, loss_ref = ref_step(params, opt_state, batch, rng)

    train, _eval, p_sh, o_sh, _bs = shard_tunesformer_step(
        mesh8, model, tx, params, opt_state)
    p_new, o_new, loss_sh = train(p_sh, o_sh, batch, rng)

    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=2e-5)
    flat_ref = jax.tree_util.tree_leaves(p_ref)
    flat_sh = jax.tree_util.tree_leaves(jax.device_get(p_new))
    for a, b in zip(flat_ref, flat_sh):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.nightly
def test_sharded_eval_and_patch_sampling(tiny, mesh8):
    model, params = tiny
    tx = optax.adam(1e-3)
    opt_state = tx.init(params["params"])
    batch = _batch()

    eval_ref = jax.jit(make_tunesformer_eval_step(model))(params, batch)
    train, eval_step, p_sh, o_sh, _ = shard_tunesformer_step(
        mesh8, model, tx, params, opt_state)
    np.testing.assert_allclose(
        float(eval_ref), float(eval_step(p_sh, batch)), rtol=2e-5)

    # patch_indices branch (the reference's PATCH_SAMPLING_BATCH_SIZE
    # conditioning subsample, ref: tunesformer/utils.py:126-135) also runs
    # sharded and matches single-device.
    idx = jnp.tile(jnp.arange(4, dtype=jnp.int32)[None], (8, 1))
    rng = jax.random.PRNGKey(3)
    _, _, loss_ref = jax.jit(make_tunesformer_train_step(model, tx))(
        params, opt_state, batch, rng, idx)
    _, _, loss_sh = train(p_sh, o_sh, batch, rng, idx)
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=2e-5)


@pytest.mark.nightly
@pytest.mark.slow
def test_tunes_server_on_mesh_matches_single_device(tiny, mesh8):
    """Bar engine with slot state on the data axis + TP params produces
    byte-identical tunes to the unsharded engine."""
    from ai_music_generation_tpu.serve.tunes_engine import TunesServer

    cfg = TunesFormerConfig(
        patch_length=16, patch_size=16, patch_layers=2, char_layers=2,
        n_embd=32, n_head=2, dropout=0.0, dtype=jnp.float32,
    )
    model = TunesFormer(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16), jnp.int32))
    abc = "L:1/8\nM:4/4\nK:C\nCDEF GABc|"

    srv = TunesServer(model, params, n_slots=4)
    r = srv.submit(abc, max_patch=8, seed=11)
    plain = {d.id: d.text for d in srv.run_until_idle()}[r]

    srv_m = TunesServer(model, params, n_slots=4, mesh=mesh8)
    rm = srv_m.submit(abc, max_patch=8, seed=11)
    sharded = {d.id: d.text for d in srv_m.run_until_idle()}[rm]
    assert plain == sharded

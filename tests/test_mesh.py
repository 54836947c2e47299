"""Mesh + sharding-rule tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ai_music_generation_tpu.models.gpt import GPT, GPTConfig
from ai_music_generation_tpu.parallel import mesh as pmesh


def test_make_mesh_shapes():
    m = pmesh.make_mesh(n_data=4, n_model=2)
    assert m.shape == {"data": 4, "model": 2}
    m1 = pmesh.make_mesh()
    assert m1.shape["data"] == jax.device_count()


def test_param_rules():
    assert pmesh.spec_for_param("params/h_0/attn/c_attn/kernel") == P(None, "model")
    assert pmesh.spec_for_param("params/h_3/mlp/c_proj/kernel") == P("model", None)
    assert pmesh.spec_for_param("params/ln_f/scale") == P()
    assert pmesh.spec_for_param("params/wte/embedding") == P("model", None)


@pytest.mark.nightly
def test_sharded_forward_matches_replicated(mesh8):
    cfg = GPTConfig(block_size=16, vocab_size=64, n_layer=2, n_head=2,
                    n_embd=32, dtype=jnp.float32)
    model = GPT(cfg)
    idx = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None, :], (8, 1))
    targets = jnp.roll(idx, -1, axis=1)
    params = model.init(jax.random.PRNGKey(0), idx)

    _, loss_ref, _ = model.apply(params, idx, targets)

    shardings = pmesh.param_shardings(mesh8, params)
    params_sh = jax.device_put(params, shardings)
    idx_sh = jax.device_put(idx, pmesh.batch_sharding(mesh8))
    t_sh = jax.device_put(targets, pmesh.batch_sharding(mesh8))

    @jax.jit
    def fwd(p, x, t):
        return model.apply(p, x, t)[1]

    loss_sh = fwd(params_sh, idx_sh, t_sh)
    np.testing.assert_allclose(float(loss_ref), float(loss_sh), rtol=1e-5)


@pytest.mark.nightly
def test_sharded_batched_decode(mesh8):
    """Generation with the batch sharded over the data axis (v5e-8 story):
    SPMD decode must produce the same tokens as single-device decode."""
    import numpy as np

    from ai_music_generation_tpu.decode.generate import Generator
    from ai_music_generation_tpu.parallel import mesh as pmesh

    cfg = GPTConfig(block_size=16, vocab_size=64, n_layer=2, n_head=2,
                    n_embd=32, dtype=jnp.float32)
    model = GPT(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    gen = Generator(model, max_new_tokens=6, temperature=0.0)
    prompts = np.tile(np.array([[3, 1, 4, 1]], np.int32), (8, 1))

    out_local = np.asarray(gen.generate(params, prompts, seed=0))

    params_sh = jax.device_put(params, pmesh.shardings_for_tree(mesh8, params))
    prompts_sh = jax.device_put(jnp.asarray(prompts), pmesh.batch_sharding(mesh8))
    out_sh = np.asarray(gen.generate(params_sh, prompts_sh, seed=0))
    np.testing.assert_array_equal(out_local, out_sh)


def test_fsdp_spec_rules(mesh8):
    """fsdp=True adds the data axis on a dim the TP spec leaves free;
    1-D leaves and non-divisible dims stay put."""
    params = {
        "params": {
            "h_0": {"attn": {"c_attn": {
                "kernel": jnp.zeros((32, 96)),   # TP on dim1 -> data on dim0
                "bias": jnp.zeros((96,)),        # 1-D: replicated
            }}},
            "wte": {"embedding": jnp.zeros((64, 32))},  # TP dim0 -> data dim1
            "ln_f": {"scale": jnp.zeros((32,))},
            "odd": {"kernel": jnp.zeros((7, 5))},  # nothing divides: replicated
        }
    }
    sh = pmesh.shardings_for_tree(mesh8, params, fsdp=True)
    p = sh["params"]
    assert p["h_0"]["attn"]["c_attn"]["kernel"].spec == P("data", "model")
    assert p["h_0"]["attn"]["c_attn"]["bias"].spec == P("model")
    assert p["wte"]["embedding"].spec == P("model", "data")
    assert p["ln_f"]["scale"].spec == P(None)  # replicated (rank-padded)
    assert p["odd"]["kernel"].spec == P(None, None)
    # without the flag, nothing changes
    sh0 = pmesh.shardings_for_tree(mesh8, params)
    assert sh0["params"]["h_0"]["attn"]["c_attn"]["kernel"].spec == P(None, "model")


@pytest.mark.nightly
def test_fsdp_train_step_matches_replicated(mesh8):
    """One optimizer step under ZeRO-3 shardings is bit-comparable to the
    replicated run, and the param shards are actually distributed (per-device
    bytes < full size)."""
    import optax

    from ai_music_generation_tpu.train.optimizer import make_optimizer
    from ai_music_generation_tpu.train.step import TrainState, make_train_step

    cfg = GPTConfig(block_size=16, vocab_size=64, n_layer=2, n_head=2,
                    n_embd=32, dtype=jnp.float32)
    model = GPT(cfg)
    x = jnp.tile(jnp.arange(16, dtype=jnp.int32)[None, None, :], (1, 8, 1))
    y = jnp.roll(x, -1, axis=-1)
    params = model.init(jax.random.PRNGKey(0), x[0])
    tx = make_optimizer(lambda it: 1e-3, 0.1, 0.9, 0.95, 1.0)
    step = make_train_step(model, tx)

    state_rep = TrainState.create(params, tx)
    ref_state, ref_metrics = jax.jit(step)(
        state_rep, x, y, jax.random.PRNGKey(1))

    state_sh = TrainState(
        params=pmesh.shardings_for_tree(mesh8, params, fsdp=True),
        opt_state=pmesh.shardings_for_tree(
            mesh8, state_rep.opt_state, fsdp=True),
        step=pmesh.replicated(mesh8),
    )
    state = jax.device_put(TrainState.create(params, tx), state_sh)
    kern = state.params["params"]["h_0"]["attn"]["c_attn"]["kernel"]
    assert kern.addressable_shards[0].data.size < kern.size  # really sharded

    batch_sh = jax.sharding.NamedSharding(mesh8, P(None, pmesh.DATA_AXIS))
    stepf = jax.jit(step, in_shardings=(state_sh, batch_sh, batch_sh, None),
                    out_shardings=(state_sh, None))
    new_state, metrics = stepf(state, jax.device_put(x, batch_sh),
                               jax.device_put(y, batch_sh),
                               jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(metrics["loss"]), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(ref_state.params)
    flat_new = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
    for a, b in zip(flat_ref, flat_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)

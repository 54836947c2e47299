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

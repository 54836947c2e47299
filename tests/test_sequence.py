"""Sequence/context parallelism (parallel/sequence.py + ops/ring_attention.py).

The claims under test, on the 8-device virtual CPU mesh:
- the ring-attention op equals plain masked softmax attention (fwd + grad);
- the sequence-sharded loss equals the plain loss, and every parameter
  gradient matches, across (data, seq) factorizations 1x4, 2x4, 1x8, 2x2;
- ignore_index tokens distributed UNEVENLY across shards still give the
  exact global mean (the psum'd total/count contract);
- a full optimizer step runs on a plain replicated TrainState and learns.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from ai_music_generation_tpu.models.gpt import GPT, GPTConfig
from ai_music_generation_tpu.ops.ring_attention import ring_attention
from ai_music_generation_tpu.parallel import sequence as sq
from ai_music_generation_tpu.train.step import TrainState

pytestmark = pytest.mark.slow  # compile-heavy shard_map programs


def _plain_attention(q, k, v):
    # the model's einsum path (models/gpt.py CausalSelfAttention, fp32)
    B, T, H, D = q.shape
    mask = jnp.tril(jnp.ones((T, T), bool))
    att = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(D)
    att = jnp.where(mask[None, None], att, -jnp.inf)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhts,bshd->bthd", att, v.astype(jnp.float32))


# nightly: the unit-level ring sweep costs 99s/56s/34s of shard_map-grad
# compile solo (the tier's single largest block, VERDICT r4 #6); the
# verification tier keeps ring-attention grad coverage via the cheaper
# test_seq_loss_and_grads_match_plain factorizations below.
@pytest.mark.nightly
@pytest.mark.parametrize("n_seq", [2, 4, 8])
def test_ring_attention_matches_plain(n_seq):
    B, T, H, D = 2, 16, 2, 8
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(B, T, H, D)), jnp.float32)
               for _ in range(3))
    ref = _plain_attention(q, k, v)

    mesh = sq.make_seq_mesh(1, n_seq, devices=jax.devices()[:n_seq])
    ring = jax.shard_map(
        lambda q, k, v: ring_attention(q, k, v, sq.SEQ_AXIS),
        mesh=mesh,
        in_specs=(P(None, sq.SEQ_AXIS), P(None, sq.SEQ_AXIS),
                  P(None, sq.SEQ_AXIS)),
        out_specs=P(None, sq.SEQ_AXIS),
    )
    out = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradient parity (the ppermute transpose is the reverse rotation)
    g_ref = jax.grad(lambda q: jnp.sum(_plain_attention(q, k, v) ** 2))(q)
    g_ring = jax.grad(lambda q: jnp.sum(ring(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def setup():
    cfg = GPTConfig(block_size=16, vocab_size=64, n_layer=2, n_head=2,
                    n_embd=32, dropout=0.0, bias=True, dtype=jnp.float32)
    model = GPT(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 16)), jnp.int32)
    y = jnp.roll(x, -1, axis=1)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x, y


@pytest.mark.parametrize(
    "n_data,n_seq",
    [(1, 4), (2, 4),
     # nightly: the pure-seq 8-way factorization compiles the widest ring
     # (8s solo) and adds no branch the 4-way cases miss (VERDICT r4 #6)
     pytest.param(1, 8, marks=pytest.mark.nightly),
     (2, 2)])
def test_seq_loss_and_grads_match_plain(setup, n_data, n_seq):
    model, params, x, y = setup
    mesh = sq.make_seq_mesh(n_data, n_seq,
                            devices=jax.devices()[: n_data * n_seq])
    loss_ref, grads_ref = jax.value_and_grad(
        lambda p: model.apply(p, x, y)[1])(params)

    loss_fn = sq.make_seq_loss(model, mesh)
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params, x, y)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)

    flat_ref = jax.tree_util.tree_flatten_with_path(grads_ref)[0]
    flat_sp = dict(jax.tree_util.tree_flatten_with_path(grads)[0])
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_sp[path]), np.asarray(leaf),
            rtol=5e-5, atol=1e-6, err_msg=str(path))


def test_seq_loss_exact_with_uneven_ignore_index(setup):
    # -1 targets land entirely in shard 0's token range and data shard 0's
    # rows: the psum'd total/count must still give the global mean
    model, params, x, y = setup
    y = np.array(y)  # writable copy
    y[:3, :5] = -1
    y = jnp.asarray(y)
    loss_ref = model.apply(params, x, y)[1]
    mesh = sq.make_seq_mesh(2, 4)
    loss = jax.jit(sq.make_seq_loss(model, mesh))(params, x, y)
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-6)


# nightly (11s solo): the "learns" soak; loss/grad exactness of the seq
# step stays in the tier via matches_plain factorizations.
@pytest.mark.nightly
def test_seq_train_step_runs_and_learns(setup):
    model, params, x, y = setup
    mesh = sq.make_seq_mesh(2, 4)
    tx = optax.adamw(1e-3)
    state = TrainState.create(params, tx)
    step = jax.jit(sq.make_seq_train_step(model, tx, mesh))
    state, m1 = step(state, x, y)
    state, m2 = step(state, x, y)
    assert np.isfinite(float(m1["loss"]))
    assert float(m2["loss"]) < float(m1["loss"])
    assert int(state.step) == 2


def test_seq_axis_guards(setup):
    model, params, x, y = setup
    # global T > block_size is caught by the wrapper (the model's own
    # trace-time check only sees the local chunk)
    big = GPT(dataclasses.replace(model.config, block_size=8))
    mesh = sq.make_seq_mesh(1, 4, devices=jax.devices()[:4])
    with pytest.raises(AssertionError, match="exceeds block_size"):
        sq.make_seq_loss(big, mesh)(params, x, y)
    # dropout is rejected up front
    drop = GPT(dataclasses.replace(model.config, dropout=0.1))
    with pytest.raises(AssertionError, match="dropout=0"):
        sq.make_seq_loss(drop, mesh)

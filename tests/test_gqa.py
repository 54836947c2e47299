"""Grouped-query attention (GQA/MQA): the n_kv_head knob.

No reference analogue (nanoGPT is full MHA, ref: nanoGPT/model.py:29-76);
GQA is a TPU-native decode-bandwidth lever — the cache shrinks to
kv_heads/n_head of the MHA size, which is the decode step's HBM roofline
(ops/decode_attention_int8.py verdict). Exactness contract: a GQA model must
equal a full-MHA model whose c_attn K/V columns are the GQA ones repeated
group-size times — that oracle proves the grouped einsums, and the usual
cached-vs-full / ring-vs-scalar / serving-vs-Generator oracles prove every
decode path on top of it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.models.gpt import GPT, GPTConfig, KVCache

CFG = GPTConfig(block_size=32, vocab_size=50, n_layer=2, n_head=4, n_embd=32,
                dropout=0.0, dtype=jnp.float32, n_kv_head=2)


@pytest.fixture(scope="module")
def gqa():
    model = GPT(CFG)
    idx = jax.random.randint(jax.random.PRNGKey(1), (3, 12), 0, CFG.vocab_size)
    params = model.init(jax.random.PRNGKey(0), idx)
    return model, params, idx


def test_config_validation():
    with pytest.raises(ValueError):
        GPTConfig(n_head=4, n_kv_head=3)
    with pytest.raises(ValueError):
        GPTConfig(n_head=4, n_kv_head=0)
    assert GPTConfig(n_head=4, n_kv_head=4).kv_heads == 4
    assert GPTConfig(n_head=4).kv_heads == 4
    assert GPTConfig(n_head=4, n_kv_head=1).kv_heads == 1  # MQA


def _expand_to_full_mha(params, cfg: GPTConfig):
    """Repeat the K/V projection columns group-size times -> full-MHA params."""
    C, D, KH, H = cfg.n_embd, cfg.head_dim, cfg.kv_heads, cfg.n_head
    G = H // KH
    new = jax.tree_util.tree_map(lambda x: x, params)
    for layer in range(cfg.n_layer):
        att = new["params"][f"h_{layer}"]["attn"]["c_attn"]
        kern = att["kernel"]  # [C, C + 2*KH*D]
        qk = kern[:, :C]
        kk = jnp.repeat(kern[:, C:C + KH * D].reshape(C, KH, D), G, axis=1)
        vk = jnp.repeat(kern[:, C + KH * D:].reshape(C, KH, D), G, axis=1)
        att["kernel"] = jnp.concatenate(
            [qk, kk.reshape(C, C), vk.reshape(C, C)], axis=1)
        if "bias" in att:
            b = att["bias"]
            kb = jnp.repeat(b[C:C + KH * D].reshape(KH, D), G, axis=0)
            vb = jnp.repeat(b[C + KH * D:].reshape(KH, D), G, axis=0)
            att["bias"] = jnp.concatenate(
                [b[:C], kb.reshape(-1), vb.reshape(-1)])
    return new


@pytest.mark.parametrize("n_kv_head", [1, 2])
def test_matches_expanded_full_mha(n_kv_head):
    """GQA forward == full MHA with K/V weights repeated per group (exact)."""
    cfg = dataclasses.replace(CFG, n_kv_head=n_kv_head)
    model = GPT(cfg)
    idx = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(3), idx)
    full = GPT(dataclasses.replace(cfg, n_kv_head=None))
    pf = _expand_to_full_mha(params, cfg)
    lg, _, _ = model.apply(params, idx, return_all_logits=True)
    lf, _, _ = full.apply(pf, idx, return_all_logits=True)
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lf))
    # and the training loss
    tg = model.apply(params, idx, idx)[1]
    tf = full.apply(pf, idx, idx)[1]
    assert float(tg) == float(tf)


def test_cached_decode_matches_full_forward(gqa):
    """Incremental KV-cache decode == one full forward (scalar mode).

    Tolerance note: the cached GQA path folds the G query heads into the
    query time axis (models/gpt.py cached_att) so the cache operand gets
    the MHA decode einsum and its layout; the fold's dot shape makes the
    CPU backend pick a different reduction order than the full forward's
    H-head einsum, so equality here is to 1-ULP float32 tolerance (the
    MHA decode oracle in test_decode.py stays bitwise). All decode-path
    consistency oracles (ring-vs-scalar, serving-vs-Generator, GQA ==
    expanded-MHA full forward) remain exact.
    """
    model, params, idx = gqa
    full, _, _ = model.apply(params, idx, return_all_logits=True)
    cache = KVCache.create(CFG, idx.shape[0])
    assert cache.k[0].shape == (3, CFG.block_size, 2, CFG.head_dim)  # KH=2
    outs = []
    for t in range(idx.shape[1]):
        lo, _, cache = model.apply(params, idx[:, t:t + 1], cache=cache)
        outs.append(lo[:, 0])
    np.testing.assert_allclose(
        np.asarray(jnp.stack(outs, axis=1)), np.asarray(full),
        rtol=0, atol=2e-7)


@pytest.mark.parametrize("quantized", [False, True])
def test_ring_mode_matches_scalar(gqa, quantized):
    """Per-row ring cache == lockstep scalar cache at every step (exact)."""
    _, params, idx = gqa
    cfg = dataclasses.replace(CFG, kv_quantized=quantized)
    model = GPT(cfg)
    cache_s = KVCache.create(cfg, idx.shape[0])
    cache_v = KVCache.create(cfg, idx.shape[0], per_row=True)
    for t in range(idx.shape[1]):
        ls, _, cache_s = model.apply(params, idx[:, t:t + 1], cache=cache_s)
        lv, _, cache_v = model.apply(params, idx[:, t:t + 1], cache=cache_v)
        assert float(jnp.max(jnp.abs(ls - lv))) == 0.0


def test_generator_and_serving_byte_parity(gqa):
    """Greedy serving decode == lockstep Generator on a GQA model."""
    from ai_music_generation_tpu.decode.generate import Generator
    from ai_music_generation_tpu.serve.engine import GenerationServer

    model, params, _ = gqa
    srv = GenerationServer(model, params, n_slots=2, ticks_per_call=4)
    prompts = [[1, 2, 3], [7] * 9]
    rids = [srv.submit(p, max_new_tokens=10, temperature=0.0, seed=0)
            for p in prompts]
    done = {r.id: r for r in srv.run_until_idle()}
    gen = Generator(model, max_new_tokens=10, temperature=0.0, top_k=None)
    for rid, p in zip(rids, prompts):
        ref = jax.device_get(
            gen.generate(params, jnp.array([p], jnp.int32)))[0, len(p):]
        assert done[rid].generated == list(ref)


def test_spec_cache_rejected():
    """Speculative decode's flat cache assumes full MHA; fail loudly."""
    with pytest.raises(AssertionError, match="full multi-head"):
        KVCache.create(CFG, 2, spec=True)


def test_reference_export_rejected(gqa, tmp_path):
    """GQA has no nanoGPT analogue: to-torch export must refuse."""
    torch = pytest.importorskip("torch")  # noqa: F841
    from ai_music_generation_tpu.models.nanogpt_ckpt import save_reference_ckpt

    _, params, _ = gqa
    with pytest.raises(ValueError, match="GQA"):
        save_reference_ckpt(str(tmp_path / "ckpt.pt"), params["params"], CFG)


# nightly (7.5s solo): sharded-GQA train parity also runs every driver
# dryrun (all four mesh factorizations train the GQA config).
@pytest.mark.nightly
def test_sharded_train_parity():
    """GQA loss on a (data, model) mesh == replicated single-device loss."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ai_music_generation_tpu.parallel import mesh as pmesh

    cfg = dataclasses.replace(CFG, dtype=jnp.float32)
    model = GPT(cfg)
    idx = jax.random.randint(jax.random.PRNGKey(4), (8, 16), 0, cfg.vocab_size)
    params = model.init(jax.random.PRNGKey(5), idx)
    loss_plain = float(model.apply(params, idx, idx)[1])
    mesh = pmesh.make_mesh(n_model=2)
    shardings = pmesh.shardings_for_tree(mesh, params)
    p_sh = jax.device_put(params, shardings)
    x_sh = jax.device_put(idx, NamedSharding(mesh, P(pmesh.DATA_AXIS, None)))
    loss_sh = float(jax.jit(lambda p, x: model.apply(p, x, x)[1])(p_sh, x_sh))
    assert abs(loss_plain - loss_sh) < 1e-5


# nightly (15s solo): GQA through the trainer CLI + checkpoint resume;
# the tier keeps GQA exactness (expanded-MHA, cached-decode, flat
# byte-parity) and the driver dryrun trains the GQA config every pass.
@pytest.mark.nightly
def test_trainer_round_trip(tmp_path):
    """--n_kv_head trains, persists in model_args, and survives resume."""
    from ai_music_generation_tpu.train.trainer import Trainer

    data_dir = tmp_path / "data" / "tiny"
    data_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for split, n in (("train", 2048), ("val", 512)):
        rng.integers(0, 50, n, dtype=np.uint16).tofile(data_dir / f"{split}.bin")
    import pickle
    with open(data_dir / "meta.pkl", "wb") as f:
        pickle.dump({"vocab_size": 50}, f)

    conf = dict(
        out_dir=str(tmp_path / "out"), dataset="tiny",
        data_root=str(tmp_path / "data"), n_layer=2, n_head=4, n_embd=32,
        n_kv_head=2, block_size=16, batch_size=2,
        gradient_accumulation_steps=1, max_iters=2, lr_decay_iters=2,
        eval_interval=2, eval_iters=1, log_interval=1, dtype="float32",
    )
    t = Trainer(conf)
    assert t.gpt_config.n_kv_head == 2
    assert t.model_args["n_kv_head"] == 2
    kern = t.state.params["params"]["h_0"]["attn"]["c_attn"]["kernel"]
    assert kern.shape == (32, 32 + 2 * 2 * 8)
    t.run()

    t2 = Trainer({**conf, "init_from": "resume", "n_kv_head": 0})
    # architecture must come from the checkpoint, not the (absent) CLI flag
    assert t2.gpt_config.n_kv_head == 2

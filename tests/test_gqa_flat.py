"""Flat-cache GQA decode (GPTConfig.flat_kv + ops/gqa_decode.py).

The kernel exists because XLA pins a G>1 decode step's carried cache
S-minor and rewrites the full buffer every step (docs/PERF.md
"Grouped-query attention" — the measured layout trap). Correctness
contract pinned here:

- the Pallas kernel (interpret mode) matches the pure-XLA reference on
  every (quantized, ring, position) combination, including the cache
  write itself (bit-exact buffers);
- off-TPU, a flat_kv model is BIT-IDENTICAL to the 4-D cache GQA model
  through the whole Generator (the op's reference mirrors the model's
  einsum chain op-for-op), for bf16 and int8 caches, including the
  windowed-refresh phases;
- the serving engine (ring mode + admission rolls) produces the same
  greedy tokens with a flat_kv model as with the 4-D one.

No reference analogue (nanoGPT is full MHA with no KV cache at all,
ref: nanoGPT/model.py:29-76,305-330).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.decode.generate import Generator
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig, KVCache
from ai_music_generation_tpu.ops.gqa_decode import (
    _placement,
    gqa_decode_reference,
    gqa_decode_update,
)

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject)

B, S, H, KH, D = 8, 32, 6, 2, 64
KHD = KH * D


def _inputs(quant, ring, pos, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 10)
    kslab = jax.random.normal(ks[2], (B, 1, KHD), jnp.bfloat16)
    vslab = jax.random.normal(ks[3], (B, 1, KHD), jnp.bfloat16)
    if quant:
        # slabs stay RAW bf16 — the kernel owns the quantize + scale write
        rint = lambda k, shape: jax.random.randint(
            k, shape, -127, 128, jnp.int32).astype(jnp.int8)
        k = rint(ks[0], (B, S, KHD))
        v = rint(ks[1], (B, S, KHD))
        kscale = (jax.random.uniform(ks[4], (B, KH, S)) * 0.1
                  + 0.01).astype(jnp.bfloat16)
        vscale = (jax.random.uniform(ks[5], (B, KH, S)) * 0.1
                  + 0.01).astype(jnp.bfloat16)
    else:
        k = jax.random.normal(ks[0], (B, S, KHD), jnp.bfloat16)
        v = jax.random.normal(ks[1], (B, S, KHD), jnp.bfloat16)
        kscale = vscale = None
    qh = jax.random.normal(ks[6], (B, H, D), jnp.bfloat16)
    q_bd = jnp.einsum("bhd,hdc->bhc", qh, _placement(H, KH, D, jnp.bfloat16))
    if ring:
        lengths = jax.random.randint(ks[7], (B,), 0, S, jnp.int32)
        offset = jnp.mod(pos - jnp.arange(S), S)
        mask_rel = (lengths[:, None] - offset[None, :]).astype(jnp.int32)
    else:
        mask_rel = None
    return q_bd, k, v, kslab, vslab, kscale, vscale, mask_rel


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("ring", [False, True])
def test_kernel_interpret_matches_reference(quant, ring):
    for pos in (0, 5, 8, S - 1):
        args = _inputs(quant, ring, pos)
        ref = gqa_decode_reference(*args, pos, n_head=H, n_kv_head=KH)
        ker = gqa_decode_update(
            *args, pos, n_head=H, n_kv_head=KH, interpret=True)
        if quant:
            kr, vr, ksr, vsr, outr = ref
            kk, vk, ksk, vsk, outk = ker
            # the in-kernel quantize + scale write is bit-exact with
            # _quantize_int8 + _scale_write
            np.testing.assert_array_equal(np.asarray(ksr), np.asarray(ksk))
            np.testing.assert_array_equal(np.asarray(vsr), np.asarray(vsk))
        else:
            kr, vr, outr = ref
            kk, vk, outk = ker
        # the cache write is bit-exact (same column, same values)
        np.testing.assert_array_equal(np.asarray(kr), np.asarray(kk))
        np.testing.assert_array_equal(np.asarray(vr), np.asarray(vk))
        a = np.asarray(outr, np.float32)
        b = np.asarray(outk, np.float32)
        err = np.max(np.abs(a - b)) / (np.abs(a).max() + 1e-6)
        assert err < 2e-2, (quant, ring, pos, err)


def test_placement_fold_is_exact_inverse():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, H, D), jnp.bfloat16)
    P = _placement(H, KH, D, jnp.bfloat16)
    folded = jnp.einsum("bhd,hdc->bhc", x, P)
    back = jnp.einsum("bhc,hdc->bhd", folded, P)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_create_validates_layout():
    cfg = GPTConfig(block_size=32, vocab_size=64, n_layer=1, n_head=6,
                    n_embd=96, n_kv_head=2, flat_kv=True)  # KH*D = 32
    with pytest.raises(AssertionError):
        KVCache.create(cfg, 2)
    cfg = GPTConfig(block_size=30, vocab_size=64, n_layer=1, n_head=6,
                    n_embd=384, n_kv_head=2, flat_kv=True)
    with pytest.raises(AssertionError):
        KVCache.create(cfg, 2)  # length not 8-aligned
    cfg = dataclasses.replace(cfg, block_size=32)
    c = KVCache.create(cfg, 2)
    assert c.k[0].shape == (2, 32, 128)


BASE = GPTConfig(block_size=32, vocab_size=96, n_layer=2, n_head=6,
                 n_embd=384, n_kv_head=2, dropout=0.0)


@pytest.fixture(scope="module")
def params():
    model = GPT(BASE)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((2, 8), jnp.int32))


@pytest.mark.parametrize(
    "quant",
    [
        # nightly (9.3s call + 9.6s fixture solo): the bf16-cache variant;
        # the int8 flagship config stays in the verification tier.
        pytest.param(False, marks=pytest.mark.nightly),
        True,
    ])
def test_flat_generator_bit_matches_4d(params, quant):
    """Off-TPU the flat path must be bit-identical to the 4-D GQA path —
    sampled tokens (not just logits), across the windowed-refresh phase
    (40 new tokens at block 32 forces a refresh re-prefill)."""
    c4 = dataclasses.replace(BASE, kv_quantized=quant)
    cf = dataclasses.replace(BASE, kv_quantized=quant, flat_kv=True)
    g4 = Generator(GPT(c4), max_new_tokens=40, temperature=0.8, top_k=20)
    gf = Generator(GPT(cf), max_new_tokens=40, temperature=0.8, top_k=20)
    prompts = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 96)
    t4 = jax.device_get(g4.generate(params, prompts, seed=7))
    tf = jax.device_get(gf.generate(params, prompts, seed=7))
    np.testing.assert_array_equal(t4, tf)


@pytest.mark.nightly
def test_flat_serving_matches_4d_engine(params):
    """Ring mode + admission: a flat_kv server's greedy outputs equal the
    4-D server's (the engine's roll/scatter admission is layout-agnostic
    over a row's leading position axis)."""
    from ai_music_generation_tpu.serve.engine import GenerationServer

    prompts = [[1, 2, 3], [4, 5, 6, 7, 8], [9, 10]]
    outs = {}
    for name, flat in (("4d", False), ("flat", True)):
        cfg = dataclasses.replace(BASE, flat_kv=flat)
        srv = GenerationServer(GPT(cfg), params, n_slots=4, ticks_per_call=4)
        rids = [srv.submit(p, max_new_tokens=10, temperature=0.0, seed=0)
                for p in prompts]
        done = {r.id: r for r in srv.run_until_idle()}
        outs[name] = [done[r].generated for r in rids]
    assert outs["4d"] == outs["flat"]


def test_kernel_under_shard_map_matches_reference():
    """The Pallas kernel composes with ``jax.shard_map`` over the batch
    (data) axis — the multi-chip flat-kv decode shape (serve/engine.py
    ``_scan``): each shard runs the kernel (interpret mode here) on its
    local rows, KV heads whole, shared scalar ``pos`` replicated. Output
    and cache writes must equal the unsharded reference bit-for-bit."""
    from jax.sharding import PartitionSpec as P

    from ai_music_generation_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
    pos = 9
    args = _inputs(False, False, pos)  # (q_bd, k, v, kslab, vslab, N, N, N)
    ref_k, ref_v, ref_out = gqa_decode_reference(
        *args, pos, n_head=H, n_kv_head=KH)

    def local(q_bd, k, v, kslab, vslab):
        return gqa_decode_update(
            q_bd, k, v, kslab, vslab, None, None, None, pos,
            n_head=H, n_kv_head=KH, interpret=True)

    row = P("data")
    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so the replication checker cannot see through it (same
    # setting as engine._scan's shard_map)
    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(row,) * 5, out_specs=(row,) * 3,
        check_vma=False)
    kk, vk, outk = sharded(*args[:5])
    np.testing.assert_array_equal(np.asarray(ref_k), np.asarray(kk))
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(vk))
    a = np.asarray(ref_out, np.float32)
    b = np.asarray(outk, np.float32)
    assert np.max(np.abs(a - b)) / (np.abs(a).max() + 1e-6) < 2e-2


@pytest.mark.nightly
def test_engine_flat_kv_sharded_over_mesh(params):
    """Multi-chip flat-kv serving (VERDICT r4 #1): ``GenerationServer(
    mesh=)`` on a DATA-ONLY mesh runs the decode scan under shard_map
    (engine._scan) and must reproduce the single-chip engine's bytes —
    including a SAMPLED (non-greedy) request, because per-slot RNG
    (fold_in(PRNGKey(seed), gen)) is invariant to slot placement and
    shard count. A model-axis mesh is rejected loudly."""
    from ai_music_generation_tpu.parallel.mesh import make_mesh
    from ai_music_generation_tpu.serve.engine import GenerationServer

    cfg = dataclasses.replace(BASE, flat_kv=True)
    model = GPT(cfg)
    mesh = make_mesh(n_data=8, n_model=1)

    def run(use_mesh):
        srv = GenerationServer(model, params, n_slots=8, ticks_per_call=4,
                               mesh=mesh if use_mesh else None)
        a = srv.submit([1, 2, 3], max_new_tokens=12, seed=11)
        b = srv.submit([5] * 9, max_new_tokens=20, seed=22, temperature=1.2,
                       top_p=0.9)
        c = srv.submit([7, 8], max_new_tokens=8, temperature=0.0, seed=3)
        return {r.id: r.generated for r in srv.run_until_idle()}, (a, b, c)

    plain, ids = run(False)
    sharded, ids2 = run(True)
    for i, j in zip(ids, ids2):
        assert plain[i] == sharded[j]

    with pytest.raises(ValueError, match="data axis only"):
        GenerationServer(model, params, n_slots=8, ticks_per_call=4,
                         mesh=make_mesh(n_data=4, n_model=2))

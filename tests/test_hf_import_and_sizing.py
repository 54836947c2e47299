"""HF GPT-2 import equivalence + sizing accounting + train bench smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.models.gpt import GPT, GPTConfig, num_params
from ai_music_generation_tpu.models.hf_import import (
    config_from_hf,
    params_from_hf_state,
)
from ai_music_generation_tpu.utils.sizing import (
    params_breakdown,
    print_report,
    projected_tokens_per_sec,
    sizing_report,
)


@pytest.fixture(scope="module")
def tiny_hf_model():
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(
        n_positions=32, vocab_size=96, n_layer=2, n_head=2, n_embd=32,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
    )
    torch.manual_seed(0)
    return GPT2LMHeadModel(hf_cfg).eval()


def test_hf_import_matches_hf_forward(tiny_hf_model):
    """Imported params must reproduce HF logits on the same input."""
    import torch

    config = config_from_hf(tiny_hf_model.config)
    config = config.__class__(**{**config.__dict__, "dtype": jnp.float32})
    params = params_from_hf_state(dict(tiny_hf_model.state_dict()), config)

    ids = np.array([[5, 17, 42, 3, 8, 61]], np.int32)
    with torch.no_grad():
        hf_logits = tiny_hf_model(torch.tensor(ids, dtype=torch.long)).logits.numpy()

    model = GPT(config)
    logits, _, _ = model.apply(params, jnp.asarray(ids), jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-3, rtol=2e-3)


def test_sizing_matches_actual_params():
    cfg = GPTConfig(block_size=64, vocab_size=96, n_layer=3, n_head=2,
                    n_embd=32, bias=True, dtype=jnp.float32)
    bd = params_breakdown(cfg)
    params = GPT(cfg).init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    assert bd["total"] == num_params(params, non_embedding=False)
    assert bd["non_embedding"] == num_params(params, non_embedding=True)
    # bias=False variant
    cfg2 = GPTConfig(block_size=64, vocab_size=96, n_layer=3, n_head=2,
                     n_embd=32, bias=False, dtype=jnp.float32)
    params2 = GPT(cfg2).init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    assert params_breakdown(cfg2)["total"] == num_params(params2, non_embedding=False)


def test_sizing_report_and_projection(capsys):
    cfg = GPTConfig(block_size=256, vocab_size=128, n_layer=6, n_head=6, n_embd=384)
    rep = sizing_report(cfg)
    assert rep.flops_per_token > 6 * rep.params_non_embedding
    assert projected_tokens_per_sec(cfg, mfu=0.4) > 0
    print_report(cfg)
    out = capsys.readouterr().out
    assert "flops/token" in out


@pytest.mark.nightly
def test_train_bench_simple_mode(capsys):
    from ai_music_generation_tpu.cli.train_bench import main

    dt, mfu = main([
        "--batch_size=2", "--block_size=32", "--n_layer=2", "--n_head=2",
        "--n_embd=32", "--vocab_size=64", "--burn_in=1", "--num_steps=3",
        "--dtype=float32",
    ])
    assert dt > 0
    out = capsys.readouterr().out
    assert "time per iteration" in out and "MFU" in out

"""Chinchilla scaling-law calculators (ref: nanoGPT/scaling_laws.ipynb)."""

import pytest

from ai_music_generation_tpu.utils.scaling_laws import (
    chinchilla_flops,
    chinchilla_loss,
    chinchilla_params,
    compute_optimal,
    gpt_params,
    optimal_for_params,
)


def test_gpt2_small_param_count():
    """GPT-2 small must come out at ~124M (the notebook's anchor)."""
    n = gpt_params(seq_len=1024, vocab_size=50257, d_model=768,
                   num_heads=12, num_layers=12)
    assert abs(n - 124e6) / 124e6 < 0.01


def test_chinchilla_70b_param_count():
    """Chinchilla 70B config (paper table 1: 80L, d8192, 64H, ffw 4d)."""
    n = chinchilla_params(seq_len=2048, vocab_size=32000, d_model=8192,
                          num_heads=64, num_layers=80, ffw_size=4 * 8192)
    assert abs(n - 70e9) / 70e9 < 0.05


def test_flops_close_to_6nd():
    """Appendix-F accounting stays within ~15% of the 6ND rule at 2048 ctx."""
    kw = dict(seq_len=2048, vocab_size=32000, d_model=4096, num_heads=32,
              num_layers=40, ffw_size=4 * 4096)
    f = chinchilla_flops(**kw)
    n = chinchilla_params(**kw)
    approx = 6 * n * kw["seq_len"]
    assert abs(f - approx) / approx < 0.15


def test_loss_surface_monotone():
    assert chinchilla_loss(1e9, 1e11) > chinchilla_loss(1e10, 1e11)
    assert chinchilla_loss(1e9, 1e11) > chinchilla_loss(1e9, 1e12)
    assert chinchilla_loss(1e12, 1e14) > 1.69  # never below entropy


def test_compute_optimal_matches_paper_anchor():
    """Gopher's budget (5.76e23): the Approach-3 closed form with the
    paper's fitted constants allocates ~32B params at ~93 tokens/param.
    (Known discrepancy vs the 20-tok/param Approach-1/2 headline — the
    reference notebook itself remarks its Approach-3 numbers don't match
    Table A3.)"""
    opt = compute_optimal(5.76e23)
    assert 1e10 < opt.n_params < 1e11
    assert 50 < opt.tokens_per_param < 150
    # optimality: perturbing N at fixed FLOPs must not improve loss
    for factor in (0.5, 2.0):
        n = opt.n_params * factor
        d = opt.flops / (6 * n)
        assert chinchilla_loss(n, d) > opt.loss


def test_optimal_for_params_roundtrip():
    opt = optimal_for_params(124e6)
    assert abs(opt.n_params - 124e6) / 124e6 < 1e-6
    assert opt.n_tokens > 124e6  # multi-epoch-scale token budget
    back = compute_optimal(opt.flops)
    assert abs(back.n_params - 124e6) / 124e6 < 1e-6

"""HF GPT-2 checkpoint import (parity: nanoGPT/model.py:206-261 from_pretrained).

Maps a transformers ``GPT2LMHeadModel`` state dict onto this framework's
Flax GPT parameter tree. The reference transposes HF's Conv1D weights into
torch Linear layout (ref :236-256); Flax ``Dense`` kernels are [in, out] —
the same layout HF Conv1D uses — so weights map without transposition.

``from_pretrained(name)`` resolves through transformers (works offline from
a local HF cache; raises a clear error in zero-egress environments with no
cache). ``params_from_hf_state`` converts an in-memory model/state dict —
used by the tests with a tiny randomly-initialized GPT-2.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.models.gpt import GPTConfig

# GPT-2 model zoo shapes (ref: nanoGPT/model.py:219-224)
GPT2_CONFIGS = {
    "gpt2": dict(n_layer=12, n_head=12, n_embd=768),
    "gpt2-medium": dict(n_layer=24, n_head=16, n_embd=1024),
    "gpt2-large": dict(n_layer=36, n_head=20, n_embd=1280),
    "gpt2-xl": dict(n_layer=48, n_head=25, n_embd=1600),
}


def params_from_hf_state(state: dict[str, Any], config: GPTConfig):
    """HF GPT2LMHeadModel state-dict -> flax params pytree."""

    def get(name):
        t = state[name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().numpy()
        return jnp.asarray(np.asarray(t), jnp.float32)

    prefix = "transformer." if any(k.startswith("transformer.") for k in state) else ""
    p: dict[str, Any] = {
        "wte": {"embedding": get(f"{prefix}wte.weight")},
        "wpe": {"embedding": get(f"{prefix}wpe.weight")},
        "ln_f": {"scale": get(f"{prefix}ln_f.weight"),
                 "bias": get(f"{prefix}ln_f.bias")},
    }
    for i in range(config.n_layer):
        h = f"{prefix}h.{i}."
        p[f"h_{i}"] = {
            "ln_1": {"scale": get(h + "ln_1.weight"), "bias": get(h + "ln_1.bias")},
            "ln_2": {"scale": get(h + "ln_2.weight"), "bias": get(h + "ln_2.bias")},
            "attn": {
                "c_attn": {"kernel": get(h + "attn.c_attn.weight"),
                           "bias": get(h + "attn.c_attn.bias")},
                "c_proj": {"kernel": get(h + "attn.c_proj.weight"),
                           "bias": get(h + "attn.c_proj.bias")},
            },
            "mlp": {
                "c_fc": {"kernel": get(h + "mlp.c_fc.weight"),
                         "bias": get(h + "mlp.c_fc.bias")},
                "c_proj": {"kernel": get(h + "mlp.c_proj.weight"),
                           "bias": get(h + "mlp.c_proj.bias")},
            },
        }
    return {"params": p}


def config_from_hf(hf_config, dropout: float = 0.0) -> GPTConfig:
    return GPTConfig(
        block_size=hf_config.n_positions,
        vocab_size=hf_config.vocab_size,
        n_layer=hf_config.n_layer,
        n_head=hf_config.n_head,
        n_embd=hf_config.n_embd,
        dropout=dropout,
        bias=True,
    )


def from_pretrained(model_type: str, dropout: float = 0.0):
    """(model config, params) from a HF hub name or local path
    (ref contract: nanoGPT/model.py:206-261)."""
    try:
        from transformers import GPT2LMHeadModel
    except ImportError as e:
        raise RuntimeError("transformers is required for from_pretrained") from e
    try:
        hf = GPT2LMHeadModel.from_pretrained(model_type)
    except Exception as e:
        raise RuntimeError(
            f"could not load {model_type!r} — in a zero-egress environment the "
            "weights must already be in the local HF cache or a local path"
        ) from e
    config = config_from_hf(hf.config, dropout)
    # sanity-check known zoo names against the published shapes
    # (ref: nanoGPT/model.py:219-224) — a wrong local path masquerading as
    # a zoo name fails loudly here instead of training on the wrong model
    expect = GPT2_CONFIGS.get(model_type)
    if expect is not None:
        got = {k: getattr(config, k) for k in expect}
        if got != expect:
            raise ValueError(
                f"{model_type!r} loaded with shapes {got}, expected {expect}")
    params = params_from_hf_state(dict(hf.state_dict()), config)
    return config, params

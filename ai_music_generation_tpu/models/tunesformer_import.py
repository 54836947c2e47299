"""TunesFormer checkpoint import: reference ``weights.pth`` -> Flax params.

The reference auto-downloads a torch checkpoint from the HF hub
(ref: tunesformer/generate.py:57-89, state dict of the TunesFormer module in
tunesformer/utils.py:180-219). This converter maps that state dict onto this
framework's Flax TunesFormer so users can bring the released weights:

- ``patch_level_decoder.patch_embedding`` (torch Linear over the flattened
  one-hot, weight [n_embd, patch_size*128]) -> ``patch_embedding.kernel``
  (transposed; this framework computes the identical gather-sum),
- ``patch_level_decoder.base.*`` (HF GPT2Model) -> ``patch_core.*``,
- ``char_level_decoder.base.transformer.*`` -> ``char_core.*`` and its
  ``wte`` -> ``char_wte`` (lm_head is weight-tied in both),
- HF Conv1D weights are [in, out], the same layout as Flax Dense kernels —
  no transpose (unlike torch Linear).

Usage:

    state = torch.load("weights.pth", map_location="cpu")["model"]
    params = params_from_tunesformer_state(state, config)
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.models.tunesformer import TunesFormerConfig


def _to_np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _core_params(state: Mapping[str, Any], prefix: str, n_layer: int) -> dict:
    def get(name):
        return jnp.asarray(_to_np(state[prefix + name]), jnp.float32)

    core: dict[str, Any] = {
        "wpe": {"embedding": get("wpe.weight")},
        "ln_f": {"scale": get("ln_f.weight"), "bias": get("ln_f.bias")},
    }
    for i in range(n_layer):
        h = f"h.{i}."

        def g(name, h=h):
            return jnp.asarray(_to_np(state[prefix + h + name]), jnp.float32)

        core[f"h_{i}"] = {
            "ln_1": {"scale": g("ln_1.weight"), "bias": g("ln_1.bias")},
            "ln_2": {"scale": g("ln_2.weight"), "bias": g("ln_2.bias")},
            "attn": {
                "c_attn": {"kernel": g("attn.c_attn.weight"),
                           "bias": g("attn.c_attn.bias")},
                "c_proj": {"kernel": g("attn.c_proj.weight"),
                           "bias": g("attn.c_proj.bias")},
            },
            "mlp": {
                "c_fc": {"kernel": g("mlp.c_fc.weight"),
                         "bias": g("mlp.c_fc.bias")},
                "c_proj": {"kernel": g("mlp.c_proj.weight"),
                           "bias": g("mlp.c_proj.bias")},
            },
        }
    return core


def params_from_tunesformer_state(
    state: Mapping[str, Any], config: TunesFormerConfig
) -> dict:
    """Reference TunesFormer torch state dict -> Flax params pytree."""
    state = {
        k: v for k, v in state.items()
        if not k.endswith(".attn.bias") and not k.endswith(".attn.masked_bias")
    }
    # torch Linear stores [out, in]; flax Dense kernels are [in, out]
    patch_w = _to_np(state["patch_level_decoder.patch_embedding.weight"]).T
    patch_b = _to_np(state["patch_level_decoder.patch_embedding.bias"])
    char_prefix = "char_level_decoder.base.transformer."
    params: dict[str, Any] = {
        "patch_embedding": {
            "kernel": jnp.asarray(patch_w, jnp.float32),
            "bias": jnp.asarray(patch_b, jnp.float32),
        },
        "char_wte": {
            "embedding": jnp.asarray(
                _to_np(state[char_prefix + "wte.weight"]), jnp.float32
            )
        },
    }
    if config.share_weights:
        layers = max(config.patch_layers, config.char_layers)
        params["core"] = _core_params(state, char_prefix, layers)
    else:
        params["patch_core"] = _core_params(
            state, "patch_level_decoder.base.", config.patch_layers
        )
        params["char_core"] = _core_params(state, char_prefix, config.char_layers)
    return {"params": params}


def load_reference_checkpoint(path: str, config: TunesFormerConfig) -> dict:
    """Load a reference ``weights.pth`` (torch CPU) and convert.

    The requested ``config`` is cross-checked against the architecture the
    checkpoint's tensor shapes imply (config_from_reference_state) — a
    deeper checkpoint silently truncated to fewer configured layers, or a
    share_weights mismatch, mis-maps weights without any error otherwise
    (advisor finding r3)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    inferred = config_from_reference_state(state)
    mismatches = {
        field: (getattr(config, field), getattr(inferred, field))
        for field in ("patch_size", "patch_layers", "char_layers", "n_embd",
                      "share_weights")
        if getattr(config, field) != getattr(inferred, field)
    }
    if mismatches:
        detail = ", ".join(f"{k}: configured {a} != checkpoint {b}"
                           for k, (a, b) in mismatches.items())
        raise ValueError(
            f"{path} does not match the configured architecture ({detail}); "
            "pass model args matching the checkpoint (the auto-import paths "
            "infer them via config_from_reference_state)")
    return params_from_tunesformer_state(state, config)


def config_from_reference_state(
    state: Mapping[str, Any], patch_length: int = 128, n_head: int = 12,
    dtype: Any = None,
) -> TunesFormerConfig:
    """Infer a TunesFormerConfig from a reference state dict (shape-driven).

    ``patch_length`` and ``n_head`` are not recoverable from tensor shapes —
    defaults are the reference's published config (ref tunesformer/
    config.py:1-4). Weight sharing is detected by the aliased stacks: the
    patch core's wte is the 128-vocab char wte and layer 0 tensors match.
    """
    w = _to_np(state["patch_level_decoder.patch_embedding.weight"])
    n_embd, flat = int(w.shape[0]), int(w.shape[1])

    def n_layers(prefix):
        head = prefix + "h."
        return 1 + max(int(k[len(head):].split(".")[0]) for k in state
                       if k.startswith(head))

    patch_layers = n_layers("patch_level_decoder.base.")
    char_layers = n_layers("char_level_decoder.base.transformer.")
    patch_wte = _to_np(state["patch_level_decoder.base.wte.weight"])
    share = int(patch_wte.shape[0]) == 128 and patch_layers == char_layers
    if share:
        a = _to_np(state["patch_level_decoder.base.h.0.ln_1.weight"])
        b = _to_np(state["char_level_decoder.base.transformer.h.0.ln_1.weight"])
        share = a.shape == b.shape and bool(np.array_equal(a, b))
    kwargs: dict[str, Any] = {}
    if dtype is not None:
        kwargs["dtype"] = dtype
    return TunesFormerConfig(
        patch_length=patch_length, patch_size=flat // 128,
        patch_layers=patch_layers, char_layers=char_layers,
        n_embd=n_embd, n_head=n_head, share_weights=share, **kwargs,
    )

"""Two-way bridge for the reference's trained ``ckpt.pt`` checkpoints.

The reference trainer persists {model state_dict, optimizer state_dict,
model_args, iter_num, best_val_loss, config} as ``ckpt.pt`` /
``last_iter_ckpt.pt`` (ref: nanoGPT/train.py:316-329). That is the artifact
a migrating user actually owns — distinct from the HF-hub GPT-2 format
already handled by :mod:`ai_music_generation_tpu.models.hf_import`:
nanoGPT's modules are ``torch.nn.Linear`` (weights stored [out, in]),
while HF GPT-2 uses Conv1D ([in, out], the Flax ``Dense`` layout), so this
bridge transposes every projection kernel where hf_import copies verbatim.

Import direction (``ckpt.pt`` -> Flax):
- strips torch.compile's ``_orig_mod.`` key prefix exactly like the
  reference's own resume path (ref: nanoGPT/train.py:189-192);
- ignores the non-flash causal-mask buffers ``*.attn.bias`` /
  ``*.attn.masked_bias`` (ref: nanoGPT/sample.py:62-65 strips the prefix,
  model.py:54-59 registers the buffer only when flash is unavailable);
- ``lm_head.weight`` is tied to ``wte.weight`` in both frameworks and is
  not materialized separately (ref: nanoGPT/model.py:140).

Export direction (Flax -> ``ckpt.pt``): emits the full reference key set
(including the tied ``lm_head.weight``), plus a loadable fresh AdamW
optimizer state_dict with nanoGPT's decay/no-decay param groups
(dim >= 2 decays, ref: nanoGPT/model.py:263-287) so the reference's
unconditional ``optimizer.load_state_dict(checkpoint["optimizer"])``
(ref: nanoGPT/train.py:216) succeeds on resume — moments start fresh;
optax and torch AdamW moment tensors are not interchangeable and we do not
pretend otherwise.

torch is required only for the ``.pt``-file read/write entry points; the
state-dict mappers are pure numpy and run everywhere.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.models.gpt import GPTConfig

# model_args persisted by the reference trainer (ref: nanoGPT/train.py:161-163)
MODEL_ARGS_KEYS = ("n_layer", "n_head", "n_embd", "block_size", "bias", "vocab_size")

_ORIG_MOD = "_orig_mod."


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def strip_compile_prefix(state: Mapping[str, Any]) -> dict[str, Any]:
    """Remove torch.compile's ``_orig_mod.`` prefix (ref: train.py:189-192)."""
    return {
        (k[len(_ORIG_MOD):] if k.startswith(_ORIG_MOD) else k): v
        for k, v in state.items()
    }


def config_from_model_args(model_args: Mapping[str, Any], **overrides) -> GPTConfig:
    """GPTConfig from a checkpoint's model_args dict (ref: train.py:184)."""
    kwargs = {k: model_args[k] for k in MODEL_ARGS_KEYS}
    kwargs["dropout"] = float(model_args.get("dropout", 0.0))
    kwargs.update(overrides)
    return GPTConfig(**kwargs)


def params_from_nanogpt_state(
    state: Mapping[str, Any], config: GPTConfig
) -> dict[str, Any]:
    """nanoGPT ``checkpoint["model"]`` state dict -> Flax params pytree.

    torch Linear stores [out, in]; Flax Dense kernels are [in, out] — every
    projection weight is transposed (contrast hf_import, where HF's Conv1D
    already matches the Flax layout).
    """
    state = strip_compile_prefix(state)

    def emb(name):
        return jnp.asarray(_to_np(state[name]), jnp.float32)

    def lin(name):  # torch Linear [out, in] -> Flax [in, out]
        return jnp.asarray(_to_np(state[name]).T, jnp.float32)

    def maybe_bias(d: dict, flax_name: str, key: str):
        if config.bias:
            d[flax_name] = emb(key)

    ln_f = {"scale": emb("transformer.ln_f.weight")}
    maybe_bias(ln_f, "bias", "transformer.ln_f.bias")
    p: dict[str, Any] = {
        "wte": {"embedding": emb("transformer.wte.weight")},
        "wpe": {"embedding": emb("transformer.wpe.weight")},
        "ln_f": ln_f,
    }
    for i in range(config.n_layer):
        h = f"transformer.h.{i}."
        ln_1 = {"scale": emb(h + "ln_1.weight")}
        maybe_bias(ln_1, "bias", h + "ln_1.bias")
        ln_2 = {"scale": emb(h + "ln_2.weight")}
        maybe_bias(ln_2, "bias", h + "ln_2.bias")
        attn = {
            "c_attn": {"kernel": lin(h + "attn.c_attn.weight")},
            "c_proj": {"kernel": lin(h + "attn.c_proj.weight")},
        }
        maybe_bias(attn["c_attn"], "bias", h + "attn.c_attn.bias")
        maybe_bias(attn["c_proj"], "bias", h + "attn.c_proj.bias")
        mlp = {
            "c_fc": {"kernel": lin(h + "mlp.c_fc.weight")},
            "c_proj": {"kernel": lin(h + "mlp.c_proj.weight")},
        }
        maybe_bias(mlp["c_fc"], "bias", h + "mlp.c_fc.bias")
        maybe_bias(mlp["c_proj"], "bias", h + "mlp.c_proj.bias")
        p[f"h_{i}"] = {"ln_1": ln_1, "ln_2": ln_2, "attn": attn, "mlp": mlp}
    return {"params": p}


def nanogpt_state_from_params(
    params: Mapping[str, Any], config: GPTConfig
) -> dict[str, np.ndarray]:
    """Flax params pytree -> nanoGPT state dict (numpy fp32, torch layouts).

    Emits the exact key set ``GPT(config).state_dict()`` produces on a
    flash-attention torch build (the reference's own checkpoints on
    torch >= 2.0 — no ``attn.bias`` mask buffers), including the tied
    ``lm_head.weight`` sharing storage with ``transformer.wte.weight``.
    A torch < 2.0 reference build registers persistent causal-mask buffers
    and its strict ``load_state_dict`` would report them missing — pass
    ``mask_buffers=True`` to :func:`save_reference_ckpt` (or load with
    ``strict=False``) there.
    """
    p = params["params"] if "params" in params else params

    def npf(x):
        return np.asarray(x, np.float32)

    if getattr(config, "n_expert", 0) > 0:
        raise ValueError(
            "MoE models cannot export to the reference ckpt.pt format — "
            "nanoGPT has no MoE layer (ref: nanoGPT/model.py:78-92)")
    wte = npf(p["wte"]["embedding"])
    out: dict[str, np.ndarray] = {
        "transformer.wte.weight": wte,
        "transformer.wpe.weight": npf(p["wpe"]["embedding"]),
    }
    for i in range(config.n_layer):
        blk = p[f"h_{i}"]
        h = f"transformer.h.{i}."
        out[h + "ln_1.weight"] = npf(blk["ln_1"]["scale"])
        out[h + "attn.c_attn.weight"] = npf(blk["attn"]["c_attn"]["kernel"]).T
        out[h + "attn.c_proj.weight"] = npf(blk["attn"]["c_proj"]["kernel"]).T
        out[h + "ln_2.weight"] = npf(blk["ln_2"]["scale"])
        out[h + "mlp.c_fc.weight"] = npf(blk["mlp"]["c_fc"]["kernel"]).T
        out[h + "mlp.c_proj.weight"] = npf(blk["mlp"]["c_proj"]["kernel"]).T
        if config.bias:
            out[h + "ln_1.bias"] = npf(blk["ln_1"]["bias"])
            out[h + "attn.c_attn.bias"] = npf(blk["attn"]["c_attn"]["bias"])
            out[h + "attn.c_proj.bias"] = npf(blk["attn"]["c_proj"]["bias"])
            out[h + "ln_2.bias"] = npf(blk["ln_2"]["bias"])
            out[h + "mlp.c_fc.bias"] = npf(blk["mlp"]["c_fc"]["bias"])
            out[h + "mlp.c_proj.bias"] = npf(blk["mlp"]["c_proj"]["bias"])
    out["transformer.ln_f.weight"] = npf(p["ln_f"]["scale"])
    if config.bias:
        out["transformer.ln_f.bias"] = npf(p["ln_f"]["bias"])
    out["lm_head.weight"] = wte  # weight tying (ref: nanoGPT/model.py:140)
    return out


def _fresh_adamw_state_dict(
    state: Mapping[str, np.ndarray],
    learning_rate: float,
    weight_decay: float,
    beta1: float,
    beta2: float,
) -> dict:
    """A loadable torch AdamW state_dict with nanoGPT's param groups.

    Group 0 = decayed (ndim >= 2), group 1 = undecayed, over the model's
    deduplicated parameters in state-dict order — the same partition
    ``GPT.configure_optimizers`` builds (ref: nanoGPT/model.py:263-287), so
    ``optimizer.load_state_dict`` on the reference side sees matching group
    sizes. Moment state is empty (fresh), which torch accepts.
    """
    import torch

    seen: set[int] = set()
    decay, nodecay = [], []
    for arr in state.values():
        if id(arr) in seen:  # tied lm_head/wte count once, like named_parameters
            continue
        seen.add(id(arr))
        t = torch.nn.Parameter(torch.from_numpy(np.array(arr, np.float32, copy=True)))
        (decay if t.dim() >= 2 else nodecay).append(t)
    groups = [
        {"params": decay, "weight_decay": weight_decay},
        {"params": nodecay, "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(groups, lr=learning_rate, betas=(beta1, beta2))
    return opt.state_dict()


def save_reference_ckpt(
    path: str,
    params: Mapping[str, Any],
    config: GPTConfig,
    iter_num: int = 0,
    best_val_loss: float = 1e9,
    train_config: Mapping[str, Any] | None = None,
    mask_buffers: bool = False,
) -> None:
    """Write a ``ckpt.pt`` the reference's train.py/sample.py load as-is
    (ref: nanoGPT/train.py:173-216, sample.py:55-66).

    ``mask_buffers=True`` additionally emits the persistent causal-mask
    buffers ``transformer.h.<i>.attn.bias`` (tril ones, [1,1,T,T]) that a
    NON-flash torch (< 2.0) reference build registers
    (ref: nanoGPT/model.py:45-50) — without them its strict
    ``load_state_dict`` fails with missing keys. Flash builds (torch >= 2.0)
    must NOT get them (unexpected keys): leave the default off there.
    """
    import torch

    if config.kv_heads != config.n_head:
        # a GQA c_attn kernel is [C, C + 2*KH*D], not the reference's
        # [C, 3C] — exporting it would hand the reference a checkpoint its
        # model can't load; fail loudly instead of writing a broken file
        raise ValueError(
            "reference ckpt.pt export requires full multi-head attention "
            f"(n_kv_head={config.n_kv_head}); GQA has no nanoGPT analogue")
    train_config = dict(train_config or {})
    model_args = {k: getattr(config, k) for k in MODEL_ARGS_KEYS}
    model_args["dropout"] = config.dropout
    state = nanogpt_state_from_params(params, config)
    # ONE torch tensor per unique source array: tied keys (lm_head/wte) must
    # share a single Storage so torch.save serializes it once and the
    # reference side sees the tie (and optimizer group sizes stay correct —
    # separate from_numpy calls create separate Storages even over the same
    # memory, which torch.save would duplicate)
    tcache: dict[int, Any] = {}

    def as_tensor(v: np.ndarray):
        if id(v) not in tcache:
            tcache[id(v)] = torch.from_numpy(
                np.array(v, np.float32, copy=True))
        return tcache[id(v)]

    model_sd = {k: as_tensor(v) for k, v in state.items()}
    if mask_buffers:
        # one shared tril tensor for all layers (buffers, NOT parameters —
        # they stay out of the optimizer groups built from `state` below)
        tril = torch.tril(torch.ones(config.block_size, config.block_size)
                          ).view(1, 1, config.block_size, config.block_size)
        for i in range(config.n_layer):
            model_sd[f"transformer.h.{i}.attn.bias"] = tril
    ckpt = {
        "model": model_sd,
        "optimizer": _fresh_adamw_state_dict(
            state,
            learning_rate=float(train_config.get("learning_rate", 6e-4)),
            weight_decay=float(train_config.get("weight_decay", 0.1)),
            beta1=float(train_config.get("beta1", 0.9)),
            beta2=float(train_config.get("beta2", 0.95)),
        ),
        "model_args": model_args,
        "iter_num": int(iter_num),
        "best_val_loss": float(best_val_loss),
        "config": train_config,
    }
    torch.save(ckpt, path)


def load_reference_ckpt(path: str, **config_overrides):
    """Read a reference ``ckpt.pt`` -> (GPTConfig, Flax params, meta dict).

    meta carries {model_args, iter_num, best_val_loss, config} with the
    reference's exact semantics so callers can persist it unchanged.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    config = config_from_model_args(ckpt["model_args"], **config_overrides)
    params = params_from_nanogpt_state(ckpt["model"], config)
    meta = {
        "model_args": {k: ckpt["model_args"][k] for k in MODEL_ARGS_KEYS},
        "iter_num": int(ckpt.get("iter_num", 0)),
        "best_val_loss": float(ckpt.get("best_val_loss", 1e9)),
        "config": dict(ckpt.get("config", {})),
    }
    return config, params, meta

"""TunesFormer checkpoint export: Flax params -> reference ``weights.pth``.

Inverse of :mod:`ai_music_generation_tpu.models.tunesformer_import` — lets a
model trained in this framework be loaded by the reference's generate.py
(``torch.load(...)["model"]`` into the TunesFormer module defined in
ref tunesformer/utils.py:180-219) and resumed by its train.py
(ref tunesformer/train.py:161-172, which also restores optimizer/lr_sched/
epoch state — emitted fresh here; torch and optax moments are not
interchangeable).

Layout rules (mirror of the import):
- ``patch_level_decoder.patch_embedding`` is a torch Linear — weight stored
  [n_embd, patch_size*128], our Flax kernel transposed;
- the GPT-2 cores are HF modules whose Conv1D weights are [in, out], the
  Flax ``Dense`` layout — copied without transpose;
- ``char_level_decoder.base.lm_head.weight`` is weight-tied to the char
  ``wte`` in both frameworks — emitted as the same array;
- non-shared models: the patch core's HF ``wte`` ([1, n_embd],
  vocab_size=1) is an artifact of feeding ``inputs_embeds`` and is never
  read by either framework — emitted as zeros;
- shared models (``share_weights=True``): the reference aliases
  ``patch_level_decoder.base = char_level_decoder.base.transformer``
  (ref utils.py:207-208), so its state dict carries BOTH prefixes pointing
  at the same tensors — reproduced here from the single ``core``.

The mapper is pure numpy; torch is needed only by
:func:`save_reference_checkpoint`.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ai_music_generation_tpu.models.tunesformer import TunesFormerConfig


def _npf(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _core_state(core: Mapping[str, Any], n_layer: int) -> dict[str, np.ndarray]:
    """Core params -> relative-key state dict (one numpy object per leaf, so
    tied/aliased emission sites can share storage identity for dedup)."""
    out: dict[str, np.ndarray] = {"wpe.weight": _npf(core["wpe"]["embedding"])}
    for i in range(n_layer):
        blk = core[f"h_{i}"]
        h = f"h.{i}."
        out[h + "ln_1.weight"] = _npf(blk["ln_1"]["scale"])
        out[h + "ln_1.bias"] = _npf(blk["ln_1"]["bias"])
        out[h + "attn.c_attn.weight"] = _npf(blk["attn"]["c_attn"]["kernel"])
        out[h + "attn.c_attn.bias"] = _npf(blk["attn"]["c_attn"]["bias"])
        out[h + "attn.c_proj.weight"] = _npf(blk["attn"]["c_proj"]["kernel"])
        out[h + "attn.c_proj.bias"] = _npf(blk["attn"]["c_proj"]["bias"])
        out[h + "ln_2.weight"] = _npf(blk["ln_2"]["scale"])
        out[h + "ln_2.bias"] = _npf(blk["ln_2"]["bias"])
        out[h + "mlp.c_fc.weight"] = _npf(blk["mlp"]["c_fc"]["kernel"])
        out[h + "mlp.c_fc.bias"] = _npf(blk["mlp"]["c_fc"]["bias"])
        out[h + "mlp.c_proj.weight"] = _npf(blk["mlp"]["c_proj"]["kernel"])
        out[h + "mlp.c_proj.bias"] = _npf(blk["mlp"]["c_proj"]["bias"])
    out["ln_f.weight"] = _npf(core["ln_f"]["scale"])
    out["ln_f.bias"] = _npf(core["ln_f"]["bias"])
    return out


def tunesformer_state_from_params(
    params: Mapping[str, Any], config: TunesFormerConfig
) -> dict[str, np.ndarray]:
    """Flax params pytree -> reference TunesFormer state dict (numpy fp32)."""
    p = params["params"] if "params" in params else params
    char_prefix = "char_level_decoder.base.transformer."
    char_wte = _npf(p["char_wte"]["embedding"])
    out: dict[str, np.ndarray] = {
        # torch Linear stores [out, in] — transpose of the Flax kernel
        "patch_level_decoder.patch_embedding.weight":
            _npf(p["patch_embedding"]["kernel"]).T,
        "patch_level_decoder.patch_embedding.bias":
            _npf(p["patch_embedding"]["bias"]),
        char_prefix + "wte.weight": char_wte,
        "char_level_decoder.base.lm_head.weight": char_wte,  # tied
    }
    if config.share_weights:
        layers = max(config.patch_layers, config.char_layers)
        core_sd = _core_state(p["core"], layers)
        for k, v in core_sd.items():  # same arrays under both prefixes (alias)
            out["patch_level_decoder.base." + k] = v
            out[char_prefix + k] = v
        # the aliased base IS the char transformer, so its wte is the char wte
        out["patch_level_decoder.base.wte.weight"] = char_wte
    else:
        for k, v in _core_state(p["patch_core"], config.patch_layers).items():
            out["patch_level_decoder.base." + k] = v
        for k, v in _core_state(p["char_core"], config.char_layers).items():
            out[char_prefix + k] = v
        # vocab_size=1 embedding, never read (inputs_embeds path)
        out["patch_level_decoder.base.wte.weight"] = np.zeros(
            (1, config.n_embd), np.float32)
    return out


def save_reference_checkpoint(
    path: str,
    params: Mapping[str, Any],
    config: TunesFormerConfig,
    epoch: int = 0,
    best_epoch: int = 0,
    min_eval_loss: float = 100.0,
) -> None:
    """Write a ``weights.pth`` with the reference's checkpoint keys
    (ref: tunesformer/train.py:189-208). Optimizer and lr_sched state are
    fresh (single AdamW group over all params, the reference's own setup at
    train.py:151-158); generation (ref generate.py:87-89) reads only
    ``model``."""
    import torch

    state = tunesformer_state_from_params(params, config)
    # one tensor per unique source array: tied/aliased keys must share a
    # single Storage so torch.save serializes the tie (and a reference-side
    # AdamW(model.parameters()) sees matching parameter counts)
    tcache: dict[int, Any] = {}

    def as_tensor(v: np.ndarray):
        if id(v) not in tcache:
            tcache[id(v)] = torch.from_numpy(np.array(v, np.float32, copy=True))
        return tcache[id(v)]

    tensors = {k: as_tensor(v) for k, v in state.items()}
    torch_params = [torch.nn.Parameter(t.clone())
                    for t in dict.fromkeys(tensors.values())]
    opt = torch.optim.AdamW(torch_params, lr=5e-5)  # ref train.py:151
    sched = torch.optim.lr_scheduler.LambdaLR(opt, lambda _: 1.0)
    torch.save(
        {
            "model": tensors,
            "optimizer": opt.state_dict(),
            "lr_sched": sched.state_dict(),
            "epoch": int(epoch),
            "best_epoch": int(best_epoch),
            "min_eval_loss": float(min_eval_loss),
        },
        path,
    )

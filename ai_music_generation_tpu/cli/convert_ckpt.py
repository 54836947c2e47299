"""Two-way checkpoint conversion between this framework and the reference.

Closes the migration loop in both directions for both model families:

  # reference nanoGPT ckpt.pt  ->  framework out_dir (cli/sample.py-ready)
  python -m ai_music_generation_tpu.cli.convert_ckpt gpt from-torch \
      --ckpt out/ckpt.pt --out_dir out-imported

  # framework out_dir  ->  reference ckpt.pt (nanoGPT sample.py/train.py-ready)
  python -m ai_music_generation_tpu.cli.convert_ckpt gpt to-torch \
      --out_dir out-bach --out ckpt.pt

  # reference TunesFormer weights.pth  ->  framework out_dir
  python -m ai_music_generation_tpu.cli.convert_ckpt tunesformer from-torch \
      --ckpt weights.pth --out_dir tunes-imported

  # framework out_dir  ->  reference weights.pth (tunesformer generate.py-ready)
  python -m ai_music_generation_tpu.cli.convert_ckpt tunesformer to-torch \
      --out_dir tunes-out --out weights.pth

Formats: ref nanoGPT/train.py:316-329 (ckpt.pt), ref tunesformer/
train.py:189-208 + generate.py:87-89 (weights.pth). Optimizer moments never
cross the torch<->optax boundary — exported checkpoints carry fresh
optimizer state (loadable, zero moments); imported ones are
sampling/generation-ready and serve as fine-tune inits.
"""

from __future__ import annotations

import argparse
import os

from ai_music_generation_tpu.train import checkpoint as ckpt_lib


def _gpt_from_torch(args) -> None:
    from ai_music_generation_tpu.models.nanogpt_ckpt import load_reference_ckpt

    config, params, meta = load_reference_ckpt(args.ckpt)
    os.makedirs(args.out_dir, exist_ok=True)
    ckpt_lib.save_checkpoint(
        args.out_dir, args.name, {"params": params},
        model_args=meta["model_args"], iter_num=meta["iter_num"],
        best_val_loss=meta["best_val_loss"], config=meta["config"],
    )
    print(f"imported {args.ckpt} -> {args.out_dir}/{args.name} "
          f"({config.n_layer}L/{config.n_head}H/{config.n_embd}d, "
          f"vocab {config.vocab_size}, iter {meta['iter_num']})")


def _gpt_to_torch(args) -> None:
    from ai_music_generation_tpu.models.nanogpt_ckpt import (
        config_from_model_args, save_reference_ckpt)

    state, meta = ckpt_lib.load_checkpoint(args.out_dir, args.name)
    config = config_from_model_args(
        {**meta["model_args"],
         "dropout": meta.get("config", {}).get("dropout", 0.0)})
    save_reference_ckpt(
        args.out, state["params"], config,
        iter_num=meta["iter_num"], best_val_loss=meta["best_val_loss"],
        train_config=meta.get("config", {}),
        mask_buffers=args.mask_buffers,
    )
    print(f"exported {args.out_dir}/{args.name} -> {args.out} "
          f"({config.n_layer}L/{config.n_head}H/{config.n_embd}d)")


def _tunes_from_torch(args) -> None:
    import torch

    from ai_music_generation_tpu.models.tunesformer_import import (
        config_from_reference_state, params_from_tunesformer_state)

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    state = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    state = {k: v for k, v in state.items()
             if not k.endswith(".attn.bias")
             and not k.endswith(".attn.masked_bias")}
    cfg = config_from_reference_state(
        state, patch_length=args.patch_length, n_head=args.n_head)
    params = params_from_tunesformer_state(state, cfg)
    os.makedirs(args.out_dir, exist_ok=True)
    ckpt_lib.save_checkpoint(
        args.out_dir, args.name, {"params": params},
        model_args=dict(
            patch_length=cfg.patch_length, patch_size=cfg.patch_size,
            patch_layers=cfg.patch_layers, char_layers=cfg.char_layers,
            n_embd=cfg.n_embd, n_head=cfg.n_head,
            share_weights=cfg.share_weights,
        ),
        iter_num=int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0,
        best_val_loss=float(ckpt.get("min_eval_loss", 100.0))
        if isinstance(ckpt, dict) else 100.0,
        config={},
    )
    print(f"imported {args.ckpt} -> {args.out_dir}/{args.name} "
          f"({cfg.patch_layers}+{cfg.char_layers} layers, {cfg.n_embd}d, "
          f"patch {cfg.patch_length}x{cfg.patch_size}, "
          f"share_weights={cfg.share_weights})")


def _tunes_to_torch(args) -> None:
    from ai_music_generation_tpu.models.tunesformer import load_tunesformer
    from ai_music_generation_tpu.models.tunesformer_export import (
        save_reference_checkpoint)

    model, params, meta = load_tunesformer(args.out_dir, args.name)
    save_reference_checkpoint(
        args.out, params, model.config,
        epoch=meta["iter_num"],
        best_epoch=meta.get("config", {}).get("best_epoch", meta["iter_num"]),
        min_eval_loss=meta["best_val_loss"],
    )
    cfg = model.config
    print(f"exported {args.out_dir}/{args.name} -> {args.out} "
          f"({cfg.patch_layers}+{cfg.char_layers} layers, {cfg.n_embd}d)")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = ap.add_subparsers(dest="family", required=True)

    gpt = sub.add_parser("gpt").add_subparsers(dest="direction", required=True)
    g_from = gpt.add_parser("from-torch")
    g_from.add_argument("--ckpt", required=True, help="reference ckpt.pt")
    g_from.add_argument("--out_dir", required=True)
    g_from.add_argument("--name", default=ckpt_lib.BEST)
    g_from.set_defaults(fn=_gpt_from_torch)
    g_to = gpt.add_parser("to-torch")
    g_to.add_argument("--out_dir", required=True)
    g_to.add_argument("--name", default=ckpt_lib.BEST)
    g_to.add_argument("--out", required=True, help="output ckpt.pt path")
    g_to.add_argument("--mask_buffers", action="store_true",
                      help="also emit transformer.h.*.attn.bias causal-mask "
                           "buffers for NON-flash torch (<2.0) reference "
                           "builds whose strict load_state_dict needs them; "
                           "flash builds (torch>=2.0) must load without "
                           "this flag (or use strict=False)")
    g_to.set_defaults(fn=_gpt_to_torch)

    tf = sub.add_parser("tunesformer").add_subparsers(dest="direction",
                                                      required=True)
    t_from = tf.add_parser("from-torch")
    t_from.add_argument("--ckpt", required=True, help="reference weights.pth")
    t_from.add_argument("--out_dir", required=True)
    t_from.add_argument("--name", default="weights")
    t_from.add_argument("--patch_length", type=int, default=128,
                        help="not recoverable from tensor shapes (ref config.py:1)")
    t_from.add_argument("--n_head", type=int, default=12)
    t_from.set_defaults(fn=_tunes_from_torch)
    t_to = tf.add_parser("to-torch")
    t_to.add_argument("--out_dir", required=True)
    t_to.add_argument("--name", default="weights")
    t_to.add_argument("--out", required=True, help="output weights.pth path")
    t_to.set_defaults(fn=_tunes_to_torch)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()

"""TunesFormer generation CLI, flag-compatible with ref: tunesformer/generate.py.

Parity surface:
- argparse flags -num_tunes -max_patch -top_p -top_k -temperature -seed
  -show_control_code (ref :14-37, same defaults)
- reads the prompt (control codes S:/B:/E: + ABC header) from prompt.txt
  (ref :93-94); control-code lines are hidden from the output unless
  -show_control_code (ref :114-126,141-147)
- per-tune ``X:<i>`` header; tunes joined with blank lines; output written
  to ``output_tunes/<timestamp>.abc`` (ref :113,159-161)

Differences:
- weights load from an orbax checkpoint directory (``-weights``, default
  ``tf_out``) written by cli/tunesformer_train.py. The reference's HF-hub
  auto-download (ref :57-89) requires network egress; a missing checkpoint
  is an explicit error naming the trainer instead.
- all tunes decode in ONE batch through the jitted bar/char loops
  (decode/tunes_generate.py) rather than sequentially.
"""

from __future__ import annotations

import argparse
import os
import time

import jax.numpy as jnp


def get_args(parser: argparse.ArgumentParser):
    # same flags/defaults as ref: tunesformer/generate.py:14-37
    parser.add_argument("-num_tunes", type=int, default=1,
                        help="the number of independently computed returned tunes")
    parser.add_argument("-max_patch", type=int, default=128,
                        help="integer to define the maximum length in tokens of each tune")
    parser.add_argument("-top_p", type=float, default=0.8,
                        help="float to define the tokens that are within the sample operation of text generation")
    parser.add_argument("-top_k", type=int, default=8,
                        help="integer to define the tokens that are within the sample operation of text generation")
    parser.add_argument("-temperature", type=float, default=1.2,
                        help="the temperature of the sampling operation")
    parser.add_argument("-seed", type=int, default=None, help="seed for randomstate")

    def str2bool(v: str) -> bool:
        # deviation from the reference's `type=bool` (ref generate.py:34),
        # under which '-show_control_code False' parsed as True and the
        # flag could never be disabled from the CLI
        return v.strip().lower() not in ("false", "0", "no", "")

    parser.add_argument("-show_control_code", type=str2bool, default=True,
                        help="whether to show control code")
    parser.add_argument("-weights", type=str, default="tf_out",
                        help="orbax checkpoint directory (from tunesformer_train)")
    parser.add_argument("-torch_weights", type=str, default="",
                        help="path to a reference weights.pth (torch) to convert on load")
    parser.add_argument("-prompt", type=str, default="prompt.txt",
                        help="path to the prompt file")
    parser.add_argument("-output_dir", type=str, default="output_tunes")
    return parser.parse_args()


def generate_abc(args) -> str:
    from ai_music_generation_tpu.decode.tunes_generate import TunesGenerator
    from ai_music_generation_tpu.models.tunesformer import TunesFormer, TunesFormerConfig
    from ai_music_generation_tpu.train import checkpoint as ckpt_lib

    torch_weights = getattr(args, "torch_weights", "")
    if torch_weights:
        # reference weights.pth (ref generate.py:57-89 downloads this file;
        # here the user supplies it — zero-egress environments can't fetch)
        from ai_music_generation_tpu.models.tunesformer_import import (
            load_reference_checkpoint,
        )

        cfg = TunesFormerConfig(dropout=0.0, dtype=jnp.bfloat16)
        model = TunesFormer(cfg)
        params = load_reference_checkpoint(torch_weights, cfg)
    else:
        if not ckpt_lib.checkpoint_exists(args.weights, "weights"):
            raise FileNotFoundError(
                f"no checkpoint at {args.weights}/weights — train one with "
                "`python -m ai_music_generation_tpu.cli.tunesformer_train` or "
                "pass -torch_weights weights.pth (the reference checkpoint)"
            )
        from ai_music_generation_tpu.models.tunesformer import (
            load_tunesformer,
        )

        model, params, _ = load_tunesformer(args.weights)

    with open(args.prompt) as f:
        prompt = f.read()

    print(" HYPERPARAMETERS ".center(60, "#"), "\n")
    for key, val in vars(args).items():
        print(f"{key}: {val}")
    print("\n" + " OUTPUT TUNES ".center(60, "#"))

    start_time = time.time()
    gen = TunesGenerator(
        model, top_p=args.top_p, top_k=args.top_k, temperature=args.temperature
    )
    bodies = gen.generate_tunes(
        params, prompt,
        num_tunes=args.num_tunes, max_patch=args.max_patch,
        seed=args.seed, show_control_code=args.show_control_code,
    )
    tunes = ""
    for i, body in enumerate(bodies):
        tune = f"X:{i + 1}\n" + body
        print(tune + "\n")
        tunes += tune + "\n\n"
    print("Generation time: {:.2f} seconds".format(time.time() - start_time))

    os.makedirs(args.output_dir, exist_ok=True)
    timestamp = time.strftime("%a_%d_%b_%Y_%H_%M_%S", time.localtime())
    out_path = os.path.join(args.output_dir, timestamp + ".abc")
    with open(out_path, "w") as f:
        f.write(tunes)
    return out_path


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    generate_abc(get_args(parser))

"""Training CLI, flag-compatible with the reference trainer.

Usage (same shape as ref nanoGPT/train.py:1-17):

    python -m ai_music_generation_tpu.cli.train configs/<exp>.py --batch_size=32

A positional argument is a Python config file executed over the defaults;
``--key=value`` flags override individual keys (ref: nanoGPT/configurator.py).
No torchrun/DDP launcher: multi-chip runs use the same command — the mesh is
built from all visible JAX devices.
"""

import sys

from ai_music_generation_tpu.train.trainer import DEFAULTS, Trainer
from ai_music_generation_tpu.utils.configurator import apply_overrides


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    config = apply_overrides(dict(DEFAULTS), argv)
    trainer = Trainer(config)
    print(f"tokens per iteration will be: {trainer.tokens_per_iter:,}")
    best = trainer.run()
    print(f"best val loss: {best:.4f}")
    return best


if __name__ == "__main__":
    main()

"""TunesFormer generation server CLI: continuous-batching bar decode.

The reference generates tunes only via a batch CLI (ref:
tunesformer/generate.py); this serves the same checkpoints over HTTP with
iteration-level batching (serve/tunes_engine.py) — mixed prompts, sampling
params, and arrival times share one compiled bar program.

    python -m ai_music_generation_tpu.cli.serve_tunesformer \\
        --weights=tf_out --port=8001 --n_slots=16

then:

    curl -s localhost:8001/generate \\
        -d '{"prompt": "S:2\\nB:9\\nE:4\\nB:9\\nL:1/8\\nM:3/4\\nK:D\\n de", "seed": 3}'
"""

from __future__ import annotations

import sys

import jax.numpy as jnp

from ai_music_generation_tpu.serve.http import EngineRunner, serve_tunes
from ai_music_generation_tpu.serve.tunes_engine import TunesServer
from ai_music_generation_tpu.utils.configurator import apply_overrides

DEFAULTS = dict(
    weights="tf_out",
    torch_weights="",
    host="127.0.0.1",
    port=8001,
    n_slots=16,
)


def load_tunesformer(weights: str, torch_weights: str = ""):
    """Build (model, params) from an orbax dir or a reference weights.pth
    (same loading contract as cli/tunesformer_generate.py)."""
    from ai_music_generation_tpu.models.tunesformer import (
        TunesFormer,
        TunesFormerConfig,
    )
    from ai_music_generation_tpu.train import checkpoint as ckpt_lib

    if torch_weights:
        from ai_music_generation_tpu.models.tunesformer_import import (
            load_reference_checkpoint,
        )

        cfg = TunesFormerConfig(dropout=0.0, dtype=jnp.bfloat16)
        model = TunesFormer(cfg)
        return model, load_reference_checkpoint(torch_weights, cfg)
    if not ckpt_lib.checkpoint_exists(weights, "weights"):
        raise FileNotFoundError(
            f"no checkpoint at {weights}/weights — train one with "
            "`python -m ai_music_generation_tpu.cli.tunesformer_train`")
    from ai_music_generation_tpu.models.tunesformer import load_tunesformer

    model, params, _ = load_tunesformer(weights)
    return model, params


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    c = apply_overrides(dict(DEFAULTS), argv)
    model, params = load_tunesformer(c["weights"], c["torch_weights"])
    engine = TunesServer(model, params, n_slots=c["n_slots"])
    if c["prewarm"]:
        print("prewarming bar program...", flush=True)
        engine.prewarm()
    runner = EngineRunner(engine)
    httpd = serve_tunes(runner, c["host"], c["port"])
    print(f"serving TunesFormer {c['weights']} on "
          f"{c['host']}:{httpd.server_address[1]} ({c['n_slots']} slots)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        runner.shutdown()


if __name__ == "__main__":
    main()

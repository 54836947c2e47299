"""Batch TunesFormer sampling over validation leadsheets.

Parity with ref: scripts/irishman_sripts/sample_tunesformer.py — for each
validation leadsheet, build a prompt = control code + the first N measures
(regex split on ``(:\\||::|\\s\\||\\|\\])``), generate a continuation, and
write ``samples/sample_<id>.abc`` with an ``X:<id>`` header.

TPU-native differences:
- tunes are generated in BATCHES through the jitted bar/char decoder
  (decode/tunes_generate.py) instead of rewriting prompt.txt and re-running
  the CLI per tune with output-directory diffing (ref :134-195);
- the reference monkey-patches ``samplings.random_sampling`` to renormalize
  broken probability vectors (ref :52-76); this framework's sampling chain
  (sample_top_p_top_k_temperature) renormalizes by construction, so no
  patch is needed.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import zlib
from pathlib import Path

import jax.numpy as jnp

BAR_SPLIT_RE = re.compile(r"(:\||::|\s\||\|\])")


def prefixes_from_leadsheets(leadsheets, n_measures: int):
    """(id, control_code, prefix_abc) per leadsheet (ref :97-107)."""
    out = []
    for sheet in leadsheets:
        _id = str(sheet.get("id"))
        parts = BAR_SPLIT_RE.split(sheet.get("abc notation", ""))
        prefix = "".join(parts[: n_measures * 2])
        out.append((_id, sheet.get("control code", ""), prefix))
    return out


def normalize_abc(text: str, sample_id: str) -> str:
    """X:<id> header + generated body (ref normalize_abc, :181-195)."""
    body = text.strip()
    # drop any leading X: line the generator may have kept
    lines = body.split("\n")
    if lines and lines[0].startswith("X:"):
        lines = lines[1:]
    return f"X:{sample_id}\n" + "\n".join(lines).strip() + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("validation_json",
                    help="leadsheet JSON with 'id', 'abc notation' (+optional 'control code')")
    ap.add_argument("--weights", default="tf_out")
    ap.add_argument("--output_dir", default="samples")
    ap.add_argument("--n_measures", type=int, default=4)
    ap.add_argument("--max_patch", type=int, default=128)
    ap.add_argument("--top_p", type=float, default=0.8)
    ap.add_argument("--top_k", type=int, default=8)
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--show_control_code", action="store_true")
    ap.add_argument("--limit", type=int, default=0)
    a = ap.parse_args(argv)

    from ai_music_generation_tpu.decode.tunes_generate import TunesGenerator
    from ai_music_generation_tpu.models.tunesformer import load_tunesformer

    model, params, _ = load_tunesformer(a.weights)
    gen = TunesGenerator(model, top_p=a.top_p, top_k=a.top_k,
                         temperature=a.temperature)

    with open(a.validation_json) as f:
        leadsheets = json.load(f)
    prompts = prefixes_from_leadsheets(leadsheets, a.n_measures)
    if a.limit:
        prompts = prompts[: a.limit]

    os.makedirs(a.output_dir, exist_ok=True)
    n = 0
    for _id, control_code, prefix in prompts:
        prompt = (control_code + "\n" if control_code and not control_code.endswith("\n")
                  else control_code) + prefix
        tunes = gen.generate_tunes(
            params, prompt, num_tunes=1, max_patch=a.max_patch,
            seed=a.seed if a.seed is not None else zlib.crc32(_id.encode()),
            show_control_code=a.show_control_code,
        )
        out_path = Path(a.output_dir) / f"sample_{_id}.abc"
        out_path.write_text(normalize_abc(tunes[0], _id))
        n += 1
    print(f"wrote {n} samples to {a.output_dir}")
    return n


if __name__ == "__main__":
    main()

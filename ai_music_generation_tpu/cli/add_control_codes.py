"""TunesFormer training-data curation: ABC dir -> data.json with S:/B:/E: codes.

Parity with ref: tunesformer/data_curation.zip::add_control_codes.py — see
data/curation.py for the section-splitting and code-computation semantics.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path

from ai_music_generation_tpu.data.curation import build_control_code_dataset


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("abc_dir")
    ap.add_argument("--output", default="data.json")
    a = ap.parse_args(argv)
    texts = []
    for path in sorted(Path(a.abc_dir).glob("*.abc")):
        texts.append(path.read_text(encoding="utf-8", errors="replace"))
    data = build_control_code_dataset(texts)
    with open(a.output, "w") as f:
        json.dump(data, f, indent=2)
    print(f"curated {len(data)}/{len(texts)} tunes -> {a.output}")
    return len(data)


if __name__ == "__main__":
    main()

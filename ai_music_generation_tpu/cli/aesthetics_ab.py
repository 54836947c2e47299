"""A/B-compare the real Audiobox-aesthetics scorer against the DSP proxy.

    python -m ai_music_generation_tpu.cli.aesthetics_ab \
        <wav_paths.jsonl> <out_dir> [--batch-size N]

``wav_paths.jsonl`` is the same {"path": ...}-per-line file the eval
pipeline feeds ``audio-aes`` (ref: abc_to_midi_wav_and_aesthetics.py:323).
Writes proxy.jsonl (+ real.jsonl when audio-aes is installed) and
ab_report.json with per-axis mean deltas and Pearson/Spearman agreement.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    from ai_music_generation_tpu.eval.aesthetics import compare_scorers

    ap = argparse.ArgumentParser()
    ap.add_argument("wav_paths_jsonl")
    ap.add_argument("out_dir")
    ap.add_argument("--batch-size", type=int, default=10)
    a = ap.parse_args(argv)
    report = compare_scorers(a.wav_paths_jsonl, a.out_dir, a.batch_size)
    print(json.dumps(report, indent=2))
    if not report["real_available"]:
        print("NOTE: audio-aes not on PATH — only proxy scores produced; "
              "re-run once audio-aes is installed for calibration numbers.")
    return report


if __name__ == "__main__":
    main()

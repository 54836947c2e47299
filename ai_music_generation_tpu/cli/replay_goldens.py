"""Hermetic real-data golden replay harness.

Three parity proofs are blocked in the build environment (no network, no
IrishMAN/Bach corpora, no released weights). This one command turns them
into replayable debt the moment the artifacts exist locally:

1. **Prepare goldens** — the reference pins its corpus stats as trailing
   comments that act as regression oracles
   (ref: nanoGPT/data/irishman/prepare_char.py:110-159 — vocab 95,
   60,944,859 train / 611,888 val tokens; leadsheet subset 12,935,627 /
   117,776; ref: nanoGPT/data/bach/prepare.py trailing comments — vocab 121,
   310,183 train / 30,509 val tokens). Each provided corpus is prepared and
   checked against those numbers.
2. **TunesFormer checkpoint bridge** — the published ``weights.pth``
   (ref: tunesformer/generate.py:57-89 auto-download) is imported, its
   architecture inferred from tensor shapes, exported back to torch, and
   compared tensor-for-tensor (byte equality) — the real-weights leg of the
   two-way bridge validated on synthetic weights in tests/.
3. **Audiobox score parity** — with the released audiobox-aesthetics
   checkpoint (and optionally the ``audio-aes`` CLI on PATH), scores wavs
   through the Flax port, asserts every checkpoint key mapped, and compares
   per-axis scores against the reference scorer
   (ref: scripts/common/abc_to_midi_wav_and_aesthetics.py:323-355).

Every stage is gated on its inputs: absent inputs SKIP with a reason
(exit 0); present inputs must PASS their goldens (any FAIL exits 1).
``--goldens custom.json`` overrides the expected numbers — used by the
plumbing test to replay the whole harness on tiny fixtures.

Usage (full replay):
    python -m ai_music_generation_tpu.cli.replay_goldens \
        --irishman_train train.json --irishman_valid validation.json \
        --leadsheet_train train_leadsheet.json \
        --leadsheet_valid validation_leadsheet.json \
        --bach_train_dir data/bach/train/midi_texts \
        --bach_valid_dir data/bach/validation/midi_texts \
        --bach_extra_vocab_dirs data/irishman_midi/texts \
        --tunesformer_weights weights.pth \
        --audiobox_ckpt checkpoint.pt --wav_jsonl input.jsonl \
        --out_dir /tmp/replay
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Callable, Optional

# Reference golden numbers (see module docstring for ref: citations).
GOLDENS = {
    "irishman_char": {"vocab": 95, "train_tokens": 60_944_859,
                      "val_tokens": 611_888},
    "leadsheet_char": {"vocab": 95, "train_tokens": 12_935_627,
                       "val_tokens": 117_776},
    "bach_midi": {"vocab": 121, "train_tokens": 310_183,
                  "val_tokens": 30_509},
    "tunesformer": {"patch_layers": 9, "char_layers": 3, "n_embd": 768,
                    "patch_size": 32},
    "audiobox_score_atol": 1e-3,
}


class Report:
    def __init__(self):
        self.rows: list[tuple[str, str, str]] = []

    def skip(self, stage: str, why: str):
        self.rows.append((stage, "SKIP", why))
        print(f"SKIP {stage}: {why}")

    def check(self, stage: str, got: dict, want: dict):
        bad = {k: (got.get(k), want[k]) for k in want if got.get(k) != want[k]}
        if bad:
            detail = ", ".join(f"{k}: got {g} want {w}"
                               for k, (g, w) in bad.items())
            self.rows.append((stage, "FAIL", detail))
            print(f"FAIL {stage}: {detail}")
        else:
            self.rows.append((stage, "PASS", json.dumps(got, sort_keys=True)))
            print(f"PASS {stage}: {got}")

    def fail(self, stage: str, why: str):
        self.rows.append((stage, "FAIL", why))
        print(f"FAIL {stage}: {why}")

    def ok(self, stage: str, detail: str):
        self.rows.append((stage, "PASS", detail))
        print(f"PASS {stage}: {detail}")

    @property
    def failed(self) -> bool:
        return any(s == "FAIL" for _, s, _ in self.rows)


def _gate(report: Report, stage: str, *paths: Optional[str]) -> bool:
    """True when every path for the stage is provided and exists."""
    if any(p is None for p in paths):
        report.skip(stage, "inputs not provided")
        return False
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        report.skip(stage, f"missing: {', '.join(missing)}")
        return False
    return True


def _load_json(path: str) -> list:
    with open(path) as f:
        return json.load(f)


def _char_stage(report, goldens, stage, train_json, valid_json, out_dir):
    from ai_music_generation_tpu.data.prepare import prepare_char

    vocab, n_train, n_val = prepare_char(
        _load_json(train_json), _load_json(valid_json),
        os.path.join(out_dir, stage))
    report.check(stage, {"vocab": vocab, "train_tokens": n_train,
                         "val_tokens": n_val}, goldens[stage])


def _bach_stage(report, goldens, train_dir, valid_dir, extra_dirs, out_dir):
    from ai_music_generation_tpu.data.prepare import prepare_midi_texts

    vocab, n_train, n_val = prepare_midi_texts(
        train_dir, valid_dir, os.path.join(out_dir, "bach_midi"),
        extra_dirs or ())
    report.check("bach_midi", {"vocab": vocab, "train_tokens": n_train,
                               "val_tokens": n_val}, goldens["bach_midi"])


def _tunesformer_stage(report, goldens, weights, out_dir):
    import numpy as np
    import torch

    from ai_music_generation_tpu.models.tunesformer_export import (
        tunesformer_state_from_params)
    from ai_music_generation_tpu.models.tunesformer_import import (
        config_from_reference_state,
        params_from_tunesformer_state,
    )

    ckpt = torch.load(weights, map_location="cpu", weights_only=False)
    state = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    state = {k: v for k, v in state.items()
             if not k.endswith((".attn.bias", ".attn.masked_bias"))}
    cfg = config_from_reference_state(state)
    report.check("tunesformer_arch", {
        "patch_layers": cfg.patch_layers, "char_layers": cfg.char_layers,
        "n_embd": cfg.n_embd, "patch_size": cfg.patch_size,
    }, goldens["tunesformer"])

    params = params_from_tunesformer_state(state, cfg)
    back = tunesformer_state_from_params(params, cfg)
    missing = sorted(set(state) - set(back))
    diff = [k for k in back
            if k in state and not np.array_equal(
                np.asarray(back[k], np.float32),
                np.asarray(state[k].float().numpy() if hasattr(state[k], "numpy")
                           else state[k], np.float32))]
    if missing or diff:
        report.fail("tunesformer_bridge",
                    f"missing={missing[:5]} diff={diff[:5]}")
    else:
        report.ok("tunesformer_bridge",
                  f"{len(back)} tensors byte-equal through import->export")


def _audiobox_stage(report, goldens, ckpt, wav_jsonl, out_dir):
    import shutil
    import subprocess

    from ai_music_generation_tpu.eval.audiobox import AesPredictor

    pred = AesPredictor(weights=ckpt)
    if pred.unmapped:
        report.fail("audiobox_keys",
                    f"{len(pred.unmapped)} unmapped checkpoint keys "
                    f"(extend HEAD_KEY_HINTS): {pred.unmapped[:8]}")
        return
    report.ok("audiobox_keys", "all checkpoint keys mapped")
    ours_path = os.path.join(out_dir, "audiobox_ours.jsonl")
    pred.score_jsonl(wav_jsonl, ours_path)
    ours = [json.loads(ln) for ln in open(ours_path)]

    aes = shutil.which("audio-aes")
    if not aes:
        report.skip("audiobox_parity",
                    "audio-aes CLI not on PATH (scores written to "
                    + ours_path + ")")
        return
    theirs_raw = subprocess.run(
        [aes, wav_jsonl, "--batch-size", "10"],
        capture_output=True, text=True, check=True).stdout
    theirs = [json.loads(ln) for ln in theirs_raw.splitlines() if ln.strip()]
    atol = goldens["audiobox_score_atol"]
    bad = [
        (i, ax, a[ax], b[ax])
        for i, (a, b) in enumerate(zip(ours, theirs))
        for ax in ("CE", "CU", "PC", "PQ")
        if not abs(a[ax] - b[ax]) <= atol
    ]
    if bad:
        report.fail("audiobox_parity", f"{len(bad)} scores off: {bad[:5]}")
    else:
        report.ok("audiobox_parity",
                  f"{len(ours)} files x 4 axes within {atol}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--irishman_train")
    ap.add_argument("--irishman_valid")
    ap.add_argument("--leadsheet_train")
    ap.add_argument("--leadsheet_valid")
    ap.add_argument("--bach_train_dir")
    ap.add_argument("--bach_valid_dir")
    ap.add_argument("--bach_extra_vocab_dirs", nargs="*", default=[])
    ap.add_argument("--tunesformer_weights")
    ap.add_argument("--audiobox_ckpt")
    ap.add_argument("--wav_jsonl")
    ap.add_argument("--out_dir", default="/tmp/replay_goldens")
    ap.add_argument("--goldens", help="JSON file overriding the expected "
                    "numbers (plumbing tests on tiny fixtures)")
    a = ap.parse_args(argv)

    goldens = dict(GOLDENS)
    if a.goldens:
        with open(a.goldens) as f:
            goldens.update(json.load(f))
    os.makedirs(a.out_dir, exist_ok=True)
    report = Report()

    stages: list[tuple[str, list, Callable]] = [
        ("irishman_char", [a.irishman_train, a.irishman_valid],
         lambda: _char_stage(report, goldens, "irishman_char",
                             a.irishman_train, a.irishman_valid, a.out_dir)),
        ("leadsheet_char", [a.leadsheet_train, a.leadsheet_valid],
         lambda: _char_stage(report, goldens, "leadsheet_char",
                             a.leadsheet_train, a.leadsheet_valid, a.out_dir)),
        ("bach_midi", [a.bach_train_dir, a.bach_valid_dir],
         lambda: _bach_stage(report, goldens, a.bach_train_dir,
                             a.bach_valid_dir, a.bach_extra_vocab_dirs,
                             a.out_dir)),
        ("tunesformer", [a.tunesformer_weights],
         lambda: _tunesformer_stage(report, goldens, a.tunesformer_weights,
                                    a.out_dir)),
        ("audiobox", [a.audiobox_ckpt, a.wav_jsonl],
         lambda: _audiobox_stage(report, goldens, a.audiobox_ckpt,
                                 a.wav_jsonl, a.out_dir)),
    ]
    for stage, paths, fn in stages:
        if _gate(report, stage, *paths):
            fn()

    with open(os.path.join(a.out_dir, "replay_report.json"), "w") as f:
        json.dump([{"stage": s, "status": st, "detail": d}
                   for s, st, d in report.rows], f, indent=2)
    n_pass = sum(s == "PASS" for _, s, _ in report.rows)
    n_skip = sum(s == "SKIP" for _, s, _ in report.rows)
    print(f"replay: {n_pass} pass, {n_skip} skip, "
          f"{sum(s == 'FAIL' for _, s, _ in report.rows)} fail")
    return 1 if report.failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

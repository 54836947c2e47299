"""Proxy-scorer calibration + A/B harness tests (VERDICT #2).

The real Audiobox scorer (audio-aes) is absent from this environment, so
absolute parity can't be measured here; these tests instead (a) pin the
proxy's ORDERING on known-good vs known-bad fixtures — the property relative
comparisons rely on — and (b) exercise the A/B harness end to end so it
produces calibration numbers the moment audio-aes is installed.
(ref scorer: abc_to_midi_wav_and_aesthetics.py:323-355)
"""

import json
import os

import numpy as np
import pytest

from ai_music_generation_tpu.eval.aesthetics import (
    AXES,
    compare_scorers,
    proxy_score_wave,
    run_aesthetics,
)

SR = 16_000


def good_music(seconds=8.0):
    """Known-good fixture: a harmonic, well-leveled melody with varied
    spectral content (piano-ish partials, changing pitches)."""
    t = np.arange(int(SR * seconds)) / SR
    freqs = [262, 330, 392, 523, 392, 330, 262, 196]
    wave = np.zeros_like(t)
    seg = len(t) // len(freqs)
    for i, f0 in enumerate(freqs):
        ts = t[i * seg:(i + 1) * seg] - t[i * seg]
        env = np.exp(-2.0 * ts)
        for h, amp in ((1, 1.0), (2, 0.5), (3, 0.25), (4, 0.12)):
            wave[i * seg:(i + 1) * seg] += amp * env * np.sin(2 * np.pi * f0 * h * ts)
    return (0.5 * wave / np.max(np.abs(wave))).astype(np.float32)


def bad_clipped_noise(seconds=8.0):
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1.2, int(SR * seconds)).astype(np.float32)
    return np.clip(w, -1.0, 1.0)


def bad_near_silence(seconds=8.0):
    return np.full(int(SR * seconds), 1e-6, np.float32)


def bad_short_blip():
    return 0.5 * np.sin(2 * np.pi * 440 * np.arange(SR // 10) / SR).astype(np.float32)


def test_proxy_orders_good_above_bad():
    g = proxy_score_wave(good_music(), SR)
    clip = proxy_score_wave(bad_clipped_noise(), SR)
    silence = proxy_score_wave(bad_near_silence(), SR)
    blip = proxy_score_wave(bad_short_blip(), SR)

    # silence / sub-quarter-second audio floor at 1.0 everywhere
    assert all(silence[a] == 1.0 for a in AXES)
    assert all(blip[a] == pytest.approx(1.0) for a in AXES)
    # clipping must crater PQ relative to clean music
    assert g["PQ"] > clip["PQ"] + 2.0
    # harmonic content must beat noise on enjoyment
    assert g["CE"] > clip["CE"] + 1.0
    # usefulness follows
    assert g["CU"] > clip["CU"]
    # and the good fixture scores in a sane mid-to-high band on every axis
    for a in AXES:
        assert 3.0 <= g[a] <= 10.0, (a, g[a])


def test_proxy_is_deterministic():
    w = good_music(4.0)
    assert proxy_score_wave(w, SR) == proxy_score_wave(w, SR)


@pytest.fixture()
def wav_set(tmp_path):
    from ai_music_generation_tpu.synth.wav_io import write_wav

    paths = []
    for name, wave in [("good", good_music(4.0)),
                       ("clip", bad_clipped_noise(4.0)),
                       ("quiet", bad_near_silence(4.0))]:
        p = str(tmp_path / f"{name}.wav")
        write_wav(p, wave, SR)
        paths.append(p)
    jsonl = str(tmp_path / "wav_paths.jsonl")
    with open(jsonl, "w") as f:
        for p in paths:
            f.write(json.dumps({"path": p}) + "\n")
    return jsonl, paths


def test_ab_harness_runs_and_reports(wav_set, tmp_path):
    jsonl, paths = wav_set
    out = str(tmp_path / "ab")
    report = compare_scorers(jsonl, out)
    assert os.path.exists(os.path.join(out, "ab_report.json"))
    rows = [json.loads(l) for l in open(os.path.join(out, "proxy.jsonl"))]
    assert len(rows) == len(paths)
    assert all(r.get("proxy") is True for r in rows)
    if not report["real_available"]:
        assert "real_jsonl" not in report
    else:  # runs only where audio-aes is installed
        assert all("pearson" in report["axes"][a] for a in AXES)


def test_run_aesthetics_schema_and_failure_tolerance(tmp_path, wav_set):
    jsonl, paths = wav_set
    # append a broken path: the scorer must emit NaN row, not crash
    with open(jsonl, "a") as f:
        f.write(json.dumps({"path": str(tmp_path / "missing.wav")}) + "\n")
    out = str(tmp_path / "scores.jsonl")
    used_real = run_aesthetics(jsonl, out, force_proxy=True)
    assert used_real is False
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == len(paths) + 1
    assert all(set(AXES) <= set(r) for r in rows)
    assert all(np.isnan(rows[-1][a]) for a in AXES)

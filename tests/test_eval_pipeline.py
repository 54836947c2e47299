"""End-to-end eval pipeline tests: ABC -> MIDI -> WAV -> metrics -> ranking."""

import json
import os

import numpy as np
import pytest

from ai_music_generation_tpu.cli.create_generations_ranking import (
    extract_identifier_from_path,
    main as ranking_main,
)
from ai_music_generation_tpu.cli.random_baselines import generate
from ai_music_generation_tpu.eval.aesthetics import proxy_score_wave
from ai_music_generation_tpu.eval.pipeline import EvalPipeline, PipelineConfig

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject)


@pytest.fixture(scope="module")
def abc_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("abc"))
    generate("random", d, num_files=3, min_total_notes=16, seed=1)
    return d


def test_random_baseline_generator(abc_dir):
    files = sorted(os.listdir(abc_dir))
    assert files == ["sample_0.abc", "sample_1.abc", "sample_2.abc"]
    text = open(os.path.join(abc_dir, files[0])).read()
    assert text.startswith("X:0\nL:1/4\nM:")
    assert "|" in text


def test_full_pipeline(abc_dir, tmp_path):
    out = str(tmp_path / "evalout")
    pipeline = EvalPipeline(PipelineConfig(
        abc_input_folder=abc_dir, base_output_dir=out,
    ))
    result = pipeline.run()
    assert result["n_failed"] == 0
    # structure metrics written + aggregated
    sdir = os.path.join(out, "metrics", "builtin", "structure")
    rows = open(os.path.join(sdir, "inner_similarity.jsonl")).read().splitlines()
    assert len(rows) == 3
    row = json.loads(rows[0])
    assert "melody" in row and "rhythm" in row and "path" in row
    agg = json.load(open(os.path.join(sdir, "aggregated_similarities.json")))
    assert 0 <= agg["inner"]["mean"]["melody"] <= 1
    # wavs rendered, aesthetics scored (proxy)
    adir = os.path.join(out, "audiobox_aesthetics", "builtin", "tpu_synth",
                        "builtin_sample_bank")
    aest = [json.loads(l) for l in open(os.path.join(adir, "aesthetics.jsonl"))]
    assert len(aest) == 3
    assert all(set(a) >= {"CE", "CU", "PC", "PQ"} for a in aest)
    assert result["aesthetics_engine"] == "proxy"
    # ranking CLI consumes the outputs
    results_dir = str(tmp_path / "ranking")
    df = ranking_main([sdir, adir, results_dir])
    assert len(df) == 3
    assert os.path.exists(os.path.join(results_dir, "final_ranking.csv"))
    assert os.path.exists(os.path.join(results_dir, "ranked_identifiers.txt"))
    assert set(df["final_rank"]) <= {1, 2, 3}


def test_conditioned_pipeline(abc_dir, tmp_path):
    out = str(tmp_path / "evalcond")
    pipeline = EvalPipeline(PipelineConfig(
        abc_input_folder=abc_dir, base_output_dir=out,
        n_conditioned_measures=2, render_wav=False,
    ))
    result = pipeline.run()
    sdir = os.path.join(out, "metrics", "builtin", "structure")
    cond = open(os.path.join(sdir, "conditional_prefix_similarity.jsonl")).read().splitlines()
    assert len(cond) == 3
    assert result["aggregated_similarities"]["conditioned"] is not None


def test_identifier_extraction():
    assert extract_identifier_from_path("/x/file_sample_bwv103.6.wav") == "bwv103.6"
    assert extract_identifier_from_path("/x/sample_bwv121.6.mid") == "bwv121.6"
    assert extract_identifier_from_path("/x/file_42.mid") == "42"
    assert extract_identifier_from_path("/x/plain.mid") == "plain"


def test_proxy_scorer_prefers_tonal_over_noise():
    rng = np.random.default_rng(0)
    sr = 16000
    t = np.arange(sr * 6) / sr
    tone = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.3 * np.sin(2 * np.pi * 660 * t)
    noise = rng.normal(0, 0.4, sr * 6).astype(np.float32)
    s_tone = proxy_score_wave(tone)
    s_noise = proxy_score_wave(noise.astype(np.float32))
    assert s_tone["CE"] > s_noise["CE"]
    silent = proxy_score_wave(np.zeros(sr, np.float32))
    assert silent["CE"] == 1.0

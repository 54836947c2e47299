"""Plumbing test for the hermetic real-data replay harness
(cli/replay_goldens.py): every stage's dispatch, golden comparison, skip
gating, and exit-code contract run here on tiny fixtures; the real corpus
numbers (ref: nanoGPT/data/irishman/prepare_char.py:110-159,
nanoGPT/data/bach/prepare.py trailing comments) replay with the same command
the day the data exists.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.cli.replay_goldens import GOLDENS, main

torch = pytest.importorskip("torch")


@pytest.fixture()
def fixtures(tmp_path):
    # tiny irishman-style corpora
    train = [{"abc notation": "X:1\nK:C\nCDEF GABc|"}] * 3
    valid = [{"abc notation": "X:2\nK:G\nGABc defg|"}]
    (tmp_path / "train.json").write_text(json.dumps(train))
    (tmp_path / "valid.json").write_text(json.dumps(valid))

    # tiny bach-style midi-text dirs
    for split, texts in (("train", ["p60 d4 | p62 d4", "p64 d2 o2"]),
                         ("valid", ["p60 d4"])):
        d = tmp_path / "bach" / split
        d.mkdir(parents=True)
        for i, t in enumerate(texts):
            (d / f"{i}.txt").write_text(t)

    # tiny reference-format TunesFormer weights.pth
    from ai_music_generation_tpu.models.tunesformer import (
        TunesFormer, TunesFormerConfig)
    from ai_music_generation_tpu.models.tunesformer_export import (
        save_reference_checkpoint)

    tcfg = TunesFormerConfig(patch_length=8, patch_size=16, patch_layers=2,
                             char_layers=2, n_embd=32, n_head=2, dropout=0.0,
                             share_weights=False, dtype=jnp.float32)
    model = TunesFormer(tcfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.ones((1, 8, 16), jnp.int32))
    weights = tmp_path / "weights.pth"
    save_reference_checkpoint(str(weights), params, tcfg, epoch=1,
                              best_epoch=1, min_eval_loss=1.0)

    # goldens matching the fixtures (computed from their prepare semantics)
    from ai_music_generation_tpu.data.prepare import (
        entries_to_text, texts_to_midi_corpus)

    tr_text = entries_to_text(train)
    va_text = entries_to_text(valid)
    vocab = len(set(tr_text + va_text))
    bach_tr = texts_to_midi_corpus(["p60 d4 | p62 d4", "p64 d2 o2"])
    bach_va = texts_to_midi_corpus(["p60 d4"])
    goldens = {
        "irishman_char": {"vocab": vocab, "train_tokens": len(tr_text),
                          "val_tokens": len(va_text)},
        "bach_midi": {
            "vocab": len(set(bach_tr.split()) | set(bach_va.split())),
            "train_tokens": len(bach_tr.split()),
            "val_tokens": len(bach_va.split())},
        "tunesformer": {"patch_layers": 2, "char_layers": 2, "n_embd": 32,
                        "patch_size": 16},
    }
    gpath = tmp_path / "goldens.json"
    gpath.write_text(json.dumps(goldens))
    return tmp_path


def _run(tmp_path, *extra):
    out = tmp_path / "out"
    rc = main(["--out_dir", str(out), "--goldens",
               str(tmp_path / "goldens.json"), *extra])
    report = json.loads((out / "replay_report.json").read_text())
    return rc, {r["stage"]: r["status"] for r in report}


def test_all_stages_skip_without_inputs(tmp_path, fixtures):
    rc, statuses = _run(fixtures)
    assert rc == 0
    assert set(statuses.values()) == {"SKIP"}
    assert set(statuses) == {"irishman_char", "leadsheet_char", "bach_midi",
                             "tunesformer", "audiobox"}


def test_stages_pass_on_fixture_goldens(fixtures):
    rc, statuses = _run(
        fixtures,
        "--irishman_train", str(fixtures / "train.json"),
        "--irishman_valid", str(fixtures / "valid.json"),
        "--bach_train_dir", str(fixtures / "bach" / "train"),
        "--bach_valid_dir", str(fixtures / "bach" / "valid"),
        "--tunesformer_weights", str(fixtures / "weights.pth"),
    )
    assert rc == 0
    assert statuses["irishman_char"] == "PASS"
    assert statuses["bach_midi"] == "PASS"
    assert statuses["tunesformer_arch"] == "PASS"
    assert statuses["tunesformer_bridge"] == "PASS"
    assert statuses["leadsheet_char"] == "SKIP"
    assert statuses["audiobox"] == "SKIP"


def test_wrong_goldens_fail_with_exit_1(fixtures):
    goldens = json.loads((fixtures / "goldens.json").read_text())
    goldens["irishman_char"]["vocab"] = 9999
    (fixtures / "goldens.json").write_text(json.dumps(goldens))
    rc, statuses = _run(
        fixtures,
        "--irishman_train", str(fixtures / "train.json"),
        "--irishman_valid", str(fixtures / "valid.json"),
    )
    assert rc == 1
    assert statuses["irishman_char"] == "FAIL"


def test_missing_file_skips_not_errors(fixtures):
    rc, statuses = _run(
        fixtures,
        "--irishman_train", str(fixtures / "train.json"),
        "--irishman_valid", str(fixtures / "nonexistent.json"),
    )
    assert rc == 0
    assert statuses["irishman_char"] == "SKIP"


def test_default_goldens_are_the_reference_numbers():
    """The shipped goldens must stay the reference's published stats."""
    assert GOLDENS["irishman_char"] == {
        "vocab": 95, "train_tokens": 60_944_859, "val_tokens": 611_888}
    assert GOLDENS["leadsheet_char"] == {
        "vocab": 95, "train_tokens": 12_935_627, "val_tokens": 117_776}
    assert GOLDENS["bach_midi"] == {
        "vocab": 121, "train_tokens": 310_183, "val_tokens": 30_509}

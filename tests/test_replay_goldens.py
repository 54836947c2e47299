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
                             "tunesformer", "audiobox", "abc2midi_diff",
                             "fluidsynth_ab", "shakespeare_gpt2"}


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


# ---- native-fidelity stages (VERDICT r4 #3): plumbing on fixtures with
# FAKE binaries standing in for abc2midi / fluidsynth — the harness
# mechanics (invocation shape, event normalization, match-rate math, CI
# check, report rows) run end-to-end; the real binaries replay with the
# same command the day they exist.

import os
import stat
import sys
import textwrap


def _fake_bin(tmp_path, name, body):
    """An executable python script with the repo on sys.path."""
    p = tmp_path / name
    p.write_text("#!" + sys.executable + "\n" + textwrap.dedent(
        f"import sys\nsys.path.insert(0, {str(tmp_path.parent)!r})\n"
        f"sys.path.insert(0, '/root/repo')\n") + textwrap.dedent(body))
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


@pytest.fixture()
def abc_fixture(tmp_path):
    d = tmp_path / "abc"
    d.mkdir()
    (d / "a.abc").write_text("X:1\nL:1/8\nM:4/4\nK:C\nCDEF GABc|c4 z4|\n")
    (d / "b.abc").write_text("X:2\nL:1/8\nM:6/8\nK:G\nGAB dBG|B3 z3|\n")
    (tmp_path / "goldens.json").write_text("{}")
    return tmp_path, d


def test_abc2midi_stage_pass_on_agreeing_compiler(abc_fixture):
    """Fake abc2midi = OUR compiler: streams match, stage PASSes."""
    tmp_path, d = abc_fixture
    fake = _fake_bin(tmp_path, "abc2midi", """
        from ai_music_generation_tpu.abcnotation.to_midi import (
            abc_file_to_midi_file)
        abc_file_to_midi_file(sys.argv[1], sys.argv[3])  # argv: abc -o mid
    """)
    rc, statuses = _run(tmp_path, "--abc2midi_bin", fake,
                        "--abc_dir", str(d))
    assert rc == 0 and statuses["abc2midi_diff"] == "PASS"
    report = json.loads(
        (tmp_path / "out" / "replay_report.json").read_text())
    detail = json.loads(
        next(r["detail"] for r in report if r["stage"] == "abc2midi_diff"))
    assert detail == {"files": 2, "mean_note_match": 1.0,
                      "min_note_match": 1.0}
    # per-file rates land in the diff jsonl for inspection
    rows = [json.loads(x) for x in
            (tmp_path / "out" / "abc2midi_diff.jsonl").read_text()
            .splitlines()]
    assert [r["note_match"] for r in rows] == [1.0, 1.0]


def test_abc2midi_stage_fails_on_divergent_compiler(abc_fixture):
    """Fake abc2midi transposing every note: match rate 0, stage FAILs."""
    tmp_path, d = abc_fixture
    fake = _fake_bin(tmp_path, "abc2midi_bad", """
        from ai_music_generation_tpu.abcnotation.to_midi import abc_to_midi
        from ai_music_generation_tpu.codec.midi_io import write_midi_file
        midi = abc_to_midi(open(sys.argv[1]).read())
        for n in midi.notes:
            n.pitch += 3
        write_midi_file(midi, sys.argv[3])
    """)
    rc, statuses = _run(tmp_path, "--abc2midi_bin", fake,
                        "--abc_dir", str(d))
    assert rc == 1 and statuses["abc2midi_diff"] == "FAIL"


@pytest.fixture()
def midi_fixture(tmp_path):
    from ai_music_generation_tpu.abcnotation.to_midi import (
        abc_file_to_midi_file)
    from ai_music_generation_tpu.synth.sf2 import write_sf2

    d = tmp_path / "midi"
    d.mkdir()
    abc = tmp_path / "t.abc"
    abc.write_text("X:1\nL:1/8\nK:C\nCDEF|\n")
    abc_file_to_midi_file(str(abc), str(d / "t.mid"))
    sf2 = tmp_path / "tiny.sf2"
    wave = (0.5 * np.sin(2 * np.pi * 440 / 16000
                         * np.arange(4800))).astype(np.float32)
    write_sf2(str(sf2), [dict(wave=wave, root=69, loop=(1600, 3200))])
    (tmp_path / "goldens.json").write_text("{}")
    return tmp_path, d, sf2


# nightly (11s solo — the fake-fluidsynth subprocess cold-imports the
# package and compiles the synth); the stage's CI-gate logic stays in the
# verification tier via test_fluidsynth_stage_ab_ci_check.
@pytest.mark.nightly
def test_fluidsynth_stage_renders_and_gates_on_ckpt(midi_fixture):
    """Fake fluidsynth renders via OUR synth; without --audiobox_ckpt the
    render leg PASSes and the A/B leg SKIPs with both wav sets on disk."""
    tmp_path, d, sf2 = midi_fixture
    fake = _fake_bin(tmp_path, "fluidsynth", """
        import numpy as np
        from ai_music_generation_tpu.codec.midi_io import parse_midi_file
        from ai_music_generation_tpu.synth.render import synthesize_midi
        from ai_music_generation_tpu.synth.wav_io import write_wav
        # argv: -ni sf2 mid -F wav -r 16000
        wave = synthesize_midi(parse_midi_file(sys.argv[3]),
                               voice="sf2:" + sys.argv[2])
        write_wav(sys.argv[5], np.asarray(wave))
    """)
    rc, statuses = _run(tmp_path, "--fluidsynth_bin", fake,
                        "--sf2", str(sf2), "--midi_dir", str(d))
    assert rc == 0
    assert statuses["fluidsynth_render"] == "PASS"
    assert statuses["fluidsynth_ab"] == "SKIP"
    assert (tmp_path / "out" / "fs_ref" / "t.wav").exists()
    assert (tmp_path / "out" / "fs_ours" / "t.wav").exists()


def test_fluidsynth_stage_ab_ci_check(midi_fixture, monkeypatch):
    """The aesthetics A/B leg: a fake predictor scoring both sets equally
    PASSes; one skewing the reference set beyond tol+CI FAILs."""
    from ai_music_generation_tpu.eval import audiobox as ab

    tmp_path, d, sf2 = midi_fixture
    fake = _fake_bin(tmp_path, "fluidsynth", """
        import numpy as np
        from ai_music_generation_tpu.synth.wav_io import write_wav
        write_wav(sys.argv[5], np.zeros(1600, np.float32))
    """)
    ckpt = tmp_path / "aes.ckpt"
    ckpt.write_text("placeholder")

    class FakePred:
        skew = 0.0

        def __init__(self, config=None, weights=None, batch=8):
            assert weights == str(ckpt)

        def score_jsonl(self, inp, out):
            rows = [json.loads(x) for x in open(inp)]
            with open(out, "w") as f:
                for r in rows:
                    s = self.skew if "fs_ref" in r["path"] else 0.0
                    f.write(json.dumps(
                        {a: 5.0 + s for a in ("CE", "CU", "PC", "PQ")})
                        + "\n")

    monkeypatch.setattr(ab, "AesPredictor", FakePred)
    args = ["--fluidsynth_bin", fake, "--sf2", str(sf2),
            "--midi_dir", str(d), "--audiobox_ckpt", str(ckpt),
            "--wav_jsonl", str(tmp_path / "missing.jsonl")]
    rc, statuses = _run(tmp_path, *args)
    assert rc == 0 and statuses["fluidsynth_ab"] == "PASS"
    FakePred.skew = 1.0  # way past fluidsynth_aes_tol=0.25 with CI=0
    rc, statuses = _run(tmp_path, *args)
    assert rc == 1 and statuses["fluidsynth_ab"] == "FAIL"


def test_shakespeare_gpt2_stage_with_fixture_assets(tmp_path):
    """The gpt2bpe prepare stage checks token-count goldens; with fixture
    assets + fixture goldens the plumbing PASSes, and wrong goldens FAIL."""
    from ai_music_generation_tpu.data.gpt2_bpe import bytes_to_unicode

    base = [bytes_to_unicode()[b] for b in range(256)]
    assets = tmp_path / "assets"
    assets.mkdir()
    (assets / "encoder.json").write_text(json.dumps(
        {c: i for i, c in enumerate(base)}))
    (assets / "vocab.bpe").write_text("#version: 0.2\n")
    inp = tmp_path / "input.txt"
    inp.write_text("to be or not to be " * 20)  # 380 chars -> byte tokens
    n = len(inp.read_text())
    split = int(n * 0.9)
    (tmp_path / "goldens.json").write_text(json.dumps(
        {"shakespeare_gpt2": {"train_tokens": split,
                              "val_tokens": n - split}}))
    rc, statuses = _run(tmp_path, "--shakespeare_txt", str(inp),
                        "--bpe_assets", str(assets))
    assert rc == 0 and statuses["shakespeare_gpt2"] == "PASS"
    (tmp_path / "goldens.json").write_text(json.dumps(
        {"shakespeare_gpt2": {"train_tokens": 1, "val_tokens": 1}}))
    rc, statuses = _run(tmp_path, "--shakespeare_txt", str(inp),
                        "--bpe_assets", str(assets))
    assert rc == 1 and statuses["shakespeare_gpt2"] == "FAIL"


def test_default_goldens_new_stages():
    assert GOLDENS["shakespeare_gpt2"] == {
        "train_tokens": 301_966, "val_tokens": 36_059}
    assert 0 < GOLDENS["abc2midi"]["mean_note_match"] <= 1.0
    assert GOLDENS["fluidsynth_aes_tol"] > 0

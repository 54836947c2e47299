"""Dataset prepare + curation tests."""

import json
import os
import pickle

import numpy as np
import pytest

from ai_music_generation_tpu.data import prepare as P
from ai_music_generation_tpu.data.curation import (
    add_control_codes,
    build_control_code_dataset,
    filter_by_ids,
    ld_sim,
    levenshtein,
    split_sections,
    split_validation,
    strip_x_header,
)

ENTRIES = [
    {"abc notation": "L:1/8\nK:G\nGABc dedB|dedB dedB|"},
    {"abc notation": "L:1/8\nK:D\nABcd efga|"},
]


def test_prepare_char(tmp_path):
    out = str(tmp_path / "char")
    vocab, n_train, n_val = P.prepare_char(ENTRIES, ENTRIES[:1], out)
    meta = pickle.load(open(os.path.join(out, "meta.pkl"), "rb"))
    assert meta["vocab_size"] == vocab
    assert meta["tokens_format"] == "char"
    data = np.fromfile(os.path.join(out, "train.bin"), np.uint16)
    assert len(data) == n_train
    # separator contract: entries end with " $" and are space-joined
    text = "".join(meta["itos"][i] for i in data)
    assert " $ " in text and text.endswith("$")


def test_prepare_whitespace_uint32(tmp_path):
    out = str(tmp_path / "ws")
    P.prepare_whitespace(ENTRIES, ENTRIES[:1], out)
    meta = pickle.load(open(os.path.join(out, "meta.pkl"), "rb"))
    assert meta["bin_dtype"] == "uint32"
    data = np.fromfile(os.path.join(out, "train.bin"), np.uint32)
    words = [meta["itos"][i] for i in data]
    assert words.count("$") == 2  # one per entry


def test_prepare_midi_texts_union_vocab(tmp_path):
    d1 = tmp_path / "t1"
    d2 = tmp_path / "t2"
    extra = tmp_path / "extra"
    for d, toks in ((d1, "p60 d12 | p62 d12 |"), (d2, "p64 d24 |"),
                    (extra, "p99 d48 | rest d12 |")):
        d.mkdir()
        (d / "a.txt").write_text(toks)
    out = str(tmp_path / "out")
    vocab, _, _ = P.prepare_midi_texts(str(d1), str(d2), out,
                                       extra_vocab_dirs=[str(extra)])
    meta = pickle.load(open(os.path.join(out, "meta.pkl"), "rb"))
    # union vocab includes tokens only present in the extra corpus (transfer contract)
    assert "p99" in meta["stoi"]
    assert "rest" in meta["stoi"]
    data = np.fromfile(os.path.join(out, "train.bin"), np.uint16)
    assert meta["itos"][data[0]] == "$"


def test_prepare_bpe_and_wordpiece(tmp_path):
    out = str(tmp_path / "bpe")
    vocab, n_train, _ = P.prepare_bpe(ENTRIES, ENTRIES[:1], out, vocab_size=300)
    assert os.path.exists(os.path.join(out, "tokenizer.json"))
    assert os.path.exists(os.path.join(out, "vocab.json"))
    assert vocab <= 300
    out2 = str(tmp_path / "wp")
    vocab2, _, _ = P.prepare_wordpiece(ENTRIES, ENTRIES[:1], out2, vocab_size=300)
    assert vocab2 <= 300


# ---- curation ---------------------------------------------------------------

def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "abc") == 0
    assert ld_sim("abc", "abc") == 1.0
    assert ld_sim("abc", "abd") == pytest.approx(2 / 3)


def test_split_sections():
    text = "X:1\nL:1/8\nK:G\nGABc dedB|dedB dedB:|abcd efga|gfed cBAG|]"
    meta, sections = split_sections(text)
    assert meta == "X:1\nL:1/8\nK:G\n"
    assert len(sections) == 2
    assert sections[0].endswith(":|")
    assert sections[1].endswith("|]")


def test_add_control_codes():
    text = "X:1\nL:1/8\nK:G\nGABc dedB|dedB dedB:|GABc dedB|dedB dedc|]"
    header, tune = add_control_codes(text)
    assert header.startswith("S:2\n")
    assert "B:2" in header
    assert "E:" in header  # similarity vs first section
    # high similarity between the two nearly-identical sections
    e_val = int([l for l in header.splitlines() if l.startswith("E:")][0][2:])
    assert e_val >= 8
    assert tune.startswith("X:1\n")


def test_run_filter_metadata_stripping():
    """ref run_filter (add_control_codes.py:116-135): metadata lines (T:,
    w:, R:, X:, ...) and % comments never reach the curated tune text."""
    from ai_music_generation_tpu.data.curation import run_filter

    text = ("X:123\nT:The Title % with comment\nR:reel\n"
            "L:1/8\nM:4/4\nK:G\n%%MIDI program 0\n\n"
            "GABc dedB| % trailing comment\nw:la la la\ndedB dedB|]\n")
    out = run_filter(text)
    lines = out.splitlines()
    assert lines[0] == "L:1/8"  # K/M/L survive (not in the filter list)
    assert not any(l[:2] in ("X:", "T:", "R:", "w:") for l in lines)
    assert not any(l.startswith("%") for l in lines)
    assert "GABc dedB| " in out and "% trailing" not in out
    # multi-voice rejected outright
    assert run_filter("K:C\nV:2\nabc|]") == ""
    # builder output therefore carries no X:/T: into the training text
    entries = build_control_code_dataset([text])
    assert entries and "X:" not in entries[0]["abc notation"]
    assert entries[0]["abc notation"].startswith("L:1/8")


def test_control_codes_rejections():
    # >8 sections rejected
    many = "K:C\n" + ":|".join(["abc|def"] * 9) + "|]"
    assert add_control_codes(many) == ("", "")
    # V:2 filtered in dataset builder
    entries = build_control_code_dataset(
        ["X:1\nK:C\nV:2\nabc|def|]", "X:2\nK:C\nabc|def|]"]
    )
    assert len(entries) == 1


def test_strip_x_header_and_filters():
    entries = [{"abc notation": "X:42\nL:1/8\nK:C\nCDEF|"},
               {"abc notation": "no header"}]
    out = strip_x_header(entries)
    assert out[0]["id"] == "42"
    assert out[0]["abc notation"].startswith("L:1/8")
    assert "id" not in out[1]
    kept = filter_by_ids(out, {"42"})
    assert len(kept) == 1


def test_split_validation_deterministic():
    entries = [{"id": i} for i in range(10)]
    v1, t1 = split_validation(entries, seed=42)
    v2, t2 = split_validation(entries, seed=42)
    assert v1 == v2 and t1 == t2
    assert len(v1) == 5 and len(t1) == 5
    # order preserved within halves
    assert [e["id"] for e in v1] == sorted(e["id"] for e in v1)


def test_prepare_cli(tmp_path):
    from ai_music_generation_tpu.cli.prepare import main as prep_main

    tj = tmp_path / "train.json"
    vj = tmp_path / "valid.json"
    tj.write_text(json.dumps(ENTRIES))
    vj.write_text(json.dumps(ENTRIES[:1]))
    out = str(tmp_path / "out")
    prep_main(["char", f"--train_json={tj}", f"--valid_json={vj}", f"--out_dir={out}"])
    assert os.path.exists(os.path.join(out, "train.bin"))

"""Golden-number regression fixtures for the prepare family (VERDICT #5).

The reference prepare scripts embed their expected stats as trailing comments
(ref: nanoGPT/data/irishman/prepare_char.py:110-159, data/bach/prepare.py
trailing comments). Real IrishMAN/bach corpora aren't in this environment, so
these tests reconstruct mini-corpora that exercise the same structural
invariants — the trailing `` $`` vs leading ``$ `` separators, the
uint16/uint32 switchover, the union-vocab transfer contract, and the
seed-42 half split — and pin exact token/vocab goldens so any tokenizer or
separator regression breaks loudly.

One-command replay when real data is present (see cli/prepare.py docstring):

    python -m ai_music_generation_tpu.cli.prepare char \
        --train_json train.json --valid_json validation.json --out_dir out
    python -m ai_music_generation_tpu.cli.prepare midi \
        --train_dir bach/train/midi_texts --valid_dir bach/validation/midi_texts \
        --out_dir data/bach --extra_vocab_dirs irishman/midi_texts

then compare the printed "Vocabulary size / train has / val has" lines against
the goldens quoted in the reference comments (95 / 60,944,859 / 611,888 for
irishman char; 121 / 310,183 / 30,509 for bach midi-texts).
"""

import os

import numpy as np

from ai_music_generation_tpu.data import prepare as P
from ai_music_generation_tpu.data.curation import split_validation
from ai_music_generation_tpu.data.memmap import BinDataset, load_meta

TRAIN_ENTRIES = [
    {"abc notation": "X:1\nL:1/8\nK:G\nGABc dedB|\n"},
    {"abc notation": "  X:2\nL:1/4\nK:D\nDEFG A2|\n  "},  # needs .strip()
]
VALID_ENTRIES = [{"abc notation": "X:3\nL:1/8\nK:C\nCDEF G2|\n"}]


def test_char_prepare_goldens(tmp_path, capsys):
    """Pin the char recipe exactly (ref: irishman/prepare_char.py:22-50):
    strip, append trailing ' $', join with ' ', char vocab over BOTH splits."""
    out = str(tmp_path / "char")
    vocab, n_train, n_val = P.prepare_char(TRAIN_ENTRIES, VALID_ENTRIES, out)

    # golden reconstruction: each entry contributes len(strip)+2 chars, plus
    # one joining space between entries
    train_text = " ".join(e["abc notation"].strip() + " $" for e in TRAIN_ENTRIES)
    valid_text = " ".join(e["abc notation"].strip() + " $" for e in VALID_ENTRIES)
    assert n_train == len(train_text) == 51
    assert n_val == len(valid_text) == 24
    assert vocab == len(set(train_text + valid_text)) == 24

    meta = load_meta(os.path.join(out, "meta.pkl"))
    assert meta["vocab_size"] == 24
    assert meta["bin_dtype"] == "uint16"
    # the separator must be a TRAILING ' $' (swapping to the midi-texts
    # leading '$ ' convention would change the final char)
    ds = BinDataset(os.path.join(out, "train.bin"))
    toks = np.memmap(os.path.join(out, "train.bin"), dtype=ds.dtype, mode="r")
    assert meta["itos"][int(toks[-1])] == "$"
    assert meta["itos"][int(toks[-2])] == " "
    # decode round-trip
    assert "".join(meta["itos"][int(t)] for t in toks) == train_text
    # the percentile block the reference prints (prepare_char.py:110-131)
    printed = capsys.readouterr().out
    assert "Train 'abc notation' length percentiles:" in printed
    assert "Vocabulary size: 24" in printed


def test_whitespace_prepare_goldens(tmp_path):
    """Word-level recipe: same ' $' suffix text, whitespace split, uint32 bins
    (ref: irishman_whitespace/prepare_whitespace.py; uint32 for large vocabs)."""
    out = str(tmp_path / "ws")
    vocab, n_train, n_val = P.prepare_whitespace(TRAIN_ENTRIES, VALID_ENTRIES, out)
    train_words = " ".join(
        e["abc notation"].strip() + " $" for e in TRAIN_ENTRIES
    ).split()
    assert n_train == len(train_words) == 12
    assert n_val == 6
    meta = load_meta(os.path.join(out, "meta.pkl"))
    assert meta["bin_dtype"] == "uint32"
    toks = np.memmap(os.path.join(out, "train.bin"), dtype=np.uint32, mode="r")
    # last token of every entry is the separator '$'
    assert meta["itos"][int(toks[-1])] == "$"
    assert [meta["itos"][int(t)] for t in toks] == train_words


def _write_midi_texts(d, texts):
    os.makedirs(d, exist_ok=True)
    for i, t in enumerate(texts):
        with open(os.path.join(d, f"{i:03d}.txt"), "w") as f:
            f.write(t)


def test_midi_texts_prefix_and_union_vocab(tmp_path, capsys):
    """midi-token-text corpora use a LEADING '$ ' per piece and a vocab UNION
    over extra corpora so transfer checkpoints share ids
    (ref: irishman_midi/prepare.py:43-76, bach/prepare.py trailing goldens)."""
    bach_train = str(tmp_path / "bach" / "train")
    bach_val = str(tmp_path / "bach" / "val")
    irish = str(tmp_path / "irish")
    _write_midi_texts(bach_train, ["p60 d4 o0 / p62 d4 o4", "time_signature_3/4 p64 d2 o0"])
    _write_midi_texts(bach_val, ["p60 d2 o0"])
    _write_midi_texts(irish, ["p72 d8 o0 / p74 d8 o8"])

    out_a = str(tmp_path / "out_bach")
    vocab_a, n_train, n_val = P.prepare_midi_texts(bach_train, bach_val, out_a,
                                                   extra_vocab_dirs=[irish])
    printed = capsys.readouterr().out
    # the reference prints these two lines (bach/prepare.py goldens)
    assert "Loaded 1 texts from the validation directory." in printed
    assert "Loaded 2 texts from the train directory." in printed

    meta_a = load_meta(os.path.join(out_a, "meta.pkl"))
    toks = np.memmap(os.path.join(out_a, "train.bin"),
                     dtype=np.dtype(meta_a["bin_dtype"]), mode="r")
    # leading '$ ' prefix: the FIRST token of the corpus is the separator
    assert meta_a["itos"][int(toks[0])] == "$"
    # union vocab includes tokens that never appear in the bins
    assert "p72" in meta_a["stoi"] and "p74" in meta_a["stoi"]
    assert n_train == 2 + 5 + 2 + 4  # ('$'+5 toks) + ('$'+... ) per piece, joined

    # transfer contract: preparing the OTHER corpus with the union reversed
    # yields the identical stoi (both are the sorted union)
    out_b = str(tmp_path / "out_irish")
    irish_val = str(tmp_path / "irish_val")
    _write_midi_texts(irish_val, ["p72 d8 o0"])
    P.prepare_midi_texts(irish, irish_val, out_b,
                         extra_vocab_dirs=[bach_train, bach_val])
    meta_b = load_meta(os.path.join(out_b, "meta.pkl"))
    assert meta_a["stoi"] == meta_b["stoi"]


def test_midi_texts_uint32_switchover(tmp_path):
    """dtype switches to uint32 once vocab >= 2**16 (deviation from the
    reference's out_dir-name hack, documented in data/memmap.py)."""
    big_train = str(tmp_path / "big" / "train")
    big_val = str(tmp_path / "big" / "val")
    words = " ".join(f"w{i}" for i in range(2**16))
    _write_midi_texts(big_train, [words])
    _write_midi_texts(big_val, ["w0 w1"])
    out = str(tmp_path / "out_big")
    vocab, _, _ = P.prepare_midi_texts(big_train, big_val, out)
    assert vocab == 2**16 + 1  # + '$'
    meta = load_meta(os.path.join(out, "meta.pkl"))
    assert meta["bin_dtype"] == "uint32"
    # and a small corpus stays uint16
    out_small = str(tmp_path / "out_small")
    P.prepare_midi_texts(big_val, big_val, out_small)
    assert load_meta(os.path.join(out_small, "meta.pkl"))["bin_dtype"] == "uint16"


def test_split_validation_seed42_golden():
    """Half split must be the reference's: random.Random(42).sample over
    indices, order preserved in both halves, disjoint and complete
    (ref: irishman_split_validation_to_val_and_test.py:6-44)."""
    entries = [{"id": i} for i in range(10)]
    val, test = split_validation(entries, seed=42)
    assert len(val) == 5 and len(test) == 5
    ids_v = [e["id"] for e in val]
    ids_t = [e["id"] for e in test]
    assert ids_v == sorted(ids_v) and ids_t == sorted(ids_t)  # order preserved
    assert sorted(ids_v + ids_t) == list(range(10))
    # frozen golden for seed 42 (catches any RNG/protocol drift)
    import random

    expect = sorted(random.Random(42).sample(list(range(10)), 5))
    assert ids_v == expect
    # determinism
    val2, _ = split_validation(entries, seed=42)
    assert [e["id"] for e in val2] == ids_v


def test_prepare_cli_replay_path(tmp_path, capsys):
    """The one-command replay path: cli.prepare char on JSON corpora prints
    the same stats lines the reference goldens are quoted in."""
    import json

    from ai_music_generation_tpu.cli.prepare import main

    tj = tmp_path / "train.json"
    vj = tmp_path / "valid.json"
    tj.write_text(json.dumps(TRAIN_ENTRIES))
    vj.write_text(json.dumps(VALID_ENTRIES))
    out = str(tmp_path / "out")
    main(["char", "--train_json", str(tj), "--valid_json", str(vj),
          "--out_dir", out])
    printed = capsys.readouterr().out
    assert "Vocabulary size: 24" in printed
    assert "train has 51 tokens" in printed
    assert "val has 24 tokens" in printed


def test_synthesized_bach_corpus_goldens(tmp_path, capsys):
    """Frozen end-to-end goldens for the in-repo chorale corpus: the
    seed-42, 40-piece corpus must prepare to EXACTLY this vocab and these
    token counts (mirrors the reference's golden-comment oracles,
    ref: nanoGPT/data/bach/prepare.py trailing comments). Any codec,
    splitter, or synthesizer drift trips this."""
    import numpy as np

    from ai_music_generation_tpu.cli.bach_pipeline import main as bach_main
    from ai_music_generation_tpu.cli.midi_to_text import convert_directory
    from ai_music_generation_tpu.cli.prepare import main as prep
    from ai_music_generation_tpu.codec.encoding_settings import EncodingSetting
    from ai_music_generation_tpu.data.chorales import synthesize_corpus

    synthesize_corpus(str(tmp_path / "raw"), num_pieces=40, seed=42)
    bach_main(["ground-truth", str(tmp_path / "raw"),
               f"--out_dir={tmp_path / 'gt'}"])
    bach_main(["split", str(tmp_path / "gt"), f"--out_dir={tmp_path / 'split'}"])
    s = EncodingSetting(only_SATB_parts=True)
    convert_directory(str(tmp_path / "split/train"), str(tmp_path / "t/train"),
                      s, processes=1)
    convert_directory(str(tmp_path / "split/validation"), str(tmp_path / "t/val"),
                      s, processes=1)
    prep(["midi", "--train_dir", str(tmp_path / "t/train"),
          "--valid_dir", str(tmp_path / "t/val"),
          "--out_dir", str(tmp_path / "data")])
    printed = capsys.readouterr().out
    # goldens re-frozen after the blacklist-collision fix in
    # data/chorales.py (the clean run now SKIPS blacklisted BWV numbers,
    # so num_pieces clean chorales are actually written: 40, not 39)
    assert "collected 40 chorales" in printed
    assert "Vocabulary size: 76" in printed
    assert "train has 23,006 tokens" in printed
    assert "val has 2,257 tokens" in printed
    train = np.fromfile(tmp_path / "data" / "train.bin", dtype=np.uint16)
    assert list(train[:8]) == [0, 2, 7, 16, 73, 19, 62, 8]

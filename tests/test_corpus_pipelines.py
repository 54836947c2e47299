"""Synthetic 4-part builder + bach pipeline tests (end-to-end over real files)."""

import json
import os
from pathlib import Path

import pytest

from ai_music_generation_tpu.cli.bach_pipeline import main as bach_main
from ai_music_generation_tpu.cli.build_synthetic_4parts import (
    assemble_piece,
    create_dataset,
    parse_file,
)
from ai_music_generation_tpu.codec.encoding_settings import EncodingSetting
from ai_music_generation_tpu.codec.quantized_converter import MidiQuantizedConverter


def melody_text(pitches, tsig="4/4", ksig=0):
    """A monophonic codec text in the queue format."""
    bars = []
    for i, chunk in enumerate(pitches):
        notes = " ".join(f"o{12*j} p{p} d12" for j, p in enumerate(chunk))
        if i == 0:
            bars.append(
                f"/0 clef_G_2_0 key_signature_{ksig} time_signature_{tsig} {notes} / o48 |"
            )
        else:
            bars.append(f"/0 {notes} / o48 |")
    return " ".join(bars)


@pytest.fixture()
def melody_dir(tmp_path):
    d = tmp_path / "melodies"
    d.mkdir()
    for i in range(6):
        base = 60 + i
        text = melody_text([[base, base + 2, base + 4, base + 5]] * 3)
        (d / f"mel_{i}.txt").write_text(text)
    return str(d)


def test_parse_file(melody_dir):
    tsig, ksig, offset, bars = parse_file(Path(melody_dir) / "mel_0.txt")
    assert tsig == "4/4"
    assert ksig == "0"
    assert offset == "o48"
    assert len(bars) == 3
    assert bars[0].startswith("/0")


def test_create_dataset_resampled(melody_dir, tmp_path):
    out = str(tmp_path / "out")
    n = create_dataset(melody_dir, out, pieces_per_sig=3, resample=True, seed=1)
    assert n == 3
    text = (Path(out) / "file_0.txt").read_text()
    # 4 voices per bar, meta only in bar 0
    assert "/0 " in text and "/3 " in text
    first_bar = text.split("|")[0]
    assert "time_signature_4/4" in first_bar
    assert text.count("time_signature") == 4  # once per voice, bar 0 only
    # the result must be parseable by the codec
    score = MidiQuantizedConverter().text_to_score(text)
    assert len(score.parts) == 4
    assert all(len(p.measures) == 3 for p in score.parts)


def test_create_dataset_no_resample_consumes_melodies(melody_dir, tmp_path):
    out = str(tmp_path / "out2")
    # 6 melodies, same (tsig,ksig) -> exactly 1 piece of 4, 2 left over
    n = create_dataset(melody_dir, out, resample=False, seed=1)
    assert n == 1


def test_bach_pipeline_end_to_end(tmp_path):
    # build a tiny 4-part chorale corpus via the codec -> midi
    from ai_music_generation_tpu.codec.quantized_converter import MidiQuantizedConverter
    from ai_music_generation_tpu.codec.score import score_to_midi
    from ai_music_generation_tpu.codec import midi_io

    conv = MidiQuantizedConverter()
    src = tmp_path / "midis"
    src.mkdir()
    for i in range(4):
        parts = " ".join(
            f"/{v} clef_G_2_0 key_signature_0 time_signature_4/4 "
            + " ".join(f"o{12*j} p{60 + v * 3 + j} d12" for j in range(4))
            for v in range(4)
        )
        text = parts + " / o48 | " + " ".join(
            f"/{v} " + " ".join(f"o{12*j} p{62 + v * 3 + j} d12" for j in range(4))
            for v in range(4)
        ) + " / o48 |"
        score = conv.text_to_score(text)
        midi_io.write_midi_file(score_to_midi(score), src / f"bwv{100 + i}.mid")
    (src / "bwv277.mid").write_bytes((src / "bwv100.mid").read_bytes())  # blacklisted
    (src / "other.mid").write_bytes((src / "bwv100.mid").read_bytes())  # non-bwv

    gt = tmp_path / "gt"
    bach_main(["ground-truth", str(src), f"--out_dir={gt}"])
    names = sorted(os.listdir(gt))
    assert names == ["bwv100.mid", "bwv101.mid", "bwv102.mid", "bwv103.mid"]

    split_dir = tmp_path / "split"
    bach_main(["split", str(gt), f"--out_dir={split_dir}", "--val_ratio=0.25"])
    assert len(os.listdir(split_dir / "train")) == 3
    assert len(os.listdir(split_dir / "validation")) == 1

    stats = tmp_path / "stats"
    bach_main(["score-templates", str(gt), f"--out_dir={stats}"])
    templates = json.load(open(stats / "score_templates.json"))
    assert "4/4" in templates

    bach_main(["measure-templates", str(gt), f"--out_dir={stats}"])
    assert json.load(open(stats / "notes_counts.json"))["chord_notes"] > 0
    prog = json.load(open(stats / "bach_progression.json"))
    assert len(prog) > 0

    gen = tmp_path / "gen"
    bach_main(["generate", str(stats), f"--out_dir={gen}", "--num_pieces=2",
               "--max_measures=4"])
    out_files = sorted(os.listdir(gen))
    assert out_files == ["generated_0.mid", "generated_1.mid"]
    m = midi_io.parse_midi_file(gen / "generated_0.mid")
    assert len(m.notes) > 0


def test_synthesize_corpus_feeds_full_pipeline(tmp_path):
    """The rule-based stand-in corpus (data/chorales.py) flows through
    ground-truth -> split -> codec conversion with SATB structure intact."""
    from ai_music_generation_tpu.codec import midi_io
    from ai_music_generation_tpu.data.chorales import (
        RANGES, VOICES, synthesize_chorale, synthesize_corpus,
    )

    raw = tmp_path / "raw"
    written = synthesize_corpus(str(raw), num_pieces=6, seed=3)
    assert len(written) == 9  # 6 + 3 blacklisted

    # determinism
    s1 = synthesize_chorale(42)
    s2 = synthesize_chorale(42)
    assert [
        [(n.offset, n.quarter_length, n.pitches) for m in p.measures for n in m.notes]
        for p in s1.parts
    ] == [
        [(n.offset, n.quarter_length, n.pitches) for m in p.measures for n in m.notes]
        for p in s2.parts
    ]

    # musical invariants: 4 named parts, in-range pitches, no voice crossing
    # at chord onsets, equal measure counts across parts
    assert tuple(p.name for p in s1.parts) == VOICES
    counts = {len(p.measures) for p in s1.parts}
    assert len(counts) == 1
    for part in s1.parts:
        lo, hi = RANGES[part.name]
        for m in part.measures:
            for n in m.notes:
                for p in n.pitches:
                    assert lo <= p <= hi, (part.name, p)

    gt = tmp_path / "gt"
    bach_main(["ground-truth", str(raw), f"--out_dir={gt}"])
    assert len(os.listdir(gt)) == 6  # blacklisted ones rejected

    split_dir = tmp_path / "split"
    bach_main(["split", str(gt), f"--out_dir={split_dir}", "--val_ratio=0.34"])

    # SATB filter keeps all four tracks; codec round-trips the corpus
    conv = MidiQuantizedConverter(EncodingSetting(only_SATB_parts=True))
    n_texts = 0
    for f in sorted((split_dir / "train").glob("*.mid")):
        texts = conv.filepath_to_texts(f)
        for text in texts.values():
            assert text.count("/0 ") >= 1 and "/3 " in text
            assert "time_signature_" in text and "key_signature_" in text
            n_texts += 1
    assert n_texts == len(list((split_dir / "train").glob("*.mid")))

"""Codec tests: MIDI I/O round trip, quantization, token grammar, inverse parsing."""

from fractions import Fraction

import pytest

from ai_music_generation_tpu.codec import midi_io
from ai_music_generation_tpu.codec.encoding_settings import EncodingSetting
from ai_music_generation_tpu.codec.quantized_converter import MidiQuantizedConverter
from ai_music_generation_tpu.codec.score import (
    Clef,
    KeySig,
    Measure,
    NoteEl,
    Part,
    Score,
    TimeSig,
    quantize_ql,
    score_from_midi,
    score_to_midi,
)

F = Fraction


def make_midi(notes, tpq=480, tsig=(4, 4), sharps=0):
    """notes: [(pitch, start_q, dur_q)] -> MidiFile"""
    track = midi_io.TrackInfo(index=1, name="P1", program=0, channel=0)
    for p, s, d in notes:
        track.notes.append(
            midi_io.MidiNote(p, 64, int(s * tpq), int((s + d) * tpq), 0, 1)
        )
    return midi_io.MidiFile(
        ticks_per_quarter=tpq,
        tracks=[track],
        tempos=[midi_io.TempoEvent(0, 500000)],
        time_signatures=[midi_io.TimeSignatureEvent(0, *tsig)],
        key_signatures=[midi_io.KeySignatureEvent(0, sharps)],
    )


# ---- MIDI I/O ---------------------------------------------------------------

def test_midi_write_parse_roundtrip(tmp_path):
    m = make_midi([(60, 0, 1), (64, 1, 1), (67, 2, 2)], tsig=(3, 4), sharps=2)
    path = tmp_path / "t.mid"
    midi_io.write_midi_file(m, path)
    back = midi_io.parse_midi_file(path)
    assert back.ticks_per_quarter == 480
    notes = back.notes
    assert [(n.pitch, n.start_tick, n.end_tick) for n in notes] == [
        (60, 0, 480), (64, 480, 960), (67, 960, 1920),
    ]
    assert back.time_signatures[0].numerator == 3
    assert back.key_signatures[0].sharps == 2
    assert abs(back.tempos[0].bpm - 120.0) < 1e-9


def test_midi_running_status_and_velocity0():
    """Hand-crafted bytes: running status + vel-0 note-off."""
    track = bytes([
        0x00, 0x90, 60, 64,   # note on C4
        0x60, 62, 64,         # running status: note on D4 at delta 0x60
        0x60, 60, 0,          # running status: vel-0 off C4
        0x00, 62, 0,          # off D4
        0x00, 0xFF, 0x2F, 0x00,
    ])
    data = (b"MThd" + (6).to_bytes(4, "big") + (0).to_bytes(2, "big")
            + (1).to_bytes(2, "big") + (96).to_bytes(2, "big")
            + b"MTrk" + len(track).to_bytes(4, "big") + track)
    m = midi_io.parse_midi_bytes(data)
    assert [(n.pitch, n.start_tick, n.end_tick) for n in m.notes] == [
        (60, 0, 0xC0), (62, 0x60, 0xC0),
    ]


# ---- quantization / score building -----------------------------------------

def test_quantize_ql_grid():
    assert quantize_ql(F(1, 1), [4, 6]) == 1
    assert quantize_ql(F(24, 100), [4, 6]) == F(1, 4)  # 0.24 -> 0.25
    assert quantize_ql(F(17, 100), [4, 6]) == F(1, 6)  # 0.17 -> 1/6 (triplet)


def test_score_from_midi_measures_and_rests():
    m = make_midi([(60, 0, 1), (64, 2, 1), (67, 4, 4)])
    score = score_from_midi(m)
    part = score.parts[0]
    assert len(part.measures) == 2
    m0 = part.measures[0]
    assert m0.time_sig == TimeSig(4, 4)
    assert m0.key_sig == KeySig(0)
    # notes at 0 and 2, rests filling 1..2 and 3..4
    sounding = [n for n in m0.notes if not n.is_rest]
    rests = [n for n in m0.notes if n.is_rest]
    assert [(n.offset, n.quarter_length) for n in sounding] == [(0, 1), (2, 1)]
    assert [(r.offset, r.quarter_length) for r in rests] == [(1, 1), (3, 1)]
    # second measure: whole-bar note
    assert part.measures[1].notes[0].pitches == (67,)
    assert part.measures[1].notes[0].quarter_length == 4


def test_score_from_midi_ties_across_barline():
    m = make_midi([(60, 3, 2)])  # crosses bar at 4
    score = score_from_midi(m)
    part = score.parts[0]
    n0 = [n for n in part.measures[0].notes if not n.is_rest][0]
    n1 = [n for n in part.measures[1].notes if not n.is_rest][0]
    assert (n0.offset, n0.quarter_length, n0.tie_next) == (3, 1, True)
    assert (n1.offset, n1.quarter_length, n1.tie_next) == (0, 1, False)


def test_score_from_midi_chord_grouping():
    m = make_midi([(60, 0, 2), (64, 0, 2), (67, 0, 2), (72, 0, 1)])
    score = score_from_midi(m)
    notes = [n for n in score.parts[0].measures[0].notes if not n.is_rest]
    chords = [n for n in notes if n.is_chord]
    assert len(chords) == 1
    assert chords[0].pitches == (60, 64, 67)
    singles = [n for n in notes if not n.is_chord]
    assert singles[0].pitches == (72,)


# ---- int encoding math (ref :877-913) ---------------------------------------

def test_int_enc_roundtrip_triplets():
    c = MidiQuantizedConverter()
    # quarter note = 1 ql -> 16/4*3 = 12
    assert c.duration_or_offset_to_int_enc(1) == 12
    assert c.int_enc_to_quarterLength(12) == 1
    # sixteenth = 1/4 ql -> 3
    assert c.duration_or_offset_to_int_enc(F(1, 4)) == 3
    # triplet eighth = 1/3 ql -> 4
    assert c.duration_or_offset_to_int_enc(F(1, 3)) == 4
    assert c.int_enc_to_quarterLength(4) == F(1, 3)


def test_int_enc_no_triplets():
    c = MidiQuantizedConverter(EncodingSetting(allow_triplet_quarterLength=False))
    assert c.duration_or_offset_to_int_enc(1) == 4
    assert c.int_enc_to_quarterLength(4) == 1
    assert c.durations_range == (1, 32)


def test_vocab_list():
    c = MidiQuantizedConverter()
    toks = c.all_possible_tokens
    assert toks[0] == "shift"
    assert "|" in toks and "rest" in toks
    assert "p21" in toks and "p108" in toks and "p109" not in toks
    assert "d1" in toks and "d96" in toks and "d97" not in toks
    assert "key_signature_-7" in toks and "key_signature_7" in toks
    assert "time_signature_6/8" in toks
    assert len(toks) == len(c.tokens_types)


# ---- text emission (queue strategy golden) ----------------------------------

def simple_score():
    m0 = Measure(
        time_sig=TimeSig(4, 4), key_sig=KeySig(0), clef=Clef("G", 2, 0),
        notes=[
            NoteEl(F(0), F(1), (60,)),
            NoteEl(F(1), F(1), ()),  # rest
            NoteEl(F(2), F(2), (64, 67)),  # chord
        ],
    )
    m1 = Measure(notes=[NoteEl(F(0), F(4), (62,))])
    return Score([Part(measures=[m0, m1], name="P1", program=0)])


def test_queue_text_golden():
    c = MidiQuantizedConverter()
    text = c.stream_to_texts(simple_score(), "x.mid")["x.mid"]
    assert text == (
        "/0 clef_G_2_0 key_signature_0 time_signature_4/4 "
        "o0 p60 d12 o12 rest d12 o24 p64 p67 d24 / o48 | "
        "/0 o0 p62 d48 / o48 |"
    )


def test_join_text_golden():
    c = MidiQuantizedConverter(
        EncodingSetting(joining_parts_strategy="Join parallel measures")
    )
    text = c.stream_to_texts(simple_score(), "x.mid")["x.mid"]
    assert text == (
        "clef_G_2_0 key_signature_0 time_signature_4/4 "
        "o0 p60 d12 o12 rest d12 o24 p64 p67 d24 o48 | "
        "o0 p62 d48 o48 |"
    )


def test_text_to_score_roundtrip():
    c = MidiQuantizedConverter()
    text = c.stream_to_texts(simple_score(), "x.mid")["x.mid"]
    score = c.text_to_score(text)
    assert len(score.parts) == 1
    m0, m1 = score.parts[0].measures
    assert m0.time_sig == TimeSig(4, 4)
    assert m0.key_sig == KeySig(0)
    assert m0.clef == Clef("G", 2, 0)
    assert [(n.offset, n.quarter_length, n.pitches) for n in m0.notes] == [
        (0, 1, (60,)), (1, 1, ()), (2, 2, (64, 67)),
    ]
    assert m1.notes[0].pitches == (62,)
    # re-encoding the parsed score reproduces the text (idempotence)
    text2 = c.stream_to_texts(score, "x.mid")["x.mid"]
    assert text2 == text


def test_anacrusis_padding():
    c = MidiQuantizedConverter()
    # pickup measure: 1 quarter of content in a 4/4 bar -> o12 padding token
    m0 = Measure(
        time_sig=TimeSig(4, 4),
        notes=[NoteEl(F(0), F(1), (60,))],
        padding_left=F(3),
    )
    score = Score([Part(measures=[m0])])
    text = c.stream_to_texts(score, "x")["x"]
    assert "/ o12 |" in text
    back = c.text_to_score(text)
    assert back.parts[0].measures[0].padding_left == 3


def test_repeats_special_tokens():
    c = MidiQuantizedConverter(EncodingSetting(repeats_handling="Special tokens"))
    m0 = Measure(time_sig=TimeSig(4, 4), notes=[NoteEl(F(0), F(4), (60,))],
                 left_repeat=True)
    m1 = Measure(notes=[NoteEl(F(0), F(4), (62,))], right_repeat=True)
    text = c.stream_to_texts(Score([Part(measures=[m0, m1])]), "x")["x"]
    assert text.startswith("repeat_start /0")
    assert "repeat_end |" in text
    back = c.text_to_score(text)
    assert back.parts[0].measures[0].left_repeat
    assert back.parts[0].measures[1].right_repeat


def test_no_offset_mode_roundtrip():
    c = MidiQuantizedConverter(EncodingSetting(include_offset_in_notes=False))
    m0 = Measure(time_sig=TimeSig(4, 4), notes=[
        NoteEl(F(0), F(1), (60,)), NoteEl(F(1), F(1), ()), NoteEl(F(2), F(2), (64,)),
    ])
    text = c.stream_to_texts(Score([Part(measures=[m0])]), "x")["x"]
    assert "o0" not in text.split()
    back = c.text_to_score(text)
    assert [(n.offset, n.pitches) for n in back.parts[0].measures[0].notes] == [
        (0, (60,)), (1, ()), (2, (64,)),
    ]


def test_invalid_tokens_counted():
    c = MidiQuantizedConverter()
    # pitch before any offset, and a garbage token
    measure, n_invalid = c.parse_single_measure_part("/0 p60 d12 zzz")
    assert n_invalid >= 1


def test_two_part_queue_roundtrip():
    c = MidiQuantizedConverter()
    p0 = Part(measures=[Measure(time_sig=TimeSig(4, 4),
                                notes=[NoteEl(F(0), F(4), (72,))])])
    p1 = Part(measures=[Measure(time_sig=TimeSig(4, 4),
                                notes=[NoteEl(F(0), F(4), (48,))])])
    text = c.stream_to_texts(Score([p0, p1]), "x")["x"]
    assert "/0 " in text and "/1 " in text
    back = c.text_to_score(text)
    assert len(back.parts) == 2
    assert back.parts[0].measures[0].notes[0].pitches == (72,)
    assert back.parts[1].measures[0].notes[0].pitches == (48,)


def test_midi_to_text_to_midi_full_circle(tmp_path):
    c = MidiQuantizedConverter()
    m = make_midi([(60, 0, 1), (64, 1, 1), (67, 2, 2), (72, 4, 4)])
    path = tmp_path / "in.mid"
    midi_io.write_midi_file(m, path)
    texts = c.filepath_to_texts(path)
    assert list(texts.keys()) == ["in.mid"]
    score = c.text_to_score(texts["in.mid"])
    out = score_to_midi(score)
    pitches = [(n.pitch, n.start_tick) for n in sorted(out.notes, key=lambda x: x.start_tick)]
    assert pitches == [(60, 0), (64, 480), (67, 960), (72, 1920)]


def test_transpose():
    c = MidiQuantizedConverter()
    text = c.stream_to_texts(simple_score(), "x", transpose_pitches_by_n=2)["x"]
    assert "p62" in text and "p66" in text and "p69" in text

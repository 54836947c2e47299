"""ABC parser tests: pitches, keys, durations, repeats, tuplets, chords, voices."""

from fractions import Fraction

import pytest

from ai_music_generation_tpu.abcnotation.parser import (
    AbcParser,
    key_signature_sharps,
    sharps_to_accidentals,
)
from ai_music_generation_tpu.abcnotation.to_midi import abc_to_midi

F = Fraction


def parse(body, headers="X:1\nL:1/8\nM:4/4\nK:C\n"):
    return AbcParser().parse(headers + body)


def notes_of(tune):
    return [(n.pitch, n.start, n.duration) for n in tune.notes if not n.is_rest]


# ---- key signatures ---------------------------------------------------------

def test_key_signature_sharps():
    assert key_signature_sharps("C") == 0
    assert key_signature_sharps("G") == 1
    assert key_signature_sharps("D") == 2
    assert key_signature_sharps("F") == -1
    assert key_signature_sharps("Bb") == -2
    assert key_signature_sharps("Eb") == -3
    assert key_signature_sharps("Am") == 0  # A minor: no accidentals
    assert key_signature_sharps("Em") == 1  # E minor: F#
    assert key_signature_sharps("Dm") == -1  # D minor: Bb
    assert key_signature_sharps("Ador") == 1  # A dorian = G major set
    assert key_signature_sharps("Amix") == 2  # A mixolydian = D major set
    assert key_signature_sharps("Edor") == 2  # E dorian = D major set
    assert key_signature_sharps("none") == 0


def test_sharps_to_accidentals():
    assert sharps_to_accidentals(2) == {"F": 1, "C": 1}
    assert sharps_to_accidentals(-2) == {"B": -1, "E": -1}
    assert sharps_to_accidentals(0) == {}


# ---- pitches ----------------------------------------------------------------

def test_basic_pitches_and_octaves():
    t = parse("C D E F | G A B c | C, c' |")
    pitches = [p for p, _, _ in notes_of(t)]
    assert pitches == [60, 62, 64, 65, 67, 69, 71, 72, 48, 84]


def test_key_applies_accidentals():
    t = parse("F C |", headers="X:1\nL:1/8\nM:4/4\nK:D\n")
    assert [p for p, _, _ in notes_of(t)] == [66, 61]  # F#, C#


def test_explicit_accidentals_and_measure_propagation():
    # ^F applies to later F in the same measure; bar resets
    t = parse("^F F | F |")
    assert [p for p, _, _ in notes_of(t)] == [66, 66, 65]
    # natural overrides key
    t = parse("=F F |", headers="X:1\nL:1/8\nM:4/4\nK:D\n")
    assert [p for p, _, _ in notes_of(t)] == [65, 65]


# ---- durations --------------------------------------------------------------

def test_durations_and_unit_length():
    t = parse("C C2 C/2 C/ C3/2 |")
    ds = [d for _, _, d in notes_of(t)]
    assert ds == [F(1, 2), F(1), F(1, 4), F(1, 4), F(3, 4)]


def test_default_L_from_meter():
    # M:2/4 (< 3/4) with no L: -> unit 1/16
    t = AbcParser().parse("X:1\nM:2/4\nK:C\nC |")
    assert t.unit_length == F(1, 16)
    assert notes_of(t)[0][2] == F(1, 4)


def test_rests_advance_time():
    # L:1/8 -> unit is half a quarter: C@0, z, C@1, bar, z2, C@2.5
    t = parse("C z C | z2 C |")
    starts = [s for _, s, _ in notes_of(t)]
    assert starts == [0, 1, F(5, 2)]


def test_multimeasure_rest():
    t = parse("Z2 C |", headers="X:1\nL:1/4\nM:3/4\nK:C\n")
    assert notes_of(t)[0][1] == 6  # two 3/4 bars = 6 quarters


# ---- structures -------------------------------------------------------------

def test_broken_rhythm():
    t = parse("C>D E<F |")
    ds = [d for _, _, d in notes_of(t)]
    assert ds == [F(3, 4), F(1, 4), F(1, 4), F(3, 4)]
    # time flow: C ends at 3/4, D at 1, E at 5/4 -> F starts at 5/4
    assert notes_of(t)[-1][1] == F(5, 4)


def test_tie_merges_same_pitch():
    t = parse("C2- C2 D |")
    ns = notes_of(t)
    assert ns[0] == (60, 0, 2)  # merged 1+1
    assert ns[1][0] == 62


def test_chord_bracket():
    t = parse("[CEG]2 D |")
    ns = notes_of(t)
    assert [(p, s) for p, s, _ in ns[:3]] == [(60, 0), (64, 0), (67, 0)]
    assert all(d == 1 for _, _, d in ns[:3])
    assert ns[3] == (62, 1, F(1, 2))


def test_tuplet_triplet():
    t = parse("(3CDE F |")
    ns = notes_of(t)
    assert [d for _, _, d in ns[:3]] == [F(1, 3)] * 3
    assert ns[3][1] == 1  # triplet total = 2 eighths = 1 quarter


def test_repeat_expansion():
    t = parse("|: C D :| E |")
    ps = [p for p, _, _ in notes_of(t)]
    assert ps == [60, 62, 60, 62, 64]
    starts = [s for _, s, _ in notes_of(t)]
    assert starts == [0, F(1, 2), 1, F(3, 2), 2]


def test_repeat_without_start_marker():
    # :| with no |: repeats from the beginning
    t = parse("C D :| E |")
    assert [p for p, _, _ in notes_of(t)] == [60, 62, 60, 62, 64]


def test_voices():
    t = parse("V:1\nC D |\nV:2\nE F |\n", headers="X:1\nL:1/8\nM:4/4\nK:C\n")
    v0 = [n for n in t.notes if n.voice == 0 and not n.is_rest]
    v1 = [n for n in t.notes if n.voice == 1 and not n.is_rest]
    assert [n.pitch for n in v0] == [60, 62]
    assert [n.pitch for n in v1] == [64, 65]
    assert v1[0].start == 0  # voices are parallel


def test_chord_symbols_recorded_graces_played_decorations_skipped():
    t = parse('"G" C {ag}D !trill!E |')
    # graces (a, g) play before D, stealing the first 1/4 of its span
    assert [p for p, _, _ in notes_of(t)] == [60, 81, 79, 62, 64]
    assert t.chord_symbols == [(Fraction(0), "G")]
    assert t.accomp_voice is None  # accompaniment is opt-in


def test_inline_meter_change():
    t = parse("C | [M:3/4] D |")
    assert t.meter == (3, 4)


def test_tempo_parsing():
    t = AbcParser().parse("X:1\nQ:1/4=100\nM:4/4\nK:C\nC |")
    assert t.tempo_bpm == pytest.approx(100.0)
    t = AbcParser().parse("X:1\nQ:1/8=120\nM:4/4\nK:C\nC |")
    assert t.tempo_bpm == pytest.approx(60.0)


# ---- to_midi ----------------------------------------------------------------

def test_abc_to_midi_end_to_end():
    midi = abc_to_midi("X:1\nT:Test\nL:1/8\nM:4/4\nQ:1/4=120\nK:D\nDEFG A2 |")
    notes = sorted(midi.notes, key=lambda n: n.start_tick)
    assert [n.pitch for n in notes] == [62, 64, 66, 67, 69]
    assert notes[0].start_tick == 0
    assert notes[1].start_tick == 240
    assert notes[4].end_tick == 240 * 4 + 480  # A2 = one quarter at L:1/8
    assert midi.time_signatures[0].numerator == 4
    assert midi.key_signatures[0].sharps == 2
    assert abs(midi.tempos[0].bpm - 120.0) < 1e-9


def test_random_notes_style_abc():
    """The shape the random-note baseline generators emit (ref scripts/random_notes)."""
    abc = "X:3\nL:1/4\nM:6/8\nK:Bb\nB2 c A, | g'3 F z |"
    midi = abc_to_midi(abc)
    assert len(midi.notes) == 5
    assert midi.key_signatures[0].sharps == -2


def test_mismatched_tie_does_not_capture_later_note():
    """A tie binds only the immediately-following note: 'C2- D2 C2' must
    yield three notes (regression: the tie used to capture the later C)."""
    t = parse("C2- D2 C2 |")
    ns = notes_of(t)
    assert [(p, s, d) for p, s, d in ns] == [
        (60, 0, 1), (62, 1, 1), (60, 2, 1),
    ]


def test_repeat_with_chords_advances_by_span():
    """Repeat expansion must advance time by the section SPAN, not the sum
    of note durations (regression: chords overcounted)."""
    t = parse("|: [CEG]2 :| D |")
    ns = notes_of(t)
    # [CEG]2 spans 1 quarter: chord at 0, repeat at 1, D at 2
    # (the bug advanced by the 3-quarter duration SUM -> D landed at 4)
    starts = sorted(set(s for _, s, _ in ns))
    assert starts == [0, 1, 2]
    d_note = [n for n in ns if n[0] == 62]
    assert d_note[0][1] == 2


def test_first_second_ending_timing():
    """Volta timing: the second ending starts right after the repeated body
    (regression: the span fix over-advanced by the first ending's length)."""
    t = parse("|: A2 [1 B2 :| [2 c2 |")
    assert [(p, s) for p, s, _ in notes_of(t)] == [
        (69, 0), (71, 1), (69, 2), (72, 3),
    ]


# ---- golden event streams: graces + gchord (round-2 features) ---------------
# Frozen fixtures: any semantic drift in grace stealing or the gchord engine
# must break these, in BOTH implementations (the differential suite links them).

def test_grace_golden_stream():
    """{AB}C2: graces split the first 1/4 of C2's 2-quarter span."""
    t = AbcParser().parse("X:1\nL:1/4\nM:4/4\nK:C\n{AB}C2 D2|\n")
    assert notes_of(t) == [
        (69, F(0), F(1, 4)),        # A grace
        (71, F(1, 4), F(1, 4)),     # B grace
        (60, F(1, 2), F(3, 2)),     # C2 scaled to 3/4
        (62, F(2), F(2)),           # D2 untouched
    ]


def test_grace_chord_golden_stream():
    """{f}[CEG]2: chord scales to 3/4, grace takes the first 1/4."""
    t = AbcParser().parse("X:1\nL:1/4\nM:4/4\nK:C\n{f}[CEG]2|\n")
    assert notes_of(t) == [
        (77, F(0), F(1, 2)),
        (60, F(1, 2), F(3, 2)),
        (64, F(1, 2), F(3, 2)),
        (67, F(1, 2), F(3, 2)),
    ]


def test_gchord_golden_stream():
    """"C" then "G7" in 4/4: fzczfzcz on the eighth grid, fundamental C2+pc,
    chord tones C3+pc+iv, on a dedicated voice after the melody voices."""
    t = AbcParser(gchord=True).parse('X:1\nL:1/4\nM:4/4\nK:C\n"C"CDEF|"G7"GABc|\n')
    assert t.accomp_voice == 1
    acc = [(n.pitch, n.start, n.duration) for n in t.notes if n.voice == 1]
    assert acc == [
        # bar 1: C major — f(36) z c(48,52,55) z f z c z
        (36, F(0), F(1, 2)),
        (48, F(1), F(1, 2)), (52, F(1), F(1, 2)), (55, F(1), F(1, 2)),
        (36, F(2), F(1, 2)),
        (48, F(3), F(1, 2)), (52, F(3), F(1, 2)), (55, F(3), F(1, 2)),
        # bar 2: G7 — f(43) z c(55,59,62,65) z f z c z
        (43, F(4), F(1, 2)),
        (55, F(5), F(1, 2)), (59, F(5), F(1, 2)), (62, F(5), F(1, 2)), (65, F(5), F(1, 2)),
        (43, F(6), F(1, 2)),
        (55, F(7), F(1, 2)), (59, F(7), F(1, 2)), (62, F(7), F(1, 2)), (65, F(7), F(1, 2)),
    ]


def test_gchord_slash_bass_golden():
    """"A7/E": fundamental uses the bass pitch class, chord tones the root."""
    t = AbcParser(gchord=True).parse('X:1\nL:1/4\nM:4/4\nK:C\n"A7/E"A4|\n')
    acc = [(n.pitch, n.start) for n in t.notes if n.voice == t.accomp_voice]
    # f slots at 0 and 2 use E (pc 4) -> 40; c slots use A7 (57,61,64,67)
    assert acc[0] == (40, F(0))
    assert {p for p, s in acc if s == F(1)} == {57, 61, 64, 67}


def test_gchord_to_midi_program_and_velocity():
    """Accompaniment renders on its own track: program 24, velocity 80."""
    midi = abc_to_midi('X:1\nL:1/4\nM:4/4\nK:C\n"C"CDEF|\n', gchord=True)
    by_prog = {tr.program: tr for tr in midi.tracks}
    assert 24 in by_prog and by_prog[24].name == "gchord"
    assert all(n.velocity == 80 for n in by_prog[24].notes)
    assert all(n.velocity == 105 for n in by_prog[0].notes)

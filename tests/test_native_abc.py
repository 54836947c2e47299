"""Differential tests: native C++ ABC compiler vs the Python reference parser.

Builds the shared library on demand (g++ is baked into the image)."""

import random
import subprocess

import pytest

from ai_music_generation_tpu.abcnotation.parser import AbcParser


@pytest.fixture(scope="module")
def native_parser():
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "native")], check=True,
                   capture_output=True)
    from ai_music_generation_tpu.abcnotation import native

    assert native.native_available()
    return native.NativeAbcParser()


def assert_tunes_equal(a, b, msg=""):
    assert a.meter == b.meter, msg
    assert a.sharps == b.sharps, msg
    assert a.unit_length == b.unit_length, msg
    assert a.tempo_bpm == pytest.approx(b.tempo_bpm), msg
    na = [(n.pitch, n.start, n.duration, n.voice) for n in a.notes]
    nb = [(n.pitch, n.start, n.duration, n.voice) for n in b.notes]
    assert na == nb, f"{msg}\npython={na}\nnative={nb}"


CASES = [
    "X:1\nL:1/8\nM:4/4\nK:C\nC D E F | G A B c |",
    "X:1\nL:1/8\nM:4/4\nK:D\nF C f c |",
    "X:1\nL:1/8\nM:4/4\nK:C\n^F F | F |",
    "X:1\nL:1/8\nM:4/4\nK:Bb\nB e B' B, |",
    "X:1\nL:1/8\nM:4/4\nK:C\nC2 C/2 C/ C3/2 C// |",
    "X:1\nM:2/4\nK:C\nCDEF |",  # default L from meter
    "X:1\nL:1/8\nM:4/4\nK:C\nC z C z2 | Z C |",
    "X:1\nL:1/8\nM:4/4\nK:C\nC>D E<F C>>D |",
    "X:1\nL:1/8\nM:4/4\nK:C\nC2- C2 D- E |",
    "X:1\nL:1/8\nM:4/4\nK:C\n[CEG]2 [DF] D |",
    "X:1\nL:1/8\nM:4/4\nK:C\n(3CDE F (3:2:2GA B |",
    "X:1\nL:1/8\nM:4/4\nK:C\n|: C D :| E |",
    "X:1\nL:1/8\nM:4/4\nK:C\nC D :| E |",
    "X:1\nL:1/8\nM:4/4\nK:C\nC | [M:3/4] D E F |",
    "X:1\nQ:1/8=90\nL:1/8\nM:4/4\nK:Em\nE F G |",
    'X:1\nL:1/8\nM:4/4\nK:C\n"Am" C {ag}D !trill!E .F |',
    "X:1\nL:1/8\nM:6/8\nK:Ador\nEAA BAB | g2e a2b |",
    "X:1\nL:1/4\nM:3/4\nK:Gm\nG A B | =B c d |",
    "X:1\nL:1/8\nM:4/4\nK:C\nV:1\nC D |\nV:2\nE F |",
    "X:1\nL:1/16\nM:2/4\nK:Amix\ncBAG EFGE |",
]


@pytest.mark.parametrize("abc", CASES)
def test_native_matches_python(native_parser, abc):
    assert_tunes_equal(AbcParser().parse(abc), native_parser.parse(abc), abc)


def test_native_matches_python_random_corpus(native_parser):
    """Fuzz: random baseline-style tunes must agree exactly."""
    from ai_music_generation_tpu.cli.random_baselines import (
        KEY_SIGNATURES,
        NOTES,
        TIME_SIGNATURES,
        random_note_seq,
    )

    rng = random.Random(0)
    py = AbcParser()
    for trial in range(50):
        measures = []
        for _ in range(rng.randint(2, 8)):
            measures.append(" ".join(random_note_seq(rng, rng.randint(1, 5))))
        abc = (
            f"X:{trial}\nL:1/4\nM:{rng.choice(TIME_SIGNATURES)}\n"
            f"K:{rng.choice(KEY_SIGNATURES)}\n" + " | ".join(measures) + " |\n"
        )
        assert_tunes_equal(py.parse(abc), native_parser.parse(abc), abc)


def test_native_empty_and_garbage(native_parser):
    t = native_parser.parse("")
    assert t.notes == []
    t = native_parser.parse("X:1\nK:C\n@#$%^&*")
    assert t.notes == []


def test_native_regression_tie_and_chord_repeat(native_parser):
    """The two review-found parser bugs, fixed in BOTH implementations."""
    for abc in (
        "X:1\nL:1/8\nM:4/4\nK:C\nC2- D2 C2 |",
        "X:1\nL:1/8\nM:4/4\nK:C\n|: [CEG]2 :| D |",
    ):
        assert_tunes_equal(AbcParser().parse(abc), native_parser.parse(abc), abc)


def test_native_volta_timing(native_parser):
    abc = "X:1\nL:1/8\nM:4/4\nK:C\n|: A2 [1 B2 :| [2 c2 |"
    assert_tunes_equal(AbcParser().parse(abc), native_parser.parse(abc), abc)


# ---- round-2 features: graces, +decorations+, gchord accompaniment ----------

FEATURE_CASES = [
    # graces steal 1/4 of the principal's span (single notes and chords)
    "X:1\nL:1/4\nM:4/4\nK:C\n{AB}C2 D2|{g}E4|",
    "X:1\nL:1/4\nM:4/4\nK:C\n{f}[CEG]2 D2|",
    # graces drop at rests/barlines/EOF; grace accidentals propagate
    "X:1\nL:1/4\nK:C\n{ab}z2 {cd}|C4|",
    "X:1\nL:1/4\nK:C\n{^F}G F2 G|",
    # graces can't split a tie
    "X:1\nL:1/4\nK:C\nC2-{de}C2|",
    # old-style +...+ decorations are consumed
    "X:1\nL:1/4\nK:C\n+trill+C D +fermata+E F|",
    # broken rhythm interacting with a grace group
    "X:1\nL:1/8\nM:4/4\nK:C\nC>{a}D E2|",
]

GCHORD_CASES = [
    'X:1\nL:1/4\nM:4/4\nK:C\n"C"CDEF|"G7"GABc|',
    'X:1\nL:1/4\nM:3/4\nK:C\n"Dm"DEF|"A7/E"ABc|',
    'X:1\nL:1/8\nM:6/8\nK:G\n"G"GAB dBG|"Em"E2E G2G|',
    'X:1\nL:1/4\nM:4/4\nK:C\n|:"C"CDEF:|"F"FGAB|',      # repeat copies chords
    'X:1\nL:1/4\nM:4/4\nK:C\n|:"C"CDEF|[1 "G"GABG:|[2 "F"FACF|',
    'X:1\nL:1/4\nM:4/4\nK:C\n"Intro"C4|"^above"D4|"Cm7"E4|',  # annotations skip
    'X:1\nL:1/4\nM:4/4\nK:C\n"Cadd9"C4|',                # unknown type -> major
    'X:1\nL:1/4\nM:2/4\nK:D\n"D"DF|"Bm"Bd|"A7sus4"AA|',
]


@pytest.mark.parametrize("abc", FEATURE_CASES)
def test_native_matches_python_graces_decorations(native_parser, abc):
    assert_tunes_equal(AbcParser().parse(abc), native_parser.parse(abc), abc)


@pytest.mark.parametrize("abc", GCHORD_CASES)
def test_native_matches_python_gchord(native_parser, abc):
    from ai_music_generation_tpu.abcnotation.native import NativeAbcParser

    py = AbcParser(gchord=True).parse(abc)
    cc = NativeAbcParser(gchord=True).parse(abc)
    assert_tunes_equal(py, cc, abc)
    assert py.accomp_voice == cc.accomp_voice


@pytest.mark.parametrize("abc,expect", [
    # tempo guards (ref _parse_tempo + falsy check): zero/garbage ignored
    ("X:1\nQ:0\nK:C\nC\n", 120.0),
    ("X:1\nQ:90 apprx\nK:C\nC\n", 120.0),
    ("X:1\nQ:1/4=120\nK:C\nC\n", 120.0),
    ("X:1\nQ:1/8=120\nK:C\nC\n", 60.0),
    ("X:1\nQ:90\nK:C\nC\n", 90.0),
])
def test_tempo_guard_parity(native_parser, abc, expect):
    """Q: values that parser.py ignores must be ignored natively too — a
    sscanf-based parse accepted 'Q:0' (ZeroDivision downstream) and
    'Q:90 apprx' (review finding)."""
    from ai_music_generation_tpu.abcnotation.parser import AbcParser

    assert AbcParser().parse(abc).tempo_bpm == expect
    assert native_parser.parse(abc).tempo_bpm == expect


def test_unknown_tonic_and_meter_fallback(native_parser):
    """K: with a non-A-G (or untabled) tonic is 0 sharps with NO mode
    offset; a malformed M: resets to 4/4 — both mirroring parser.py."""
    from ai_music_generation_tpu.abcnotation.parser import AbcParser

    for abc in ("X:1\nK:Hm\nEAB\n", "X:1\nK:B#m\nEAB\n"):
        a, b = AbcParser().parse(abc), native_parser.parse(abc)
        assert a.sharps == b.sharps == 0
        assert [n.pitch for n in a.notes] == [n.pitch for n in b.notes]
    abc = "X:1\nM:6/8\nK:C\nZ [M:bad] Z\n"
    a, b = AbcParser().parse(abc), native_parser.parse(abc)
    assert a.meter == b.meter == (4, 4)
    assert [(n.start, n.duration) for n in a.notes] == \
           [(n.start, n.duration) for n in b.notes]

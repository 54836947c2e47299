"""Grammar-driven fuzzing (VERDICT r2 #5).

(a) ABC: a seeded random-tune generator spanning the implemented grammar
    (notes/accidentals/octaves/lengths, rests, chords, tuplets, broken
    rhythm, ties, graces, decorations, chord symbols, inline fields,
    repeats, voltas, multi-voice) drives Python-vs-C++ event-stream
    equality — the differential obligation in CLAUDE.md (semantic changes
    must land in BOTH compilers; ref behavior:
    scripts/common/abc_to_midi_wav_and_aesthetics.py:118).
(b) Codec: random quantized Scores round-trip through
    score -> midi-token text -> score with note content preserved
    (ref: src/.../quantized_converter.py both directions).

Deterministic: every case derives from a fixed seed, so a failure's repro
is its case index.
"""

import random
from fractions import Fraction

import pytest

from ai_music_generation_tpu.abcnotation.parser import AbcParser

N_ABC_CASES = 1000
N_CODEC_CASES = 200

# ----------------------------------------------------------- ABC generator

LETTERS = "CDEFGABcdefgab"
ACCIDENTALS = ["", "", "", "", "^", "_", "=", "^^", "__",
               "^^^", "^_", "=^"]  # over-long/mixed runs: regex backtracks
OCTAVES = ["", "", "", "'", ",", "''", ",,"]
LENGTHS = ["", "", "", "2", "3", "4", "/2", "/", "3/2", "//", "/4", "3/4",
           "3/", "//2"]  # stray-slash forms: length token ends at the digits
KEYS = ["C", "G", "D", "A", "E", "F", "Bb", "Eb", "Am", "Em", "Dm",
        "Ador", "Amix", "Gm", "F#m", "Hm", "B#m"]  # unknown tonics -> 0
METERS = ["4/4", "3/4", "2/4", "6/8", "C", "C|", "5/4"]
UNITS = ["1/8", "1/16", "1/4"]
DECOS = ["!trill!", "!fermata!", ".", "~", "u", "v", "H", "T"]
CHORD_SYMS = ["C", "G7", "Am", "Dm7", "F", "Bdim", "E/G#"]


def _rand_note(rng: random.Random) -> str:
    return (rng.choice(ACCIDENTALS) + rng.choice(LETTERS)
            + rng.choice(OCTAVES) + rng.choice(LENGTHS))


def _rand_element(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if r < 0.45:
        return _rand_note(rng)
    if r < 0.52:
        return rng.choice(["z", "z2", "z/2", "z/", "x", "Z"])
    if r < 0.60:  # chord
        k = rng.randint(2, 3)
        inner = " ".join(_rand_note(rng) for _ in range(k)).replace(" ", "")
        return f"[{inner}]" + rng.choice(["", "2", "/2"])
    if r < 0.66 and depth == 0:  # tuplet with exactly r elements following
        p = rng.choice([2, 3, 4, 6])
        forms = [f"({p}", f"({p}:{rng.randint(1, 3)}",
                 f"({p}:{rng.randint(1, 3)}:{p}"]
        head = rng.choice(forms)
        def unit():
            if rng.random() < 0.15:  # chords inside tuplets
                return ("[" + _rand_note(rng).replace(" ", "")
                        + _rand_note(rng).replace(" ", "") + "]")
            return _rand_note(rng)
        return head + "".join(unit() for _ in range(p))
    if r < 0.72:  # broken rhythm pair (sometimes onto/off a chord)
        left = (_rand_note(rng) if rng.random() < 0.8
                else "[" + _rand_note(rng) + _rand_note(rng) + "]")
        right = (_rand_note(rng) if rng.random() < 0.8
                 else "[" + _rand_note(rng) + _rand_note(rng) + "]")
        return left + rng.choice([">", "<", ">>"]) + right
    if r < 0.78:  # tie: same pitch twice
        base = rng.choice(ACCIDENTALS) + rng.choice(LETTERS)
        return f"{base}2- {base}"
    if r < 0.84:  # grace group before a principal
        g = "".join(rng.choice(LETTERS) for _ in range(rng.randint(1, 3)))
        return "{" + g + "}" + _rand_note(rng)
    if r < 0.88:
        return rng.choice(DECOS) + _rand_note(rng)
    if r < 0.92:
        return f'"{rng.choice(CHORD_SYMS)}"' + _rand_note(rng)
    if r < 0.96:  # inline field (incl. unknown/ignored and malformed ones)
        tag = rng.choice([f"[M:{rng.choice(['3/4', '4/4', '6/8'])}]",
                          f"[L:{rng.choice(UNITS)}]",
                          f"[K:{rng.choice(KEYS)}]",
                          "[r:remark eb]", "[I:linebreak]", "[M:bad]"])
        return tag + " " + _rand_note(rng)
    return "(" + _rand_note(rng) + _rand_note(rng) + ")"  # slur


def random_tune(seed: int) -> str:
    """One random tune over the implemented ABC grammar."""
    rng = random.Random(seed)
    lines = ["X:1", f"L:{rng.choice(UNITS)}", f"M:{rng.choice(METERS)}"]
    if rng.random() < 0.3:
        lines.append(rng.choice([
            f"Q:1/4={rng.randint(60, 200)}", "Q:0", "Q:90 apprx",
            f"Q:{rng.randint(60, 200)}"]))
    if rng.random() < 0.15:  # comment / directive lines are stripped
        lines.append(rng.choice(["% a comment", "%%MIDI program 0"]))
    lines.append(f"K:{rng.choice(KEYS)}")

    def body_extra() -> str:
        """Occasional mid-body field/metadata lines and malformed rests
        (both compilers must agree on all of them)."""
        roll = rng.random()
        if roll < 0.3:
            return f"K:{rng.choice(KEYS)}"
        if roll < 0.55:
            return f"M:{rng.choice(['3/4', '4/4', '6/8'])}"
        if roll < 0.75:
            return rng.choice(["T:some title", "R:reel", "N:note text"])
        return rng.choice(["Z/2 " + _rand_note(rng), "Z3/4", "Z4/2",
                           "Z3/" + rng.choice("CDE"),
                           f"Z{rng.randint(1, 2)}"])

    def measures(k: int) -> str:
        out = []
        for _ in range(k):
            n = rng.randint(1, 5)
            toks = [_rand_element(rng) for _ in range(n)]
            if rng.random() < 0.1:  # tie across the barline
                base = rng.choice(LETTERS)
                toks.append(f"{base}2-")
                out.append(" ".join(toks))
                out.append(f"{base} " + _rand_note(rng))
                continue
            out.append(" ".join(toks))
        return " | ".join(out)

    n_voices = 1 if rng.random() < 0.7 else rng.randint(2, 3)
    body = []
    for v in range(n_voices):
        if n_voices > 1:
            body.append(f"V:{v + 1}")
        shape = rng.random()
        if shape < 0.22:  # plain
            body.append(measures(rng.randint(2, 5)) + " |")
        elif shape < 0.42:  # simple repeat (sometimes [|: / ||: spelling)
            start = rng.choice(["|:", "|:", "[|:", "||:"])
            body.append(f"{start} {measures(2)} :| {measures(1)} |")
        elif shape < 0.62:  # volta endings, bracket or bar-digit spelling
            if rng.random() < 0.5:
                body.append(
                    f"|: {measures(2)} |[1 {measures(1)} :|[2 {measures(1)} |")
            else:
                body.append(
                    f"|: {measures(2)} |1 {measures(1)} :|2 {measures(1)} |")
        elif shape < 0.8:  # double repeat ::
            body.append(f"|: {measures(1)} :: {measures(1)} :| ")
        else:  # start-of-tune repeat end, no explicit |:
            body.append(f"{measures(2)} :| {measures(1)} |]")
        if rng.random() < 0.25:
            body.append(body_extra())
        if rng.random() < 0.08:
            # trailing % comment at END of a body line only — an interior
            # comment would comment out the repeat/volta closers, shrinking
            # the very structures this grammar exists to cover
            body[-1] += " % noise " + rng.choice(LETTERS)
    return "\n".join(lines + body) + "\n"


@pytest.fixture(scope="module")
def native_parser():
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(["make", "-C", os.path.join(root, "native")], check=True,
                   capture_output=True)
    from ai_music_generation_tpu.abcnotation import native

    assert native.native_available()
    return native.NativeAbcParser()


def test_abc_fuzz_python_vs_native(native_parser):
    py = AbcParser()
    failures = []
    for case in range(N_ABC_CASES):
        abc = random_tune(case)
        a = py.parse(abc)
        b = native_parser.parse(abc)
        na = [(n.pitch, n.start, n.duration, n.voice) for n in a.notes]
        nb = [(n.pitch, n.start, n.duration, n.voice) for n in b.notes]
        if (na != nb or a.meter != b.meter or a.sharps != b.sharps
                or a.unit_length != b.unit_length):
            failures.append((case, abc))
            if len(failures) >= 3:
                break
    assert not failures, "\n\n".join(
        f"case {c}:\n{abc}" for c, abc in failures)


def test_abc_fuzz_durations_positive_and_sorted():
    """Structural invariants of the Python parse over the fuzz corpus:
    non-negative starts, positive durations, per-voice sorted starts."""
    py = AbcParser()
    for case in range(0, N_ABC_CASES, 5):
        tune = py.parse(random_tune(case))
        last = {}
        for n in tune.notes:
            assert n.duration > 0, (case, n)
            assert n.start >= 0, (case, n)
            assert n.start >= last.get(n.voice, Fraction(0)), (case, n)
            last[n.voice] = n.start


# --------------------------------------------------------- codec round trip


def _random_score(seed: int):
    from ai_music_generation_tpu.codec.score import (
        Measure,
        NoteEl,
        Part,
        Score,
        TimeSig,
    )

    rng = random.Random(10_000 + seed)
    num, den = rng.choice([(4, 4), (3, 4), (6, 8), (2, 4)])
    bar_ql = Fraction(4 * num, den)
    grid = rng.choice([Fraction(1, 2), Fraction(1, 4), Fraction(1, 3)])
    n_parts = rng.randint(1, 3)
    parts = []
    for p in range(n_parts):
        measures = []
        offset = Fraction(0)
        for mi in range(rng.randint(2, 4)):
            m = Measure(offset=offset, bar_duration=bar_ql,
                        real_duration=bar_ql)
            if mi == 0:
                m.time_sig = TimeSig(num, den)
            t = Fraction(0)
            while t < bar_ql:
                steps = rng.randint(1, 4)
                ql = min(grid * steps, bar_ql - t)
                if rng.random() < 0.2:
                    m.notes.append(NoteEl(offset=t, quarter_length=ql))
                else:
                    k = 1 if rng.random() < 0.8 else 2
                    pitches = tuple(sorted(
                        {rng.randint(48, 84) for _ in range(k)}))
                    m.notes.append(NoteEl(offset=t, quarter_length=ql,
                                          pitches=pitches))
                t += ql
            measures.append(m)
            offset += bar_ql
        parts.append(Part(measures=measures, name=f"P{p}", program=0))
    return Score(parts=parts)


def _note_set(score):
    """(part, absolute offset, ql, pitches) multiset, rests dropped.

    Parts with no pitched notes are dropped BEFORE numbering — the
    converter's filter_allowed_parts does the same (ref
    quantized_converter.py:838 keeps only parts containing Note/Chord), so
    an all-rest part legitimately vanishes from the text and later parts
    shift down one index (found by the extended fuzz campaign,
    docs/experiments/fuzz_campaign.py).

    Absolute offsets are accumulated from real_durations because
    ``text_to_score`` reconstructs measures sequentially without absolute
    offsets (parity with the reference converter)."""
    parts = [p for p in score.parts
             if any(n.pitches for m in p.measures for n in m.notes)]
    out = []
    for pi, part in enumerate(parts):
        run = Fraction(0)
        for m in part.measures:
            for n in m.notes:
                if n.pitches:
                    out.append((pi, run + n.offset, n.quarter_length,
                                tuple(sorted(n.pitches))))
            run += m.real_duration
    return sorted(out)


@pytest.mark.parametrize("joining,offsets", [
    ("Queue parallel measures", True),
    ("Join parallel measures", True),
    # no-offsets mode (the bach_no_offsets config family): offsets are
    # implicit in the duration sequence, so round trips are exact for the
    # gapless scores the generator produces — Queue only (Join merges
    # parts at offsets that cannot be reconstructed without o-tokens)
    ("Queue parallel measures", False),
])
def test_codec_fuzz_round_trip(joining, offsets):
    from ai_music_generation_tpu.codec.encoding_settings import EncodingSetting
    from ai_music_generation_tpu.codec.quantized_converter import (
        MidiQuantizedConverter,
    )

    conv = MidiQuantizedConverter(EncodingSetting(
        parallel_voices_joining_method=joining,
        include_offset_in_notes=offsets,
        instruments_to_convert="All instruments",
    ))
    failures = []
    for case in range(N_CODEC_CASES):
        score = _random_score(case)
        texts = conv.stream_to_texts(score, "fuzz")
        if not texts:
            continue
        back = conv.text_to_score(texts["fuzz"])
        want, got = _note_set(score), _note_set(back)
        if want != got:
            failures.append((case, texts["fuzz"][:400], want[:5], got[:5]))
            if len(failures) >= 2:
                break
    assert not failures, failures


def test_codec_fuzz_repeat_special_tokens():
    """repeats_handling='Special tokens': random left/right repeat flags on
    measures must not perturb the note round trip (repeat_start/repeat_end
    tokens interleave with the content stream; ref :344-442)."""
    from ai_music_generation_tpu.codec.encoding_settings import EncodingSetting
    from ai_music_generation_tpu.codec.quantized_converter import (
        MidiQuantizedConverter,
    )

    conv = MidiQuantizedConverter(EncodingSetting(
        parallel_voices_joining_method="Queue parallel measures",
        repeats_handling="Special tokens",
        instruments_to_convert="All instruments",
    ))
    for case in range(150):
        rng = random.Random(900_000 + case)
        score = _random_score(case)
        flagged = []
        for p in score.parts:
            for m in p.measures:
                if rng.random() < 0.2:
                    m.left_repeat = True
                if rng.random() < 0.2:
                    m.right_repeat = True
                flagged.append((m.left_repeat, m.right_repeat))
        texts = conv.stream_to_texts(score, "f")
        if not texts:
            continue
        back = conv.text_to_score(texts["f"])
        assert _note_set(score) == _note_set(back), case


def test_abc_fuzz_gchord_differential(native_parser):
    """The two GCHORD engines (chord-symbol accompaniment voices) must also
    agree — fixture differentials exist (test_native_abc) but the fuzz
    grammar emits chord symbols too, so run a slice with gchord=True."""
    from ai_music_generation_tpu.abcnotation.native import NativeAbcParser

    py = AbcParser(gchord=True)
    nat = NativeAbcParser(gchord=True)
    failures = []
    for case in range(0, N_ABC_CASES, 4):
        abc = random_tune(case)
        a, b = py.parse(abc), nat.parse(abc)
        na = [(n.pitch, n.start, n.duration, n.voice) for n in a.notes]
        nb = [(n.pitch, n.start, n.duration, n.voice) for n in b.notes]
        if na != nb:
            failures.append(case)
            if len(failures) >= 3:
                break
    assert not failures, [
        (c, random_tune(c)) for c in failures]

"""music21-oracle differential tests (skip when music21 is absent).

SURVEY §7 prescribes music21 as a host-side oracle for the clean-room ABC
parser and MIDI codec; the reference also uses it as an alternative
ABC->MIDI converter (ref: abc_to_midi_wav_and_aesthetics.py:117-121).
music21 is not installed in this environment, so the differential tests
``importorskip``; the absence-handling tests always run.
"""

from fractions import Fraction

import pytest

from ai_music_generation_tpu.abcnotation.music21_oracle import (
    Music21Missing,
    abc_note_events,
    have_music21,
    parser_note_events,
)

TUNES = [
    # plain C-major scale fragment, explicit L
    "X:1\nL:1/8\nM:4/4\nK:C\nCDEF GABc|\n",
    # key signature applies (F# in G major), octaves and lengths
    "X:2\nL:1/8\nM:6/8\nK:G\nGFG B2d|g2d B2G|\n",
    # accidentals propagate to the barline only
    "X:3\nL:1/4\nM:4/4\nK:C\n^FGF2|F4|\n",
    # chords and a tie
    "X:4\nL:1/4\nM:4/4\nK:C\n[CEG]2 C2-|C4|\n",
]


@pytest.mark.skipif(not have_music21(), reason="music21 not installed")
@pytest.mark.parametrize("abc", TUNES)
def test_parser_matches_music21_oracle(abc):
    """Our parser's (onset, pitch, duration) stream must equal music21's."""
    assert parser_note_events(abc) == abc_note_events(abc)


@pytest.mark.skipif(not have_music21(), reason="music21 not installed")
def test_midi_oracle_roundtrip(tmp_path):
    """MIDI written by our compiler must read back identically via music21."""
    from ai_music_generation_tpu.abcnotation.music21_oracle import midi_note_events
    from ai_music_generation_tpu.abcnotation.to_midi import abc_file_to_midi_file

    abc = TUNES[0]
    src = tmp_path / "t.abc"
    src.write_text(abc)
    out = tmp_path / "t.mid"
    abc_file_to_midi_file(str(src), str(out))
    assert midi_note_events(str(out)) == parser_note_events(abc)


def test_music21_absence_is_clean():
    """Without music21 the adapter must raise the typed error, not ImportError
    from an arbitrary call depth."""
    if have_music21():
        pytest.skip("music21 installed; absence path not exercisable")
    with pytest.raises(Music21Missing, match="builtin"):
        abc_note_events(TUNES[0])


def test_pipeline_music21_choice_errors_cleanly(tmp_path):
    """Selecting the music21 converter without music21 must fail with the
    typed error when the stage runs (per-file tolerance catches it)."""
    if have_music21():
        pytest.skip("music21 installed")
    from ai_music_generation_tpu.eval.pipeline import EvalPipeline, PipelineConfig

    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "s_1.abc").write_text(TUNES[0])
    p = EvalPipeline(PipelineConfig(
        abc_input_folder=str(tmp_path / "in"),
        base_output_dir=str(tmp_path / "out"),
        abc_to_midi_converter="music21",
    ))
    with pytest.raises(Music21Missing):
        p.abc_to_midi(str(tmp_path / "in" / "s_1.abc"))


def test_parser_events_normal_form():
    """The oracle comparison format itself: Fractions, chord expansion order,
    rests dropped."""
    ev = parser_note_events(TUNES[3])
    assert all(isinstance(e[0], Fraction) for e in ev)
    # [CEG]2 at offset 0: three simultaneous pitches 60/64/67, dur 2 quarters
    assert [e[1] for e in ev[:3]] == [60, 64, 67]
    assert ev[0][2] == Fraction(2)
    # tied C2-|C4 merges into one 6-quarter note
    assert ev[3] == (Fraction(2), 60, Fraction(6))

"""MusicXML -> ABC conversion tests (incl. .mxl and round trip to events)."""

import zipfile

import pytest

from ai_music_generation_tpu.abcnotation.from_musicxml import musicxml_to_abc
from ai_music_generation_tpu.abcnotation.parser import AbcParser


def make_musicxml(notes, fifths=0, beats=4, beat_type=4, divisions=2,
                  title="Test Tune"):
    """notes: list of measures; each measure a list of
    (step, alter, octave, duration_divs) or ('rest', dur) or ('chord', ...)."""
    out = [
        '<?xml version="1.0"?>',
        "<score-partwise>",
        f"<work><work-title>{title}</work-title></work>",
        '<part-list><score-part id="P1"/></part-list>',
        '<part id="P1">',
    ]
    for i, measure in enumerate(notes):
        out.append(f'<measure number="{i+1}">')
        if i == 0:
            out.append(
                f"<attributes><divisions>{divisions}</divisions>"
                f"<key><fifths>{fifths}</fifths></key>"
                f"<time><beats>{beats}</beats><beat-type>{beat_type}</beat-type></time>"
                "</attributes>"
            )
        for item in measure:
            if item[0] == "rest":
                out.append(f"<note><rest/><duration>{item[1]}</duration></note>")
            else:
                step, alter, octave, dur, *flags = item
                chord = "<chord/>" if "chord" in flags else ""
                alter_xml = f"<alter>{alter}</alter>" if alter else ""
                out.append(
                    f"<note>{chord}<pitch><step>{step}</step>{alter_xml}"
                    f"<octave>{octave}</octave></pitch>"
                    f"<duration>{dur}</duration></note>"
                )
        out.append("</measure>")
    out.append("</part></score-partwise>")
    return "\n".join(out)


def test_basic_conversion(tmp_path):
    xml = make_musicxml([
        [("C", 0, 4, 2), ("D", 0, 4, 2), ("E", 0, 4, 2), ("F", 0, 4, 2)],
        [("G", 0, 4, 8)],
    ])
    p = tmp_path / "t.xml"
    p.write_text(xml)
    abc = musicxml_to_abc(p)
    assert abc.startswith("X:1\nT:Test Tune\nM:4/4\nL:1/8\nK:C\n")
    # quarter notes at divisions=2 -> 2 L-units each
    assert "C2 D2 E2 F2 |" in abc
    assert "G8 |" in abc
    # parses back to the same pitches/timing
    tune = AbcParser().parse(abc)
    notes = [(n.pitch, float(n.start)) for n in tune.notes if not n.is_rest]
    assert notes == [(60, 0.0), (62, 1.0), (64, 2.0), (65, 3.0), (67, 4.0)]


def test_key_signature_and_accidentals(tmp_path):
    # D major (2 sharps): F#/C# are in-key (no accidental mark); F natural marked
    xml = make_musicxml([
        [("F", 1, 4, 2), ("F", 0, 4, 2), ("C", 1, 5, 4)],
    ], fifths=2)
    p = tmp_path / "t.xml"
    p.write_text(xml)
    abc = musicxml_to_abc(p)
    assert "K:D" in abc
    body = abc.splitlines()[-1]
    assert body.startswith("F2 =F2 c4")
    tune = AbcParser().parse(abc)
    pitches = [n.pitch for n in tune.notes if not n.is_rest]
    assert pitches == [66, 65, 73]


def test_rests_chords_and_mxl(tmp_path):
    xml = make_musicxml([
        [("rest", 4), ("C", 0, 4, 2, "x"), ("E", 0, 4, 2, "chord"),
         ("G", 0, 4, 2, "chord")],
    ])
    # fix: first chord note should not carry the chord flag
    xml = xml.replace('<note><chord/><pitch><step>C</step>', '<note><pitch><step>C</step>', 1)
    p = tmp_path / "t.mxl"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("score.xml", xml)
    abc = musicxml_to_abc(p)
    assert "z4" in abc.replace("z4 ", "z4 ")
    assert "[CEG]" in abc.replace("2", "")  # chord grouped


def test_batch_converter(tmp_path):
    from ai_music_generation_tpu.cli.batch_convert_xml import convert_directory

    src = tmp_path / "xml"
    src.mkdir()
    for i in range(3):
        (src / f"t{i}.xml").write_text(
            make_musicxml([[("C", 0, 4, 2), ("D", 0, 4, 2)]], title=f"T{i}")
        )
    (src / "bad.xml").write_text("<not-musicxml/>")
    out = tmp_path / "abc"
    ok, bad = convert_directory(str(src), str(out), processes=1)
    assert ok == 3 and bad == 1
    assert sorted(f.name for f in out.glob("*.abc")) == ["t0.abc", "t1.abc", "t2.abc"]

"""MusicXML -> ABC conversion tests (incl. .mxl and round trip to events)."""

import zipfile
from fractions import Fraction as F

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


# ---- round-2 breadth: multi-voice, tuplets, graces, .mxl ---------------------

def _score(body, fifths=0, beats=4, beat_type=4, divisions=2):
    return f"""<?xml version="1.0"?>
<score-partwise version="3.1">
  <part-list><score-part id="P1"><part-name>A</part-name></score-part></part-list>
  <part id="P1">
    <measure number="1">
      <attributes>
        <divisions>{divisions}</divisions>
        <key><fifths>{fifths}</fifths></key>
        <time><beats>{beats}</beats><beat-type>{beat_type}</beat-type></time>
      </attributes>
{body}
    </measure>
  </part>
</score-partwise>"""


def _note(step, octave, dur, voice=None, extra=""):
    v = f"<voice>{voice}</voice>" if voice else ""
    return (f"<note><pitch><step>{step}</step><octave>{octave}</octave></pitch>"
            f"<duration>{dur}</duration>{v}{extra}</note>")


def test_multivoice_backup_emits_V_lines(tmp_path):
    """Two voices interleaved with <backup> must come out as two V: lines,
    both parseable, time-aligned from 0."""
    body = (
        _note("C", 4, 4, voice=1) + _note("D", 4, 4, voice=1)
        + "<backup><duration>8</duration></backup>"
        + _note("E", 3, 4, voice=2) + _note("F", 3, 4, voice=2)
    )
    f = tmp_path / "mv.xml"
    f.write_text(_score(body))
    abc = musicxml_to_abc(str(f))
    assert "V:1" in abc and "V:2" in abc
    tune = AbcParser().parse(abc)
    assert tune.n_voices == 2
    v0 = [n for n in tune.notes if n.voice == 0]
    v1 = [n for n in tune.notes if n.voice == 1]
    assert [n.pitch for n in v0] == [60, 62]
    assert [n.pitch for n in v1] == [52, 53]
    assert v1[0].start == 0  # parallel voices


def test_multipart_keeps_all_parts(tmp_path):
    two_parts = f"""<?xml version="1.0"?>
<score-partwise version="3.1">
  <part-list><score-part id="P1"/><score-part id="P2"/></part-list>
  <part id="P1"><measure number="1">
    <attributes><divisions>1</divisions>
      <key><fifths>0</fifths></key>
      <time><beats>4</beats><beat-type>4</beat-type></time></attributes>
    {_note("C", 5, 4)}
  </measure></part>
  <part id="P2"><measure number="1">
    <attributes><divisions>1</divisions></attributes>
    {_note("C", 3, 4)}
  </measure></part>
</score-partwise>"""
    f = tmp_path / "mp.xml"
    f.write_text(two_parts)
    abc = musicxml_to_abc(str(f))
    tune = AbcParser().parse(abc)
    assert tune.n_voices == 2
    assert sorted(n.pitch for n in tune.notes) == [48, 72]


def test_tuplet_time_modification_roundtrip(tmp_path):
    """Triplet eighths (duration already modified in MusicXML) re-emit as a
    (3:2:3 group whose parsed durations equal the played ones exactly."""
    tm = ("<time-modification><actual-notes>3</actual-notes>"
          "<normal-notes>2</normal-notes></time-modification>")
    body = (
        "".join(_note(s, 4, 2, extra=tm) for s in "CDE")  # 3 triplet eighths
        + _note("F", 4, 6)  # plain dotted quarter fills the 4/4 bar
    )
    f = tmp_path / "tup.xml"
    f.write_text(_score(body, divisions=6))
    abc = musicxml_to_abc(str(f))
    assert "(3:2:3" in abc
    tune = AbcParser().parse(abc)
    durs = [n.duration for n in tune.notes]
    assert durs == [F(1, 3), F(1, 3), F(1, 3), F(1)]
    assert tune.notes[3].start == F(1)


def test_grace_notes_reemitted_as_abc_graces(tmp_path):
    body = (
        "<note><grace/><pitch><step>A</step><octave>4</octave></pitch></note>"
        + _note("G", 4, 8)
    )
    f = tmp_path / "gr.xml"
    f.write_text(_score(body))
    abc = musicxml_to_abc(str(f))
    assert "{A}" in abc
    tune = AbcParser().parse(abc)
    # grace steals the first 1/4 of G's 4-quarter span
    assert [(n.pitch, n.start, n.duration) for n in tune.notes] == [
        (69, F(0), F(1)), (67, F(1), F(3)),
    ]


def test_ornaments_warn_once(tmp_path):
    orn = "<notations><ornaments><trill-mark/></ornaments></notations>"
    body = _note("C", 4, 4, extra=orn) + _note("D", 4, 4, extra=orn)
    f = tmp_path / "orn.xml"
    f.write_text(_score(body))
    with pytest.warns(UserWarning, match="ornaments"):
        abc = musicxml_to_abc(str(f))
    assert AbcParser().parse(abc).notes  # still converts


def test_forward_becomes_rest(tmp_path):
    body = (_note("C", 4, 2, voice=1)
            + "<forward><duration>2</duration><voice>1</voice></forward>"
            + _note("E", 4, 2, voice=1) + _note("F", 4, 2, voice=1))
    f = tmp_path / "fw.xml"
    f.write_text(_score(body))
    tune = AbcParser().parse(musicxml_to_abc(str(f)))
    sounded = [n for n in tune.notes if not n.is_rest]
    assert [(n.pitch, n.start) for n in sounded] == [
        (60, F(0)), (64, F(2)), (65, F(3)),
    ]


def test_mxl_container_multivoice(tmp_path):
    import zipfile

    body = (
        _note("C", 4, 4, voice=1)
        + "<backup><duration>4</duration></backup>"
        + _note("E", 3, 4, voice=2)
        + _note("G", 4, 4, voice=1)
        + "<backup><duration>4</duration></backup>"
        + _note("B", 3, 4, voice=2)
    )
    f = tmp_path / "c.mxl"
    with zipfile.ZipFile(f, "w") as z:
        z.writestr("score.xml", _score(body))
    abc = musicxml_to_abc(str(f))
    tune = AbcParser().parse(abc)
    assert tune.n_voices == 2
    assert sorted(n.pitch for n in tune.notes) == [52, 59, 60, 67]


# ---- round-3 features: voltas, <harmony>, %%score, mid-tune changes ------


def _write(tmp_path, xml, name="t.xml"):
    p = tmp_path / name
    p.write_text(xml)
    return str(p)


def test_volta_endings(tmp_path):
    """<ending> start barlines -> ABC '[1'/'[2' voltas; repeat expansion in
    the in-repo parser plays ending 1 then ending 2 (xml2abc parity)."""
    xml = """<?xml version="1.0"?>
<score-partwise><part-list><score-part id="P1"/></part-list>
<part id="P1">
<measure number="1">
 <attributes><divisions>1</divisions><key><fifths>0</fifths></key>
 <time><beats>2</beats><beat-type>4</beat-type></time></attributes>
 <note><pitch><step>C</step><octave>4</octave></pitch><duration>2</duration></note>
</measure>
<measure number="2">
 <barline location="left"><ending number="1" type="start"/></barline>
 <note><pitch><step>D</step><octave>4</octave></pitch><duration>2</duration></note>
 <barline location="right"><ending number="1" type="stop"/>
  <repeat direction="backward"/></barline>
</measure>
<measure number="3">
 <barline location="left"><ending number="2" type="start"/></barline>
 <note><pitch><step>E</step><octave>4</octave></pitch><duration>2</duration></note>
</measure>
</part></score-partwise>"""
    abc = musicxml_to_abc(_write(tmp_path, xml))
    assert "[1 " in abc and "[2 " in abc and ":|" in abc
    tune = AbcParser().parse(abc)
    # expanded: C D C E  (first pass takes ending 1, repeat, then ending 2)
    pitches = [n.pitch for n in tune.notes]
    assert pitches == [60, 62, 60, 64], (abc, pitches)


def test_harmony_chord_symbols(tmp_path):
    xml = """<?xml version="1.0"?>
<score-partwise><part-list><score-part id="P1"/></part-list>
<part id="P1">
<measure number="1">
 <attributes><divisions>1</divisions><key><fifths>0</fifths></key>
 <time><beats>4</beats><beat-type>4</beat-type></time></attributes>
 <harmony><root><root-step>G</root-step></root><kind>dominant</kind></harmony>
 <note><pitch><step>G</step><octave>4</octave></pitch><duration>2</duration></note>
 <harmony><root><root-step>D</root-step></root><kind>minor</kind>
  <bass><bass-step>F</bass-step><bass-alter>1</bass-alter></bass></harmony>
 <note><pitch><step>D</step><octave>4</octave></pitch><duration>2</duration></note>
</measure>
</part></score-partwise>"""
    abc = musicxml_to_abc(_write(tmp_path, xml))
    assert '"G7"' in abc and '"Dm/F#"' in abc, abc
    # the symbols feed the gchord engine: parseable + at the right times
    tune = AbcParser().parse(abc)
    assert [(float(t), s) for t, s in tune.chord_symbols] == [
        (0.0, "G7"), (2.0, "Dm/F#")]


def test_score_directive_emitted_for_multipart(tmp_path):
    xml = """<?xml version="1.0"?>
<score-partwise>
<part-list><score-part id="P1"/><score-part id="P2"/></part-list>
<part id="P1"><measure number="1">
 <attributes><divisions>1</divisions><key><fifths>0</fifths></key>
 <time><beats>4</beats><beat-type>4</beat-type></time></attributes>
 <note><voice>1</voice><pitch><step>C</step><octave>5</octave></pitch><duration>4</duration></note>
 <backup><duration>4</duration></backup>
 <note><voice>2</voice><pitch><step>E</step><octave>4</octave></pitch><duration>4</duration></note>
</measure></part>
<part id="P2"><measure number="1">
 <note><pitch><step>C</step><octave>3</octave></pitch><duration>4</duration></note>
</measure></part>
</score-partwise>"""
    abc = musicxml_to_abc(_write(tmp_path, xml))
    assert "%%score (1 2) 3" in abc, abc
    # parser must still consume the tune (%% lines are skipped)
    tune = AbcParser().parse(abc)
    assert tune.n_voices == 3


def test_mid_tune_key_and_meter_change(tmp_path):
    xml = """<?xml version="1.0"?>
<score-partwise><part-list><score-part id="P1"/></part-list>
<part id="P1">
<measure number="1">
 <attributes><divisions>1</divisions><key><fifths>0</fifths></key>
 <time><beats>4</beats><beat-type>4</beat-type></time></attributes>
 <note><pitch><step>F</step><octave>4</octave></pitch><duration>4</duration></note>
</measure>
<measure number="2">
 <attributes><key><fifths>1</fifths></key>
 <time><beats>3</beats><beat-type>4</beat-type></time></attributes>
 <note><pitch><step>F</step><octave>4</octave></pitch><duration>3</duration></note>
</measure>
</part></score-partwise>"""
    abc = musicxml_to_abc(_write(tmp_path, xml))
    assert "[K:G]" in abc and "[M:3/4]" in abc, abc
    # header keeps the OPENING signatures; changes are inline fields
    assert "M:4/4" in abc and "K:C" in abc, abc
    tune = AbcParser().parse(abc)
    # MusicXML pitch is absolute: bar-2 F (no <alter>) must stay natural
    # under the new K:G — emitted as '=F'
    assert [n.pitch for n in tune.notes] == [65, 65], abc
    assert tune.meter == (3, 4)  # final meter after the inline change


def test_musicxml_round_trip_fuzz(tmp_path):
    """Seeded random MusicXML -> ABC -> in-repo parser: MIDI pitch/timing
    equality against directly-computed expectations. Exercises key
    signatures (fifths -5..5), measure accidental propagation, chords,
    rests, fractional L-unit durations, and 4/4 / 3/4 / 6/8 meters — the
    differential complement to the per-feature fixtures above (xml2abc
    parity surface, ref tunesformer/data_curation.zip)."""
    import random

    base = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}
    for case in range(150):
        rng = random.Random(77_000 + case)
        fifths = rng.randint(-5, 5)
        divisions = rng.choice([1, 2, 4])
        beats, beat_type = rng.choice([(4, 4), (3, 4), (6, 8)])
        total_units = F(4 * beats, beat_type) * divisions
        assert total_units.denominator == 1
        total_units = int(total_units)

        measures, expected = [], []
        t_ql = F(0)
        for _ in range(rng.randint(1, 3)):
            m, remaining = [], total_units
            while remaining:
                dur = rng.randint(1, min(remaining, 4 * divisions))
                ql = F(dur, divisions)
                if rng.random() < 0.2:
                    m.append(("rest", dur))
                    expected.append((-1, t_ql, ql))
                else:
                    k = 1 if rng.random() < 0.85 else rng.randint(2, 3)
                    seen = set()
                    for ci in range(k):
                        step = rng.choice("CDEFGAB")
                        alter = rng.choice([-1, 0, 0, 0, 1])
                        octave = rng.randint(3, 5)
                        midi = 12 * (octave + 1) + base[step] + alter
                        if midi in seen:
                            continue  # generator avoids chord unisons
                        seen.add(midi)
                        m.append((step, alter, octave, dur)
                                 + (("chord",) if ci else ()))
                        expected.append((midi, t_ql, ql))
                remaining -= dur
                t_ql += ql
            measures.append(m)

        p = tmp_path / f"fuzz{case}.xml"
        p.write_text(make_musicxml(
            measures, fifths=fifths, beats=beats, beat_type=beat_type,
            divisions=divisions))
        tune = AbcParser().parse(musicxml_to_abc(p))
        got = sorted((n.pitch, n.start, n.duration) for n in tune.notes)
        assert got == sorted(expected), (
            f"case {case}\n{musicxml_to_abc(p)}\n"
            f"missing={sorted(set(expected)-set(got))[:5]}\n"
            f"extra={sorted(set(got)-set(expected))[:5]}")


def test_mid_tune_voice_alignment(tmp_path):
    """A voice first appearing in measure 3 must be padded with full-measure
    rest bars so its notes start at measure 3, not t=0 (review finding:
    '' placeholders were dropped at output, collapsing the timeline)."""
    xml = """<?xml version="1.0"?>
<score-partwise>
<part-list><score-part id="P1"/></part-list>
<part id="P1">
<measure number="1">
<attributes><divisions>2</divisions><key><fifths>0</fifths></key>
<time><beats>4</beats><beat-type>4</beat-type></time></attributes>
<note><voice>1</voice><pitch><step>C</step><octave>4</octave></pitch><duration>8</duration></note>
</measure>
<measure number="2">
<note><voice>1</voice><pitch><step>D</step><octave>4</octave></pitch><duration>8</duration></note>
</measure>
<measure number="3">
<note><voice>1</voice><pitch><step>E</step><octave>4</octave></pitch><duration>8</duration></note>
<backup><duration>8</duration></backup>
<note><voice>2</voice><pitch><step>G</step><octave>3</octave></pitch><duration>8</duration></note>
</measure>
</part></score-partwise>"""
    p = tmp_path / "v.xml"
    p.write_text(xml)
    abc = musicxml_to_abc(p)
    tune = AbcParser().parse(abc)
    v2 = [n for n in tune.notes if n.voice == 1 and n.pitch >= 0]
    assert len(v2) == 1 and v2[0].pitch == 55
    assert v2[0].start == F(8)  # measure 3 starts at quarter 8, not 0

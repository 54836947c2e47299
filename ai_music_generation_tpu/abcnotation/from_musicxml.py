"""MusicXML -> ABC conversion.

Replaces the reference's vendored ``xml2abc.py`` (2,300 LoC, driven by
``batch_converter.py`` in tunesformer/data_curation.zip) with a clean-room
converter for the score-partwise subset the TunesFormer curation pipeline
needs: parts, measures, divisions, key (fifths) / time attributes, pitched
notes and rests with durations, chords, ties, voices (first voice kept per
part — the curation pipeline filters multi-voice tunes anyway), and repeat
barlines. ``.mxl`` (zipped MusicXML) is handled transparently.

Output is ABC text directly consumable by the in-repo ABC parser and the
control-code curation (data/curation.py).
"""

from __future__ import annotations

import io
import zipfile
from fractions import Fraction
from pathlib import Path
from typing import Optional
from xml.etree import ElementTree as ET

_STEP_TO_ABC = {"C": "C", "D": "D", "E": "E", "F": "F", "G": "G", "A": "A", "B": "B"}
_SHARP_KEYS = ["C", "G", "D", "A", "E", "B", "F#", "C#"]
_FLAT_KEYS = ["C", "F", "Bb", "Eb", "Ab", "Db", "Gb", "Cb"]

# which letters carry an accidental for a given fifths count
_SHARP_ORDER = "FCGDAEB"


def _key_name(fifths: int, mode: str = "major") -> str:
    if mode.lower().startswith("min"):
        # relative minor = major key 3 fifths lower
        name = _key_name(fifths)  # major name of the signature
        minors = ["A", "E", "B", "F#", "C#", "G#", "D#", "A#"]
        minors_flat = ["A", "D", "G", "C", "F", "Bb", "Eb", "Ab"]
        return (minors[fifths] if fifths >= 0 else minors_flat[-fifths]) + "m"
    return _SHARP_KEYS[fifths] if fifths >= 0 else _FLAT_KEYS[-fifths]


def _signature_alters(fifths: int) -> dict[str, int]:
    out: dict[str, int] = {}
    if fifths > 0:
        for letter in _SHARP_ORDER[:fifths]:
            out[letter] = 1
    elif fifths < 0:
        for letter in reversed(_SHARP_ORDER[len(_SHARP_ORDER) + fifths:]):
            out[letter] = -1
    return out


def _pitch_to_abc(step: str, alter: int, octave: int, key_alters: dict[str, int],
                  measure_state: dict) -> str:
    """MusicXML pitch -> ABC note, emitting an explicit accidental whenever
    the alteration differs from the current EFFECTIVE state (key signature
    overridden by earlier accidentals on the same letter+octave this
    measure) — matching ABC's measure-propagation semantics."""
    effective = measure_state.get((step, octave), key_alters.get(step, 0))
    prefix = ""
    if alter != effective:
        prefix = {2: "^^", 1: "^", 0: "=", -1: "_", -2: "__"}.get(alter, "")
        measure_state[(step, octave)] = alter
    if octave >= 5:
        body = step.lower() + "'" * (octave - 5)
    else:
        body = step + "," * (4 - octave)
    return prefix + body


def _dur_to_abc(units: Fraction) -> str:
    """duration in L-units -> ABC length suffix."""
    if units == 1:
        return ""
    if units.denominator == 1:
        return str(units.numerator)
    if units.numerator == 1 and units.denominator == 2:
        return "/"
    return f"{units.numerator}/{units.denominator}"


def load_musicxml(path) -> ET.Element:
    path = Path(path)
    data = path.read_bytes()
    if data[:2] == b"PK":  # .mxl container
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            names = [n for n in z.namelist()
                     if n.endswith(".xml") and not n.startswith("META-INF")]
            if not names:
                raise ValueError(f"{path}: no MusicXML inside .mxl")
            data = z.read(names[0])
    return ET.fromstring(data)


def musicxml_to_abc(path, reference: int = 1, unit: Fraction = Fraction(1, 8)) -> str:
    """Convert a MusicXML file to ABC text (first part, first voice)."""
    root = load_musicxml(path)
    if root.tag != "score-partwise":
        raise ValueError(f"unsupported MusicXML root {root.tag!r}")

    title = None
    work = root.find("work/work-title")
    if work is not None and work.text:
        title = work.text.strip()

    part = root.find("part")
    if part is None:
        raise ValueError("no <part> in MusicXML")

    divisions = 1
    fifths = 0
    mode = "major"
    beats, beat_type = 4, 4
    key_alters: dict[str, int] = {}
    body_bars: list[str] = []
    pending_tie = False

    for measure in part.findall("measure"):
        attrs = measure.find("attributes")
        if attrs is not None:
            d = attrs.find("divisions")
            if d is not None:
                divisions = int(d.text)
            k = attrs.find("key/fifths")
            if k is not None:
                fifths = int(k.text)
                key_alters = _signature_alters(fifths)
            m = attrs.find("key/mode")
            if m is not None and m.text:
                mode = m.text
            t = attrs.find("time")
            if t is not None:
                beats = int(t.find("beats").text)
                beat_type = int(t.find("beat-type").text)

        quarter_per_unit = unit * 4  # quarters per ABC unit note
        measure_state: dict = {}
        tokens: list[str] = []
        chord_group: list[str] = []
        chord_dur: Optional[Fraction] = None

        def flush_chord():
            nonlocal chord_group, chord_dur, pending_tie
            if not chord_group:
                return
            dur = _dur_to_abc(chord_dur)
            tie = "-" if pending_tie else ""
            if len(chord_group) == 1:
                tokens.append(chord_group[0] + dur + tie)
            else:
                tokens.append("[" + "".join(chord_group) + "]" + dur + tie)
            chord_group = []
            chord_dur = None
            pending_tie = False

        for note in measure.findall("note"):
            if note.find("grace") is not None:
                continue
            voice_el = note.find("voice")
            if voice_el is not None and voice_el.text and voice_el.text.strip() != "1":
                continue
            dur_el = note.find("duration")
            if dur_el is None:
                continue
            dur_q = Fraction(int(dur_el.text), divisions)  # quarters
            units = dur_q / quarter_per_unit
            is_chord = note.find("chord") is not None
            if not is_chord:
                flush_chord()
            if note.find("rest") is not None:
                tokens.append("z" + _dur_to_abc(units))
                continue
            pitch = note.find("pitch")
            if pitch is None:
                continue
            step = pitch.find("step").text
            octv = int(pitch.find("octave").text)
            alter_el = pitch.find("alter")
            alter = int(float(alter_el.text)) if alter_el is not None else 0
            abc_note = _pitch_to_abc(step, alter, octv, key_alters, measure_state)
            chord_group.append(abc_note)
            chord_dur = units
            # tie start?
            for tie in note.findall("tie"):
                if tie.get("type") == "start":
                    pending_tie = True
        flush_chord()

        bar_text = " ".join(tokens)
        barline = "|"
        for bl in measure.findall("barline"):
            rep = bl.find("repeat")
            style = bl.find("bar-style")
            if rep is not None and rep.get("direction") == "backward":
                barline = ":|"
            elif rep is not None and rep.get("direction") == "forward":
                bar_text = "|: " + bar_text if body_bars else bar_text
                continue
            elif style is not None and style.text == "light-heavy":
                barline = "|]"
        body_bars.append(bar_text + " " + barline)

    header = [f"X:{reference}"]
    if title:
        header.append(f"T:{title}")
    header.append(f"M:{beats}/{beat_type}")
    header.append(f"L:{unit.numerator}/{unit.denominator}")
    header.append(f"K:{_key_name(fifths, mode)}")
    return "\n".join(header) + "\n" + "\n".join(body_bars) + "\n"

"""Synth tests: event extraction, rendering sanity, trim, WAV round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.abcnotation.to_midi import abc_to_midi
from ai_music_generation_tpu.codec import midi_io
from ai_music_generation_tpu.synth.render import (
    SAMPLE_RATE,
    midi_to_events,
    render_events,
    synthesize_midi,
    trim_trailing_silence,
)
from ai_music_generation_tpu.synth.wav_io import read_wav, write_wav


def simple_midi(bpm=120.0):
    track = midi_io.TrackInfo(index=1, program=0, channel=0)
    track.notes = [
        midi_io.MidiNote(69, 100, 0, 480, 0, 1),       # A4 quarter
        midi_io.MidiNote(60, 100, 480, 960, 0, 1),     # C4 quarter
    ]
    return midi_io.MidiFile(480, [track], [midi_io.TempoEvent(0, int(60e6 / bpm))], [], [])


def test_midi_to_events_timing():
    ev = midi_to_events(simple_midi())
    assert ev.shape == (2, 4)
    # 120 bpm -> quarter = 0.5 s = 8000 samples
    assert ev[0][1] == 0
    assert ev[0][2] == pytest.approx(8000, rel=1e-3)
    assert ev[1][1] == pytest.approx(8000, rel=1e-3)


def test_midi_to_events_tempo_change():
    m = simple_midi()
    m.tempos = [midi_io.TempoEvent(0, 500000), midi_io.TempoEvent(480, 250000)]
    ev = midi_to_events(m)
    # second note starts at 0.5 s but lasts only 0.25 s (240 bpm)
    assert ev[1][1] == pytest.approx(8000, rel=1e-3)
    assert ev[1][2] == pytest.approx(4000, rel=1e-3)


def test_render_contains_fundamental():
    ev = midi_to_events(simple_midi())
    wave = np.asarray(render_events(jnp.asarray(ev), 2 * SAMPLE_RATE))
    assert wave.shape == (2 * SAMPLE_RATE,)
    assert np.max(np.abs(wave)) == pytest.approx(0.9, abs=0.01)  # normalized
    # spectral peak of the first 0.4 s should be near A4 = 440 Hz
    seg = wave[: int(0.4 * SAMPLE_RATE)] * np.hanning(int(0.4 * SAMPLE_RATE))
    spec = np.abs(np.fft.rfft(seg))
    freqs = np.fft.rfftfreq(len(seg), 1 / SAMPLE_RATE)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 440.0) < 15.0


def test_trim_trailing_silence():
    wave = jnp.concatenate([
        0.5 * jnp.ones(1000), jnp.zeros(10_000)
    ])
    end = int(trim_trailing_silence(wave, pad_samples=100))
    assert 1000 <= end <= 1200


def test_synthesize_abc_end_to_end(tmp_path):
    midi = abc_to_midi("X:1\nL:1/8\nM:4/4\nQ:1/4=120\nK:C\nCDEF GABc |")
    wave = synthesize_midi(midi)
    assert wave.ndim == 1
    assert len(wave) > SAMPLE_RATE  # at least 1 second of audio
    assert np.max(np.abs(wave)) > 0.1
    # WAV round trip
    path = tmp_path / "t.wav"
    write_wav(path, wave)
    back, rate = read_wav(path)
    assert rate == SAMPLE_RATE
    np.testing.assert_allclose(back, np.clip(wave, -1, 1), atol=2e-4)


def test_empty_midi():
    empty = midi_io.MidiFile(480, [], [], [], [])
    assert synthesize_midi(empty).shape == (0,)

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


# ---- sample-bank voice (round-2: the FluidSynth/SF2 parity path) ------------

def test_piano_bank_build_and_determinism():
    from ai_music_generation_tpu.synth.piano_bank import get_bank, bank_pitches

    samples, pitches = get_bank(16_000)
    assert samples.shape[0] == len(bank_pitches())
    assert samples.dtype == np.float32
    # every sample is normalized, non-trivial, and decaying
    assert np.all(np.abs(samples).max(axis=1) > 0.85)
    head = np.abs(samples[:, : 16_000]).mean(axis=1)
    tail = np.abs(samples[:, -16_000:]).mean(axis=1)
    assert np.all(tail < head)  # decay
    # process-level cache: same object, bit-identical content
    samples2, _ = get_bank(16_000)
    assert samples2 is samples


def test_sample_bank_render_contains_fundamental():
    """A 440 Hz note rendered by the sampled voice must put its spectral
    peak region at the fundamental (pitch-shift gather correctness)."""
    from ai_music_generation_tpu.synth.render import render_events

    sr = 16_000
    ev = jnp.asarray([[69.0, 0.0, sr * 1.0, 0.9]], jnp.float32)
    wave = np.asarray(render_events(ev, sr, sr, "sample_bank"))
    assert np.max(np.abs(wave)) > 0.1
    spec = np.abs(np.fft.rfft(wave * np.hanning(len(wave))))
    freqs = np.fft.rfftfreq(len(wave), 1 / sr)
    # strongest bin within 3% of 440 (inharmonicity shifts partials slightly)
    peak_f = freqs[int(np.argmax(spec))]
    assert abs(peak_f - 440.0) / 440.0 < 0.03, peak_f


def test_sample_bank_note_off_damps():
    from ai_music_generation_tpu.synth.render import render_events

    sr = 16_000
    # short note: 0.2 s; by 0.8 s the damped tail must be far below peak
    ev = jnp.asarray([[60.0, 0.0, sr * 0.2, 0.9]], jnp.float32)
    wave = np.asarray(render_events(ev, sr * 2, sr, "sample_bank"))
    peak = np.abs(wave[: int(0.3 * sr)]).max()
    late = np.abs(wave[int(0.8 * sr):]).max()
    assert late < 0.05 * peak


def test_voice_selection_end_to_end(tmp_path):
    """Both voices flow through synthesize_midi; outputs differ (timbres)."""
    from ai_music_generation_tpu.abcnotation.to_midi import abc_to_midi
    from ai_music_generation_tpu.synth.render import synthesize_midi

    midi = abc_to_midi("X:1\nL:1/8\nM:4/4\nQ:1/4=160\nK:C\nCEGc e2c2|\n")
    w_add = synthesize_midi(midi, voice="additive")
    w_smp = synthesize_midi(midi, voice="sample_bank")
    assert len(w_add) > 0 and len(w_smp) > 0
    n = min(len(w_add), len(w_smp))
    assert not np.allclose(w_add[:n], w_smp[:n])

"""On-TPU audio synthesis: MIDI note events -> PCM waveform.

Replaces the FluidSynth/Timidity external renderers
(ref: scripts/common/midi_to_wav_and_aesthetics.py:100-110) with a JAX
additive-wavetable synthesizer that runs the whole render as ONE jit
program on device:

- note events become a fixed-shape tensor [N, 4] (pitch, start_sample,
  dur_samples, velocity);
- each note renders a bounded-length enveloped harmonic stack (piano-like
  voice: 1/h^1.7 harmonic rolloff + slight inharmonicity + pitch-dependent
  decay, attack ramp) into a scratch segment;
- a ``lax.scan`` accumulates segments into the output buffer via
  dynamic-slice adds — O(N * MAX_NOTE) work, no [N, T] materialization;
- the result is peak-normalized and end-silence trimmed on device
  (the sox silence-trim replacement, ref: midi_to_wav_and_aesthetics.py:113-132).

Default sample rate 16 kHz matches the reference eval protocol
(ref: abc_to_midi_wav_and_aesthetics.py:33).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.codec import midi_io

SAMPLE_RATE = 16_000
MAX_NOTE_SECONDS = 4.0
N_HARMONICS = 12


def midi_to_events(midi: midi_io.MidiFile, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """MidiFile -> float32 [N, 4]: (midi_pitch, start_sample, dur_samples, velocity01).

    Tempo map applied (piecewise-constant tempo; ref corpora use one tempo).
    """
    tpq = midi.ticks_per_quarter
    tempos = midi.tempos or [midi_io.TempoEvent(0, 500000)]
    # piecewise tick -> seconds conversion
    marks = []  # (tick, seconds_at_tick, sec_per_tick)
    t_sec = 0.0
    prev_tick = 0
    prev_spt = tempos[0].microseconds_per_quarter / 1e6 / tpq
    marks.append((0, 0.0, prev_spt))
    for ev in tempos[1:]:
        t_sec += (ev.tick - prev_tick) * prev_spt
        prev_tick = ev.tick
        prev_spt = ev.microseconds_per_quarter / 1e6 / tpq
        marks.append((ev.tick, t_sec, prev_spt))

    def tick_to_sec(tick: int) -> float:
        for mtick, msec, spt in reversed(marks):
            if tick >= mtick:
                return msec + (tick - mtick) * spt
        return tick * marks[0][2]

    events = []
    for n in midi.notes:
        start = tick_to_sec(n.start_tick)
        end = tick_to_sec(n.end_tick)
        events.append(
            (float(n.pitch), start * sample_rate, max((end - start), 0.01) * sample_rate,
             (n.velocity or 64) / 127.0)
        )
    if not events:
        return np.zeros((0, 4), np.float32)
    return np.asarray(events, np.float32)


def _voice_bank(voice: str, sample_rate: int):
    """Resolve a sample-bank voice string to render tensors.

    ``"sample_bank"`` -> the embedded piano bank (synth/piano_bank.py) with
    full key/velocity ranges and the measured 80 ms piano release;
    ``"sf2:<path>"`` -> zones parsed from a SoundFont file (synth/sf2.py),
    honoring key/velocity ranges, tuning, loops, envelopes — the TPU
    equivalent of FluidSynth loading the reference's .sf2
    (ref: midi_to_wav_and_aesthetics.py:105-110).

    Returns (samples [K, Lb], root_pitch [K], key_ranges [K, 2],
    vel_ranges [K, 2], release_tau [K], tail_cut [K]).
    """
    if voice.startswith("sf2:"):
        from ai_music_generation_tpu.synth.sf2 import bank_from_sf2

        samples, pitches, keyr, velr, rel = bank_from_sf2(voice[4:], sample_rate)
        return (samples, pitches, keyr, velr, rel,
                np.minimum(4.0 * rel, 1.5).astype(np.float32))
    from ai_music_generation_tpu.synth.piano_bank import get_bank

    bank_np, pitches_np = get_bank(sample_rate)
    k = len(pitches_np)
    full = np.tile(np.asarray([[0.0, 127.0]], np.float32), (k, 1))
    return (bank_np, pitches_np, full, full.copy(),
            np.full((k,), 0.08, np.float32),
            np.full((k,), 0.35, np.float32))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def render_events(events: jax.Array, total_samples: int,
                  sample_rate: int = SAMPLE_RATE,
                  voice: str = "sample_bank") -> jax.Array:
    """Render [N, 4] note events into a [total_samples] float32 waveform.

    ``voice``: ``"sample_bank"`` (default; pitch-shifted gather from the
    embedded multi-sample piano bank, see synth/piano_bank.py),
    ``"sf2:<path>"`` (zones from a SoundFont file, see synth/sf2.py), or
    ``"additive"`` (the round-1 harmonic-stack voice). The default was
    chosen by a measured A/B through the metrics pipeline (docs/PERF.md).
    """
    max_note = int(MAX_NOTE_SECONDS * sample_rate)
    t = jnp.arange(max_note, dtype=jnp.float32) / sample_rate  # [L]

    if voice != "additive":
        (bank_np, bank_pitches_np, keyr_np, velr_np, rel_np, cut_np
         ) = _voice_bank(voice, sample_rate)
        bank = jnp.asarray(bank_np)  # [K, Lb] — an XLA constant
        bank_pitch = jnp.asarray(bank_pitches_np)
        key_ranges = jnp.asarray(keyr_np)
        vel_ranges = jnp.asarray(velr_np)
        release_tau = jnp.asarray(rel_np)
        tail_cut = jnp.asarray(cut_np)
        bank_len = bank_np.shape[1]

        def render_note(ev):
            pitch, start, dur_samples, vel = ev[0], ev[1], ev[2], ev[3]
            dur = dur_samples / sample_rate
            # zone selection: nearest root among zones whose key AND
            # velocity ranges match; out-of-range zones only as fallback
            vel127 = vel * 127.0
            key_miss = (pitch < key_ranges[:, 0]) | (pitch > key_ranges[:, 1])
            vel_miss = (vel127 < vel_ranges[:, 0]) | (vel127 > vel_ranges[:, 1])
            score = (jnp.abs(bank_pitch - pitch)
                     + 1e3 * key_miss + 1e3 * vel_miss)
            k = jnp.argmin(score)
            rate = 2.0 ** ((pitch - bank_pitch[k]) / 12.0)
            row = jnp.take(bank, k, axis=0)  # [Lb]
            pos = jnp.arange(max_note, dtype=jnp.float32) * rate
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - i0
            valid = i0 < bank_len - 1
            i0 = jnp.clip(i0, 0, bank_len - 2)
            seg = row[i0] * (1.0 - frac) + row[i0 + 1] * frac
            # damp at note-off with the zone's release time-constant
            tau = release_tau[k]
            release = jnp.exp(-jnp.maximum(t - dur, 0.0) / tau)
            seg = seg * valid * release * (t < dur + tail_cut[k])
            return (vel * seg).astype(jnp.float32)

    else:

        def render_note(ev):
            pitch, start, dur_samples, vel = ev[0], ev[1], ev[2], ev[3]
            dur = dur_samples / sample_rate
            freq = 440.0 * 2.0 ** ((pitch - 69.0) / 12.0)
            # piano-ish envelope: 5 ms attack, exponential decay scaled by
            # pitch, release after note-off
            attack = jnp.minimum(t / 0.005, 1.0)
            decay_rate = 0.5 + freq / 2000.0  # higher notes decay faster
            decay = jnp.exp(-decay_rate * t)
            release = jnp.exp(-jnp.maximum(t - dur, 0.0) / 0.05)
            env = attack * decay * release
            env = env * (t < dur + 0.25)  # hard stop after release tail
            h = jnp.arange(1, N_HARMONICS + 1, dtype=jnp.float32)  # [H]
            inharm = 1.0 + 0.0004 * h * h  # slight stiffness inharmonicity
            f_h = freq * h * inharm  # [H]
            amp = h ** -1.7 * (f_h < sample_rate / 2)  # Nyquist guard
            phases = 2.0 * jnp.pi * f_h[None, :] * t[:, None]  # [L, H]
            wave = jnp.sin(phases) @ amp  # [L]
            return (vel * env * wave).astype(jnp.float32)

    def body(buf, ev):
        seg = render_note(ev)
        start = jnp.asarray(ev[1], jnp.int32)
        start = jnp.clip(start, 0, total_samples - 1)
        # accumulate: read-modify-write the note window
        window = jax.lax.dynamic_slice(buf, (start,), (max_note,))
        buf = jax.lax.dynamic_update_slice(buf, window + seg, (start,))
        return buf, None

    # pad the buffer so a note near the end can't overrun
    buf = jnp.zeros(total_samples + max_note, jnp.float32)
    buf, _ = jax.lax.scan(body, buf, events)
    out = buf[:total_samples]
    peak = jnp.maximum(jnp.max(jnp.abs(out)), 1e-6)
    return out * (0.9 / peak)


def trim_trailing_silence(wave: jax.Array, threshold: float = 1e-3,
                          pad_samples: int = 1600):
    """Index one past the last above-threshold sample (+pad). Host slices.

    sox end-silence-trim equivalent (ref: midi_to_wav_and_aesthetics.py:113-132).
    """
    above = jnp.abs(wave) > threshold
    idx = jnp.max(jnp.where(above, jnp.arange(wave.shape[0]), -1))
    return jnp.minimum(idx + 1 + pad_samples, wave.shape[0])


EVENT_PAD = 512  # canonical note-count pad: one compile covers the corpus
CANONICAL_SECONDS = 128  # canonical render length: ONE compile per process


def _event_bucket(n: int) -> int:
    """Canonical note-count bucket (EVENT_PAD, then powers of 2 beyond)."""
    bucket = EVENT_PAD
    while bucket < n:
        bucket *= 2
    return bucket


def _pad_events(events: np.ndarray) -> np.ndarray:
    """Pad the note dimension to the canonical bucket (powers of 2 beyond it)
    with silent (velocity 0) events, so the jitted render compiles ONCE for a
    whole corpus — distinct shapes cost ~60 s of XLA compile each."""
    n = len(events)
    bucket = _event_bucket(n)
    if bucket == n:
        return events
    pad = np.zeros((bucket - n, 4), np.float32)
    return np.concatenate([events, pad], axis=0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def render_events_batch(events: jax.Array, total_samples: int,
                        sample_rate: int = SAMPLE_RATE,
                        voice: str = "sample_bank") -> jax.Array:
    """Render a BATCH of padded event tensors [N, E, 4] -> [N, total_samples].

    vmap of :func:`render_events`: all tunes' note-scans run as one batched
    program, amortizing per-call dispatch for directory-scale rendering."""
    return jax.vmap(
        lambda ev: render_events(ev, total_samples, sample_rate, voice)
    )(events)


def synthesize_midi_batch(
    midis: list, sample_rate: int = SAMPLE_RATE,
    max_seconds: float = 120.0, trim: bool = True,
    voice: str = "sample_bank", mesh=None,
) -> list:
    """Render many MidiFiles in one device call (canonical shapes).

    ``mesh``: optional ``jax.sharding.Mesh`` — the tune batch is padded to
    the data-axis size and sharded across it, so the per-tune note scans
    run SPMD over all devices (the v5e-8 scaling story for the ≥100
    tunes/min target, BASELINE.md; single-process replacement for the
    reference's per-file CPU pool, ref: abc_to_midi_wav_and_aesthetics
    .py:119-132). Waveform results and trimming are identical to the
    unsharded path.

    Returns a list of trimmed float32 waveforms, order-matched to ``midis``.
    """
    all_events = [midi_to_events(m, sample_rate) for m in midis]
    n_pad = max((_event_bucket(len(e)) for e in all_events if len(e)), default=EVENT_PAD)
    total = int(min(CANONICAL_SECONDS, max_seconds) * sample_rate)
    n_rows = len(midis)
    if mesh is not None:
        from ai_music_generation_tpu.parallel import mesh as pmesh

        n_data = mesh.shape[pmesh.DATA_AXIS]
        n_rows = -(-len(midis) // n_data) * n_data  # pad to data-axis size
    batch = np.zeros((n_rows, n_pad, 4), np.float32)
    needs = []
    for i, ev in enumerate(all_events):
        needs.append(
            min(float((ev[:, 1] + ev[:, 2]).max()) / sample_rate + 1.0, max_seconds)
            if len(ev) else 0.0
        )
        if len(ev):
            batch[i, : len(ev)] = ev
    dev_batch = jnp.asarray(batch)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ai_music_generation_tpu.parallel import mesh as pmesh

        dev_batch = jax.device_put(
            dev_batch, NamedSharding(mesh, P(pmesh.DATA_AXIS, None, None)))
    waves = np.asarray(jax.device_get(
        render_events_batch(dev_batch, total, sample_rate, voice)
    ))[: len(midis)]
    out = []
    for i, wave in enumerate(waves):
        if needs[i] == 0.0:
            out.append(np.zeros(0, np.float32))
            continue
        end = len(wave)
        if trim:
            above = np.abs(wave) > 1e-3
            idx = int(np.max(np.where(above)[0])) if above.any() else 0
            end = min(idx + 1 + 1600, len(wave))
        out.append(wave[: min(end, int(needs[i] * sample_rate))])
    return out


def synthesize_midi(midi: midi_io.MidiFile, sample_rate: int = SAMPLE_RATE,
                    max_seconds: float = 120.0, trim: bool = True,
                    voice: str = "sample_bank") -> np.ndarray:
    """Host convenience: MidiFile -> trimmed float32 waveform (numpy).

    Shapes are bucketed (notes: powers of 2; length: 16 s buckets) so a
    directory of tunes shares a handful of XLA compilations instead of one
    per tune.
    """
    events = midi_to_events(midi, sample_rate)
    if len(events) == 0:
        return np.zeros(0, np.float32)
    need = float((events[:, 1] + events[:, 2]).max()) / sample_rate + 1.0
    need = min(need, max_seconds)
    # canonical length, doubling only for unusually long pieces
    seconds = CANONICAL_SECONDS
    while seconds < need:
        seconds *= 2
    total = int(min(seconds, max_seconds) * sample_rate)
    wave = render_events(jnp.asarray(_pad_events(events)), total, sample_rate, voice)
    if trim:
        end = int(jax.device_get(trim_trailing_silence(wave)))
        wave = wave[:min(end, int(need * sample_rate))]
    return np.asarray(jax.device_get(wave))

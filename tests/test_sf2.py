"""SF2 soundfont ingestion: writer->parser round trip, bank building,
zone selection in the render voice, and pipeline plumbing.

The reference's timbre is FluidSynth + an .sf2 file
(ref: scripts/common/midi_to_wav_and_aesthetics.py:105-110); here the zones
become sample-bank tensors rendered by the jitted TPU synth. Fixtures are
synthesized by synth/sf2.write_sf2 — no licensed soundfont ships in-repo.
"""

import numpy as np
import pytest

from ai_music_generation_tpu.synth.sf2 import (
    bank_from_sf2,
    parse_sf2,
    write_sf2,
)


def _sine(freq, seconds=0.3, rate=16000, amp=0.8):
    t = np.arange(int(seconds * rate)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture()
def fixture_sf2(tmp_path):
    path = str(tmp_path / "tiny.sf2")
    lo = _sine(220.0)  # A3, root 57
    hi = _sine(880.0)  # A5, root 81
    write_sf2(path, [
        dict(wave=lo, root=57, key_range=(0, 63), loop=(800, 4000),
             release_tc=-3600, fine_tune=0),
        dict(wave=hi, root=81, key_range=(64, 127), vel_range=(0, 127),
             attack_tc=-7200, sustain_cb=200, atten_cb=60),
    ], preset_name="TestPiano")
    return path


def test_parse_round_trip(fixture_sf2):
    sf = parse_sf2(fixture_sf2)
    assert len(sf.presets) == 1
    p = sf.presets[0]
    assert p.name == "TestPiano" and (p.bank, p.program) == (0, 0)
    assert len(p.zones) == 2
    z0, z1 = p.zones
    assert (z0.key_lo, z0.key_hi) == (0, 63)
    assert (z1.key_lo, z1.key_hi) == (64, 127)
    assert z0.sample.original_pitch == 57
    assert z0.loop and not z1.loop
    assert z0.sample.start_loop - z0.sample.start == 800
    assert z1.sustain_cb == 200 and z1.atten_cb == 60
    # PCM round trip: first zone's samples match the sine to 16-bit lsb
    got = sf.sample_data[z0.sample.start:z0.sample.end]
    np.testing.assert_allclose(got, _sine(220.0), atol=6e-5)


def test_bank_from_sf2_zones_and_loop(fixture_sf2):
    samples, pitches, keyr, velr, rel = bank_from_sf2(
        fixture_sf2, sample_rate=16000, seconds=1.0)
    assert samples.shape == (2, 16000)
    np.testing.assert_allclose(pitches, [57.0, 81.0])
    np.testing.assert_array_equal(keyr, [[0, 63], [64, 127]])
    # looped zone keeps ringing past its 0.3 s source; the unlooped one ends
    assert np.abs(samples[0][12000:]).max() > 0.1
    assert np.abs(samples[1][8000:]).max() == 0.0
    # release generator surfaced as a playback param (2^(-3600/1200)=0.125 s)
    np.testing.assert_allclose(rel[0], 0.125, rtol=1e-6)
    # attenuation: 60 cB = 6 dB ≈ 0.501x
    peak_hi = np.abs(samples[1][:2000]).max()
    assert 0.3 < peak_hi < 0.45  # 0.8 * 0.501 with envelope


def test_render_selects_zone_by_key_range(fixture_sf2, tmp_path):
    """A note in the high key range must render from the 880 Hz zone even
    though pitch-distance alone would pick the other root for pitch 69."""
    import jax.numpy as jnp

    from ai_music_generation_tpu.synth.render import render_events

    # pitch 69 (A4): |69-57|=12 > |69-81|=12 — tie broken by key range
    # (69 is in zone1's range only after key 64); use pitch 66 for a
    # strict case: |66-57|=9 < |66-81|=15, but 66 > 63 so zone1 must win.
    events = jnp.asarray([[66.0, 0.0, 8000.0, 0.5]], jnp.float32)
    wave = np.asarray(render_events(
        events, 16000, 16000, f"sf2:{fixture_sf2}"))
    # zone1 root 81 at 880 Hz shifted to pitch 66 -> 880*2^((66-81)/12) ≈ 370 Hz
    spec = np.abs(np.fft.rfft(wave[:8000]))
    peak_hz = np.argmax(spec) * 16000 / 8000
    assert abs(peak_hz - 370) < 15, peak_hz


def test_velocity_layer_selection(tmp_path):
    path = str(tmp_path / "vel.sf2")
    write_sf2(path, [
        dict(wave=_sine(440.0), root=69, vel_range=(0, 63)),
        dict(wave=_sine(660.0), root=69, vel_range=(64, 127)),
    ])
    import jax.numpy as jnp

    from ai_music_generation_tpu.synth.render import render_events

    for vel, expect_hz in ((0.3, 440.0), (0.9, 660.0)):
        events = jnp.asarray([[69.0, 0.0, 8000.0, vel]], jnp.float32)
        wave = np.asarray(render_events(events, 16000, 16000, f"sf2:{path}"))
        spec = np.abs(np.fft.rfft(wave[:8000]))
        peak_hz = np.argmax(spec) * 16000 / 8000
        assert abs(peak_hz - expect_hz) < 10, (vel, peak_hz)


def test_pipeline_accepts_sf2_path(fixture_sf2, tmp_path):
    """eval pipeline renders via sound_font=<path>.sf2 (ref :105-110)."""
    from ai_music_generation_tpu.eval.pipeline import (
        EvalPipeline,
        PipelineConfig,
    )

    abc_dir = tmp_path / "abc"
    abc_dir.mkdir()
    (abc_dir / "t1.abc").write_text(
        "X:1\nL:1/8\nM:4/4\nK:C\nCDEF GABc|\n")
    cfg = PipelineConfig(
        abc_input_folder=str(abc_dir),
        base_output_dir=str(tmp_path / "out"),
        sound_font=fixture_sf2,
        render_wav=True,
        metrics_processes=1,
    )
    result = EvalPipeline(cfg).run()
    wavs = list((tmp_path / "out").rglob("*.wav"))
    assert wavs, result
    from ai_music_generation_tpu.synth.wav_io import read_wav

    wave, rate = read_wav(str(wavs[0]))
    assert len(wave) > 1000 and np.abs(wave).max() > 0.05


def test_address_offset_generators(tmp_path):
    """Sample-address offset generators (SF2 spec gens 0-3) shift the
    zone's sample/loop window: a loop window expressed via start/endloop
    offsets must produce the same bank row as the same window stored in
    the sample header."""
    path_a = str(tmp_path / "a.sf2")
    path_b = str(tmp_path / "b.sf2")
    w = _sine(440.0, seconds=0.2)
    write_sf2(path_a, [dict(wave=w, root=69, loop=(1600, 2400))])
    write_sf2(path_b, [dict(wave=w, root=69, loop=(800, 1600),
                            startloop_ofs=800, endloop_ofs=800)])
    za = parse_sf2(path_a).presets[0].zones[0]
    zb = parse_sf2(path_b).presets[0].zones[0]
    assert (zb.startloop_ofs, zb.endloop_ofs) == (800, 800)
    assert (za.sample.start_loop - za.sample.start
            == zb.sample.start_loop - zb.sample.start + zb.startloop_ofs)
    rows_a = bank_from_sf2(path_a, seconds=1.0)[0]
    rows_b = bank_from_sf2(path_b, seconds=1.0)[0]
    np.testing.assert_allclose(rows_a, rows_b, atol=1e-7)

    # out-of-range offsets disable the loop instead of wrapping
    path_c = str(tmp_path / "c.sf2")
    write_sf2(path_c, [dict(wave=w, root=69, loop=(800, 1600),
                            startloop_ofs=-5000)])
    rows_c = bank_from_sf2(path_c, seconds=1.0)[0]
    n = len(w)
    assert np.allclose(rows_c[0][int(n * 1.2):], 0.0)  # no loop extension


def test_end_offset_past_sample_data_disables_loop(tmp_path):
    """An end-address offset pointing past the real smpl data must not pass
    loop validation (numpy slicing would silently truncate the loop body and
    tile guard-zero garbage): the effective end clamps to the data length,
    the loop window fails the bounds check, and the zone renders unlooped."""
    path = str(tmp_path / "d.sf2")
    w = _sine(440.0, seconds=0.2)
    n = len(w)
    write_sf2(path, [dict(wave=w, root=69, loop=(n - 400, n - 100),
                          end_ofs=600, endloop_ofs=600)])
    rows = bank_from_sf2(path, seconds=1.0)[0]
    assert np.allclose(rows[0][int(n * 1.5):], 0.0)  # no loop extension

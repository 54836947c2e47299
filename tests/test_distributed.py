"""Multi-process jax.distributed coverage.

The reference's real multi-device mode is multi-process DDP via torchrun
(ref: nanoGPT/train.py:86-99). These tests actually RUN 2 OS processes with
`jax.distributed.initialize` over gloo CPU collectives, build the global mesh
through parallel/mesh.py, execute one sharded GPT train step + an explicit
psum, and assert loss parity with a single-process run of the identical
program — connecting "exists" and "works" for parallel/distributed.py.
"""

import numpy as np
import pytest

from ai_music_generation_tpu.parallel.worker_smoke import (
    PSUM_EXPECTED,
    launch_multiprocess_smoke,
    run_smoke,
)


@pytest.mark.nightly
@pytest.mark.slow
def test_two_process_train_step_matches_single_process(tmp_path):
    reports = launch_multiprocess_smoke(
        num_processes=2, local_devices=4, out_dir=str(tmp_path))

    assert len(reports) == 2
    for r in reports:
        assert r["process_count"] == 2
        assert r["local_devices"] == 4
        assert r["global_devices"] == 8
        assert r["n_devices"] == 8
        assert r["step"] == 1
        # the cross-process all-reduce actually reduced across processes
        assert r["psum"] == PSUM_EXPECTED
    assert {r["process_index"] for r in reports} == {0, 1}

    # Both processes observe the same global loss (it's a replicated scalar
    # produced by ONE global program — ref's DDP averages to the same value
    # on every rank, nanoGPT/train.py:335-348).
    assert reports[0]["loss"] == reports[1]["loss"]
    assert reports[0]["grad_norm"] == reports[1]["grad_norm"]

    # Single-process run of the identical program (pytest's own 8-device
    # virtual CPU mesh) must agree: launch topology is not allowed to change
    # the math, only who owns which shard.
    single = run_smoke()
    assert single["n_devices"] == 8
    np.testing.assert_allclose(single["loss"], reports[0]["loss"], rtol=1e-5)
    np.testing.assert_allclose(
        single["grad_norm"], reports[0]["grad_norm"], rtol=1e-4)

    # is_main_process gated exactly one writer, and it was process 0
    # (ref's master_process flag, nanoGPT/train.py:90-95).
    assert reports[0]["main_flags"] == ["main_flag_0"]

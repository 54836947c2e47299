"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding (unlike the reference's NCCL path, ref:
nanoGPT/train.py:86-99) is testable on CPU via XLA's host-platform
device-count override — see SURVEY.md §4.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend at interpreter startup;
# the env var alone is not enough — force the platform via jax.config too.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_collection_modifyitems(items):
    """nightly implies slow: the iteration tier (`-m "not slow"`) must not
    pick up nightly-only heavyweights that lack an explicit slow marker
    (VERDICT r4 #6 re-tiering moved several compile-heavy tests to nightly
    without duplicating markers at every site)."""
    for item in items:
        if "nightly" in item.keywords and "slow" not in item.keywords:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def mesh8():
    from ai_music_generation_tpu.parallel.mesh import make_mesh

    return make_mesh(n_data=4, n_model=2)

"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # function-scoped so every test sees the same deterministic stream
    # regardless of execution order
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def synthetic_ring(tmp_path_factory):
    """A small synthetic ring dataset rendered once per session."""
    from sfm_tpu.utils.synthetic import SyntheticRingSpec, generate_dataset
    from sfm_tpu.utils.dataset import TempleRing

    out = tmp_path_factory.mktemp("synth_ring")
    spec = SyntheticRingSpec(n_frames=12, width=480, height=360, fx=1100.0, fy=1100.0,
                             arc_deg=140.0)
    generate_dataset(out, spec)
    return TempleRing.from_dir(out)

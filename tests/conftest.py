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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Long single-process sessions accumulate hundreds of compiled XLA
    CPU executables; past ~45 min the CPU compiler has been observed to
    abort (SIGABRT inside backend_compile_and_load) on programs that
    compile fine in a fresh process. Dropping the executable caches
    between modules keeps the session young at a small recompile cost."""
    yield
    import jax

    jax.clear_caches()


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
    # the bench/TempleRing regime (~20px median flow, sharp texture):
    # inside the designed envelope the pipeline is RNG-robust (ATE
    # identical to 4 decimals across seeds). The previous 480x360/140°
    # spec sat outside it (24px flow on soft texture -> ~60% track loss
    # per frame, ~70 survivors by frame 2, bimodal E estimates) and made
    # accuracy tests seed-lottery tickets.
    spec = SyntheticRingSpec(n_frames=12, width=640, height=480,
                             fx=1520.0, fy=1520.0, arc_deg=85.0,
                             texture_blur=1.5)
    generate_dataset(out, spec)
    return TempleRing.from_dir(out)

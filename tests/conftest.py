"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware.

Env-var forcing alone is NOT sufficient in this container: sitecustomize
preloads the axon TPU plugin at *interpreter start* based on
PALLAS_AXON_POOL_IPS, so by conftest time jax is already imported with
platforms=axon and ``os.environ['JAX_PLATFORMS']='cpu'`` is ignored — a
pytest invocation from an unscrubbed shell silently lands whole test
modules on the TPU backend (observed: vmem OOMs in tests that pass on
CPU). ``jax.config.update('jax_platforms', 'cpu')`` IS authoritative even
after the plugin preload (backend init is lazy), so we force it here and
hard-fail the session if the backend still isn't CPU."""

import os

# keep env coherent for any subprocesses tests spawn, and make the
# virtual 8-device mesh available (XLA_FLAGS is read at lazy backend init)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    f"tests must run on CPU, got backend={jax.default_backend()!r}; "
    "the axon plugin preload could not be overridden — run with "
    "PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest ..."
)
assert len(jax.devices()) >= 8, (
    "virtual 8-device CPU mesh unavailable (XLA_FLAGS was applied too "
    "late — a jax computation ran before conftest import?)"
)

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

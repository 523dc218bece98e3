"""Numeric-failure detection wiring (SURVEY §5 sanitizer analogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.utils import debug


pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


@pytest.fixture
def checks():
    """Enable checks for the test, always restore global state after."""
    debug.enable_numeric_checks(True)
    try:
        yield
    finally:
        debug.enable_numeric_checks(False)


def test_nan_in_jit_raises(checks):
    @jax.jit
    def bad(x):
        return jnp.log(x - 2.0)  # log of a negative → NaN

    with pytest.raises(FloatingPointError):
        np.asarray(bad(jnp.asarray(1.0)))


def test_inf_in_jit_raises(checks):
    @jax.jit
    def bad(x):
        return 1.0 / x

    with pytest.raises(FloatingPointError):
        np.asarray(bad(jnp.asarray(0.0)))


def test_clean_pipeline_stage_passes(checks):
    # a representative masked-state computation must not false-positive
    from sfm_tpu.ops import lie

    w = jnp.asarray([0.1, -0.2, 0.3])
    R = lie.so3_exp(w)
    np.testing.assert_allclose(np.asarray(lie.so3_log(R)), np.asarray(w),
                               atol=1e-6)


def test_nan_ok_suspends(checks):
    with debug.nan_ok():
        x = jnp.asarray([1.0, jnp.nan, 3.0])
        med = jnp.nanmedian(x)  # deliberate sentinel use
        assert float(med) == 2.0
    # checks are restored afterwards
    assert debug.numeric_checks_enabled()
    assert jax.config.jax_debug_nans


def test_disabled_is_noop():
    assert not debug.numeric_checks_enabled()

    @jax.jit
    def bad(x):
        return jnp.log(x - 2.0)

    assert np.isnan(np.asarray(bad(jnp.asarray(1.0))))

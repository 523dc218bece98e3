"""Numeric-failure detection (SURVEY §5 "sanitizers" analogue).

The reference's C++ side would reach for ASan/UBSan (we build those for
the native eval tools: ``make tools-asan``). The JAX compute path has no
memory-unsafety to sanitize — its failure mode is *numeric*: a NaN/Inf
born inside a jitted stage silently propagates through masked-state
arithmetic until it surfaces as a garbage pose many frames later.

``enable_numeric_checks()`` turns on JAX's equivalent of a sanitizer:
``jax_debug_nans`` + ``jax_debug_infs`` re-run any jitted computation
that produced a NaN/Inf in op-by-op mode and raise with the exact
primitive that generated it.  This de-optimizes (disables donation and
forces sync), so it is opt-in:

  * env var:   ``SFM_TPU_DEBUG_NANS=1 python -m sfm_tpu.cli ...``
  * CLI flag:  ``python -m sfm_tpu.cli --debug-nans ...``
  * API:       ``sfm_tpu.utils.debug.enable_numeric_checks()``

NOTE: parts of the pipeline use NaN *deliberately* as a masked-lane
sentinel (e.g. ``jnp.nanmedian`` over invalid tracks in the loop-closure
scale estimate). Those sites route through :func:`nan_ok`, which locally
suspends the check, so enabling it stays false-positive-free.
"""

from __future__ import annotations

import contextlib
import os

import jax

_ENABLED = False


def enable_numeric_checks(enabled: bool = True) -> None:
    """Globally enable (or disable) NaN/Inf detection in jitted code."""
    global _ENABLED
    _ENABLED = enabled
    jax.config.update("jax_debug_nans", enabled)
    jax.config.update("jax_debug_infs", enabled)


def numeric_checks_enabled() -> bool:
    return _ENABLED


@contextlib.contextmanager
def nan_ok():
    """Context manager for code that uses NaN as a masked-lane sentinel:
    temporarily suspends the global checks (no-op when they are off)."""
    if not _ENABLED:
        yield
        return
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", True)
        jax.config.update("jax_debug_infs", True)


if os.environ.get("SFM_TPU_DEBUG_NANS", "") == "1":
    enable_numeric_checks(True)

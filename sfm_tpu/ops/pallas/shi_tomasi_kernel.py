"""Fused Shi-Tomasi corner-response Pallas kernel.

The XLA path (ops/features.shi_tomasi_score) materializes ~8 HBM
temporaries (two gradients, three structure-tensor products, their box
sums, the response). This kernel keeps the whole image in VMEM and fuses
gradient computation, the separable box sums (unrolled `pltpu.roll`
shift-adds — the window radius is a small static constant), and the
min-eigenvalue response into one pass: one HBM read of the image, one
HBM write of the score map.

ref: the per-pixel scalar loops this replaces are
cpp/src/templering_sfm.cpp:237-302 (shi_tomasi).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roll(x, shift: int, axis: int, interpret: bool):
    if interpret or shift == 0:
        return jnp.roll(x, shift, axis=axis)
    # hardware pltpu.roll requires a non-negative shift; a circular roll
    # by -k is a roll by (N - k)
    if shift < 0:
        shift = x.shape[axis] + shift
    # tpu.dynamic_rotate needs an i32 shift operand; a bare Python int
    # becomes i64 under the package-wide x64 mode and fails verification
    return pltpu.roll(x, jnp.int32(shift), axis=axis)


def _box_sum(x, radius: int, interpret: bool):
    """(2r+1)^2 box sum via separable unrolled circular shifts. The
    circular wrap contaminates only a ``radius``-wide border, which the
    detector's border gate discards anyway."""
    row = x
    for d in range(1, radius + 1):
        row = row + _roll(x, d, 1, interpret) + _roll(x, -d, 1, interpret)
    out = row
    for d in range(1, radius + 1):
        out = out + _roll(row, d, 0, interpret) + _roll(row, -d, 0, interpret)
    return out


def _shi_tomasi_kernel(img_ref, out_ref, *, block_radius: int,
                       interpret: bool):
    img = img_ref[:]
    # central-difference gradients (zero at borders via roll + mask later;
    # the border is excluded by the detector's border gate)
    gx = 0.5 * (_roll(img, -1, 1, interpret) - _roll(img, 1, 1, interpret))
    gy = 0.5 * (_roll(img, -1, 0, interpret) - _roll(img, 1, 0, interpret))
    a = _box_sum(gx * gx, block_radius, interpret)
    b = _box_sum(gx * gy, block_radius, interpret)
    c = _box_sum(gy * gy, block_radius, interpret)
    tr = a + c
    det = a * c - b * b
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    out_ref[:] = 0.5 * (tr - disc)


@functools.partial(jax.jit, static_argnames=("block_radius", "interpret"))
def shi_tomasi_score_pallas(img, block_radius: int = 2,
                            interpret: bool = False):
    """Fused corner-response map; drop-in for
    ops/features.shi_tomasi_score up to border handling (the XLA version
    zeroes gradients at borders; this one wraps — both are masked out by
    the detector's border gate)."""
    kernel = functools.partial(
        _shi_tomasi_kernel, block_radius=block_radius, interpret=interpret
    )
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
        interpret=interpret,
    )(img)

"""Batched DLT triangulation in the world frame.

TPU-native replacement for the reference's per-track DLT
(reference: cpp/src/templering_sfm.cpp:1477-1516 ``triangulate_dlt``:
4x4 design rows ``x·P3−P1`` from world→cam extrinsics in K-normalized
coords, solved via the smallest eigenvector of AᵀA; python py:922-933
via cv2.triangulatePoints + two-view cheirality). Here N points (each
with its own pair of cameras) solve as one batched (N,4,4) SVD.
"""

from __future__ import annotations

import jax.numpy as jnp

from sfm_tpu.ops import linalg


def _rows(R, t, x):
    """DLT rows for world→cam (R,t) and normalized obs x.

    R (...,3,3), t (...,3), x (...,2) -> (...,2,4)."""
    P = jnp.concatenate([R, t[..., None]], axis=-1)  # (...,3,4)
    r1 = x[..., 0:1] * P[..., 2, :] - P[..., 0, :]
    r2 = x[..., 1:2] * P[..., 2, :] - P[..., 1, :]
    return jnp.stack([r1, r2], axis=-2)


def triangulate_dlt(R_a, t_a, x_a, R_b, t_b, x_b):
    """Triangulate world points from two observations each.

    Args: per-point world→camera extrinsics (N,3,3)/(N,3) and K-normalized
    observations (N,2) in cameras a and b.
    Returns (X_world (N,3), z_a (N,), z_b (N,)) — depths for cheirality
    gating (ref: py:928-933 requires z>0 in both views).
    """
    A = jnp.concatenate([_rows(R_a, t_a, x_a), _rows(R_b, t_b, x_b)], axis=-2)
    Xh = linalg.nullvec_lstsq(A)  # (N,4)
    w = Xh[..., 3]
    X = Xh[..., :3] / jnp.where(jnp.abs(w) < 1e-18, 1e-18, w)[..., None]
    z_a = jnp.einsum("...ij,...j->...i", R_a, X)[..., 2] + t_a[..., 2]
    z_b = jnp.einsum("...ij,...j->...i", R_b, X)[..., 2] + t_b[..., 2]
    return X, z_a, z_b


def reprojection_error(R, t, X, x_obs):
    """Normalized-coordinate reprojection error (N,) for world→cam (R,t)."""
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-18, 1e-18, Xc[..., 2])
    proj = Xc[..., :2] / z[..., None]
    return jnp.linalg.norm(proj - x_obs, axis=-1)

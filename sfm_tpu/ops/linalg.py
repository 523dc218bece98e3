"""Batched small-matrix linear algebra on top of XLA primitives.

TPU-native replacement for the reference's scalar Jacobi eigensolver /
Gaussian elimination (reference: cpp/include/linalg.hpp:133-201
``jacobi_eig_sym``, cpp/include/dense.hpp:54-119 ``solve_gauss``/``inv3``,
cpp/src/templering_sfm.cpp:537-607 ``svd3``/``enforce_rank2``). Everything
here broadcasts over leading batch dims so thousands of RANSAC hypotheses
or map points run as one XLA op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smallest_eigvec_sym(A):
    """Unit eigenvector of the smallest eigenvalue of symmetric A (...,n,n).

    Used for 8-point null vectors (A^T A, 9x9) and DLT triangulation (4x4),
    replacing jacobi_eig_sym calls at cpp:626, cpp:1504.
    """
    _, vecs = jnp.linalg.eigh(A)  # ascending eigenvalues
    return vecs[..., :, 0]


def nullvec_lstsq(A):
    """Unit right-singular vector of smallest singular value of A (...,m,n).

    Better conditioned than eigh(A^T A) when running in f32.
    """
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[..., -1, :]


def inv3(A):
    """Closed-form batched 3x3 inverse (ref: dense.hpp:96-119)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    M = jnp.stack(
        [
            jnp.stack([A11, A12, A13], -1),
            jnp.stack([A21, A22, A23], -1),
            jnp.stack([A31, A32, A33], -1),
        ],
        axis=-2,
    )
    return M * inv_det[..., None, None]


def solve_psd(A, b, jitter: float = 0.0):
    """Solve A x = b for symmetric positive-(semi)definite A via Cholesky.

    Replaces the reference's partial-pivot Gaussian elimination
    (dense.hpp:54-93) on the reduced camera system — Cholesky maps onto
    XLA's blocked triangular solves.
    """
    n = A.shape[-1]
    if jitter:
        A = A + jitter * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A)
    y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(L, -1, -2), y, lower=False
    )
    return x[..., 0]


def svd3(A):
    """Batched 3x3 SVD (U, s, Vt); ref cpp:537-593 builds this by hand."""
    return jnp.linalg.svd(A, full_matrices=True)


def enforce_rank2(E):
    """Project (...,3,3) onto the essential manifold's rank-2 cone by zeroing
    the smallest singular value (ref: cpp:595-607)."""
    u, s, vt = jnp.linalg.svd(E, full_matrices=True)
    s2 = s.at[..., 2].set(0.0)
    return (u * s2[..., None, :]) @ vt


def normalize_points_hartley(pts, valid=None):
    """Hartley normalization: translate centroid to origin, scale mean norm
    to sqrt(2). Returns (pts_n, T) with T (3,3) such that p_n = T p_h.

    The reference skips this (it K-normalizes only, cpp:498-501); we add it
    because the batched f32 8-point needs the conditioning.
    """
    if valid is None:
        mean = jnp.mean(pts, axis=-2, keepdims=True)
        d = jnp.linalg.norm(pts - mean, axis=-1).mean(axis=-1)
    else:
        w = valid[..., None].astype(pts.dtype)
        cnt = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1.0)
        mean = jnp.sum(pts * w, axis=-2, keepdims=True) / cnt
        d = jnp.sum(jnp.linalg.norm((pts - mean) * w, axis=-1), axis=-1) / jnp.maximum(
            cnt[..., 0, 0], 1.0
        )
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-12)
    pts_n = (pts - mean) * s[..., None, None]
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, zeros, -s * mean[..., 0, 0]], -1),
            jnp.stack([zeros, s, -s * mean[..., 0, 1]], -1),
            jnp.stack([zeros, zeros, ones], -1),
        ],
        axis=-2,
    )
    return pts_n, T

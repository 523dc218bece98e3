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


def jacobi_eigh(A, sweeps: int = 18):
    """Batched cyclic Jacobi eigensolver for small symmetric matrices.

    A (...,n,n) symmetric, n static (intended n<=10). Returns
    (w (...,n) ascending, V (...,n,n) with eigenvectors in columns).

    Replaces ``jnp.linalg.eigh`` in the compute path: XLA's LAPACK-style
    eigh/svd on TPU lowers to enormous, slow programs for batched tiny
    matrices, while these unrolled vectorized rotations compile to plain
    VPU ops (and are the batched equivalent of the reference's own
    ``jacobi_eig_sym``, linalg.hpp:133-201).
    """
    n = A.shape[-1]
    dtype = A.dtype
    V = jnp.broadcast_to(jnp.eye(n, dtype=dtype), A.shape)
    tiny = jnp.asarray(1e-30, dtype)

    def rotate(A, V, p, q):
        app = A[..., p, p]
        aqq = A[..., q, q]
        apq = A[..., p, q]
        # tan(2θ)-based stable rotation
        theta = 0.5 * (aqq - app) / jnp.where(jnp.abs(apq) < tiny, tiny, apq)
        t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(1.0 + theta * theta))
        t = jnp.where(jnp.abs(apq) < tiny, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        # rows p,q
        Ap = A[..., p, :]
        Aq = A[..., q, :]
        A = A.at[..., p, :].set(c[..., None] * Ap - s[..., None] * Aq)
        A = A.at[..., q, :].set(s[..., None] * Ap + c[..., None] * Aq)
        # cols p,q
        Ap = A[..., :, p]
        Aq = A[..., :, q]
        A = A.at[..., :, p].set(c[..., None] * Ap - s[..., None] * Aq)
        A = A.at[..., :, q].set(s[..., None] * Ap + c[..., None] * Aq)
        Vp = V[..., :, p]
        Vq = V[..., :, q]
        V = V.at[..., :, p].set(c[..., None] * Vp - s[..., None] * Vq)
        V = V.at[..., :, q].set(s[..., None] * Vp + c[..., None] * Vq)
        return A, V

    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]

    def sweep(carry, _):
        A, V = carry
        for p, q in pairs:
            A, V = rotate(A, V, p, q)
        return (A, V), None

    (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)
    w = jnp.diagonal(A, axis1=-2, axis2=-1)
    order = jnp.argsort(w, axis=-1)
    w = jnp.take_along_axis(w, order, axis=-1)
    V = jnp.take_along_axis(V, order[..., None, :], axis=-1)
    return w, V


def smallest_eigvec_sym(A):
    """Unit eigenvector of the smallest eigenvalue of symmetric A (...,n,n).

    Used for 8-point null vectors (A^T A, 9x9) and DLT triangulation (4x4),
    replacing jacobi_eig_sym calls at cpp:626, cpp:1504.
    """
    _, vecs = jacobi_eigh(A)
    return vecs[..., :, 0]


def onesided_jacobi(A, sweeps: int = 12):
    """Batched one-sided Jacobi SVD core: orthogonalizes the n columns of
    A (...,m,n) by plane rotations accumulated into V.

    Returns (AV (...,m,n) with mutually orthogonal columns u_k·s_k,
    s (...,n) column norms UNsorted, V (...,n,n)). Unlike the
    eigen-of-AᵀA route this never squares the condition number, so f32
    null vectors keep ~1e-6 relative accuracy instead of ~3e-4."""
    n = A.shape[-1]
    dtype = A.dtype
    V = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (*A.shape[:-2], n, n))
    tiny = jnp.asarray(1e-30, dtype)
    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]

    def sweep(carry, _):
        A, V = carry
        for p, q in pairs:
            ap = A[..., :, p]
            aq = A[..., :, q]
            app = jnp.sum(ap * ap, axis=-1)
            aqq = jnp.sum(aq * aq, axis=-1)
            apq = jnp.sum(ap * aq, axis=-1)
            tau = 0.5 * (aqq - app) / jnp.where(jnp.abs(apq) < tiny, tiny, apq)
            t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
            t = jnp.where(jnp.abs(apq) < tiny, 0.0, t)
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c
            A = A.at[..., :, p].set(c[..., None] * ap - s[..., None] * aq)
            A = A.at[..., :, q].set(s[..., None] * ap + c[..., None] * aq)
            vp = V[..., :, p]
            vq = V[..., :, q]
            V = V.at[..., :, p].set(c[..., None] * vp - s[..., None] * vq)
            V = V.at[..., :, q].set(s[..., None] * vp + c[..., None] * vq)
        return (A, V), None

    (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)
    s = jnp.linalg.norm(A, axis=-2)
    return A, s, V


def nullvec_lstsq(A):
    """Unit null vector of A (...,m,n): right-singular vector of the
    smallest singular value via batched one-sided Jacobi (XLA's
    LAPACK-style svd is pathologically slow for batched tiny matrices on
    TPU, and the eigen-of-AᵀA route halves f32 precision)."""
    _, s, V = onesided_jacobi(A)
    idx = jnp.argmin(s, axis=-1)
    return jnp.take_along_axis(V, idx[..., None, None], axis=-1)[..., 0]


def nullvec_inviter(A, iters: int = 6):
    """Approximate unit null vector of A (...,m,n) via shift-inverted
    power iteration on B = AᵀA (n static and small).

    For the DLT path the reference itself solves eigen-of-AᵀA
    (cpp:1477-1516), so the squared condition number is acceptable
    there; this runs ~10x fewer (and simpler) ops than the 2-sweep-per-
    pair Jacobi, which dominates both the compile time and the run time
    of large triangulation batches on TPU. Not for the 8-point solver —
    E estimation keeps the one-sided Jacobi's full f32 accuracy."""
    n = A.shape[-1]
    dtype = A.dtype
    B = jnp.einsum("...mi,...mj->...ij", A, A)
    tr = jnp.trace(B, axis1=-2, axis2=-1)[..., None, None]
    eps = 1e-7 * tr + 1e-30
    Bs = B + eps * jnp.eye(n, dtype=dtype)
    L = cholesky_unrolled(Bs)
    # fixed start vector; the shift-invert map amplifies the smallest
    # eigencomponent by ~lam_min^-1 per iteration — a handful suffice
    x = jnp.full((*A.shape[:-2], n), 1.0 / (n ** 0.5), dtype)
    for _ in range(iters):
        y = _forward_sub(L, x)
        x = _backward_sub(jnp.swapaxes(L, -1, -2), y)
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-30)
    return x


def svd3_jacobi(A):
    """Batched 3x3 SVD (U, s descending, Vt) via one-sided Jacobi with
    Gram-Schmidt completion of U for tiny singular values (the batched
    equivalent of the reference's svd3, cpp:537-593)."""
    AV_u, s_u, V_u = onesided_jacobi(A)
    order = jnp.argsort(-s_u, axis=-1)
    s = jnp.take_along_axis(s_u, order, axis=-1)
    V = jnp.take_along_axis(V_u, order[..., None, :], axis=-1)
    AV = jnp.take_along_axis(AV_u, order[..., None, :], axis=-1)
    s_safe = jnp.maximum(s, 1e-12 * (s[..., :1] + 1e-30))
    U = AV / s_safe[..., None, :]
    # Gram-Schmidt re-orthonormalization (robust for rank-deficient A)
    u0 = U[..., :, 0]
    n0 = jnp.linalg.norm(u0, axis=-1, keepdims=True)
    fallback0 = jnp.zeros_like(u0).at[..., 0].set(1.0)
    u0 = jnp.where(n0 > 1e-6, u0 / jnp.maximum(n0, 1e-30), fallback0)
    u1 = U[..., :, 1]
    u1 = u1 - u0 * jnp.sum(u0 * u1, axis=-1, keepdims=True)
    n1 = jnp.linalg.norm(u1, axis=-1, keepdims=True)
    h = jnp.where(
        jnp.abs(u0[..., :1]) < 0.9,
        jnp.zeros_like(u0).at[..., 0].set(1.0),
        jnp.zeros_like(u0).at[..., 1].set(1.0),
    )
    alt1 = jnp.cross(u0, h)
    alt1 = alt1 / jnp.maximum(jnp.linalg.norm(alt1, axis=-1, keepdims=True), 1e-30)
    u1 = jnp.where(n1 > 1e-6, u1 / jnp.maximum(n1, 1e-30), alt1)
    u2 = jnp.cross(u0, u1)
    # orient u2 to match A v2 (so U s Vt = A for full-rank A); keep the
    # right-handed completion when s2 ~ 0 (rank-2 input)
    av2 = AV[..., :, 2]
    d2 = jnp.sum(u2 * av2, axis=-1, keepdims=True)
    sign2 = jnp.where(jnp.abs(d2) > 1e-9, jnp.sign(d2), 1.0)
    u2 = u2 * sign2
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, s, jnp.swapaxes(V, -1, -2)


def det3(A):
    """Closed-form batched 3x3 determinant (avoids XLA's LU custom call)."""
    return (
        A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )


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


def cholesky_unrolled(A):
    """Dense Cholesky with a statically unrolled column loop (vectorized
    rank-1 downdates). For the small/medium systems in this framework
    (5..48 dims) this lowers to plain VPU ops instead of the slow
    LAPACK-style custom calls XLA:TPU emits for lax.linalg.cholesky."""
    n = A.shape[-1]
    dtype = A.dtype
    L = jnp.zeros_like(A)
    idx = jnp.arange(n)
    for j in range(n):
        d = jnp.sqrt(jnp.maximum(A[..., j, j], 1e-30))
        col = A[..., :, j] / d[..., None]
        col = jnp.where(idx >= j, col, jnp.zeros_like(col))
        L = L.at[..., :, j].set(col)
        A = A - col[..., :, None] * col[..., None, :]
    return L


def _forward_sub(L, b):
    """Solve L y = b (L lower-triangular), unrolled."""
    n = L.shape[-1]
    y = jnp.zeros_like(b)
    for i in range(n):
        acc = jnp.einsum("...k,...k->...", L[..., i, :], y)
        y = y.at[..., i].set((b[..., i] - acc) / L[..., i, i])
    return y


def _backward_sub(U, b):
    """Solve U x = b (U upper-triangular), unrolled."""
    n = U.shape[-1]
    x = jnp.zeros_like(b)
    for i in range(n - 1, -1, -1):
        acc = jnp.einsum("...k,...k->...", U[..., i, :], x)
        x = x.at[..., i].set((b[..., i] - acc) / U[..., i, i])
    return x


def solve_psd_small(A, b, jitter: float = 0.0):
    """Cholesky solve for PSD A with static n<=48, fully unrolled."""
    n = A.shape[-1]
    if jitter:
        A = A + jitter * jnp.eye(n, dtype=A.dtype)
    L = cholesky_unrolled(A)
    y = _forward_sub(L, b)
    return _backward_sub(jnp.swapaxes(L, -1, -2), y)


def solve_psd(A, b, jitter: float = 0.0):
    """Solve A x = b for symmetric positive-(semi)definite A via Cholesky.

    Replaces the reference's partial-pivot Gaussian elimination
    (dense.hpp:54-93) on the reduced camera system. Small systems use the
    unrolled Cholesky (TPU-friendly); large ones fall back to XLA's
    blocked factorization.
    """
    n = A.shape[-1]
    if n <= 48:
        return solve_psd_small(A, b, jitter)
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
    return svd3_jacobi(A)


def enforce_rank2(E):
    """Project (...,3,3) onto the essential manifold's rank-2 cone by zeroing
    the smallest singular value (ref: cpp:595-607)."""
    u, s, vt = svd3_jacobi(E)
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

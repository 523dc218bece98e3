"""Essential-matrix estimation: batched 8-point + RANSAC + pose recovery.

TPU-native replacement for the reference's sequential RANSAC loop
(reference: cpp/src/templering_sfm.cpp:609-761 — ``eight_point_E`` (8x9
design matrix, null vector via 9x9 Jacobi eigen), ``sampson_err``,
``find_E_ransac`` (2500 sequential mt19937 hypotheses), E→(R,t) with
4-candidate cheirality voting; python py:900-913 via
cv2.findEssentialMat/recoverPose).

Design (SURVEY §2.6 / §7): all H hypotheses run as one vmapped tensor
program — (H,8) samples, (H,8,9) design matrices, one batched SVD, one
(H,N) Sampson scoring, argmax by inlier count. Convention: points are
K-normalized; x_j^T E x_i = 0 with E = [t]_x R and x_j ~ R x_i + t.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.ops import linalg


class RelPose(NamedTuple):
    """Relative pose i->j (x_j = R x_i + t, ‖t‖=1) + inlier stats.
    ref: cpp RelPose struct at cpp:641-645."""

    R: jnp.ndarray  # (3,3)
    t: jnp.ndarray  # (3,)
    E: jnp.ndarray  # (3,3)
    inlier_mask: jnp.ndarray  # (N,) bool
    num_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray  # () bool


def normalize_by_K(K, pts):
    """Pixel -> K-normalized homogeneous-2D coords (ref cpp:498-501)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    y = (pts[..., 1] - cy) / fy
    x = (pts[..., 0] - cx - s * y) / fx
    return jnp.stack([x, y], axis=-1)


def _design_row(xi, xj):
    """Row of the epipolar constraint x_j^T E x_i = 0 (ref cpp:612-621)."""
    xi1, yi1 = xi[..., 0], xi[..., 1]
    xj1, yj1 = xj[..., 0], xj[..., 1]
    one = jnp.ones_like(xi1)
    return jnp.stack(
        [xj1 * xi1, xj1 * yi1, xj1, yj1 * xi1, yj1 * yi1, yj1, xi1, yi1, one],
        axis=-1,
    )


def eight_point_E(xi, xj, weights=None):
    """Batched 8-point: (...,M,2)x2 -> (...,3,3) rank-2 essential matrices.

    Uses the SVD null vector of the (M,9) design (better f32 conditioning
    than the reference's eigen of A^T A, cpp:609-627) and projects the
    result to the essential cone with equalized singular values."""
    A = _design_row(xi, xj)  # (...,M,9)
    if weights is not None:
        A = A * weights[..., None]
    e = linalg.nullvec_lstsq(A)
    E = e.reshape(*e.shape[:-1], 3, 3)
    u, s, vt = jnp.linalg.svd(E, full_matrices=True)
    sbar = 0.5 * (s[..., 0] + s[..., 1])
    s2 = jnp.stack([sbar, sbar, jnp.zeros_like(sbar)], axis=-1)
    return (u * s2[..., None, :]) @ vt


def sampson_error(E, xi, xj, return_den: bool = False):
    """First-order geometric error (ref: cpp:629-638). xi/xj (...,N,2)."""
    ones = jnp.ones(xi.shape[:-1], xi.dtype)
    pi = jnp.concatenate([xi, ones[..., None]], axis=-1)  # (...,N,3)
    pj = jnp.concatenate([xj, ones[..., None]], axis=-1)
    Epi = jnp.einsum("...ij,...nj->...ni", E, pi)
    Etpj = jnp.einsum("...ji,...nj->...ni", E, pj)
    num = jnp.einsum("...ni,...ni->...n", pj, Epi) ** 2
    den = (
        Epi[..., 0] ** 2 + Epi[..., 1] ** 2 + Etpj[..., 0] ** 2 + Etpj[..., 1] ** 2
    )
    err = num / jnp.maximum(den, 1e-18)
    if return_den:
        return err, den
    return err


def decompose_E(E):
    """E -> 4 candidate (R, t) pairs, det-fixed (ref: cpp:680-712)."""
    u, _, vt = jnp.linalg.svd(E, full_matrices=True)
    # ensure proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))[..., None, None]
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def triangulate_two_view(R, t, xi, xj):
    """Midpoint-free linear two-view triangulation in cam-i frame.

    P_i=[I|0], P_j=[R|t]; batched DLT over points (ref: the inline DLT at
    cpp:714-754 used for cheirality voting). xi/xj (...,N,2) normalized.
    Returns X_i (...,N,3) and depths (z_i, z_j)."""
    N = xi.shape[-2]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), (*R.shape[:-2], 3, 3))
    zero = jnp.zeros((*R.shape[:-2], 3), R.dtype)
    Pi = jnp.concatenate([eye, zero[..., None]], axis=-1)  # (...,3,4)
    Pj = jnp.concatenate([R, t[..., None]], axis=-1)

    def rows(P, x):
        # (...,N,2,4): [x*P3 - P1 ; y*P3 - P2]
        P = P[..., None, :, :]  # (...,1,3,4)
        r1 = x[..., 0:1] * P[..., 2, :] - P[..., 0, :]
        r2 = x[..., 1:2] * P[..., 2, :] - P[..., 1, :]
        return jnp.stack([r1, r2], axis=-2)

    A = jnp.concatenate([rows(Pi, xi), rows(Pj, xj)], axis=-2)  # (...,N,4,4)
    Xh = linalg.nullvec_lstsq(A)  # (...,N,4)
    w = Xh[..., 3]
    X = Xh[..., :3] / jnp.where(jnp.abs(w) < 1e-18, 1e-18, w)[..., None]
    zi = X[..., 2]
    zj = jnp.einsum("...ij,...nj->...ni", R, X)[..., 2] + t[..., None, 2]
    return X, zi, zj


def _cheirality_vote(Rs, ts, xi, xj, inlier_mask, max_votes: int = 32):
    """Pick the (R,t) candidate with most points in front of both cameras
    (ref: cpp:714-754 votes with <=20 triangulated inliers)."""
    # deterministically take the first ``max_votes`` inliers: sort key puts
    # inliers first, stable order otherwise
    order = jnp.argsort(jnp.where(inlier_mask, 0, 1), stable=True)
    idx = order[:max_votes]
    sel_valid = inlier_mask[idx]
    vi = xi[idx]
    vj = xj[idx]
    _, zi, zj = triangulate_two_view(Rs, ts, vi[None], vj[None])  # (4,V)
    votes = jnp.sum(((zi > 0) & (zj > 0)) & sel_valid[None], axis=-1)
    best = jnp.argmax(votes)
    return Rs[best], ts[best], votes[best]


@functools.partial(
    jax.jit, static_argnames=("num_hypotheses", "max_votes", "refine", "lo_starts")
)
def find_E_ransac(
    key,
    xi,
    xj,
    valid,
    num_hypotheses: int = 1024,
    sampson_thresh: float = 1e-3,
    min_inliers: int = 60,
    max_votes: int = 32,
    refine: bool = True,
    lo_starts: int = 8,
):
    """Batched-hypothesis LO-RANSAC for the essential matrix.

    Three fully-batched stages (vs the reference's 2500 sequential
    hypotheses, cpp:646-761):
      1. H minimal 8-point hypotheses scored by inlier count;
      2. the top ``lo_starts`` hypotheses each refined by Sampson-weighted
         robust IRLS (multi-start local optimization — count-optimal
         hypotheses are frequently in the wrong basin of the robust cost);
      3. final model chosen by truncated (MSAC) cost, which discriminates
         converged solutions where raw counts cannot.

    Args:
      key: jax PRNG key (determinism contract mirrors cpp mt19937(12345)).
      xi, xj: (N,2) K-normalized correspondences.
      valid: (N,) bool mask (fixed-capacity padding).
    Returns RelPose.
    """
    N = xi.shape[0]
    H = num_hypotheses
    dtype = xi.dtype
    # sampson_error returns the squared first-order distance; the reference
    # thresholds that value directly (cpp:672, thr=1e-3)
    thr = jnp.asarray(sampson_thresh, dtype)

    # Sample (H,8) distinct valid indices: per-hypothesis random priority
    # with invalid entries at -inf, take top-8. One (H,N) op replaces the
    # reference's sequential index draws (cpp:664-668).
    pri = jax.random.uniform(key, (H, N), dtype=jnp.float32)
    pri = jnp.where(valid[None, :], pri, -jnp.inf)
    _, sample_idx = jax.lax.top_k(pri, 8)  # (H,8)

    E = eight_point_E(xi[sample_idx], xj[sample_idx])  # (H,3,3)
    err = sampson_error(E, xi[None], xj[None])  # (H,N)
    inl = (err < thr) & valid[None]
    counts = jnp.sum(inl, axis=-1)

    if refine:
        K = lo_starts
        _, topk = jax.lax.top_k(counts, K)
        Ek = E[topk]  # (K,3,3)
        mask_k = inl[topk]  # (K,N)
        xb = jnp.broadcast_to(xi, (K, N, 2))
        yb = jnp.broadcast_to(xj, (K, N, 2))
        for _ in range(4):
            err_k, den_k = sampson_error(Ek, xi[None], xj[None], return_den=True)
            r = jnp.sqrt(jnp.maximum(err_k, 1e-18))
            med = jnp.nanmedian(jnp.where(mask_k, r, jnp.nan), axis=-1, keepdims=True)
            med = jnp.nan_to_num(med, nan=thr)
            # MAD-style gate: residuals far above the per-candidate noise
            # floor are high-leverage pseudo-inliers — cut them entirely
            tight = mask_k & (r < 3.0 * med + 1e-15)
            w = tight.astype(dtype) / jnp.sqrt(jnp.maximum(den_k, 1e-12))
            Ek = eight_point_E(xb, yb, weights=w)
            mask_k = (sampson_error(Ek, xi[None], xj[None]) < thr) & valid[None]
        err_k = sampson_error(Ek, xi[None], xj[None])
        cost = jnp.sum(jnp.where(valid[None], jnp.minimum(err_k, thr), 0.0), axis=-1)
        best_k = jnp.argmin(cost)
        E_best = Ek[best_k]
        mask = mask_k[best_k]
        count = jnp.sum(mask)
        # guard: if local optimization somehow lost the consensus, fall
        # back to the raw count-best hypothesis
        raw_best = jnp.argmax(counts)
        fell_apart = count < jnp.maximum(counts[raw_best] // 2, 8)
        E_best = jnp.where(fell_apart, E[raw_best], E_best)
        mask = jnp.where(fell_apart, inl[raw_best], mask)
        count = jnp.sum(mask)
    else:
        best = jnp.argmax(counts)
        E_best = E[best]
        mask = inl[best]
        count = counts[best]

    Rs, ts = decompose_E(E_best)
    R, t, votes = _cheirality_vote(Rs, ts, xi, xj, mask, max_votes)
    ok = (count >= min_inliers) & (votes > 0)
    return RelPose(R=R, t=t, E=E_best, inlier_mask=mask,
                   num_inliers=count.astype(jnp.int32), ok=ok)

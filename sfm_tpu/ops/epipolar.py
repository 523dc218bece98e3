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

from sfm_tpu.ops import lie, linalg


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
    u, s, vt = linalg.svd3_jacobi(E)
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
    u, _, vt = linalg.svd3_jacobi(E)
    # ensure proper rotations
    u = u * jnp.sign(linalg.det3(u))[..., None, None]
    vt = vt * jnp.sign(linalg.det3(vt))[..., None, None]
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


def _tangent_basis(t):
    """(3,2) orthonormal basis of the plane orthogonal to unit vector t."""
    a = jnp.where(
        jnp.abs(t[0]) < 0.9,
        jnp.array([1.0, 0.0, 0.0], t.dtype),
        jnp.array([0.0, 1.0, 0.0], t.dtype),
    )
    b1 = jnp.cross(t, a)
    b1 = b1 / jnp.linalg.norm(b1)
    b2 = jnp.cross(t, b1)
    return jnp.stack([b1, b2], axis=1)


def _polish_rt(R0, t0, xi, xj, valid, thr, iters: int = 10, damping: float = 1e-8):
    """Gauss-Newton on the essential manifold for ONE candidate.

    Parameterizes E = [t]x R with a 5-dof update (so3 twist + 2-dof
    tangent of unit t) and minimizes the robust Sampson distance. Unlike
    an algebraic re-fit + cone projection (which is NOT a descent step in
    narrow-FOV geometry), every iteration here strictly follows the true
    cost. Designed to be vmapped over candidates."""

    def gn_step(carry, _):
        R, t = carry
        B = _tangent_basis(t)

        def resid(p):
            Rn = lie.so3_exp(p[:3]) @ R
            tn = t + B @ p[3:]
            tn = tn / jnp.linalg.norm(tn)
            E = lie.hat(tn) @ Rn
            err = sampson_error(E, xi, xj)
            return jnp.sqrt(jnp.maximum(err, 1e-18))

        p0 = jnp.zeros(5, xi.dtype)
        r0 = resid(p0)
        mask = valid & (r0 * r0 < thr)
        med = jnp.nanmedian(jnp.where(mask, r0, jnp.nan))
        med = jnp.nan_to_num(med, nan=jnp.sqrt(thr))
        w = (mask & (r0 < 3.0 * med + 1e-15)).astype(xi.dtype)
        J = jax.jacfwd(resid)(p0)  # (N,5)
        Jw = J * w[:, None]
        H = Jw.T @ J + damping * jnp.eye(5, dtype=xi.dtype)
        g = Jw.T @ r0
        dp = -linalg.solve_psd_small(H, g, jitter=1e-12)
        Rn = lie.so3_exp(dp[:3]) @ R
        tn = t + B @ dp[3:]
        tn = tn / jnp.linalg.norm(tn)
        return (Rn, tn), None

    (R, t), _ = jax.lax.scan(gn_step, (R0, t0), None, length=iters)
    return R, t


def _front_votes(Rs, ts, xi, xj, inlier_mask, max_votes: int = 32):
    """Count triangulated inliers in front of both cameras for each (R,t)
    candidate in a stacked batch. Returns (votes (...,), n_available ())."""
    # deterministically take the first ``max_votes`` inliers: sort key puts
    # inliers first, stable order otherwise
    order = jnp.argsort(jnp.where(inlier_mask, 0, 1), stable=True)
    idx = order[:max_votes]
    sel_valid = inlier_mask[idx]
    vi = xi[idx]
    vj = xj[idx]
    _, zi, zj = triangulate_two_view(Rs, ts, vi[None], vj[None])  # (C,V)
    votes = jnp.sum(((zi > 0) & (zj > 0)) & sel_valid[None], axis=-1)
    return votes, jnp.sum(sel_valid)


def _cheirality_vote(Rs, ts, xi, xj, inlier_mask, max_votes: int = 32):
    """Pick the (R,t) candidate with most points in front of both cameras
    (ref: cpp:714-754 votes with <=20 triangulated inliers)."""
    votes, _ = _front_votes(Rs, ts, xi, xj, inlier_mask, max_votes)
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
    lo_starts: int = 16,
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
        # diverse multi-start: half the slots take the best hypotheses by
        # count, half stride across the whole ranking — count-optimal
        # hypotheses often cluster in one (possibly wrong) basin of the
        # robust cost, and basin diversity is what lets the polished pool
        # reach the global optimum
        order = jnp.argsort(-counts)
        k_top = K // 2
        stride = max(H // max(K - k_top, 1), 1)
        pick = jnp.concatenate(
            [order[:k_top], order[::stride][: K - k_top]]
        )
        Ek = E[pick]  # (K,3,3)
        mask_k = inl[pick]  # (K,N)
        # per-candidate cheirality vote picks the physical (R,t) branch
        Rk, tk, votes_k = jax.vmap(
            lambda Ei, mi: _cheirality_vote(*decompose_E(Ei), xi, xj, mi, max_votes)
        )(Ek, mask_k)
        # multi-start manifold GN polish (batched over candidates)
        Rk, tk = jax.vmap(
            lambda R0, t0: _polish_rt(R0, t0, xi, xj, valid, thr)
        )(Rk, tk)
        Ek = jnp.matmul(lie.hat(tk), Rk)
        err_k = sampson_error(Ek, xi[None], xj[None])
        mask_k = (err_k < thr) & valid[None]
        # truncated (MSAC) cost discriminates converged local minima where
        # raw inlier counts cannot
        cost = jnp.sum(jnp.where(valid[None], jnp.minimum(err_k, thr), 0.0), axis=-1)
        # cheirality gate AFTER polish: the degenerate (rotation-absorbed)
        # basin triangulates a large fraction of inliers behind a camera,
        # while the physical basin is ~100% in front — a decisive filter
        # the truncated cost alone does not provide
        vote_cap = 4 * max_votes
        votes_p, n_avail = jax.vmap(
            lambda R_, t_, m_: _front_votes(
                R_[None], t_[None], xi, xj, m_, vote_cap
            )
        )(Rk, tk, mask_k)
        votes_p = votes_p[:, 0]
        passes = votes_p.astype(dtype) >= 0.9 * n_avail.astype(dtype)
        gated = jnp.where(passes, cost, jnp.inf)
        any_pass = jnp.any(passes)
        best_k = jnp.where(any_pass, jnp.argmin(gated), jnp.argmax(votes_p))
        R, t = Rk[best_k], tk[best_k]
        E_best = Ek[best_k]
        mask = mask_k[best_k]
        count = jnp.sum(mask)
        votes = votes_p[best_k]
        # guard: if local optimization lost the consensus entirely, fall
        # back to the raw count-best hypothesis
        raw_best = jnp.argmax(counts)
        fell_apart = count < jnp.maximum(counts[raw_best] // 2, 8)
        E_fb = E[raw_best]
        R_fb, t_fb, votes_fb = _cheirality_vote(
            *decompose_E(E_fb), xi, xj, inl[raw_best], max_votes
        )
        R = jnp.where(fell_apart, R_fb, R)
        t = jnp.where(fell_apart, t_fb, t)
        E_best = jnp.where(fell_apart, E_fb, E_best)
        mask = jnp.where(fell_apart, inl[raw_best], mask)
        votes = jnp.where(fell_apart, votes_fb, votes)
        count = jnp.sum(mask)
    else:
        best = jnp.argmax(counts)
        E_best = E[best]
        mask = inl[best]
        count = counts[best]
        R, t, votes = _cheirality_vote(
            *decompose_E(E_best), xi, xj, mask, max_votes
        )

    ok = (count >= min_inliers) & (votes > 0)
    return RelPose(R=R, t=t, E=E_best, inlier_mask=mask,
                   num_inliers=count.astype(jnp.int32), ok=ok)

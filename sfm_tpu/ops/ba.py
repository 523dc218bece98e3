"""Sliding-window bundle adjustment: batched Schur-complement LM.

TPU-native replacement for the reference's per-observation accumulation
loops (reference: cpp/src/templering_sfm.cpp:848-1097
``bundle_adjust_window`` — analytic Jacobians cpp:944-976, per-point
Schur elimination cpp:1011-1057, 6Wx6W reduced camera solve cpp:1073,
SE(3) manifold update cpp:1081-1095, gauge fix cpp:1067-1071;
python/src/templering_sfm.py:706-852 ``LocalBA`` dense LM with numeric
pose Jacobians — we use the analytic forms, never the numeric ones).

Design (SURVEY §2.6): residuals + Jacobians for ALL observations are one
vectorized evaluation; block Hessians assemble via ``segment_sum``; the
point blocks are eliminated with a batched 3x3 inverse; the reduced
camera system solves by Cholesky; the LM loop is a ``lax.scan`` with
accept/reject selection. Everything is fixed-shape: (F) window poses,
(P) points, (M) padded observations.

Conventions: poses are world→camera (R_wc, t_wc); observations are
K-normalized image coords; update is left-multiplicative SE(3):
``T' = exp([w|v]) ∘ T``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sfm_tpu.ops import lie, linalg
from sfm_tpu.utils import debug


class BAProblem(NamedTuple):
    """Fixed-shape BA problem. Invalid obs/points are masked out."""

    R_wc: jnp.ndarray  # (F,3,3)
    t_wc: jnp.ndarray  # (F,3)
    X: jnp.ndarray  # (P,3)
    cam_idx: jnp.ndarray  # (M,) i32 in [0,F)
    pid_idx: jnp.ndarray  # (M,) i32 in [0,P)
    obs: jnp.ndarray  # (M,2) normalized coords
    obs_valid: jnp.ndarray  # (M,) bool
    point_valid: jnp.ndarray  # (P,) bool


def _project_residuals(R_wc, t_wc, X, cam_idx, pid_idx, obs, obs_valid):
    """Residuals + camera-frame points for all observations.

    Returns (r (M,2), Xc (M,3), z_ok (M,))."""
    Rc = R_wc[cam_idx]  # (M,3,3)
    tc = t_wc[cam_idx]
    Xp = X[pid_idx]
    Xc = jnp.einsum("mij,mj->mi", Rc, Xp) + tc
    z = Xc[:, 2]
    z_ok = obs_valid & (z > 1e-6)
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    proj = Xc[:, :2] / z_safe[:, None]
    r = proj - obs
    return r, Xc, z_ok


_CUTOFF = 10.0  # gross-outlier gate, in units of huber_delta


def _huber_weight(r, delta):
    """sqrt-IRLS weight per obs: min(1, delta/‖r‖) (ref cpp:843-846,
    py:787-790 use delta/‖e‖; the sqrt lands on both J and r). Residuals
    beyond ``_CUTOFF*delta`` are gross outliers and get weight 0 — the
    reference relies on RANSAC pre-filtering for this; a redescending
    cutoff makes BA robust on its own."""
    n = jnp.linalg.norm(r, axis=-1)
    w = jnp.sqrt(jnp.minimum(1.0, delta / jnp.maximum(n, 1e-12)))
    return jnp.where(n > _CUTOFF * delta, 0.0, w)


def ba_cost(p: BAProblem, huber_delta: float) -> jnp.ndarray:
    """Total robust cost (for LM accept/reject and metrics)."""
    r, _, z_ok = _project_residuals(
        p.R_wc, p.t_wc, p.X, p.cam_idx, p.pid_idx, p.obs, p.obs_valid
    )
    n = jnp.linalg.norm(r, axis=-1)
    quad = 0.5 * n * n
    lin = huber_delta * (n - 0.5 * huber_delta)
    rho = jnp.where(n <= huber_delta, quad, lin)
    # truncate at the gross-outlier gate (consistent with _huber_weight)
    cap = huber_delta * (_CUTOFF * huber_delta - 0.5 * huber_delta)
    rho = jnp.minimum(rho, cap)
    # observations behind the camera get the worst-case penalty so LM
    # steps that push points behind a camera are rejected
    rho = jnp.where(z_ok, rho, jnp.where(p.obs_valid, 2.0 * cap + 1.0, 0.0))
    return jnp.sum(jnp.where(p.obs_valid, rho, 0.0))


def ba_cost_soa(p: BAProblem, huber_delta: float) -> jnp.ndarray:
    """Scalar-lane (SoA) twin of ``ba_cost`` — same value, no tiny-matrix
    tiles. The tensor form's (M,3,3)x(M,3) einsum and (M,2) residual land
    in (8,128)-padded vector tiles (the `_linearize_soa` layout trap); at
    the window's M=1024 the cost eval was ~0.6 ms of the 2.1 ms LM
    iteration. Here every intermediate is an (M,) lane vector."""
    cam, pid = p.cam_idx, p.pid_idx
    Rg = p.R_wc[cam]
    tg = p.t_wc[cam]
    Xg = p.X[pid]
    Xc = [Rg[:, i, 0] * Xg[:, 0] + Rg[:, i, 1] * Xg[:, 1]
          + Rg[:, i, 2] * Xg[:, 2] + tg[:, i] for i in range(3)]
    z = Xc[2]
    z_ok = p.obs_valid & (z > 1e-6)
    iz = 1.0 / jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    rx = Xc[0] * iz - p.obs[:, 0]
    ry = Xc[1] * iz - p.obs[:, 1]
    n = jnp.sqrt(rx * rx + ry * ry)
    rho = jnp.where(n <= huber_delta, 0.5 * n * n,
                    huber_delta * (n - 0.5 * huber_delta))
    cap = huber_delta * (_CUTOFF * huber_delta - 0.5 * huber_delta)
    rho = jnp.minimum(rho, cap)
    rho = jnp.where(z_ok, rho, jnp.where(p.obs_valid, 2.0 * cap + 1.0, 0.0))
    return jnp.sum(jnp.where(p.obs_valid, rho, 0.0))


def _linearize(p: BAProblem, huber_delta: float):
    """One vectorized linearization pass over all observations.

    Returns (Hcc (F,6,6), bc (F,6), Hpp (P,3,3), bp (P,3), W (F,P,6,3))."""
    F = p.R_wc.shape[0]
    P = p.X.shape[0]
    r, Xc, z_ok = _project_residuals(
        p.R_wc, p.t_wc, p.X, p.cam_idx, p.pid_idx, p.obs, p.obs_valid
    )
    w = _huber_weight(r, huber_delta) * (z_ok & p.point_valid[p.pid_idx]).astype(
        r.dtype
    )
    z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-6, 1e-6, Xc[:, 2])
    inv_z = 1.0 / z
    x, y = Xc[:, 0], Xc[:, 1]
    zero = jnp.zeros_like(inv_z)
    # Jproj (M,2,3), ref cpp:944-947
    Jproj = jnp.stack(
        [
            jnp.stack([inv_z, zero, -x * inv_z * inv_z], axis=-1),
            jnp.stack([zero, inv_z, -y * inv_z * inv_z], axis=-1),
        ],
        axis=-2,
    )
    # pose block: [-Jproj·hat(Xc) | Jproj]  (left-mult SE(3); ref cpp:961-976)
    Jw = -jnp.einsum("mij,mjk->mik", Jproj, lie.hat(Xc))  # (M,2,3)
    Jc = jnp.concatenate([Jw, Jproj], axis=-1)  # (M,2,6)
    # point block: Jproj·R_wc (ref cpp:949-957, py:796-803)
    Jp = jnp.einsum("mij,mjk->mik", Jproj, p.R_wc[p.cam_idx])  # (M,2,3)

    Jc = Jc * w[:, None, None]
    Jp = Jp * w[:, None, None]
    rw = r * w[:, None]

    Hcc_m = jnp.einsum("mia,mib->mab", Jc, Jc)  # (M,6,6)
    Hpp_m = jnp.einsum("mia,mib->mab", Jp, Jp)  # (M,3,3)
    W_m = jnp.einsum("mia,mib->mab", Jc, Jp)  # (M,6,3)
    bc_m = jnp.einsum("mia,mi->ma", Jc, rw)  # (M,6)
    bp_m = jnp.einsum("mia,mi->ma", Jp, rw)  # (M,3)

    cam = p.cam_idx
    pid = p.pid_idx
    if F * P <= 8192:
        # Block assembly as one-hot matmuls instead of segment_sum:
        # scatters are among the slowest TPU primitives while these
        # reductions are small MXU matmuls (F and P are static).
        dtype = r.dtype
        oc = (
            jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0) == cam[None, :]
        ).astype(dtype)  # (F,M)
        op_ = (
            jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0) == pid[None, :]
        ).astype(dtype)  # (P,M)
        Hcc = jnp.einsum("fm,mab->fab", oc, Hcc_m)
        bc = jnp.einsum("fm,ma->fa", oc, bc_m)
        Hpp = jnp.einsum("pm,mab->pab", op_, Hpp_m)
        bp = jnp.einsum("pm,ma->pa", op_, bp_m)
        # W[f,p] = Σ_{m: cam=f, pid=p} W_m: mask by camera, reduce by point
        Wc = oc[:, :, None, None] * W_m[None]  # (F,M,6,3)
        W = jnp.einsum("pm,fmab->fpab", op_, Wc)
        return Hcc, bc, Hpp, bp, W
    # large problems (global final BA): the one-hot mask would cost
    # O(F*P*M) — fall back to segment_sum (one scatter per LM iteration
    # on a once-per-run path)
    Hcc = jax.ops.segment_sum(Hcc_m, cam, num_segments=F)
    bc = jax.ops.segment_sum(bc_m, cam, num_segments=F)
    Hpp = jax.ops.segment_sum(Hpp_m, pid, num_segments=P)
    bp = jax.ops.segment_sum(bp_m, pid, num_segments=P)
    key = cam * P + pid
    W = jax.ops.segment_sum(W_m, key, num_segments=F * P).reshape(F, P, 6, 3)
    return Hcc, bc, Hpp, bp, W


def _solve_schur(Hcc, bc, Hpp, bp, W, point_valid, lam, n_fix: int):
    """Schur elimination of points + reduced camera solve.

    ref cpp:1011-1078; gauge handled by solving only for poses >= n_fix.
    Returns (dx_cam (F,6), dX (P,3))."""
    F = Hcc.shape[0]
    P = Hpp.shape[0]
    dtype = Hcc.dtype
    eyes3 = jnp.eye(3, dtype=dtype)
    # damp + regularize invalid/under-constrained points
    diagp = jnp.einsum("pii->pi", Hpp)
    Hpp_d = Hpp + (lam * jnp.maximum(diagp.max(-1), 1e-6)[:, None, None] + 1e-9) * eyes3
    Hpp_d = jnp.where(point_valid[:, None, None], Hpp_d, eyes3)
    Hpp_inv = linalg.inv3(Hpp_d)
    Hpp_inv = jnp.where(point_valid[:, None, None], Hpp_inv, 0.0)

    T = jnp.einsum("fpij,pjk->fpik", W, Hpp_inv)  # (F,P,6,3)
    S_off = jnp.einsum("fpik,gpjk->fgij", T, W)  # (F,F,6,6)
    S = -S_off
    S = S.at[jnp.arange(F), jnp.arange(F)].add(Hcc)
    b = bc - jnp.einsum("fpik,pk->fi", T, bp)  # (F,6)

    Sf = S.transpose(0, 2, 1, 3).reshape(6 * F, 6 * F)
    bf = b.reshape(6 * F)
    # LM damping on the camera diagonal; poses with NO observations
    # (fixed-capacity padding) get a unit prior so the Cholesky stays
    # well-conditioned in f32
    dS = jnp.diag(Sf)
    prior = jnp.where(dS <= 0.0, 1.0, 0.0)
    Sf = Sf + jnp.diag(lam * jnp.maximum(dS, 1e-6) + 1e-9 + prior)
    # gauge: first n_fix poses are frozen (solve the trailing block)
    k = 6 * n_fix
    Sf_red = Sf[k:, k:]
    bf_red = bf[k:]
    dx_red = linalg.solve_psd(Sf_red, -bf_red, jitter=1e-12)
    dx = jnp.concatenate([jnp.zeros(k, dtype), dx_red]).reshape(F, 6)

    # back-substitute points: dX = Hpp^{-1}(-bp - W^T dx)
    rhs = -bp - jnp.einsum("fpik,fi->pk", W, dx)
    dX = jnp.einsum("pij,pj->pi", Hpp_inv, rhs)
    return dx, dX


def _linearize_soa(p: BAProblem, huber_delta):
    """Structure-of-arrays linearization for WINDOW-sized problems.

    The tensor form (`_linearize`) spends its time in (M,2,6)/(M,6,6)
    tiny-matrix intermediates (each padded to (8,128) vector tiles — the
    same layout trap the closed-form DLT rewrite removed, ops/
    triangulate.py) and in F+1 separate one-hot reduction matmuls whose
    18-lane operands use 1/7 of the MXU width. Here every per-obs
    quantity is an (M,) lane-packed scalar, and ALL reductions ride TWO
    matmuls with packed lanes:

      camera side  (F,M) @ (M,27)    21 Hcc-triangle + 6 bc lanes
      point side   (P,M) @ (M,9+18F) 6 Hpp-triangle + 3 bp + F*18 W
                                     (117 lanes at the window's F=6 —
                                      one tile, vs 7 under-packed
                                      matmuls before)

    Returns (Hcc (F,6,6), bc (F,6), ApT (9+18F,P)) where ApT rows are
    the point-side sums in SoA: [Hpp 00,01,02,11,12,22 | bp x,y,z |
    W[f,a,k] at row 9 + f*18 + a*3 + k].
    """
    F = p.R_wc.shape[0]
    P = p.X.shape[0]
    dtype = p.X.dtype
    cam, pid = p.cam_idx, p.pid_idx

    Rg = p.R_wc[cam]                       # (M,3,3) gather, sliced below
    tg = p.t_wc[cam]
    Xg = p.X[pid]
    r_ = [[Rg[:, i, j] for j in range(3)] for i in range(3)]
    Xc = [r_[i][0] * Xg[:, 0] + r_[i][1] * Xg[:, 1]
          + r_[i][2] * Xg[:, 2] + tg[:, i] for i in range(3)]
    z = jnp.where(jnp.abs(Xc[2]) < 1e-6, 1e-6, Xc[2])
    iz = 1.0 / z
    u = Xc[0] * iz
    v = Xc[1] * iz
    rx = u - p.obs[:, 0]
    ry = v - p.obs[:, 1]
    n = jnp.sqrt(rx * rx + ry * ry)
    w = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(n, 1e-12)))
    w = jnp.where(n > _CUTOFF * huber_delta, 0.0, w)
    z_ok = p.obs_valid & (Xc[2] > 1e-6)
    w = w * (z_ok & p.point_valid[pid]).astype(dtype)

    # Jc rows (pose tangent [w|t], left-mult SE(3) — same algebra as
    # _linearize's -Jproj·hat(Xc) | Jproj, expanded to scalars)
    one = jnp.ones_like(u)
    Jc0 = [-u * v, 1.0 + u * u, -v, iz, 0.0 * one, -u * iz]
    Jc1 = [-(1.0 + v * v), u * v, u, 0.0 * one, iz, -v * iz]
    # Jp rows: Jproj @ R_wc  ->  iz*(r0k - u*r2k), iz*(r1k - v*r2k)
    Jp0 = [iz * (r_[0][k] - u * r_[2][k]) for k in range(3)]
    Jp1 = [iz * (r_[1][k] - v * r_[2][k]) for k in range(3)]
    Jc0 = [a * w for a in Jc0]
    Jc1 = [a * w for a in Jc1]
    Jp0 = [a * w for a in Jp0]
    Jp1 = [a * w for a in Jp1]
    rwx = rx * w
    rwy = ry * w

    iu6 = [(a, b) for a in range(6) for b in range(a, 6)]   # 21
    iu3 = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]  # 6
    cam_rows = (
        [Jc0[a] * Jc0[b] + Jc1[a] * Jc1[b] for a, b in iu6]
        + [Jc0[a] * rwx + Jc1[a] * rwy for a in range(6)]
    )
    W18 = [Jc0[a] * Jp0[k] + Jc1[a] * Jp1[k]
           for a in range(6) for k in range(3)]
    oc_f = [(cam == f).astype(dtype) for f in range(F)]
    pt_rows = (
        [Jp0[a] * Jp0[b] + Jp1[a] * Jp1[b] for a, b in iu3]
        + [Jp0[a] * rwx + Jp1[a] * rwy for a in range(3)]
        + [wab * of for of in oc_f for wab in W18]
    )
    # stack on axis 0 (cheap row concat; axis=-1 would interleave every
    # scalar across lanes) and keep the matmul outputs ROW-major SoA
    Vc = jnp.stack(cam_rows)               # (27,M)
    Vp = jnp.stack(pt_rows)                # (9+18F,M)
    ocT = (cam[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, F), 1)).astype(dtype)   # (M,F)
    opT = (pid[:, None] == jax.lax.broadcasted_iota(
        jnp.int32, (1, P), 1)).astype(dtype)   # (M,P)
    # (a HIGH-precision variant of these reductions measured no faster
    # on chip — the relay timing noise exceeds the 3-vs-6-pass delta at
    # this size — so they stay on the package-wide HIGHEST default)
    AcT = Vc @ ocT                         # (27,F)
    ApT = Vp @ opT                         # (9+18F,P) — SoA rows

    Hcc = jnp.zeros((F, 6, 6), dtype)
    for li, (a, b) in enumerate(iu6):
        Hcc = Hcc.at[:, a, b].set(AcT[li])
        if a != b:
            Hcc = Hcc.at[:, b, a].set(AcT[li])
    bc = AcT[21:27].T                      # (F,6)
    return Hcc, bc, ApT


def _solve_schur_soa(Hcc, bc, ApT, point_valid, lam, n_fix: int):
    """Schur elimination in SoA form (twin of `_solve_schur`; see
    `_linearize_soa`). ``ApT`` is the (9+18F,P) row-major point-side
    reduction: rows 0..5 Hpp triangle, 6..8 bp, then W[f,a,k] at row
    9 + f*18 + a*3 + k. The (P,3,3) inverse is the closed-form adjugate
    on (P,) scalars; T = W·Hpp⁻¹ is unrolled fused multiply-adds; the
    only dense contractions are two MXU matmuls (6F,3P)@(3P,6F) and the
    (6F,6F) reduced Cholesky."""
    F = Hcc.shape[0]
    P = ApT.shape[1]
    dtype = Hcc.dtype
    h = [ApT[i] for i in range(6)]         # 00,01,02,11,12,22
    bp3 = ApT[6:9]                         # (3,P)
    dmax = jnp.maximum(jnp.maximum(h[0], h[3]), h[5])
    damp = lam * jnp.maximum(dmax, 1e-6) + 1e-9
    pv = point_valid
    m00 = jnp.where(pv, h[0] + damp, 1.0)
    m01 = jnp.where(pv, h[1], 0.0)
    m02 = jnp.where(pv, h[2], 0.0)
    m11 = jnp.where(pv, h[3] + damp, 1.0)
    m12 = jnp.where(pv, h[4], 0.0)
    m22 = jnp.where(pv, h[5] + damp, 1.0)
    c00 = m11 * m22 - m12 * m12
    c01 = m02 * m12 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c11 = m00 * m22 - m02 * m02
    c12 = m01 * m02 - m00 * m12
    c22 = m00 * m11 - m01 * m01
    det = m00 * c00 + m01 * c01 + m02 * c02
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    idet = jnp.where(pv, 1.0 / det, 0.0)
    Hi = [[c00 * idet, c01 * idet, c02 * idet],
          [c01 * idet, c11 * idet, c12 * idet],
          [c02 * idet, c12 * idet, c22 * idet]]

    def Wfak(f, a, k):
        return ApT[9 + f * 18 + a * 3 + k]

    # T[f,a,k] = sum_j W[f,a,j] Hi[j,k]  — 54F fused (P,) multiply-adds
    A_rows = []   # A2[(f*6+a)*3+k] = T[f,a,k]
    B_rows = []   # B2[(f*6+a)*3+k] = W[f,a,k]
    for f in range(F):
        for a in range(6):
            for k in range(3):
                A_rows.append(Wfak(f, a, 0) * Hi[0][k]
                              + Wfak(f, a, 1) * Hi[1][k]
                              + Wfak(f, a, 2) * Hi[2][k])
                B_rows.append(Wfak(f, a, k))
    # rows ordered ((f,a),k): reshape (18F,P)->(6F,3P) keeps (k,p)
    # adjacent, so ONE matmul contracts both k and p
    A2 = jnp.stack(A_rows).reshape(6 * F, 3 * P)
    B2 = jnp.stack(B_rows).reshape(6 * F, 3 * P)
    S_off = A2 @ B2.T                      # (6F,6F)
    S = -S_off
    idx = jnp.arange(F)
    Sf = S.reshape(F, 6, F, 6)
    Sf = Sf.at[idx, :, idx, :].add(Hcc)
    Sf = Sf.reshape(6 * F, 6 * F)
    b = bc.reshape(6 * F) - A2 @ bp3.reshape(3 * P)
    dS = jnp.diag(Sf)
    prior = jnp.where(dS <= 0.0, 1.0, 0.0)
    Sf = Sf + jnp.diag(lam * jnp.maximum(dS, 1e-6) + 1e-9 + prior)
    kfix = 6 * n_fix
    dx_red = linalg.solve_psd(Sf[kfix:, kfix:], -b[kfix:], jitter=1e-12)
    dx = jnp.concatenate([jnp.zeros(kfix, dtype), dx_red]).reshape(F, 6)

    # back-substitute: rhs_k = -bp_k - sum_{f,a} W[f,a,k] dx[f,a]
    rhs = [-bp3[k] for k in range(3)]
    for f in range(F):
        for a in range(6):
            d = dx[f, a]
            for k in range(3):
                rhs[k] = rhs[k] - Wfak(f, a, k) * d
    dX = jnp.stack(
        [Hi[k][0] * rhs[0] + Hi[k][1] * rhs[1] + Hi[k][2] * rhs[2]
         for k in range(3)], axis=-1)
    return dx, dX


def _point_gather_plan(pid_idx, obs_valid, P: int, cap: int):
    """Scatter-free per-point reduction plan for a FIXED observation
    table: G[p, r] = index of point p's r-th valid observation (M when
    absent). XLA lowers ``segment_sum`` to a serial scatter-add — ~50 ms
    per (141k -> 16k x 3 x 3) assembly on v5e — while a padded gather +
    axis-sum is pure bandwidth. One argsort + one scatter here, then
    every LM iteration reduces with fixed-index gathers only. ``cap``
    bounds observations per point (the ring gives one per keyframe, so
    kf_cap is exact — nothing is dropped)."""
    M = pid_idx.shape[0]
    i32 = jnp.int32
    seg = jnp.where(obs_valid, pid_idx, P).astype(i32)
    order = jnp.argsort(seg).astype(i32)
    sorted_ids = seg[order]
    starts = jnp.searchsorted(sorted_ids, jnp.arange(P, dtype=i32))
    rank = (jnp.arange(M, dtype=i32)
            - starts[jnp.clip(sorted_ids, 0, P - 1)])
    ok = (sorted_ids < P) & (rank < cap)
    if debug.numeric_checks_enabled():
        # a too-small cap silently under-assembles the Hessian (rows past
        # cap are dropped); surface it under the opt-in sanitizer flag
        overflow = jnp.sum((sorted_ids < P) & (rank >= cap))

        def _check(n, _cap=int(cap)):
            if int(n):
                raise FloatingPointError(
                    f"_point_gather_plan: {int(n)} observations exceed "
                    f"max_obs_per_point={_cap} and would be dropped")

        jax.debug.callback(_check, overflow)
    G = jnp.full((P, cap), M, i32)
    G = G.at[jnp.where(ok, sorted_ids, P),
             jnp.clip(rank, 0, cap - 1)].set(order, mode="drop")
    return G


def _gathered_segment_sum(vals, G):
    """(M, ...) values -> (P, ...) per-point sums via the plan from
    ``_point_gather_plan`` (row M of the padded values is zero)."""
    pad = jnp.concatenate(
        [vals, jnp.zeros((1, *vals.shape[1:]), vals.dtype)])
    return pad[G].sum(axis=1)


@partial(jax.jit, static_argnames=("iters", "max_obs_per_point"))
def refine_points(p: BAProblem, iters: int = 5, lambda0: float = 1e-3,
                  huber_delta: float = 2e-3,
                  max_obs_per_point: int | None = None):
    """Structure-only LM: polish the map points against FROZEN poses.

    Monocular full-problem BA can lower reprojection error while bending
    the (weakly constrained) trajectory gauge — measured on the 47-frame
    ring it degrades ATE from 0.74% to 1.3% of extent. The final
    refinement therefore freezes poses and solves the embarrassingly
    batched per-point 3x3 GN systems only (the dual of the reference's
    cpp window BA, which updates poses and freezes points,
    cpp:1059-1060). Returns (X, info).

    ``max_obs_per_point``: when the caller can bound a point's valid
    observations (the keyframe ring gives exactly one per keyframe, so
    kf_cap is a tight bound) the per-point Hessian assembly runs
    scatter-free through ``_point_gather_plan`` — the TPU scatter-add
    that ``segment_sum`` lowers to dominated the finalize stage
    (~0.5 s of a 2.6 s single-scene run)."""
    eye3 = jnp.eye(3, dtype=p.X.dtype)
    P_ = p.X.shape[0]
    plan = (None if max_obs_per_point is None else
            _point_gather_plan(p.pid_idx, p.obs_valid, P_,
                               max_obs_per_point))

    def psum(vals):
        if plan is None:
            return jax.ops.segment_sum(vals, p.pid_idx, num_segments=P_)
        return _gathered_segment_sum(vals, plan)

    def lm_step(carry, _):
        X, lam, cost = carry
        r, Xc, z_ok = _project_residuals(
            p.R_wc, p.t_wc, X, p.cam_idx, p.pid_idx, p.obs, p.obs_valid
        )
        w = _huber_weight(r, huber_delta) * (
            z_ok & p.point_valid[p.pid_idx]
        ).astype(r.dtype)
        z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-6, 1e-6, Xc[:, 2])
        inv_z = 1.0 / z
        x, y = Xc[:, 0], Xc[:, 1]
        zero = jnp.zeros_like(inv_z)
        Jproj = jnp.stack(
            [
                jnp.stack([inv_z, zero, -x * inv_z * inv_z], axis=-1),
                jnp.stack([zero, inv_z, -y * inv_z * inv_z], axis=-1),
            ],
            axis=-2,
        )
        Jp = jnp.einsum("mij,mjk->mik", Jproj, p.R_wc[p.cam_idx])
        Jp = Jp * w[:, None, None]
        rw = r * w[:, None]
        Hpp = psum(jnp.einsum("mia,mib->mab", Jp, Jp))
        bp = psum(jnp.einsum("mia,mi->ma", Jp, rw))
        diag = jnp.einsum("pii->pi", Hpp)
        damp = lam * jnp.maximum(diag.max(-1), 1e-6)[:, None, None] + 1e-9
        Hd = Hpp + damp * eye3
        Hd = jnp.where(p.point_valid[:, None, None], Hd, eye3)
        dX = -jnp.einsum("pij,pj->pi", linalg.inv3(Hd), bp)
        X_try = jnp.where(p.point_valid[:, None], X + dX, X)
        new_cost = ba_cost_soa(p._replace(X=X_try), huber_delta)
        accept = new_cost < cost
        X = jnp.where(accept, X_try, X)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.3, lam * 2.0)
        return (X, lam, cost), cost

    cost0 = ba_cost_soa(p, huber_delta)
    lam0 = jnp.asarray(lambda0, p.X.dtype)
    (X, lam, cost), hist = jax.lax.scan(
        lm_step, (p.X, lam0, cost0), None, length=iters)
    return X, {"cost0": cost0, "cost": cost, "cost_hist": hist}


@partial(jax.jit, static_argnames=("iters", "n_fix", "update_points"))
def bundle_adjust(
    p: BAProblem,
    iters: int = 5,
    lambda0: float = 1e-3,
    huber_delta: float = 2e-3,
    n_fix: int = 1,
    update_points: bool = True,
):
    """Run ``iters`` LM steps with accept/reject. Returns
    (R_wc, t_wc, X, info dict)."""

    F = p.R_wc.shape[0]
    P = p.X.shape[0]
    # SoA fast path for window-sized problems (same threshold as the
    # one-hot assembly in _linearize); tensor + segment_sum otherwise
    soa = F * P <= 8192

    def lm_step(carry, _):
        R_wc, t_wc, X, lam, cost = carry
        cur = p._replace(R_wc=R_wc, t_wc=t_wc, X=X)
        if soa:
            Hcc, bc, ApT = _linearize_soa(cur, huber_delta)
            dx, dX = _solve_schur_soa(Hcc, bc, ApT,
                                      p.point_valid, lam, n_fix)
        else:
            Hcc, bc, Hpp, bp, W = _linearize(cur, huber_delta)
            dx, dX = _solve_schur(Hcc, bc, Hpp, bp, W, p.point_valid,
                                  lam, n_fix)
        # trial update: left-mult SE(3) on poses (ref cpp:1081-1095)
        dR = lie.so3_exp(dx[:, :3])
        R_try = dR @ R_wc
        t_try = jnp.einsum("fij,fj->fi", dR, t_wc) + dx[:, 3:]
        X_try = X + dX if update_points else X
        trial = p._replace(R_wc=R_try, t_wc=t_try, X=X_try)
        new_cost = (ba_cost_soa if soa else ba_cost)(trial, huber_delta)
        accept = new_cost < cost
        R_wc = jnp.where(accept, R_try, R_wc)
        t_wc = jnp.where(accept, t_try, t_wc)
        X = jnp.where(accept, X_try, X)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.3, lam * 2.0)  # ref py:839-843
        return (R_wc, t_wc, X, lam, cost), cost

    cost0 = (ba_cost_soa if soa else ba_cost)(p, huber_delta)
    lam0 = jnp.asarray(lambda0, p.R_wc.dtype)
    (R_wc, t_wc, X, lam, cost), cost_hist = jax.lax.scan(
        lm_step, (p.R_wc, p.t_wc, p.X, lam0, cost0), None, length=iters
    )
    info = {"cost0": cost0, "cost": cost, "cost_hist": cost_hist, "lambda": lam}
    return R_wc, t_wc, X, info

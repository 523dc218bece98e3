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


@partial(jax.jit, static_argnames=("iters",))
def refine_points(p: BAProblem, iters: int = 5, lambda0: float = 1e-3,
                  huber_delta: float = 2e-3):
    """Structure-only LM: polish the map points against FROZEN poses.

    Monocular full-problem BA can lower reprojection error while bending
    the (weakly constrained) trajectory gauge — measured on the 47-frame
    ring it degrades ATE from 0.74% to 1.3% of extent. The final
    refinement therefore freezes poses and solves the embarrassingly
    batched per-point 3x3 GN systems only (the dual of the reference's
    cpp window BA, which updates poses and freezes points,
    cpp:1059-1060). Returns (X, info)."""
    eye3 = jnp.eye(3, dtype=p.X.dtype)

    def lm_step(carry, _):
        X, lam, cost = carry
        cur = p._replace(X=X)
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
        P = p.X.shape[0]
        Hpp = jax.ops.segment_sum(
            jnp.einsum("mia,mib->mab", Jp, Jp), p.pid_idx, num_segments=P)
        bp = jax.ops.segment_sum(
            jnp.einsum("mia,mi->ma", Jp, rw), p.pid_idx, num_segments=P)
        diag = jnp.einsum("pii->pi", Hpp)
        damp = lam * jnp.maximum(diag.max(-1), 1e-6)[:, None, None] + 1e-9
        Hd = Hpp + damp * eye3
        Hd = jnp.where(p.point_valid[:, None, None], Hd, eye3)
        dX = -jnp.einsum("pij,pj->pi", linalg.inv3(Hd), bp)
        X_try = jnp.where(p.point_valid[:, None], X + dX, X)
        new_cost = ba_cost(p._replace(X=X_try), huber_delta)
        accept = new_cost < cost
        X = jnp.where(accept, X_try, X)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.3, lam * 2.0)
        return (X, lam, cost), cost

    cost0 = ba_cost(p, huber_delta)
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

    def lm_step(carry, _):
        R_wc, t_wc, X, lam, cost = carry
        cur = p._replace(R_wc=R_wc, t_wc=t_wc, X=X)
        Hcc, bc, Hpp, bp, W = _linearize(cur, huber_delta)
        dx, dX = _solve_schur(Hcc, bc, Hpp, bp, W, p.point_valid, lam, n_fix)
        # trial update: left-mult SE(3) on poses (ref cpp:1081-1095)
        dR = lie.so3_exp(dx[:, :3])
        R_try = dR @ R_wc
        t_try = jnp.einsum("fij,fj->fi", dR, t_wc) + dx[:, 3:]
        X_try = X + dX if update_points else X
        trial = p._replace(R_wc=R_try, t_wc=t_try, X=X_try)
        new_cost = ba_cost(trial, huber_delta)
        accept = new_cost < cost
        R_wc = jnp.where(accept, R_try, R_wc)
        t_wc = jnp.where(accept, t_try, t_wc)
        X = jnp.where(accept, X_try, X)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.3, lam * 2.0)  # ref py:839-843
        return (R_wc, t_wc, X, lam, cost), cost

    cost0 = ba_cost(p, huber_delta)
    lam0 = jnp.asarray(lambda0, p.R_wc.dtype)
    (R_wc, t_wc, X, lam, cost), cost_hist = jax.lax.scan(
        lm_step, (p.R_wc, p.t_wc, p.X, lam0, cost0), None, length=iters
    )
    info = {"cost0": cost0, "cost": cost, "cost_hist": cost_hist, "lambda": lam}
    return R_wc, t_wc, X, info

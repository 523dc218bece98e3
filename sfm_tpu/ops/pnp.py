"""Robust 3D-2D (PnP) pose refinement against the sparse map.

The reference chains two-view essential-matrix estimates for every new
keyframe (cpp:1739/1762, py:900-913/1044), which in narrow-FOV
small-baseline geometry has a rotation/translation ambiguity basin. A
TPU-first framework can afford the structurally better approach used by
production SLAM: once a map exists, the new pose comes from robust
Gauss-Newton on 3D→2D reprojection (single camera, points fixed) — no
scale or direction ambiguity. Residuals/Jacobians are the same analytic
forms as the BA pose block (ref cpp:944-976), batched over observations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from sfm_tpu.ops import lie, linalg

_CUTOFF = 10.0


def _residuals(R_wc, t_wc, X, obs):
    Xc = jnp.einsum("ij,mj->mi", R_wc, X) + t_wc
    z = Xc[:, 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    r = Xc[:, :2] / z_safe[:, None] - obs
    return r, Xc, z > 1e-6


def pnp_cost(R_wc, t_wc, X, obs, valid, huber_delta):
    r, _, z_ok = _residuals(R_wc, t_wc, X, obs)
    n = jnp.linalg.norm(r, axis=-1)
    quad = 0.5 * n * n
    lin = huber_delta * (n - 0.5 * huber_delta)
    rho = jnp.where(n <= huber_delta, quad, lin)
    cap = huber_delta * (_CUTOFF * huber_delta - 0.5 * huber_delta)
    rho = jnp.minimum(rho, cap)
    rho = jnp.where(z_ok, rho, jnp.where(valid, 2.0 * cap + 1.0, 0.0))
    return jnp.sum(jnp.where(valid, rho, 0.0))


@partial(jax.jit, static_argnames=("iters",))
def refine_pose(R0, t0, X, obs, valid, iters: int = 10,
                lambda0: float = 1e-4, huber_delta: float = 2e-3):
    """Robust LM pose refinement (world→cam R0,t0 init; K-normalized obs).

    Returns (R_wc, t_wc, info) with inlier stats at the solution."""
    dtype = X.dtype

    def lm_step(carry, _):
        R, t, lam, cost = carry
        r, Xc, z_ok = _residuals(R, t, X, obs)
        n = jnp.linalg.norm(r, axis=-1)
        w = jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(n, 1e-12)))
        # adaptive gross-outlier gate: a fixed multiple of huber_delta
        # would also cut true points when the INIT error exceeds it, so
        # widen by the current robust residual scale
        med = jnp.nanmedian(jnp.where(valid & z_ok, n, jnp.nan))
        med = jnp.nan_to_num(med, nan=huber_delta)
        cut = jnp.maximum(_CUTOFF * huber_delta, 3.0 * med)
        w = jnp.where(n > cut, 0.0, w)
        w = w * (valid & z_ok).astype(dtype)
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
        Jw = -jnp.einsum("mij,mjk->mik", Jproj, lie.hat(Xc))
        J = jnp.concatenate([Jw, Jproj], axis=-1) * w[:, None, None]
        rw = r * w[:, None]
        H = jnp.einsum("mia,mib->ab", J, J)
        g = jnp.einsum("mia,mi->a", J, rw)
        H = H + jnp.diag(lam * jnp.maximum(jnp.diag(H), 1e-8) + 1e-10)
        dx = -linalg.solve_psd_small(H, g, jitter=1e-12)
        dR = lie.so3_exp(dx[:3])
        R_try = dR @ R
        t_try = dR @ t + dx[3:]
        new_cost = pnp_cost(R_try, t_try, X, obs, valid, huber_delta)
        accept = new_cost < cost
        R = jnp.where(accept, R_try, R)
        t = jnp.where(accept, t_try, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.3, lam * 2.0)
        return (R, t, lam, cost), cost

    cost0 = pnp_cost(R0, t0, X, obs, valid, huber_delta)
    (R, t, lam, cost), hist = jax.lax.scan(
        lm_step, (R0, t0, jnp.asarray(lambda0, dtype), cost0), None,
        length=iters,
    )
    r, _, z_ok = _residuals(R, t, X, obs)
    n = jnp.linalg.norm(r, axis=-1)
    inl = valid & z_ok & (n < 3.0 * huber_delta)
    info = {"cost0": cost0, "cost": cost,
            "inliers": jnp.sum(inl).astype(jnp.int32),
            "inlier_rms": jnp.sqrt(
                jnp.sum(jnp.where(inl, n * n, 0.0))
                / jnp.maximum(jnp.sum(inl), 1)
            )}
    return R, t, info

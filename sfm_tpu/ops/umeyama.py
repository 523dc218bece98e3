"""Umeyama Sim(3)/SE(3) alignment and ATE metrics in JAX.

In-process equivalent of the reference's C++ evaluation tools
(reference: cpp/tools/ate_keyframes.cpp:334-389 ``umeyama``,
cpp/tools/ate_two_frames.cpp:243-316 closed-form two-point alignment,
cpp/tools/gt_keyframe_edge.cpp:333-384 relative-edge errors). The C++
re-implementations with the same CLIs live in /cpp/tools; this module is
the jittable version used by tests and the in-loop metrics.
"""

from __future__ import annotations

import jax.numpy as jnp

from sfm_tpu.ops import lie, linalg


def umeyama(src, dst, with_scale: bool = True):
    """Least-squares similarity transform aligning src -> dst.

    Args:
      src, dst: (N,3) point sets.
      with_scale: Sim(3) if True, SE(3) (s=1) if False.
    Returns:
      (s, R, t) with dst ≈ s * R @ src + t.
    """
    n = src.shape[0]
    mu_s = jnp.mean(src, axis=0)
    mu_d = jnp.mean(dst, axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = (xd.T @ xs) / n  # (1/N) Σ yx^T, ref ate_keyframes.cpp:338-363
    u, s, vt = linalg.svd3_jacobi(cov)
    d = jnp.sign(linalg.det3(u) * linalg.det3(vt))
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=cov.dtype)).at[2, 2].set(d)
    R = u @ D @ vt
    var_s = jnp.sum(xs * xs) / n
    scale = jnp.where(
        jnp.asarray(with_scale),
        jnp.sum(s * jnp.diag(D)) / jnp.maximum(var_s, 1e-18),
        1.0,
    )
    t = mu_d - scale * R @ mu_s
    return scale, R, t


def ate(est, gt, with_scale: bool = True):
    """Absolute trajectory error after Umeyama alignment.

    Returns dict with rmse/mean/median/max and per-point errors,
    matching ate_keyframes.cpp:442-474 outputs.
    """
    s, R, t = umeyama(est, gt, with_scale)
    aligned = s * est @ R.T + t
    err = jnp.linalg.norm(aligned - gt, axis=-1)
    return {
        "rmse": jnp.sqrt(jnp.mean(err**2)),
        "mean": jnp.mean(err),
        "median": jnp.median(err),
        "max": jnp.max(err),
        "per_point": err,
        "scale": s,
    }


def edge_errors(R_est, t_est, R_gt, t_gt):
    """Relative-edge rotation error (deg) and translation-direction error
    (deg, min vs ±GT direction) — ref gt_keyframe_edge.cpp:377-384."""
    dR = R_est @ jnp.swapaxes(R_gt, -1, -2)
    rot_err = jnp.linalg.norm(lie.so3_log(dR), axis=-1) * (180.0 / jnp.pi)
    a = t_est / (jnp.linalg.norm(t_est, axis=-1, keepdims=True) + 1e-18)
    b = t_gt / (jnp.linalg.norm(t_gt, axis=-1, keepdims=True) + 1e-18)
    c = jnp.clip(jnp.abs(jnp.sum(a * b, axis=-1)), 0.0, 1.0)
    trans_err = jnp.arccos(c) * (180.0 / jnp.pi)
    return rot_err, trans_err

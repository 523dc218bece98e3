"""SO(3)/SE(3) Lie-group operations — jittable, vmappable, differentiable.

TPU-native replacement for the reference's scalar Rodrigues code
(reference: cpp/include/linalg.hpp:90-124 ``so3_exp``/``so3_log``,
cpp/include/so3.hpp hat/vee, python/src/templering_sfm.py:86-93
``rot_log``/``rot_exp`` via cv2.Rodrigues). All functions operate on
trailing (3,)/(3,3) dims and broadcast over arbitrary leading batch dims,
so ``jax.vmap`` is never required but always valid.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def hat(w):
    """(...,3) -> (...,3,3) skew-symmetric matrix. ref: so3.hpp:8-14."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    rows = jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )
    return rows


def vee(W):
    """(...,3,3) skew -> (...,3). ref: so3.hpp:16-18."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w):
    """Rodrigues formula exp: so(3) vector -> rotation matrix.

    Small-angle-safe via Taylor branches on the sinc coefficients
    (ref: linalg.hpp:90-108 has the same two-branch structure).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # a = sin(t)/t, b = (1-cos(t))/t^2, with Taylor fallbacks near 0
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Rotation matrix -> so(3) vector; robust near theta=0 and theta=pi.

    ref: linalg.hpp:111-124 uses the plain trace formula; we add the
    near-pi branch (axis from the dominant diagonal of (R+I)/2) so that
    loop-closure edges with large rotations stay well-defined.
    """
    dtype = R.dtype
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # clip strictly inside (-1, 1): arccos' gradient is -1/sqrt(1-x^2),
    # which is NaN at exactly +-1 (e.g. jacfwd of a pose graph whose
    # residual rotation is exactly identity). The margin must scale with
    # the dtype's eps — a fixed 1e-12 rounds to exactly 1.0 in f32
    # (eps ~ 1.2e-7) and the guard becomes a no-op. With 10*eps the
    # boundary gradient is finite in both precisions; the induced value
    # error in w is O(theta_clip^2/12 * |v|) ~ 2e-7 relative in f32,
    # far below tracking noise, and ~4e-15 in f64.
    margin = 10.0 * jnp.finfo(dtype).eps
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0 + margin, 1.0 - margin)
    theta = jnp.arccos(cos_t)
    sin_t = jnp.sin(theta)

    # generic branch: w = theta/(2 sin t) * vee(R - R^T)
    v = vee(R - jnp.swapaxes(R, -1, -2))
    generic_scale = jnp.where(
        theta < 1e-5,
        0.5 + theta * theta / 12.0,  # Taylor of theta/(2 sin theta)
        theta / (2.0 * sin_t + _EPS),
    )
    w_generic = generic_scale[..., None] * v

    # near-pi branch: R ~= 2 a a^T - I  =>  a a^T = (R + I)/2
    B = (R + jnp.broadcast_to(jnp.eye(3, dtype=dtype), R.shape)) * 0.5
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(B, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / (jnp.linalg.norm(col, axis=-1, keepdims=True) + _EPS)
    # fix sign so that vee(R - R^T) agrees (sin t may be tiny but signed)
    sign = jnp.where(jnp.sum(axis * v, axis=-1, keepdims=True) < 0.0, -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign

    near_pi = (jnp.pi - theta) < 1e-3
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def quat_to_rot(q):
    """Unit quaternion (w,x,y,z) -> rotation matrix; used by synthetic data."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


# ---------------------------------------------------------------------------
# SE(3) poses.  Convention matches the reference: a pose is stored either
# as camera-to-world (R_cw, t_cw) — "PoseCW", py:99-135 / cpp:157-178 — or
# world-to-camera (R_wc, t_wc) — "PoseWC".  We represent a pose batch as a
# pair of arrays (R: (...,3,3), t: (...,3)).
# ---------------------------------------------------------------------------


def pose_inv(R, t):
    """Invert an SE(3) transform: (R, t) -> (R^T, -R^T t)."""
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def pose_compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): apply b first, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def compose_right_inv_ij(R_cw, t_cw, R_ji, t_ji):
    """Next camera-to-world pose from current pose and relative pose i->j.

    ref: py:117-127 ``PoseCW.compose_right_inv_ij`` / cpp:170-178.
    If T_cw maps cam_i->world and T_ji maps cam_i->cam_j (x_j = R_ji x_i + t_ji),
    then T_cw' = T_cw ∘ T_ji^{-1} maps cam_j->world.
    """
    R_ij, t_ij = pose_inv(R_ji, t_ji)
    return pose_compose(R_cw, t_cw, R_ij, t_ij)


def se3_exp(xi):
    """(...,6) twist [w | v] -> (R, t) with exact V(w) integration."""
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    R = so3_exp(w)
    W = hat(w)
    W2 = W @ W
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2 * theta + _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    return R, jnp.einsum("...ij,...j->...i", V, v)


def se3_log(R, t):
    """(R, t) -> (...,6) twist [w | v]."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-8
    # V^{-1} = I - W/2 + (1/theta^2)(1 - a/(2b)) W^2,  a=sinc, b=(1-cos)/t^2
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - a / (2.0 * b)) / (theta2 + _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    Vinv = eye - 0.5 * W + coef[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def rvec_from_R(R):
    """Alias matching the reference exporter naming (cpp so3.hpp:20-23)."""
    return so3_log(R)

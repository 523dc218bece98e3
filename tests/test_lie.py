"""Unit tests for SO(3)/SE(3) ops against closed forms (SURVEY §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sfm_tpu.ops import lie


pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


def random_rotations(n, rng, max_angle=np.pi * 0.98):
    axes = rng.standard_normal((n, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angles = rng.uniform(0, max_angle, size=(n, 1))
    return np.asarray(lie.so3_exp(jnp.asarray(axes * angles)))


def test_exp_log_roundtrip(rng):
    w = rng.standard_normal((64, 3))
    w = w / np.linalg.norm(w, axis=1, keepdims=True) * rng.uniform(1e-4, 3.0, (64, 1))
    R = lie.so3_exp(jnp.asarray(w))
    w2 = lie.so3_log(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-9)


def test_exp_small_angle(rng):
    w = rng.standard_normal((16, 3)) * 1e-7
    R = lie.so3_exp(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(lie.so3_log(R)), w, atol=1e-12)
    # orthonormality
    RtR = np.einsum("nij,nik->njk", np.asarray(R), np.asarray(R))
    np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), RtR.shape), atol=1e-12)


def test_log_near_pi(rng):
    axes = rng.standard_normal((32, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    w = axes * (np.pi - 1e-5)
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    # log may return ±axis*theta near pi; compare rotations
    R2 = np.asarray(lie.so3_exp(jnp.asarray(w2)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-4)


def test_hat_vee(rng):
    w = rng.standard_normal((8, 3))
    W = lie.hat(jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(lie.vee(W)), w)
    v = rng.standard_normal((8, 3))
    cross = np.cross(w, v)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("nij,nj->ni", W, jnp.asarray(v))), cross, atol=1e-12
    )


def test_pose_inverse_compose(rng):
    R = random_rotations(16, rng)
    t = rng.standard_normal((16, 3))
    Ri, ti = lie.pose_inv(jnp.asarray(R), jnp.asarray(t))
    Rc, tc = lie.pose_compose(jnp.asarray(R), jnp.asarray(t), Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-10)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-10)


def test_compose_right_inv_ij_matches_reference_semantics(rng):
    """x_j = R_ji x_i + t_ji; pose_cw' maps cam_j -> world (ref py:117-127)."""
    R_cw = random_rotations(1, rng)[0]
    t_cw = rng.standard_normal(3)
    R_ji = random_rotations(1, rng)[0]
    t_ji = rng.standard_normal(3)
    R2, t2 = lie.compose_right_inv_ij(
        jnp.asarray(R_cw), jnp.asarray(t_cw), jnp.asarray(R_ji), jnp.asarray(t_ji)
    )
    # a point at camera-j origin: x_i = R_ji^{-1}(0 - t_ji); world = R_cw x_i + t_cw
    x_i = R_ji.T @ (-t_ji)
    world = R_cw @ x_i + t_cw
    np.testing.assert_allclose(np.asarray(t2), world, atol=1e-12)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.standard_normal((32, 6))
    R, t = lie.se3_exp(jnp.asarray(xi))
    xi2 = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-8)


def test_jit_and_grad():
    w = jnp.array([0.1, -0.2, 0.3])

    def f(w):
        return jnp.sum(lie.so3_log(lie.so3_exp(w)) ** 2)

    g = jax.jit(jax.grad(f))(w)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(w), atol=1e-6)


def test_np_geom_matches_jax(rng):
    """Host-side numpy twins must agree with the jittable ops."""
    from sfm_tpu.utils import np_geom

    for _ in range(8):
        w = rng.standard_normal(3)
        R_j = np.asarray(lie.so3_exp(jnp.asarray(w)))
        R_n = np_geom.so3_exp(w)
        np.testing.assert_allclose(R_n, R_j, atol=1e-12)
        np.testing.assert_allclose(np_geom.so3_log(R_n),
                                   np.asarray(lie.so3_log(jnp.asarray(R_j))),
                                   atol=1e-9)
    K = np.array([[800.0, 2.0, 320.0], [0, 790.0, 240.0], [0, 0, 1.0]])
    pts = rng.uniform(0, 640, (32, 2))
    from sfm_tpu.ops import epipolar

    np.testing.assert_allclose(
        np_geom.normalize_by_K(K, pts),
        np.asarray(epipolar.normalize_by_K(jnp.asarray(K), jnp.asarray(pts))),
        atol=1e-12,
    )

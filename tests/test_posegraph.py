"""Pose-graph optimization tests (SURVEY §4: SE(3) GN on synthetic
graphs with known GT; both reference flavors)."""

import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import lie, posegraph as pg


def ring_poses(n, radius=1.0):
    """Cameras on a ring looking at the center (cam->world)."""
    Rs, Cs = [], []
    for k in range(n):
        phi = 2 * np.pi * k / n
        C = radius * np.array([np.cos(phi), np.sin(phi), 0.0])
        z = -C / np.linalg.norm(C)
        up = np.array([0.0, 0.0, 1.0])
        x = np.cross(z, up)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R_wc = np.stack([x, y, z])
        Rs.append(R_wc.T)  # cam->world
        Cs.append(C)
    return np.stack(Rs), np.stack(Cs)


def make_problem(rng, n=12, drift_rot=0.03, drift_tr=0.02, loop=True,
                 mode_full=True):
    R_gt, C_gt = ring_poses(n)
    edges = [(k, k + 1) for k in range(n - 1)]
    if loop:
        edges.append((0, n - 1))
    E = len(edges)
    e_i = np.array([e[0] for e in edges], np.int32)
    e_j = np.array([e[1] for e in edges], np.int32)
    R_meas = np.zeros((E, 3, 3))
    t_meas = np.zeros((E, 3))
    for k, (i, j) in enumerate(edges):
        R_ji = R_gt[j].T @ R_gt[i]
        t_ji = R_gt[j].T @ (C_gt[i] - C_gt[j])
        R_meas[k] = R_ji
        t_meas[k] = t_ji
    # drifted initialization (accumulating noise, pose 0 exact)
    R0 = [R_gt[0]]
    C0 = [C_gt[0]]
    dR = np.eye(3)
    dC = np.zeros(3)
    for k in range(1, n):
        dR = dR @ np.asarray(lie.so3_exp(jnp.asarray(rng.standard_normal(3) * drift_rot)))
        dC = dC + rng.standard_normal(3) * drift_tr
        R0.append(dR @ R_gt[k])
        C0.append(C_gt[k] + dC)
    prob = pg.PoseGraphProblem(
        R_cw=jnp.asarray(np.stack(R0)),
        C=jnp.asarray(np.stack(C0)),
        e_i=jnp.asarray(e_i),
        e_j=jnp.asarray(e_j),
        R_meas=jnp.asarray(R_meas),
        t_meas=jnp.asarray(t_meas),
        w_rot=jnp.ones(E),
        w_trans=jnp.ones(E),
        valid=jnp.ones(E, bool),
    )
    return prob, R_gt, C_gt


def test_se3_full_mode_recovers_ring(rng):
    prob, R_gt, C_gt = make_problem(rng)
    R, C, info = pg.optimize_se3(prob, mode="full", iters=15)
    assert float(info["cost"]) < 1e-10 * max(float(info["cost0"]), 1.0)
    np.testing.assert_allclose(np.asarray(C), C_gt, atol=1e-5)
    for k in range(len(C_gt)):
        dR = np.asarray(R[k]) @ R_gt[k].T
        ang = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR))))
        assert ang < 1e-5, (k, ang)


def test_se3_dir_mode_converges(rng):
    """dir mode fixes directions only; centers recover up to per-edge
    lengths (which the ring's loop constraint then pins down)."""
    prob, R_gt, C_gt = make_problem(rng)
    R, C, info = pg.optimize_se3(prob, mode="dir", iters=15)
    assert float(info["cost"]) < 0.01 * float(info["cost0"])
    # rotations must be exact (rot residual is mode-independent)
    for k in range(len(C_gt)):
        dR = np.asarray(R[k]) @ R_gt[k].T
        ang = np.linalg.norm(np.asarray(lie.so3_log(jnp.asarray(dR))))
        assert ang < 1e-4, (k, ang)


def test_centers_mode_straightens_drift(rng):
    prob, R_gt, C_gt = make_problem(rng)
    R, C, _ = pg.optimize_centers(prob)
    # rotations untouched by design (cpp:1131-1197)
    np.testing.assert_allclose(np.asarray(R), np.asarray(prob.R_cw))
    # centers move toward consistency: residual drops
    def center_cost(Cx):
        r = 0.0
        Cx = np.asarray(Cx)
        for k in range(int(prob.e_i.shape[0])):
            i, j = int(prob.e_i[k]), int(prob.e_j[k])
            Ri = np.asarray(prob.R_cw[i])
            d = Ri @ (-np.asarray(prob.R_meas[k]).T @ np.asarray(prob.t_meas[k]))
            d = d / np.linalg.norm(d)
            dm = d * np.linalg.norm(Cx[j] - Cx[i])
            r += np.sum(((Cx[j] - Cx[i]) - dm) ** 2)
        return r
    assert center_cost(C) < 0.2 * center_cost(prob.C) + 1e-12


def test_padding_invariance(rng):
    prob, R_gt, C_gt = make_problem(rng)
    R1, C1, _ = pg.optimize_se3(prob, mode="full", iters=8)
    n, e = prob.C.shape[0], prob.e_i.shape[0]
    prob2 = pg.PoseGraphProblem(
        R_cw=jnp.concatenate([prob.R_cw, jnp.tile(jnp.eye(3), (4, 1, 1))]),
        C=jnp.concatenate([prob.C, jnp.zeros((4, 3))]),
        e_i=jnp.concatenate([prob.e_i, jnp.zeros(4, jnp.int32)]),
        e_j=jnp.concatenate([prob.e_j, jnp.zeros(4, jnp.int32)]),
        R_meas=jnp.concatenate([prob.R_meas, jnp.tile(jnp.eye(3), (4, 1, 1))]),
        t_meas=jnp.concatenate([prob.t_meas, jnp.zeros((4, 3))]),
        w_rot=jnp.concatenate([prob.w_rot, jnp.ones(4)]),
        w_trans=jnp.concatenate([prob.w_trans, jnp.ones(4)]),
        valid=jnp.concatenate([prob.valid, jnp.zeros(4, bool)]),
    )
    R2, C2, _ = pg.optimize_se3(prob2, mode="full", iters=8)
    np.testing.assert_allclose(np.asarray(C1), np.asarray(C2)[:n], atol=1e-8)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2)[:n], atol=1e-8)

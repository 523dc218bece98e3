"""Geometry export models: sparse Delaunay mesh + dense stereo grid mesh.

Sparse mesh — TPU-hostile irregular triangulation stays host-side
(reference: cpp/src/templering_sfm.cpp:1245-1461 hand-rolled
Bowyer-Watson ``delaunay_triangulate_2d`` + ``build_mesh_from_sparse_
points``): we project map points into a chosen keyframe on device, do
the grid-cell dedup and edge-length filtering in numpy, and use
scipy.spatial.Delaunay (Qhull) for the triangulation itself.

Dense stereo mesh (reference: python/src/templering_sfm.py:1099-1266 —
cv2.stereoRectify + StereoSGBM + reprojectImageTo3D + subsampled grid):
re-designed as a batched JAX cost-volume block matcher: rectification is
a pair of rotation homographies applied by bilinear warp, matching cost
is a (D,H,W) SAD volume built with the box-filter prefix sums, disparity
is an argmin with parabolic subpixel refinement and left-right
consistency gating — all one jitted program on the MXU/VPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import image as im


# ---------------------------------------------------------------------------
# sparse Delaunay mesh (cpp semantics)
# ---------------------------------------------------------------------------


def build_sparse_mesh(K, kf, points_xyz, max_points: int = 2500,
                      grid_px: int = 4, max_edge_px: float = 80.0,
                      seed: int = 42):
    """Project map points into keyframe ``kf``, grid-dedup, Delaunay,
    reject long-edged triangles. Returns (vertices_world (V,3),
    faces (F,3)). ref: cpp:1371-1461."""
    from scipy.spatial import Delaunay, QhullError

    R_wc, t_wc = kf.pose_wc
    X = np.asarray(points_xyz, np.float64)
    if len(X) < 3:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    Xc = X @ R_wc.T + t_wc
    z = Xc[:, 2]
    uvh = Xc @ np.asarray(K, np.float64).T
    uv = uvh[:, :2] / np.where(np.abs(uvh[:, 2:3]) < 1e-12, 1e-12, uvh[:, 2:3])
    H, W = 2.0 * K[1, 2], 2.0 * K[0, 2]
    ok = (z > 1e-6) & (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    idx = np.nonzero(ok)[0]
    if len(idx) < 3:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)

    # grid-cell dedup with seeded shuffle (ref cpp:1412-1438)
    rng = np.random.default_rng(seed)
    order = rng.permutation(idx)
    seen: dict[tuple, int] = {}
    for i in order:
        cell = (int(uv[i, 0] // grid_px), int(uv[i, 1] // grid_px))
        if cell not in seen:
            seen[cell] = i
        if len(seen) >= max_points:
            break
    keep = np.array(sorted(seen.values()))
    pts2 = uv[keep]
    try:
        tri = Delaunay(pts2)
    except QhullError:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    faces = tri.simplices
    # reject triangles with any pixel edge > max_edge_px (ref cpp:1449-1459)
    a, b, c = pts2[faces[:, 0]], pts2[faces[:, 1]], pts2[faces[:, 2]]
    ok_f = (
        (np.linalg.norm(a - b, axis=1) <= max_edge_px)
        & (np.linalg.norm(b - c, axis=1) <= max_edge_px)
        & (np.linalg.norm(c - a, axis=1) <= max_edge_px)
    )
    return X[keep], faces[ok_f]


# ---------------------------------------------------------------------------
# dense stereo grid mesh (python semantics, TPU block matcher)
# ---------------------------------------------------------------------------


def _rectify_rotations(R_ji, t_ji):
    """Minimal stereoRectify: rotations R1,R2 bringing both cameras to a
    common fronto-parallel frame with baseline along +x
    (cv2.stereoRectify's core geometry, ref py:1148-1152)."""
    t = t_ji / (np.linalg.norm(t_ji) + 1e-18)
    # new x-axis along the baseline (cam1 -> cam2 direction in cam1 frame
    # is -R_ji^T t_ji)
    e1 = -R_ji.T @ t
    e1 = e1 / np.linalg.norm(e1)
    z = np.array([0.0, 0.0, 1.0])
    e2 = np.cross(z, e1)
    n2 = np.linalg.norm(e2)
    if n2 < 1e-9:
        e2 = np.array([0.0, 1.0, 0.0])
    else:
        e2 = e2 / n2
    e3 = np.cross(e1, e2)
    R_rect = np.stack([e1, e2, e3])  # cam1 -> rectified
    R1 = R_rect
    R2 = R_rect @ R_ji.T
    return R1, R2


_COST_INVALID = 1e6  # wrapped-region sentinel, pre-aggregation


def _sgm_scan(vol_nhd, P1: float, P2: float):
    """One-direction semi-global aggregation (the SGM recurrence of
    StereoSGBM, ref py:1168-1182) along the leading axis of a
    (N,H,D)-ordered cost volume, as a ``lax.scan``:

      L(p,d) = C(p,d) + min(L(q,d), L(q,d±1)+P1, min_d' L(q,d')+P2)
                      - min_d' L(q,d')
    """
    inf = jnp.asarray(jnp.inf, vol_nhd.dtype)

    def step(Lp, C):
        m = jnp.min(Lp, axis=-1, keepdims=True)  # (H,1)
        dm = jnp.concatenate([jnp.full_like(Lp[:, :1], inf), Lp[:, :-1]], -1)
        dp = jnp.concatenate([Lp[:, 1:], jnp.full_like(Lp[:, :1], inf)], -1)
        cand = jnp.minimum(
            jnp.minimum(Lp, m + P2),
            jnp.minimum(dm, dp) + P1,
        )
        L = C + cand - m
        return L, L

    _, Ls = jax.lax.scan(step, vol_nhd[0], vol_nhd[1:])
    return jnp.concatenate([vol_nhd[:1], Ls], axis=0)


def _sgm_aggregate(vol, P1: float, P2: float):
    """4-direction (left/right/up/down) semi-global sum over a (D,H,W)
    cost volume. Wrapped-region sentinel lanes keep their huge cost
    through the recurrence: L for an invalid lane stays ~_COST_INVALID
    (C dominates, and cand-m is bounded by the valid lanes' spread), so
    it never wins any min reduction — neither the normalizing m nor the
    d±1/P2 candidates of neighboring valid lanes. (Zeroing them instead
    makes the artificial 0 the per-pixel MINIMUM, capping every valid
    lane's aggregated cost near the border — the opposite of holding
    them out.) The sentinel is re-imposed exactly on the output."""
    invalid = vol >= _COST_INVALID
    v = vol
    whd = v.transpose(2, 1, 0)  # (W,H,D)
    agg = _sgm_scan(whd, P1, P2)  # left -> right
    agg = agg + _sgm_scan(whd[::-1], P1, P2)[::-1]  # right -> left
    hwd = v.transpose(1, 2, 0)  # (H,W,D)
    aggv = _sgm_scan(hwd, P1, P2)  # top -> bottom
    aggv = aggv + _sgm_scan(hwd[::-1], P1, P2)[::-1]  # bottom -> top
    out = agg.transpose(2, 1, 0) + aggv.transpose(2, 0, 1)
    return jnp.where(invalid, 4.0 * _COST_INVALID, out)


@partial(jax.jit, static_argnames=("num_disp", "block_radius", "sgm"))
def _disparity_sad(img_l, img_r, num_disp: int, block_radius: int,
                   sgm: bool = True):
    """(H,W) rectified pair -> disparity. Replaces StereoSGBM
    (py:1168-1182): a (D,H,W) SAD volume of box-filtered absolute-
    difference planes, 4-direction semi-global aggregation (``sgm``;
    disable for the plain block matcher), winner-take-all with parabolic
    subpixel refinement, and left-right consistency gating derived from
    the same aggregated volume (vol_r[d,y,x] = vol_l[d,y,x+d])."""
    H, W = img_l.shape

    def cost_plane(d):
        shifted = jnp.roll(img_r, d, axis=1)
        # invalidate wrapped region
        colmask = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) >= d
        ad = jnp.abs(img_l - shifted)
        ad = jnp.where(colmask, ad, _COST_INVALID)
        return im.box_filter(ad, block_radius)

    vol = jax.vmap(cost_plane)(jnp.arange(num_disp))  # (D,H,W)
    if sgm:
        # cv2.StereoSGBM penalty convention: P1 = 8*blockSize^2,
        # P2 = 32*blockSize^2 (costs here are block SUMS of |dI|)
        win = float((2 * block_radius + 1) ** 2)
        vol = _sgm_aggregate(vol, 8.0 * win, 32.0 * win)
    best = jnp.argmin(vol, axis=0)  # (H,W)
    dm1 = jnp.clip(best - 1, 0, num_disp - 1)
    dp1 = jnp.clip(best + 1, 0, num_disp - 1)

    def take(d_idx):
        return jnp.take_along_axis(vol, d_idx[None], axis=0)[0]

    c0 = take(best)
    cm = take(dm1)
    cp = take(dp1)
    denom = cm + cp - 2.0 * c0
    sub = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (cm - cp) / denom, 0.0)
    disp = best.astype(img_l.dtype) + jnp.clip(sub, -0.5, 0.5)

    # left-right consistency from the same (aggregated) volume:
    # vol_r[d, y, xr] = vol_l[d, y, xr + d]
    xs = jax.lax.broadcasted_iota(jnp.int32, (num_disp, H, W), 2)
    ds = jax.lax.broadcasted_iota(jnp.int32, (num_disp, H, W), 0)
    xl = jnp.minimum(xs + ds, W - 1)
    vol_r = jnp.take_along_axis(vol, xl, axis=2)
    best_r = jnp.argmin(vol_r, axis=0)
    xr = jnp.clip(xs[0] - best, 0, W - 1)
    d_r = jnp.take_along_axis(best_r, xr, axis=1)
    lr_ok = jnp.abs(best - d_r) <= 1
    return disp, lr_ok


def export_stereo_grid_mesh(K, kf1, kf2, img1_u8, img2_u8, cfg):
    """Dense mesh from one rectified keyframe pair (ref py:1099-1266).

    Returns (vertices_world, faces). ``cfg`` is a StereoMeshConfig."""
    # relative pose cam1 -> cam2
    R1_cw, t1_cw = kf1.R_cw, kf1.t_cw
    R_ji = kf2.R_cw.T @ kf1.R_cw
    Rwj, twj = kf2.pose_wc
    t_ji = Rwj @ kf1.t_cw + twj
    baseline = float(np.linalg.norm(t_ji))
    if baseline < 1e-9:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    Rr1, Rr2 = _rectify_rotations(R_ji, t_ji)

    K = np.asarray(K, np.float64)
    Kinv = np.linalg.inv(K)
    H, W = img1_u8.shape

    # inverse warp: rectified pixel -> original pixel via homography
    # H = K R_rect^T K^{-1}
    def warp(img_u8, R_rect):
        Hmat = jnp.asarray(K @ R_rect.T @ Kinv)
        yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32), indexing="ij")
        ones = jnp.ones_like(xx)
        p = jnp.stack([xx, yy, ones], axis=-1).reshape(-1, 3)
        q = p @ Hmat.T.astype(jnp.float32)
        q = q[:, :2] / q[:, 2:3]
        vals = im.bilinear(jnp.asarray(img_u8, jnp.float32), q)
        return vals.reshape(H, W)

    rect1 = warp(img1_u8, Rr1)
    rect2 = warp(img2_u8, Rr2)

    num_disp = int(np.ceil(cfg.num_disparities / 16.0) * 16)
    block_r = max(int(cfg.block_size) // 2, 1)
    disp, lr_ok = _disparity_sad(rect1, rect2, num_disp, block_r,
                                 sgm=getattr(cfg, "sgm", True))
    disp = np.asarray(disp)
    lr_ok = np.asarray(lr_ok)

    fx = K[0, 0]
    valid = lr_ok & (disp >= cfg.disp_min)
    z = np.where(valid, fx * baseline / np.maximum(disp, 1e-6), np.nan)
    zs = z[np.isfinite(z)]
    if zs.size == 0:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    z_max = np.percentile(zs, cfg.z_max_percentile)  # ref py:1188-1194
    valid &= np.nan_to_num(z, nan=np.inf) <= z_max

    # subsampled grid vertices (ref py:1196-1216)
    step = max(int(cfg.step), 1)
    gy = np.arange(0, H, step)
    gx = np.arange(0, W, step)
    vid = -np.ones((len(gy), len(gx)), np.int64)
    verts_rect = []
    disp_grid = np.zeros((len(gy), len(gx)))
    for iy, y in enumerate(gy):
        for ix, x in enumerate(gx):
            if not valid[y, x]:
                continue
            d = disp[y, x]
            zz = fx * baseline / d
            X = (x - K[0, 2]) / fx * zz
            Y = (y - K[1, 2]) / K[1, 1] * zz
            vid[iy, ix] = len(verts_rect)
            verts_rect.append([X, Y, zz])
            disp_grid[iy, ix] = d
    if len(verts_rect) < 3:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    verts_rect = np.asarray(verts_rect)

    # quads -> 2 triangles with disparity-jump rejection (ref py:1222-1251)
    faces = []
    for iy in range(len(gy) - 1):
        for ix in range(len(gx) - 1):
            q = [vid[iy, ix], vid[iy, ix + 1], vid[iy + 1, ix], vid[iy + 1, ix + 1]]
            if min(q) < 0:
                continue
            ds = [disp_grid[iy, ix], disp_grid[iy, ix + 1],
                  disp_grid[iy + 1, ix], disp_grid[iy + 1, ix + 1]]
            if max(ds) - min(ds) > cfg.disp_jump:
                continue
            faces.append([q[0], q[1], q[2]])
            faces.append([q[1], q[3], q[2]])
    faces = np.asarray(faces, np.int64) if faces else np.zeros((0, 3), np.int64)

    # rectified cam1 -> cam1 -> world (ref py:1256-1261)
    verts_cam1 = verts_rect @ Rr1  # R1^T applied to rows
    verts_world = verts_cam1 @ kf1.R_cw.T + kf1.t_cw
    return verts_world, faces

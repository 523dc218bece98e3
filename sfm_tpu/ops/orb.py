"""Oriented binary features + Hamming matching (ORB-flavor loop closure).

TPU-native equivalent of the python reference's loop-closure front-end
(reference: python/src/templering_sfm.py:532-595 ``LoopClosure`` —
cv2.ORB_create(4000) keypoints/descriptors, BFMatcher Hamming knn with
Lowe ratio 0.75). Re-designed for the MXU:

  * keypoints = batched Shi-Tomasi corners (ops/features.py);
  * orientation = intensity-centroid angle over a circular patch
    (the "oriented" part of ORB), one batched gather;
  * descriptor = 256 BRIEF comparisons on a blurred image with the
    pair pattern rotated per keypoint — one (K, 256, 2) gather;
  * Hamming distance for ALL pairs via one matmul:
    d(a,b) = Σa + Σb − 2·a·b for a,b ∈ {0,1}^256.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sfm_tpu.ops import features, image as im

N_BITS = 256
PATCH_R = 15.0


def _brief_pattern(seed: int = 9, n_bits: int = N_BITS, radius: float = PATCH_R):
    """Fixed random BRIEF pair offsets (n_bits, 2, 2), gaussian-clustered
    like ORB's learned pattern."""
    rng = np.random.default_rng(seed)
    pat = rng.standard_normal((n_bits, 2, 2)) * (radius / 2.5)
    return jnp.asarray(np.clip(pat, -radius, radius), jnp.float32)


_PATTERN = _brief_pattern()


def _orientation(img, xy, radius: int = 7):
    """Intensity-centroid angle per keypoint (K,) — batched gather."""
    r = jnp.arange(-radius, radius + 1, dtype=img.dtype)
    dx, dy = jnp.meshgrid(r, r, indexing="xy")
    circ = (dx * dx + dy * dy) <= radius * radius
    offs = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # (P,2)
    vals = im.bilinear(img, xy[:, None, :] + offs[None])  # (K,P)
    w = circ.ravel().astype(img.dtype)
    m10 = jnp.sum(vals * (offs[:, 0] * w)[None], axis=-1)
    m01 = jnp.sum(vals * (offs[:, 1] * w)[None], axis=-1)
    return jnp.arctan2(m01, m10)


@partial(jax.jit, static_argnames=("max_kp",))
def detect_and_describe(img, max_kp: int = 512):
    """Oriented binary features for one image.

    Returns (xy (K,2), desc (K,256) f32 in {0,1}, valid (K,))."""
    xy, score, valid = features.detect_corners(
        img, jnp.zeros((1, 2)), jnp.zeros(1, bool), max_new=max_kp, cell=8,
        quality=0.01, border=int(PATCH_R) + 2,
    )
    # smooth for BRIEF comparisons (box approximates the gaussian blur)
    blur = im.box_filter(img, 2) / 25.0
    theta = _orientation(blur, xy)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # rotate the pattern per keypoint: (K, n_bits, 2, 2)
    px = _PATTERN[None, :, :, 0]
    py = _PATTERN[None, :, :, 1]
    rx = c[:, None, None] * px - s[:, None, None] * py
    ry = s[:, None, None] * px + c[:, None, None] * py
    pa = xy[:, None, :] + jnp.stack([rx[:, :, 0], ry[:, :, 0]], axis=-1)
    pb = xy[:, None, :] + jnp.stack([rx[:, :, 1], ry[:, :, 1]], axis=-1)
    va = im.bilinear(blur, pa)  # (K, n_bits)
    vb = im.bilinear(blur, pb)
    desc = (va < vb).astype(jnp.float32)
    return xy, desc, valid


@jax.jit
def match_hamming(desc_a, valid_a, desc_b, valid_b, ratio: float = 0.75):
    """Lowe-ratio Hamming matching (ref py:544-555), all pairs via MXU.

    Returns (idx_b (Ka,) best match per a, match_ok (Ka,) bool,
    dist (Ka,))."""
    sa = jnp.sum(desc_a, axis=-1, keepdims=True)  # (Ka,1)
    sb = jnp.sum(desc_b, axis=-1, keepdims=True)  # (Kb,1)
    cross = desc_a @ desc_b.T  # (Ka,Kb) — one matmul
    D = sa + sb.T - 2.0 * cross  # Hamming distances
    D = jnp.where(valid_b[None, :], D, jnp.inf)
    # two smallest per row
    neg = -D
    top2, idx2 = jax.lax.top_k(neg, 2)
    d1 = -top2[:, 0]
    d2 = -top2[:, 1]
    ok = valid_a & (d1 < ratio * d2) & jnp.isfinite(d1)
    return idx2[:, 0], ok, d1


def propose_candidates(match_counts: np.ndarray, kf_id: int, min_kf_gap: int,
                       top_k: int) -> list[int]:
    """Rank loop candidates >= min_kf_gap older by match count, keep the
    best top_k (ref py:561-570). Host-side (tiny)."""
    cands = [
        (int(match_counts[k]), k)
        for k in range(max(kf_id - min_kf_gap + 1, 0))
        if match_counts[k] > 0
    ]
    cands.sort(reverse=True)
    return [k for _, k in cands[:top_k]]

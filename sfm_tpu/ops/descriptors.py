"""Global image descriptors for loop-closure candidate search.

TPU-native replacement for the reference's 32x32 global descriptor
(reference: cpp/src/templering_sfm.cpp:1100-1129 ``global_desc_32`` —
box-downsample to ≤32, nearest-resample to exactly 32x32, mean-removed,
L2-normalized 1024-float vector; cosine score via ``dot_desc``). The
whole keyframe bank scores with one (KF,1024)x(1024,) matvec on the MXU
(replacing the per-keyframe dot loop at cpp:1827-1830).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from sfm_tpu.ops import image as im

DESC_DIM = 32 * 32


@jax.jit
def global_desc_32(img):
    """(H,W) f32 -> (1024,) mean-removed L2-normalized descriptor."""
    H, W = img.shape
    # box-downsample by 2 until both dims <= 32 (static loop), then
    # nearest-neighbor resample to exactly 32x32 (ref cpp:1100-1115)
    while img.shape[0] > 32 or img.shape[1] > 32:
        img = im.downsample2(img)
    h, w = img.shape
    yi = (jnp.arange(32) * h // 32).astype(jnp.int32)
    xi = (jnp.arange(32) * w // 32).astype(jnp.int32)
    d = img[yi][:, xi].reshape(-1)
    d = d - jnp.mean(d)
    return d / (jnp.linalg.norm(d) + 1e-12)


@jax.jit
def score_bank(bank, bank_valid, desc):
    """Cosine scores of ``desc`` against the keyframe bank.

    bank (KF_CAP, 1024), bank_valid (KF_CAP,) bool -> (KF_CAP,) scores
    with invalid rows at -inf. One MXU matvec (ref cpp:1124-1129)."""
    s = bank @ desc
    return jnp.where(bank_valid, s, -jnp.inf)

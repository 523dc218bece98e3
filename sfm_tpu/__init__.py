"""sfm_tpu — TPU-native Structure-from-Motion / visual-SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the classic monocular SfM pipeline
(reference capability set: RoozbehSanaei/Structure-from-Motion-3D-Reconstruction):
pyramidal KLT tracking, essential-matrix RANSAC, DLT triangulation,
Schur-complement sliding-window bundle adjustment, loop closure,
SE(3) pose-graph optimization, PLY/CSV artifact export and ATE evaluation.

Design stance (TPU-first, not a port):
  * fixed-capacity masked tensor state instead of dynamic Python objects
  * per-track / per-hypothesis / per-observation loops become vmapped or
    Pallas-kernel batched tensor programs
  * host-driven per-frame loop with jitted inner stages; multi-scene
    scaling via ``jax.sharding.Mesh`` + ``shard_map``.
"""

import os

# f64 support is required for the accuracy-critical reductions (Umeyama
# alignment, pose-graph residual norms). Hot kernels pin f32 explicitly.
import jax

if os.environ.get("SFM_TPU_X64", "1") == "1":
    jax.config.update("jax_enable_x64", True)

# TPU matmuls default to bfloat16 multiplications (8-bit mantissa) — fatal
# for the geometric linear algebra in this framework (8-point systems,
# Jacobi rotations, Schur complements). Force true f32 matmul arithmetic;
# the matrices here are tiny so the extra passes are free.
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"

from sfm_tpu import ops, models, parallel, utils  # noqa: E402,F401
from sfm_tpu.config import SystemConfig, load_config  # noqa: E402,F401

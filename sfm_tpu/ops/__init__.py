from sfm_tpu.ops import lie, linalg, umeyama  # noqa: F401

from sfm_tpu.ops.pallas import lk_kernel, shi_tomasi_kernel  # noqa: F401

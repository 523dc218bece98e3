from sfm_tpu.ops.pallas import shi_tomasi_kernel  # noqa: F401

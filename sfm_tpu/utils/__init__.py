from sfm_tpu.utils import artifacts, dataset, synthetic  # noqa: F401

"""Alias package: ``structure_from_motion_3d_reconstruction_tpu`` → ``sfm_tpu``."""

import sys

import sfm_tpu

sys.modules[__name__] = sfm_tpu

from sfm_tpu.ops import (ba, descriptors, epipolar, features, image, klt,  # noqa: F401
                         lie, linalg, orb, pnp, posegraph, triangulate,
                         umeyama)

"""Multi-scene vmapped scan reconstruction (BASELINE config 5 on the
device-resident path): N synthetic rings reconstructed in one compiled
program, each with full mapping + window BA."""

import numpy as np
import pytest

from tests.test_scan_pipeline import _small_cfg


@pytest.fixture(scope="module")
def four_rings(tmp_path_factory):
    from sfm_tpu.utils.dataset import TempleRing
    from sfm_tpu.utils.synthetic import SyntheticRingSpec, generate_dataset

    dss = []
    for s in range(4):
        out = tmp_path_factory.mktemp(f"ms_ring{s}")
        spec = SyntheticRingSpec(
            n_frames=8, width=480, height=360, fx=1100.0, fy=1100.0,
            arc_deg=90.0, seed=7 + s,
        )
        generate_dataset(out, spec)
        dss.append(TempleRing.from_dir(out))
    return dss


def test_multi_scene_scan(four_rings):
    import jax.numpy as jnp

    from sfm_tpu.ops import umeyama
    from sfm_tpu.parallel.multi_scan import run_scenes_scan

    dss = four_rings
    cfg = _small_cfg()
    res = run_scenes_scan(dss, cfg, frames=8, chunk=4, p_cap=4096, p_ba=256)
    assert len(res["centers"]) == 4
    for s, ds in enumerate(dss):
        n_kf = int(res["n_keyframes"][s])
        assert n_kf >= 4, f"scene {s}: {n_kf} keyframes"
        assert int(res["n_points"][s]) > 100
        est = res["centers"][s]
        gt = np.stack([ds.records[f].center for f in res["kf_frames"][s]])
        r = umeyama.ate(jnp.asarray(est), jnp.asarray(gt), with_scale=True)
        extent = float(np.linalg.norm(gt - gt.mean(0), axis=1).max())
        assert float(r["rmse"]) / extent < 0.08, f"scene {s}"


def test_gated_matches_ungated(four_rings):
    """The any-scene-gated chunk program (keyframe branch under ONE
    lax.cond with per-scene masking) must reproduce the wholesale
    vmap(run_chunk) results: same keyframe schedule, same geometry."""
    import numpy as np

    from sfm_tpu.parallel.multi_scan import run_scenes_scan

    dss = four_rings
    cfg = _small_cfg()
    kw = dict(frames=8, chunk=4, p_cap=4096, p_ba=256)
    res_g = run_scenes_scan(dss, cfg, gated=True, **kw)
    res_u = run_scenes_scan(dss, cfg, gated=False, **kw)
    np.testing.assert_array_equal(res_g["n_keyframes"],
                                  res_u["n_keyframes"])
    np.testing.assert_array_equal(res_g["n_points"], res_u["n_points"])
    for s in range(len(dss)):
        np.testing.assert_array_equal(res_g["kf_frames"][s],
                                      res_u["kf_frames"][s])
        np.testing.assert_allclose(res_g["centers"][s],
                                   res_u["centers"][s], atol=1e-4)


def test_multi_scene_scan_sharded(four_rings):
    """Same program sharded over the virtual mesh scene axis (SURVEY
    §2.6 scene/data parallelism): results must match the unsharded run
    structurally and hit the same accuracy bar."""
    import jax.numpy as jnp

    from sfm_tpu.ops import umeyama
    from sfm_tpu.parallel import mesh as mesh_lib
    from sfm_tpu.parallel.multi_scan import run_scenes_scan

    dss = four_rings
    cfg = _small_cfg()
    mesh = mesh_lib.make_mesh(4, hyp_axis=1)
    res = run_scenes_scan(dss, cfg, frames=8, chunk=4, p_cap=4096,
                          p_ba=256, mesh=mesh)
    for s, ds in enumerate(dss):
        assert int(res["n_keyframes"][s]) >= 4
        est = res["centers"][s]
        gt = np.stack([ds.records[f].center for f in res["kf_frames"][s]])
        r = umeyama.ate(jnp.asarray(est), jnp.asarray(gt), with_scale=True)
        extent = float(np.linalg.norm(gt - gt.mean(0), axis=1).max())
        assert float(r["rmse"]) / extent < 0.08, f"scene {s}"

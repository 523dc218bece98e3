"""Config loader must consume the reference's config.json schema as-is."""

import json

from sfm_tpu.config import ExportGeometry, TranslationMode, load_config

REFERENCE_CONFIG = {
    "common": {
        "system": {
            "frames": 12,
            "use_gt_scale": False,
            "translation_mode": "dir",
            "loop_every_kf": 1,
            "posegraph_every_kf": 1,
        },
        "keyframe": {"min_inliers": 200, "min_gap": 1, "parallax_px": 18.0},
        "klt": {
            "max_tracks": 2200,
            "min_tracks": 900,
            "quality": 0.01,
            "min_distance": 8,
            "block_size": 7,
            "pyr_levels": 3,
            "win_size": [21, 21],
            "win_radius": 5,
            "iters": 10,
            "fb_thresh": 1.0,
        },
        "outputs": {"visuals": False, "export_geometry": "pointcloud"},
    },
    "python": {
        "ba": {"window": 5, "max_points": 200, "iters": 6, "lambda0": 0.01},
        "loop_closure": {"min_kf_gap": 8, "top_k": 5},
        "pose_graph": {"iters": 10, "w_rot": 1.0},
    },
    "cpp": {
        "ba": {"window": 6, "iters": 5, "max_points": 600, "huber_delta": 3.0, "lambda": 0.001},
        "mesh_sparse": {"kf": 0, "max_points": 2500, "grid_px": 4, "max_edge_px": 80.0},
    },
}


import pytest

pytestmark = pytest.mark.quick  # fast tier (pyproject markers)


def test_defaults():
    cfg = load_config(None)
    assert cfg.frames == 12
    assert cfg.klt.max_tracks == 2200
    assert cfg.translation_mode == TranslationMode.DIR


def test_win_size_only_alias(tmp_path):
    """win_size -> win_radius inverts the reference's 2r+1 relation
    (ref py:1431-1434): [15,15] -> 7, not the 21->5 special case."""
    p = tmp_path / "config.json"
    p.write_text(json.dumps({"common": {"klt": {"win_size": [15, 15]}}}))
    assert load_config(p).klt.win_radius == 7
    p.write_text(json.dumps({"common": {"klt": {"win_size": 11}}}))
    assert load_config(p).klt.win_radius == 5


def test_reference_config_loads(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps(REFERENCE_CONFIG))
    cfg = load_config(p)
    assert cfg.frames == 12
    assert cfg.keyframe.parallax_px == 18.0
    assert cfg.klt.win_radius == 5
    assert cfg.klt.pyr_levels == 3
    # cpp section wins over python for shared knobs (TPU defaults = cpp math)
    assert cfg.ba.window == 6
    assert cfg.ba.max_points == 600
    assert cfg.ba.lambda0 == 0.001  # via "lambda" alias
    assert cfg.export_geometry == ExportGeometry.POINTCLOUD
    assert cfg.mesh_sparse.max_points == 2500


def test_cli_overrides(tmp_path):
    p = tmp_path / "config.json"
    p.write_text(json.dumps(REFERENCE_CONFIG))
    cfg = load_config(p, overrides={"frames": 47, "ba.window": 8, "klt.max_tracks": 4096})
    assert cfg.frames == 47
    assert cfg.ba.window == 8
    assert cfg.klt.max_tracks == 4096


def test_tpu_section_precedence(tmp_path):
    raw = dict(REFERENCE_CONFIG)
    raw["tpu"] = {"ba": {"window": 7}, "ransac": {"num_hypotheses": 4096}}
    p = tmp_path / "config.json"
    p.write_text(json.dumps(raw))
    cfg = load_config(p)
    assert cfg.ba.window == 7
    assert cfg.ransac.num_hypotheses == 4096


def test_missing_file_ok(tmp_path):
    cfg = load_config(tmp_path / "nope.json")
    assert cfg.frames == 12

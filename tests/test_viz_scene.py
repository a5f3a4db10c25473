"""Interactive scene export (slamScene analog): the standalone HTML embeds
the full renderable map state as JSON."""

import json
import re

import numpy as np

from _map_fixtures import World, lateral_poses, make_camera, render_features
from plslam_tpu.backend.mapping import MapConfig, MapHandler
from plslam_tpu.viz_scene import _scene_data, export_scene_html


def _mapper(n_kf=5):
    cam = make_camera()
    world = World(n_pts=120, n_ls=12)
    mapper = MapHandler(cam, MapConfig(ba_points=2048, ba_pobs=8192,
                                       ba_lobs=2048))
    poses = lateral_poses(n_kf, 0.05)
    mapper.initialize(poses[0], render_features(world, poses[0], cam))
    for T in poses[1:]:
        mapper.add_keyframe(T, render_features(world, T, cam), run_ba=False)
    return mapper


def test_scene_data_counts_and_geometry():
    mapper = _mapper()
    m = mapper.map
    data = _scene_data(mapper, gt=np.zeros((4, 3)))
    # pose-stack ground truth (what viz.render_run's callers pass)
    Ts = np.broadcast_to(np.eye(4), (4, 4, 4)).copy()
    Ts[:, 0, 3] = np.arange(4)
    d2 = _scene_data(mapper, gt=Ts)
    assert np.asarray(d2["gt"]).shape == (4, 3)
    assert [r[0] for r in d2["gt"]] == [0.0, 1.0, 2.0, 3.0]
    assert len(data["points"]) == int(np.sum(m.pt_valid))
    assert len(data["kf_T"]) == len(m.keyframes)
    assert len(data["lines"]) > 0 and len(data["lines"]) <= len(m.ls_valid)
    # every KF pose row is 3x4
    assert all(len(T) == 3 and len(T[0]) == 4 for T in data["kf_T"])
    # the fixture world is co-visible across all KFs -> far covis edge
    G = np.asarray(m.covis)
    n_exp = int(np.sum(np.triu(G, 1) >= data["cov_threshold"]))
    assert len(data["cov_edges"]) == n_exp > 0
    assert len(data["gt"]) == 4


def test_scene_html_is_selfcontained(tmp_path):
    mapper = _mapper()
    path = export_scene_html(mapper, str(tmp_path / "scene.html"))
    html = open(path).read()
    # no external resources — a single file must render offline
    assert "http://" not in html and "https://" not in html
    assert "<script src" not in html
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "embedded DATA blob missing"
    data = json.loads(m.group(1))
    assert data["kf_T"] and data["points"]


def test_live_scene_export_at_kf_cadence(tmp_path):
    """viz_every_kf rewrites the scene HTML from the mapping worker at KF
    cadence (slamScene updateSceneSafe analog for a batch environment)."""
    from _map_fixtures import World, lateral_poses, make_camera, \
        render_features
    from plslam_tpu.config import PLSLAMConfig
    from plslam_tpu.pipeline import PLSLAM

    cam = make_camera()
    world = World(n_pts=80, n_ls=8, seed=2)
    out = str(tmp_path / "live.html")
    cfg = PLSLAMConfig(multithread_slam=False, viz_every_kf=2,
                       viz_path=out)
    slam = PLSLAM(cam, cfg)
    poses = lateral_poses(5, step=0.04)
    slam.insert_keyframe_features(poses[0],
                                  render_features(world, poses[0], cam))
    import os

    sizes = []
    for T in poses[1:]:
        slam.insert_keyframe_features(T, render_features(world, T, cam))
        if os.path.exists(out):
            sizes.append(os.path.getsize(out))
    assert sizes, "live scene file was never written"
    html = open(out).read()
    assert "const DATA" in html

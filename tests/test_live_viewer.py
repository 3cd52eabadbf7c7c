"""Live viewer (viz/live.py) — the reference's Pangolin thread done
headless (reference src/viz.cc:26-78): producer snapshots under a lock on
a serving thread, consumed over localhost HTTP. Tested end-to-end against
a real Frontend run plus direct HTTP asserts."""

import json
import urllib.error
import urllib.request

import numpy as np

from ya_vo_tpu.tracking.frontend import Frontend
from ya_vo_tpu.utils import synthetic
from ya_vo_tpu.viz import live
from tests.test_frontend_e2e import make_config


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=10) as r:
        return r.status, r.read()


def test_viewer_serves_state_and_page():
    imgs, poses_gt, lms, cam = synthetic.render_sequence(
        n_frames=6, n_landmarks=400, height=256, width=768,
        step=0.4, yaw_rate=0.004, seed=7)
    fe = Frontend(make_config(sync_ba=True), cam)
    viewer = live.attach(fe, port=0)
    try:
        fe.run(imgs, pipelined=False)

        st, body = _get(viewer.port, "/state.json")
        assert st == 200
        s = json.loads(body)
        assert s["frame_id"] == 5
        assert s["status"] == "TRACKING"
        assert len(s["traj"]) == 6
        assert s["n_landmarks"] > 50
        assert len(s["landmarks"]) > 50
        assert np.asarray(s["pose"]).shape == (4, 4)
        assert s["fps"] > 0

        st, page = _get(viewer.port, "/")
        assert st == 200
        assert b"state.json" in page and b"canvas" in page

        try:
            _get(viewer.port, "/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        viewer.close()


def test_viewer_survives_map_downsampling():
    """Cloud shipped per poll stays bounded on big maps."""
    v = live.LiveViewer(port=0, max_landmarks=10)

    class FakeMap:
        n_keyframes = 3

        def alive_landmarks(self):
            return np.random.default_rng(0).normal(
                size=(1000, 3)).astype(np.float32), None

        def stats(self):
            return {"n_alive": 1000}

    try:
        v.update_map(FakeMap(), n_resets=2)
        s = json.loads(v.state_json())
        assert len(s["landmarks"]) <= 10
        assert s["n_landmarks"] == 1000
        assert s["resets"] == 2
    finally:
        v.close()

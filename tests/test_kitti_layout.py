"""End-to-end run through a REAL KITTI odometry directory layout
(round-1 VERDICT weak #9: the loaders had only ever seen .npy fixtures).

Builds the exact on-disk tree the reference consumes
(`<base>/sequences/<seq>/image_0/*.png` + calib.txt + `<base>/poses/<seq>.txt`,
reference src/LoopHandler.cc:37-57 + src/Utils.cc:31-64), renders photoreal
textured frames into it as real PNGs, then drives the full CLI path:
config JSON (the reference's 3-key schema) -> calib parse -> sorted image
listing -> PNG decode (native C decoder or PIL) -> frontend -> ATE against
the poses file.
"""

import json
import os

import numpy as np


def _build_dataset(base, seq="07", n_frames=8):
    from PIL import Image

    from ya_vo_tpu.utils.scene import TexturedSequence

    ts = TexturedSequence(n_frames=n_frames, seed=3, noise_sigma=0.0)
    img_dir = os.path.join(base, "sequences", seq, "image_0")
    os.makedirs(img_dir)
    os.makedirs(os.path.join(base, "poses"))
    for f in range(n_frames):
        img = np.asarray(ts.frame(f))
        Image.fromarray(img).save(os.path.join(img_dir, f"{f:06d}.png"))

    cam = ts.cam
    row = (f"{cam.fx} 0 {cam.cx} 0 0 {cam.fy} {cam.cy} 0 0 0 1 0")
    with open(os.path.join(base, "sequences", seq, "calib.txt"), "w") as fp:
        fp.write(f"P0: {row}\nP1: {row}\n")

    gt_cw = np.linalg.inv(ts.poses)  # poses file is cam0->world
    rows = gt_cw[:, :3, :4].reshape(n_frames, 12)
    np.savetxt(os.path.join(base, "poses", f"{seq}.txt"), rows)
    return ts


def test_run_vo_on_kitti_layout(tmp_path, capsys):
    import run_vo

    base = str(tmp_path / "dataset")
    os.makedirs(base)
    _build_dataset(base, seq="07", n_frames=8)

    # the reference's own config schema (config/KITTI.json:1-6)
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fp:
        json.dump({"basePath": base, "sequence": "07",
                   "cameraType": "mono"}, fp)

    traj_path = str(tmp_path / "poses_est.txt")
    rc = run_vo.main(["--config", cfg_path, "--traj", traj_path])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["frames"] == 8
    assert summary["resets"] == 0
    # photoreal imagery decoded from real PNGs through the real path train
    assert summary["ate_sim3_m"] < 0.25, summary
    assert "scale_drift_rms_log" in summary
    rows = np.loadtxt(traj_path)
    assert rows.shape == (8, 12)

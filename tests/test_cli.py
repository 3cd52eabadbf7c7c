"""CLI runner smoke: the full run_vo entrypoint in-process on a small
synthetic sequence, exercising trajectory export, plotting, checkpointing
and the summary JSON."""

import json
import os

import numpy as np
import pytest


def test_run_vo_synthetic(tmp_path, capsys):
    import run_vo

    traj_path = str(tmp_path / "poses.txt")
    plot_path = str(tmp_path / "traj.png")
    ckpt_path = str(tmp_path / "state.npz")
    rc = run_vo.main([
        "--synthetic", "--synthetic-frames", "8",
        "--synthetic-size", "256", "768",
        "--traj", traj_path, "--plot", plot_path,
        "--checkpoint", ckpt_path,
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["frames"] == 8
    assert summary["resets"] == 0
    assert summary["ate_sim3_m"] < 0.2
    assert os.path.getsize(plot_path) > 1000
    assert os.path.exists(ckpt_path)
    rows = np.loadtxt(traj_path)
    assert rows.shape == (8, 12)

"""Offline visualization / dataset-statistics tooling tests (the repo's
equivalent of the reference's mayavi + demos/dataset scripts): scene HTML
export structure, PNG render, and the stats JSON."""

import json
import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "kitti")


def test_export_scene_html_structure(tmp_path):
    from tools.show_predictions_3d import export_scene_html

    pts = np.random.default_rng(0).uniform(-10, 40, (5000, 3)).astype(
        np.float32
    )
    gt = np.array([[0.0, 1.6, 20.0, 3.8, 1.6, 1.5, 0.3]])
    preds = np.array([[1.0, 1.6, 22.0, 3.9, 1.7, 1.5, -0.2]])
    out = tmp_path / "scene.html"
    export_scene_html(
        str(out), pts, gt, None, preds, np.array([0.9]), max_points=1000
    )

    s = out.read_text()
    m = re.search(r"const DATA = (\{.*?\});\n", s, re.S)
    data = json.loads(m.group(1))
    assert len(data["points"]) <= 1000
    assert len(data["boxes"]) == 2  # gt + pred
    assert all(len(b["corners"]) == 8 for b in data["boxes"])
    assert data["boxes"][1]["label"] == "0.90"
    assert len(data["edges"]) == 12
    # Balanced braces = the JS template survived the str.format escaping.
    assert s.count("{") == s.count("}")


def test_show_predictions_3d_cli(tmp_path):
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "show_predictions_3d.py"),
            "--dataset_dir", FIXTURE, "--data_split", "val",
            "--out_dir", str(tmp_path), "--max_samples", "1",
        ],
        capture_output=True, text=True, cwd="/tmp",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    files = list(tmp_path.glob("*.html"))
    assert len(files) == 1 and files[0].stat().st_size > 10000


def test_dataset_stats_histograms(tmp_path):
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "dataset_stats.py"),
            "histograms", "--dataset_dir", FIXTURE,
            "--data_split", "trainval", "--out_dir", str(tmp_path),
        ],
        capture_output=True, text=True, cwd="/tmp",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads((tmp_path / "stats.json").read_text())
    # The dataset drops split entries with no in-class GT (7 of the
    # fixture's 12 trainval names survive).
    assert stats["num_samples"] >= 5
    assert stats["Car"]["count"] > 0
    assert stats["Car"]["l"]["mean"] > 2.0  # cars are car-sized
    assert (tmp_path / "hist_car.png").exists()


def test_show_predictions_2d_cli(tmp_path):
    # Synthesize a one-sample predictions tree: a proposal and a final
    # detection near a plausible camera-space pose.
    step = "7"
    split = "val"
    pred_root = tmp_path / "preds"
    prop_dir = pred_root / "proposals_and_scores" / split / step
    final_dir = pred_root / "final_predictions_and_scores" / split / step
    prop_dir.mkdir(parents=True)
    final_dir.mkdir(parents=True)
    name = "000001"
    np.savetxt(
        prop_dir / f"{name}.txt",
        np.array([[0.0, 1.6, 20.0, 3.8, 1.6, 1.5, 0.3, 0.8]]),
    )
    np.savetxt(
        final_dir / f"{name}.txt",
        np.array([
            [0.5, 1.6, 21.0, 3.9, 1.7, 1.5, -0.2, 0.9, 0.0],
            # Behind-camera box: must be dropped, not drawn as garbage.
            [0.5, 1.6, -5.0, 3.9, 1.7, 1.5, 0.0, 0.95, 0.0],
        ]),
    )
    out_dir = tmp_path / "imgs"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "show_predictions_2d.py"),
            "--dataset_dir", FIXTURE, "--data_split", split,
            "--predictions_dir", str(pred_root),
            "--views", "proposals,predictions,overlaid",
            "--out_dir", str(out_dir), "--max_samples", "3",
        ],
        capture_output=True, text=True, cwd="/tmp",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for view in ("proposals", "predictions", "overlaid"):
        png = out_dir / view / step / f"{name}.png"
        assert png.exists() and png.stat().st_size > 20000, view

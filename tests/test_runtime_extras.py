"""Tests for format checks, native AP evaluator wrapper, and model export."""

import glob
import os

import numpy as np
import pytest

from heterofusionrcnn_tpu.utils import format_checker as fc

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "kitti")


def test_format_checker_accepts_valid():
    fc.check_box_3d_format(np.zeros((4, 7)))
    fc.check_box_8c_format(np.zeros((4, 8, 3)))
    fc.check_bev_box_format(np.zeros((4, 5)))
    fc.check_anchor_format(np.zeros((4, 6)))
    fc.check_point_cloud_format(np.zeros((2, 100, 4)))
    fc.check_proposal_file_format(np.zeros((3, 8)))
    fc.check_final_prediction_file_format(np.zeros((3, 9)))


def test_format_checker_rejects_invalid():
    with pytest.raises(ValueError):
        fc.check_box_3d_format(np.zeros((4, 6)))
    with pytest.raises(ValueError):
        fc.check_box_8c_format(np.zeros((8, 2)))
    with pytest.raises(ValueError):
        fc.check_proposal_file_format(np.zeros((8,)))


def test_native_eval_perfect_detections(tmp_path):
    """GT evaluated against itself must reach the structural AP maximum
    (num_valid_gt/41 on the tiny fixture) with BEV == 3D == 2D."""
    from heterofusionrcnn_tpu.runtime.native_eval import run_kitti_native_eval

    gt_dir = os.path.join(FIXTURE, "training", "label_2")
    det_dir = tmp_path / "det"
    det_dir.mkdir()
    for f in glob.glob(gt_dir + "/*.txt"):
        rows = []
        for line in open(f):
            p = line.split()
            if p and p[0] in ("Car", "Pedestrian", "Cyclist"):
                rows.append(" ".join(p[:15]) + " 0.99")
        (det_dir / os.path.basename(f)).write_text(
            "\n".join(rows) + ("\n" if rows else "")
        )

    aps = run_kitti_native_eval(gt_dir, str(det_dir), str(tmp_path / "out"))
    assert "car_detection_3d" in aps
    for cls in ("car", "pedestrian", "cyclist"):
        d2 = aps[f"{cls}_detection_2d"]
        bev = aps[f"{cls}_detection_bev"]
        d3 = aps[f"{cls}_detection_3d"]
        ahs = aps[f"{cls}_heading_3d"]
        np.testing.assert_allclose(bev, d2, atol=1e-3)
        np.testing.assert_allclose(d3, d2, atol=1e-3)
        np.testing.assert_allclose(ahs, d3, atol=1e-3)
    # Car moderate structural max on this fixture: 20 GT / 41 pts.
    assert aps["car_detection_3d"][1] > 40.0
    # stats files written
    stats = glob.glob(str(tmp_path / "out" / "stats_*"))
    assert len(stats) == 9


def test_native_eval_poor_detections(tmp_path):
    """Random garbage detections must score ~0 AP."""
    from heterofusionrcnn_tpu.runtime.native_eval import run_kitti_native_eval

    gt_dir = os.path.join(FIXTURE, "training", "label_2")
    det_dir = tmp_path / "det"
    det_dir.mkdir()
    rng = np.random.default_rng(0)
    for f in glob.glob(gt_dir + "/*.txt"):
        rows = []
        for _ in range(5):
            vals = [
                "Car", -1, -1, -10,
                *np.round(rng.uniform(0, 50, 4), 2),
                1.5, 1.6, 3.9,
                *np.round(rng.uniform(-30, 30, 3), 2),
                0.0, round(rng.uniform(0.5, 1.0), 3),
            ]
            rows.append(" ".join(str(v) for v in vals))
        (det_dir / os.path.basename(f)).write_text("\n".join(rows) + "\n")

    aps = run_kitti_native_eval(gt_dir, str(det_dir), str(tmp_path / "out"))
    assert aps["car_detection_3d"][1] < 5.0


def test_native_eval_low_iou_mode(tmp_path):
    """low_iou relaxes only the BEV/3D thresholds (0.5 car — reference
    evaluate_object_3d_offline_05_iou.cpp:55). Detections with footprint
    scaled x0.75 have 3D IoU = 0.5625 vs their GT: a miss at the standard
    0.7 car threshold, a hit at the relaxed 0.5."""
    from heterofusionrcnn_tpu.runtime.native_eval import run_kitti_native_eval

    gt_dir = os.path.join(FIXTURE, "training", "label_2")
    det_dir = tmp_path / "det"
    det_dir.mkdir()
    for f in glob.glob(gt_dir + "/*.txt"):
        rows = []
        for line in open(f):
            p = line.split()
            if p and p[0] == "Car":
                p[9] = str(float(p[9]) * 0.75)   # w
                p[10] = str(float(p[10]) * 0.75)  # l
                rows.append(" ".join(p[:15]) + " 0.99")
        (det_dir / os.path.basename(f)).write_text(
            "\n".join(rows) + ("\n" if rows else "")
        )

    std = run_kitti_native_eval(gt_dir, str(det_dir), str(tmp_path / "std"))
    low = run_kitti_native_eval(
        gt_dir, str(det_dir), str(tmp_path / "low"), low_iou=True
    )
    # 2D thresholds identical in both modes; the 2D boxes are untouched.
    np.testing.assert_allclose(
        low["car_detection_2d"], std["car_detection_2d"], atol=1e-6
    )
    # 3D: every det misses at 0.7 but hits at 0.5.
    assert std["car_detection_3d"][1] < 1.0
    assert low["car_detection_3d"][1] > 40.0
    assert low["car_detection_bev"][1] > 40.0


def test_export_roundtrip(tmp_path):
    """jax.export freeze of a tiny jitted fn: serialized artifact reproduces
    the live outputs."""
    import jax
    import jax.numpy as jnp

    from heterofusionrcnn_tpu.runtime.export import export_fused_inference, load_exported

    w = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32))

    def fused(rpn_vars, rcnn_vars, pc, img, p2):
        return {"out": pc @ rpn_vars["w"] + rcnn_vars["b"]}

    rpn_vars = {"w": w}
    rcnn_vars = {"b": jnp.ones((3,), jnp.float32)}
    pc = np.random.default_rng(1).normal(size=(2, 4)).astype(np.float32)
    img = np.zeros((1,), np.float32)
    p2 = np.zeros((1,), np.float32)

    path = str(tmp_path / "model.stablehlo")
    n = export_fused_inference(fused, rpn_vars, rcnn_vars, pc, img, p2, path)
    assert n > 0 and os.path.exists(path)

    loaded = load_exported(path)
    got = loaded(pc, img, p2)
    want = fused(rpn_vars, rcnn_vars, pc, img, p2)
    np.testing.assert_allclose(
        np.asarray(got["out"]), np.asarray(want["out"]), atol=1e-5
    )


def test_moving_average_optimizer():
    """use_moving_average keeps a parameter EMA inside the optimizer state
    (parity with optimizer_builder.py:74-77 MovingAverageOptimizer)."""
    import jax.numpy as jnp
    import optax

    from heterofusionrcnn_tpu.configs.config import OptimizerConfig
    from heterofusionrcnn_tpu.runtime.optimizer import (
        build_optimizer,
        get_ema_params,
    )

    cfg = OptimizerConfig(
        optimizer_type="sgd",
        initial_learning_rate=0.1,
        use_moving_average=True,
        moving_average_decay=0.5,
    )
    tx = build_optimizer(cfg, world_size=1, grad_clip_norm=0.0)
    params = {"w": jnp.ones((3,), jnp.float32)}
    state = tx.init(params)
    assert get_ema_params(state) is not None

    grads = {"w": jnp.ones((3,), jnp.float32)}
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    # post-step params = 1 - 0.1 = 0.9; ema = 0.5*1.0 + 0.5*0.9 = 0.95
    np.testing.assert_allclose(np.asarray(new_params["w"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(get_ema_params(state)["w"]), 0.95, rtol=1e-6
    )

    # Without the flag there is no EMA in the state.
    cfg.use_moving_average = False
    tx2 = build_optimizer(cfg)
    assert get_ema_params(tx2.init(params)) is None

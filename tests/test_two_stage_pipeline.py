"""Full two-stage pipeline integration test on the mini-KITTI fixture:
RPN training -> checkpoint -> RPN eval (proposals + features + IoU files) ->
RCNN training from the handoff files -> RCNN eval -> KITTI-format txts.

This mirrors the reference's file-mediated stage handoff
(SURVEY.md §1 dataflow; README.md:92-119).
"""

import glob
import os

import numpy as np
import pytest

pytestmark = pytest.mark.integration

import jax

from heterofusionrcnn_tpu.configs.presets import rcnn_unittest, rpn_unittest
from heterofusionrcnn_tpu.datasets.kitti.dataset import KittiDataset
from heterofusionrcnn_tpu.models.rcnn import RcnnModel, rcnn_loss
from heterofusionrcnn_tpu.models.rpn import RpnModel, rpn_loss
from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager, restore_matching
from heterofusionrcnn_tpu.runtime.evaluator import RcnnEvaluator, RpnEvaluator
from heterofusionrcnn_tpu.runtime.optimizer import build_optimizer
from heterofusionrcnn_tpu.runtime.train_state import TrainState, make_rpn_train_step
from heterofusionrcnn_tpu.runtime.trainer import train


@pytest.fixture(scope="module")
def two_stage_run(tmp_path_factory):
    """Run the whole pipeline once; individual tests assert on the results."""
    out = {}
    output_root = str(tmp_path_factory.mktemp("outputs"))
    out["root"] = output_root

    # ---------------- Stage 1: RPN training ---------------- #
    cfg = rpn_unittest()
    ic = cfg.model_config.input_config
    ds = KittiDataset(cfg.dataset_config, "train")
    ds.seed(0)
    clusters = tuple(tuple(np.asarray(c).reshape(3).tolist()) for c in ds.clusters)
    out["clusters"] = clusters

    model = RpnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=clusters, mode="train"
    )

    def next_batch():
        batch, _ = ds.next_batch(
            1, shuffle=True, model="rpn",
            pc_sample_pts=ic.pc_sample_pts,
            img_w=ic.img_dims_w, img_h=ic.img_dims_h,
        )
        return batch

    init_batch = next_batch()
    # Exclude the sample-name-free subset used for init (ordered dict of arrays).
    init_args = {
        k: init_batch[k]
        for k in (
            "point_cloud", "image_input", "stereo_calib_p2",
            "label_seg", "label_reg", "label_boxes_3d",
        )
    }

    state = train(
        model=model,
        loss_fn=lambda preds: rpn_loss(preds, cfg.model_config),
        make_train_step=make_rpn_train_step,
        init_batch=init_args,
        next_batch=next_batch,
        pipeline_cfg=cfg,
        output_root=output_root,
        num_devices=1,
    )
    out["rpn_cfg"] = cfg
    out["rpn_state"] = state
    assert int(state.step) == cfg.train_config.max_iterations

    # ---------------- RPN eval: generate handoff files ---------------- #
    eval_ds = KittiDataset(cfg.dataset_config, "val")
    eval_ds.data_split = "train"  # evaluate the train split for RCNN training
    eval_ds.train_val_test = "val"
    val_model = RpnModel(
        config=cfg.model_config, num_classes=3, cluster_sizes=clusters,
        mode="val", save_rpn_feature=True,
    )
    evaluator = RpnEvaluator(
        val_model, eval_ds, cfg, output_root, save_rpn_feature=True
    )

    # Untrained baseline eval at pseudo-step 0: gives the loss ledgers a
    # second row so tests can assert the evaluated loss decreases with
    # training (reference writes rpn_avg_losses.csv per checkpoint,
    # evaluator.py:683-700).
    init_vars = jax.jit(
        lambda rngs, *a: val_model.init(rngs, *a, training=False)
    )(
        {"params": jax.random.PRNGKey(99)},
        init_args["point_cloud"], init_args["image_input"],
        init_args["stereo_calib_p2"], init_args["label_seg"],
        init_args["label_reg"], init_args["label_boxes_3d"],
    )
    evaluator.run_checkpoint_once(jax.device_get(init_vars), 0)

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    summary = evaluator.run_checkpoint_once(variables, int(state.step))
    out["rpn_eval_summary"] = summary
    out["pred_dir"] = evaluator.predictions_dir

    # ---------------- Stage 2: RCNN training ---------------- #
    rcfg = rcnn_unittest()
    step = int(state.step)
    rds = KittiDataset(rcfg.dataset_config, "train")
    rds.seed(1)
    rds.proposal_dir = os.path.join(
        evaluator.predictions_dir, "proposals_and_scores", "train", str(step)
    )
    rds.proposal_iou_dir = os.path.join(
        evaluator.predictions_dir, "proposals_iou", "train", str(step)
    )
    rds.rpn_feature_dir = os.path.join(
        evaluator.predictions_dir, "rpn_feature", "train", str(step)
    )

    rmodel = RcnnModel(
        config=rcfg.model_config, num_classes=3, cluster_sizes=clusters,
        mode="train",
    )

    ric = rcfg.model_config.input_config

    def next_rcnn_batch():
        batch, _ = rds.next_batch(
            1, shuffle=True, model="rcnn",
            img_w=ric.img_dims_w, img_h=ric.img_dims_h,
        )
        return batch

    rbatch = next_rcnn_batch()
    out["rcnn_batch"] = rbatch
    init_args_rcnn = {
        k: rbatch[k]
        for k in (
            "rpn_roi", "rpn_iou", "rpn_gt", "rpn_pts", "rpn_intensity",
            "rpn_fg_mask", "rpn_fts", "image_input", "stereo_calib_p2",
        )
    }

    def make_rcnn_train_step(loss_fn):
        import jax as _jax
        import optax

        @_jax.jit
        def step_fn(state, batch, rng):
            drop, path, nxt = _jax.random.split(rng, 3)

            def compute(params):
                preds, updates = state.apply_fn(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["rpn_roi"], batch["rpn_iou"], batch["rpn_gt"],
                    batch["rpn_pts"], batch["rpn_intensity"],
                    batch["rpn_fg_mask"], batch["rpn_fts"],
                    batch["image_input"], batch["stereo_calib_p2"],
                    rngs={"dropout": drop, "path_drop": path},
                    mutable=["batch_stats"],
                )
                loss_dict, total = loss_fn(preds)
                return total, (loss_dict, updates["batch_stats"])

            (total, (loss_dict, stats)), grads = _jax.value_and_grad(
                compute, has_aux=True
            )(state.params)
            updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=params,
                batch_stats=stats, opt_state=opt_state,
            )
            metrics = dict(loss_dict)
            metrics["total_loss"] = total
            return new_state, metrics, nxt

        return step_fn

    # Warm start RCNN image branch from the RPN checkpoint (the reference's
    # load_model_weights ignore_missing pattern).
    rstate = train(
        model=rmodel,
        loss_fn=lambda preds: rcnn_loss(preds, rcfg.model_config),
        make_train_step=make_rcnn_train_step,
        init_batch=init_args_rcnn,
        next_batch=next_rcnn_batch,
        pipeline_cfg=rcfg,
        output_root=output_root,
        num_devices=1,
        init_params_from=jax.device_get(state.params),
    )
    out["rcnn_cfg"] = rcfg
    out["rcnn_state"] = rstate

    # ---------------- RCNN eval ---------------- #
    vds = KittiDataset(rcfg.dataset_config, "val")
    vds.data_split = "train"
    vds.train_val_test = "val"
    vds.proposal_dir = rds.proposal_dir
    vds.proposal_iou_dir = rds.proposal_iou_dir
    vds.rpn_feature_dir = rds.rpn_feature_dir
    rval_model = RcnnModel(
        config=rcfg.model_config, num_classes=3, cluster_sizes=clusters, mode="val"
    )
    revaluator = RcnnEvaluator(rval_model, vds, rcfg, output_root)
    rvariables = {
        "params": jax.device_get(rstate.params),
        "batch_stats": jax.device_get(rstate.batch_stats),
    }
    rsummary = revaluator.run_checkpoint_once(
        rvariables, int(rstate.step), num_rois=32
    )
    out["rcnn_eval_summary"] = rsummary
    return out


def test_rpn_training_and_checkpoints(two_stage_run):
    cfg = two_stage_run["rpn_cfg"]
    ckpt_dir = os.path.join(
        two_stage_run["root"], cfg.model_config.checkpoint_name, "checkpoints"
    )
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() == cfg.train_config.max_iterations
    mgr.close()


def test_rpn_handoff_files(two_stage_run):
    pred_dir = two_stage_run["pred_dir"]
    step = int(two_stage_run["rpn_state"].step)
    props = glob.glob(
        os.path.join(pred_dir, "proposals_and_scores", "train", str(step), "*.txt")
    )
    feats = glob.glob(
        os.path.join(pred_dir, "rpn_feature", "train", str(step), "*.npy")
    )
    ious = glob.glob(
        os.path.join(pred_dir, "proposals_iou", "train", str(step), "*.txt")
    )
    assert len(props) > 0 and len(props) == len(feats) == len(ious)

    rows = np.loadtxt(props[0]).reshape(-1, 8)
    assert rows.shape[0] >= 1  # box(7) + score

    arr = np.load(feats[0])
    # pts(3) + intensity(1) + fg(1) + pc_fts(64) + img_fts(8)
    assert arr.shape[1] == 3 + 1 + 1 + 64 + 8


def test_rpn_eval_summary(two_stage_run):
    s = two_stage_run["rpn_eval_summary"]
    assert 0.0 <= s["avg_seg_acc"] <= 1.0
    assert s["avg_num_proposals"] >= 1
    assert np.isfinite(s["avg_iou3d"])


def test_rcnn_batch_from_handoff(two_stage_run):
    batch = two_stage_run["rcnn_batch"]
    roi_n = two_stage_run["rcnn_cfg"].dataset_config.mini_batch_config.roi_per_sample
    assert batch["rpn_roi"].shape == (1, roi_n, 7)
    assert batch["rpn_iou"].shape == (1, roi_n)
    assert batch["rpn_gt"].shape == (1, roi_n, 8)
    assert batch["rpn_fts"].shape[2] == 72


def test_rcnn_training_progressed(two_stage_run):
    rstate = two_stage_run["rcnn_state"]
    cfg = two_stage_run["rcnn_cfg"]
    assert int(rstate.step) == cfg.train_config.max_iterations


def test_final_predictions_and_kitti_txt(two_stage_run):
    cfg = two_stage_run["rcnn_cfg"]
    step = int(two_stage_run["rcnn_state"].step)
    base = os.path.join(
        two_stage_run["root"], cfg.model_config.checkpoint_name, "predictions"
    )
    finals = glob.glob(
        os.path.join(base, "final_predictions_and_scores", "train", str(step), "*.txt")
    )
    assert len(finals) > 0
    rows = np.loadtxt(finals[0])
    if rows.size:
        rows = rows.reshape(-1, 9)
        # scores in [0, 1], classes in {0, 1, 2}
        assert (rows[:, 7] >= 0).all() and (rows[:, 7] <= 1).all()
        assert set(rows[:, 8].astype(int)).issubset({0, 1, 2})

    kitti_dir = two_stage_run["rcnn_eval_summary"]["kitti_predictions_dir"]
    kitti_files = glob.glob(os.path.join(kitti_dir, "*.txt"))
    assert len(kitti_files) > 0
    # KITTI rows must have 16 columns when non-empty.
    for f in kitti_files:
        with open(f) as fh:
            for line in fh:
                parts = line.split()
                if parts:
                    assert len(parts) == 16
                    assert parts[0] in ("Car", "Pedestrian", "Cyclist")


def _read_ledger(path):
    """Parse the reference-format '%d, %.5f, ...' np.savetxt CSVs."""
    rows = np.loadtxt(path, delimiter=",", ndmin=2)
    return rows


def test_rpn_loss_ledgers(two_stage_run):
    """Per-checkpoint loss ledgers in the reference's format + the evaluated
    loss decreases from the untrained (step-0) baseline to the trained step
    (reference evaluator.py:683-726)."""
    pred_dir = two_stage_run["pred_dir"]
    step = int(two_stage_run["rpn_state"].step)

    losses = _read_ledger(os.path.join(pred_dir, "rpn_avg_losses.csv"))
    # columns: step, seg, bin_cls, reg, total
    assert losses.shape == (2, 5)
    assert np.isfinite(losses).all()
    by_step = {int(r[0]): r for r in losses}
    assert set(by_step) == {0, step}
    assert by_step[step][4] < by_step[0][4]  # total loss decreased

    seg_acc = _read_ledger(os.path.join(pred_dir, "rpn_avg_seg_acc.csv"))
    assert seg_acc.shape == (2, 2)
    assert (seg_acc[:, 1] >= 0).all() and (seg_acc[:, 1] <= 1).all()
    by_step_acc = {int(r[0]): r for r in seg_acc}
    assert by_step_acc[step][1] >= by_step_acc[0][1]

    recall = _read_ledger(os.path.join(pred_dir, "rpn_total_recall.csv"))
    # columns: step, r50, r70, avg_proposals, iou2d, iou3d, angle_res
    assert recall.shape == (2, 7)
    assert np.isfinite(recall).all()


def test_rcnn_loss_ledgers(two_stage_run):
    cfg = two_stage_run["rcnn_cfg"]
    pred_dir = os.path.join(
        two_stage_run["root"], cfg.model_config.checkpoint_name, "predictions"
    )
    losses = _read_ledger(os.path.join(pred_dir, "rcnn_avg_losses.csv"))
    assert losses.shape[1] == 5
    assert np.isfinite(losses).all()
    s = two_stage_run["rcnn_eval_summary"]
    assert np.isfinite(s["avg_losses"]["rcnn_total_loss"])

    acc = _read_ledger(os.path.join(pred_dir, "rcnn_avg_cls_acc.csv"))
    assert (acc[:, 1] >= 0).all() and (acc[:, 1] <= 1).all()


def test_inference_time_stats(two_stage_run):
    """min/max/mean/median timing parity (reference
    evaluator_utils.print_inference_time_statistics :222-238)."""
    for key in ("rpn_eval_summary", "rcnn_eval_summary"):
        ts = two_stage_run[key]["inference_time_stats"]
        assert ts["min"] <= ts["median"] <= ts["max"]
        assert ts["min"] <= ts["mean"] <= ts["max"]


def test_warm_start_transferred_img_branch(two_stage_run):
    """The RCNN's image extractor params should have been warm-started from
    the RPN checkpoint (identical subtree names)."""
    rpn_params = jax.device_get(two_stage_run["rpn_state"].params)
    merged = restore_matching(
        jax.device_get(two_stage_run["rcnn_state"].params), rpn_params
    )
    assert "img_vgg_pyr" in merged

"""Trainer-loop test with a fake model (the reference's FakeBatchNormClassifier
pattern, hf/core/trainer_test.py:20-105): exercises the full train() loop —
output dirs, config snapshot, checkpointing, resume — without KITTI or the
real models."""

import glob
import json
import os

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from heterofusionrcnn_tpu.configs.config import PipelineConfig
from heterofusionrcnn_tpu.runtime.checkpoint import CheckpointManager
from heterofusionrcnn_tpu.runtime.trainer import train


class FakeClassifier(nn.Module):
    """BatchNorm + Dense binary classifier over 4-dim inputs."""

    @nn.compact
    def __call__(self, x, y=None, training: bool = False):
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9)(x)
        logits = nn.Dense(2)(h)
        return {"logits": logits, "labels": y}


def fake_loss(preds):
    logits = preds["logits"]
    labels = preds["labels"]
    loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    )
    return {"ce": loss}, loss


def make_fake_train_step(loss_fn):
    @jax.jit
    def step(state, batch, rng):
        def compute(params):
            preds, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["x"],
                batch["y"],
                training=True,
                mutable=["batch_stats"],
            )
            loss_dict, total = loss_fn(preds)
            return total, (loss_dict, updates["batch_stats"])

        (total, (loss_dict, stats)), grads = jax.value_and_grad(
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
        return new_state, metrics, rng

    return step


@pytest.fixture()
def fake_setup(tmp_path):
    cfg = PipelineConfig()
    cfg.model_config.checkpoint_name = "fake_test"
    cfg.train_config.max_iterations = 5
    cfg.train_config.checkpoint_interval = 2
    cfg.train_config.summary_interval = 1
    cfg.train_config.optimizer.initial_learning_rate = 0.05

    rng = np.random.default_rng(0)
    # 16-sample synthetic dataset: class = sign of the first feature.
    xs = rng.normal(size=(16, 4)).astype(np.float32)
    ys = (xs[:, 0] > 0).astype(np.int32)

    def next_batch():
        idx = rng.integers(0, 16, 8)
        return {"x": xs[idx], "y": ys[idx]}

    return cfg, next_batch, str(tmp_path)


def test_trainer_end_to_end(fake_setup):
    cfg, next_batch, out_root = fake_setup
    model = FakeClassifier()
    state = train(
        model=model,
        loss_fn=fake_loss,
        make_train_step=make_fake_train_step,
        init_batch=next_batch(),
        next_batch=next_batch,
        pipeline_cfg=cfg,
        output_root=out_root,
        num_devices=1,
        prefetch=2,
    )
    assert int(state.step) == 5

    base = os.path.join(out_root, "fake_test")
    # Output tree + config snapshot (reference conventions).
    assert os.path.isdir(os.path.join(base, "checkpoints"))
    assert os.path.exists(os.path.join(base, "fake_test_config.json"))
    # Metrics logged.
    metrics_path = os.path.join(base, "logs", "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_path)]
    assert len(rows) >= 5
    assert all(np.isfinite(r["total_loss"]) for r in rows)

    # Checkpoints at the interval + final.
    mgr = CheckpointManager(os.path.join(base, "checkpoints"))
    steps = mgr.all_steps()
    mgr.close()
    assert 2 in steps and 4 in steps and 5 in steps


def test_trainer_resumes(fake_setup):
    cfg, next_batch, out_root = fake_setup
    model = FakeClassifier()
    common = dict(
        model=model,
        loss_fn=fake_loss,
        make_train_step=make_fake_train_step,
        init_batch=next_batch(),
        next_batch=next_batch,
        pipeline_cfg=cfg,
        output_root=out_root,
        num_devices=1,
        prefetch=0,
    )
    train(**common)  # to step 5
    cfg.train_config.max_iterations = 8
    state = train(**common)  # resumes from 5, continues to 8
    assert int(state.step) == 8


def test_trainer_rss_limit_checkpoints_and_exits(fake_setup, monkeypatch):
    """HFR_MAX_HOST_RSS_MB turns the round-5 host-memory leak into a graceful
    restart: the trainer checkpoints at the CURRENT step and exits 75 so an
    outer loop (tools/genrun_loop.sh) can relaunch and resume."""
    cfg, next_batch, out_root = fake_setup
    # 1 MB limit: any real process exceeds it at the first log step.
    monkeypatch.setenv("HFR_MAX_HOST_RSS_MB", "1")
    with pytest.raises(SystemExit) as exc:
        train(
            model=FakeClassifier(),
            loss_fn=fake_loss,
            make_train_step=make_fake_train_step,
            init_batch=next_batch(),
            next_batch=next_batch,
            pipeline_cfg=cfg,
            output_root=out_root,
            num_devices=1,
            prefetch=0,
        )
    assert exc.value.code == 75
    # Checkpoint exists at step 1 (summary_interval=1 -> first log step).
    mgr = CheckpointManager(os.path.join(out_root, "fake_test", "checkpoints"))
    steps = mgr.all_steps()
    mgr.close()
    assert 1 in steps
    # RSS made it into the metrics ledger.
    metrics_path = os.path.join(out_root, "fake_test", "logs", "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_path)]
    assert rows and rows[0]["host_rss_mb"] > 1.0

    # Relaunch without the limit resumes from the saved step and completes.
    monkeypatch.delenv("HFR_MAX_HOST_RSS_MB")
    state = train(
        model=FakeClassifier(),
        loss_fn=fake_loss,
        make_train_step=make_fake_train_step,
        init_batch=next_batch(),
        next_batch=next_batch,
        pipeline_cfg=cfg,
        output_root=out_root,
        num_devices=1,
        prefetch=0,
    )
    assert int(state.step) == cfg.train_config.max_iterations


def test_metrics_logger_summary_toggles(tmp_path):
    """summary_histograms / summary_img_images / summary_pc_images wiring
    (reference trainer.py:58-60 + summary_utils.summaries_to_keep)."""
    from heterofusionrcnn_tpu.runtime.trainer import MetricsLogger, device_memory_mb

    log_dir = str(tmp_path / "logs")
    logger = MetricsLogger(
        log_dir, histograms=True, img_images=True, pc_images=True
    )
    params = {
        "dense": {"kernel": jnp.linspace(-1.0, 1.0, 256).reshape(16, 16),
                  "bias": jnp.zeros((16,))},
    }
    logger.log(1, {"loss": 1.0})
    logger.log_param_histograms(1, params)
    batch = {
        "image_input": np.random.default_rng(0).uniform(0, 255, (1, 24, 48, 3)),
        "point_cloud": np.random.default_rng(1).uniform(-10, 40, (1, 256, 4)),
    }
    logger.log_input_summaries(1, batch)
    logger.close()

    # TB event files carry the summaries (torch TB is baked into the env).
    events = glob.glob(os.path.join(log_dir, "events.*"))
    assert events and os.path.getsize(events[0]) > 500

    # Toggles off -> no histogram work (must not throw, logs scalars only).
    logger2 = MetricsLogger(str(tmp_path / "logs2"), histograms=False)
    logger2.log_param_histograms(1, params)
    logger2.log_input_summaries(1, batch)
    logger2.close()

    assert device_memory_mb() >= 0.0


def test_trainer_profile_steps(fake_setup, tmp_path):
    """profile_steps captures a jax.profiler trace into <logs>/profile."""
    cfg, next_batch, out_root = fake_setup
    model = FakeClassifier()
    train(
        model=model,
        loss_fn=fake_loss,
        make_train_step=make_fake_train_step,
        init_batch=next_batch(),
        next_batch=next_batch,
        pipeline_cfg=cfg,
        output_root=out_root,
        num_devices=1,
        prefetch=0,
        profile_steps=(1, 3),
    )
    prof_dir = os.path.join(out_root, "fake_test", "logs", "profile")
    files = glob.glob(os.path.join(prof_dir, "**", "*"), recursive=True)
    assert any(os.path.isfile(f) for f in files)

"""Training engine tests: convergence, DP equivalence, checkpoint resume."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from closerlook3d_tpu.models import build_model
from closerlook3d_tpu.parallel.mesh import make_mesh, shard_batch
from closerlook3d_tpu.train.schedules import make_lr_schedule, make_optimizer
from closerlook3d_tpu.train.state import create_train_state
from closerlook3d_tpu.train.step import make_train_step
from closerlook3d_tpu.utils.config import load_config


def tiny_cfg():
    cfg = load_config()
    cfg.datasets = "synthetic"
    cfg.task = "classification"
    cfg.num_points = 64
    cfg.num_classes = 4
    cfg.width = 24
    cfg.depth = 1
    cfg.nsamples = [8, 8]
    cfg.radius = 0.4
    cfg.npoints = []
    cfg.precision = "f32"
    cfg.batch_size = 8
    cfg.cls_head_dims = [32, 16]
    cfg.base_learning_rate = 0.05
    cfg.warmup_epoch = 0
    cfg.epochs = 10
    cfg.weight_decay = 1e-4
    cfg.label_smoothing = 0.0
    return cfg


def make_batch(cfg, seed=0):
    from closerlook3d_tpu.data.synthetic import SyntheticClassification

    ds = SyntheticClassification(cfg.batch_size, cfg.num_points,
                                 cfg.num_classes, seed=seed)
    samples = [ds[i] for i in range(cfg.batch_size)]
    return {
        "xyz": np.stack([s["xyz"] for s in samples]),
        "mask": np.stack([s["mask"] for s in samples]),
        "features": np.stack([s["xyz"] for s in samples]),
        "label": np.stack([s["label"] for s in samples]),
    }


def test_overfit_minibatch():
    """A correct trunk must overfit one small batch quickly."""
    cfg = tiny_cfg()
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    model, loss_fn = build_model(cfg)
    # long horizon: the cosine schedule must not hit zero mid-test
    optimizer, _ = make_optimizer(cfg, steps_per_epoch=20)
    batch = shard_batch(make_batch(cfg), mesh)
    state = create_train_state(cfg, model, optimizer, jax.random.PRNGKey(0),
                               batch, mesh)
    step = make_train_step(model, loss_fn, cfg.task, mesh, donate=False)
    rng = jax.random.PRNGKey(1)
    first = None
    for i in range(50):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    acc = float(metrics["acc"])
    assert last < first * 0.5, (first, last)
    assert acc >= 0.75, acc


def test_dp_equals_single_device():
    """Sharding the batch over 8 virtual devices must not change the math."""
    cfg = tiny_cfg()
    batch_np = make_batch(cfg)
    rng = jax.random.PRNGKey(1)

    results = {}
    for name, (dp, devs) in {
        "single": (1, jax.devices()[:1]),
        "dp8": (8, jax.devices()[:8]),
    }.items():
        mesh = make_mesh(dp, 1, devices=devs)
        model, loss_fn = build_model(cfg)
        optimizer, _ = make_optimizer(cfg, steps_per_epoch=1)
        batch = shard_batch(batch_np, mesh)
        state = create_train_state(cfg, model, optimizer,
                                   jax.random.PRNGKey(0), batch, mesh)
        step = make_train_step(model, loss_fn, cfg.task, mesh, donate=False)
        for _ in range(3):
            state, metrics = step(state, batch, rng)
        results[name] = (
            float(metrics["loss"]),
            float(jnp.mean(jnp.abs(
                jax.tree_util.tree_leaves(state.params)[0]))),
        )
    loss1, p1 = results["single"]
    loss8, p8 = results["dp8"]
    assert np.isclose(loss1, loss8, rtol=1e-4), (loss1, loss8)
    assert np.isclose(p1, p8, rtol=1e-4), (p1, p8)


def test_checkpoint_roundtrip(tmp_path):
    from closerlook3d_tpu.train.checkpoints import CheckpointManager

    cfg = tiny_cfg()
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    model, loss_fn = build_model(cfg)
    optimizer, _ = make_optimizer(cfg, steps_per_epoch=1)
    batch = shard_batch(make_batch(cfg), mesh)
    state = create_train_state(cfg, model, optimizer, jax.random.PRNGKey(0),
                               batch, mesh)
    step = make_train_step(model, loss_fn, cfg.task, mesh, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(int(state.step), state, extra={"epoch": 3})
    mgr.wait()

    template = create_train_state(cfg, model, optimizer,
                                  jax.random.PRNGKey(7), batch, mesh)
    restored, extra, step_no = mgr.restore(template)
    assert step_no == int(state.step)
    assert extra["epoch"] == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_lr_schedules():
    cfg = tiny_cfg()
    for sched in ("cosine", "step", "multistep"):
        cfg.lr_scheduler = sched
        cfg.lr_milestones = [5, 8]
        fn = make_lr_schedule(cfg, steps_per_epoch=10)
        v0 = float(fn(0))
        vend = float(fn(cfg.epochs * 10 - 1))
        assert vend <= v0
    cfg.lr_scheduler = "cosine"
    cfg.warmup_epoch = 2
    fn = make_lr_schedule(cfg, steps_per_epoch=10)
    assert float(fn(0)) < float(fn(19))  # warming up


def test_kill_resume_fault_injection(tmp_path):
    """Failure-recovery analogue (SURVEY.md §5): a run that dies mid-job
    must resume from the latest checkpoint on restart, not from scratch.

    Run A trains 2 of 4 epochs (checkpointing each) and is then
    abandoned without finishing — the process-state-discarded
    equivalent of a kill. Run B constructs a fresh Trainer on the same
    workdir: auto-resume must restore the exact optimizer step and
    continue at epoch 3, and finishing must leave the final-epoch
    checkpoint behind.
    """
    from closerlook3d_tpu.train.loop import Trainer

    def cfg_for():
        cfg = tiny_cfg()
        cfg.epochs = 4
        cfg.save_interval = 1
        cfg.val_interval = 10**9  # skip validation (slow CPU compiles)
        cfg.log_interval = 10**9
        cfg.use_pallas = "never"
        return cfg

    wd = str(tmp_path / "run")
    a = Trainer(cfg_for(), wd)
    assert a.start_epoch == 1  # fresh dir: nothing to resume
    for epoch in (1, 2):
        a.train_one_epoch(epoch)
        a.ckpt.save(int(a.state.step), a.state, extra={"epoch": epoch})
    a.ckpt.wait()
    step_at_kill = int(a.state.step)
    del a  # the "kill": in-flight training state is discarded

    b = Trainer(cfg_for(), wd)
    assert b.start_epoch == 3  # resumed past the completed epochs
    assert int(b.state.step) == step_at_kill
    b.fit()  # completes epochs 3..4 only
    assert int(b.state.step) > step_at_kill

    c = Trainer(cfg_for(), wd)  # post-completion restart
    assert c.start_epoch == 5


def test_best_checkpoint_saved(tmp_path):
    """fit() must keep the best-val model in ckpt_best even when a later
    (worse) epoch is the last one saved to the keep-k latest slot."""
    from closerlook3d_tpu.train.loop import Trainer

    cfg = tiny_cfg()
    cfg.epochs = 3
    cfg.save_interval = 1
    cfg.val_interval = 1
    cfg.log_interval = 10**9
    cfg.use_pallas = "never"

    t = Trainer(cfg, str(tmp_path / "run"))
    canned = iter([{"acc": 0.5}, {"acc": 0.8}, {"acc": 0.6}])
    best_steps = []
    t.validate = lambda epoch: next(canned)
    orig_save = t.ckpt_best.save
    t.ckpt_best.save = lambda step, state, extra=None: (
        best_steps.append((step, extra)), orig_save(step, state, extra))[1]
    best = t.fit()
    assert best == 0.8
    # saved at epochs 1 and 2 (improvements), not at epoch 3 (worse)
    assert len(best_steps) == 2
    assert best_steps[-1][1]["value"] == 0.8
    assert best_steps[-1][1]["epoch"] == 2
    # the surviving on-disk best checkpoint is the epoch-2 one
    assert t.ckpt_best.latest_step() == best_steps[-1][0]
    # and the latest slot moved past it
    assert t.ckpt.latest_step() > t.ckpt_best.latest_step()


def test_nan_loss_aborts_training(tmp_path):
    """A diverged step must kill training loudly at the next fetch, not
    keep training garbage behind healthy-looking meters (VERDICT r4
    weak #1)."""
    import pytest

    from closerlook3d_tpu.train.loop import Trainer

    cfg = tiny_cfg()
    cfg.epochs = 1
    cfg.log_interval = 1
    cfg.use_pallas = "never"

    t = Trainer(cfg, str(tmp_path / "run"))
    orig = t.train_step

    def poisoned(state, batch, rng):
        state, metrics = orig(state, batch, rng)
        metrics = dict(metrics)
        metrics["loss"] = metrics["loss"] * jnp.float32("nan")
        return state, metrics

    t.train_step = poisoned
    with pytest.raises(FloatingPointError, match="non-finite"):
        t.fit()

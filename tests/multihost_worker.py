"""Worker process for the REAL 2-process multi-host test (not a test).

Usage: python tests/multihost_worker.py <coordinator_port> <pid> <pcnt> \
           [trainer <workdir>]

Each worker owns 2 virtual CPU devices; jax.distributed.initialize joins
them into one 2x2-device job.

Step mode (default): runs 3 global train steps on a deterministic batch
(its process-local shard assembled into the global array by shard_batch)
and exercises the host-side collective helpers, then prints the final
loss for the parent to compare against the single-process 4-device run.

Trainer mode (VERDICT r3 item 5): drives the FULL Trainer.fit — epoch
loop, process-sharded data iterators, cross-process validation
reductions, rank-gated logging/scalars, and Orbax multi-process
checkpointing (keep-k + best slot) — for 2 tiny epochs in a SHARED
workdir, then re-constructs a Trainer to prove multi-process
auto-resume restores the saved step. Prints the best metric and the
resumed step for the parent to cross-check between ranks.
"""

import os
import sys

port, pid, pcnt = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
mode = sys.argv[4] if len(sys.argv) > 4 else "step"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

# the axon plugin's sitecustomize (if on PYTHONPATH) forces
# jax_platforms="axon,cpu" before env vars are read — override it
jax.config.update("jax_platforms", "cpu")

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=pcnt, process_id=pid)
assert jax.process_count() == pcnt, jax.process_count()
assert jax.local_device_count() == 2
assert len(jax.devices()) == 2 * pcnt

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tests.test_train import make_batch, tiny_cfg  # noqa: E402

if mode == "trainer":
    workdir = sys.argv[5]
    from closerlook3d_tpu.train.loop import Trainer

    cfg = tiny_cfg()
    cfg.synthetic_train_size = 48   # 24 local / bs 8 = 3 steps/epoch
    cfg.synthetic_val_size = 16
    cfg.epochs = 2
    cfg.val_interval = 1
    cfg.save_interval = 1
    cfg.log_interval = 1
    cfg.keep_checkpoints = 2
    cfg.data_parallel = 2 * pcnt
    cfg.model_parallel = 1
    cfg.num_workers = 0
    cfg.use_pallas = "never"  # interpret-mode kernels compile slowly on CPU

    trainer = Trainer(cfg, workdir)
    best = trainer.fit()
    step_after = int(trainer.state.step)
    assert step_after == 2 * 3, step_after  # 2 epochs x 3 global steps

    # multi-process auto-resume: a fresh Trainer on the same workdir
    # must restore the latest step on every rank
    resumed = Trainer(cfg, workdir)
    assert int(resumed.state.step) == step_after, int(resumed.state.step)
    assert resumed.start_epoch == cfg.epochs + 1, resumed.start_epoch
    p0 = jax.tree_util.tree_leaves(trainer.state.params)[0]
    p1 = jax.tree_util.tree_leaves(resumed.state.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))

    # one full evaluator under the real 2-process runtime: shard-local
    # batches, collective forward, cross-process count reduction
    from closerlook3d_tpu.train.evaluate import evaluate_classification
    from closerlook3d_tpu.train.loop import device_batch

    def logits_fn(state, batch):
        return trainer.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["xyz"], batch["mask"], batch["features"], train=False)

    jitted = jax.jit(logits_fn)
    res = evaluate_classification(
        cfg, trainer.state,
        lambda s, b: jitted(s, device_batch(b, trainer.mesh)),
        trainer.val_iter)
    assert res["accuracy"] >= 0.0

    print(f"TRAINER_OK pid={pid} best={best:.6f} step={step_after} "
          f"evalacc={res['accuracy']:.6f}", flush=True)
    sys.exit(0)

from closerlook3d_tpu.models import build_model  # noqa: E402
from closerlook3d_tpu.parallel.collectives import (  # noqa: E402
    all_processes_concat,
    all_processes_sum,
)
from closerlook3d_tpu.parallel.mesh import make_mesh, shard_batch  # noqa: E402
from closerlook3d_tpu.train.schedules import make_optimizer  # noqa: E402
from closerlook3d_tpu.train.state import create_train_state  # noqa: E402
from closerlook3d_tpu.train.step import make_train_step  # noqa: E402

# device order must put process p's devices at block p for the
# contiguous batch split below to land each shard on its own host
devs = jax.devices()
assert all(d.process_index == i // 2 for i, d in enumerate(devs)), devs

cfg = tiny_cfg()
batch_np = make_batch(cfg)  # deterministic: same global batch everywhere
half = cfg.batch_size // pcnt
local = {k: v[pid * half:(pid + 1) * half] for k, v in batch_np.items()}

mesh = make_mesh(2 * pcnt, 1)
model, loss_fn = build_model(cfg)
optimizer, _ = make_optimizer(cfg, steps_per_epoch=1)
dbatch = shard_batch(local, mesh)  # cross-process global-array assembly
assert dbatch["xyz"].shape[0] == cfg.batch_size  # global, not local
state = create_train_state(cfg, model, optimizer, jax.random.PRNGKey(0),
                           dbatch, mesh)
step = make_train_step(model, loss_fn, cfg.task, mesh, donate=False)
rng = jax.random.PRNGKey(1)
for _ in range(3):
    state, metrics = step(state, dbatch, rng)
loss = float(metrics["loss"])

# host-side collective helpers under a REAL multi-process runtime
assert all_processes_sum(pid + 1) == sum(range(1, pcnt + 1))
tree = all_processes_sum({"a": np.eye(2) * (pid + 1)})
np.testing.assert_allclose(tree["a"], np.eye(2) * sum(range(1, pcnt + 1)))
ragged = np.full((pid + 1, 2), pid, np.float32)  # different n per process
cat = all_processes_concat(ragged)
expect = np.concatenate(
    [np.full((p + 1, 2), p, np.float32) for p in range(pcnt)])
np.testing.assert_array_equal(cat, expect)

print(f"WORKER_OK pid={pid} loss={loss:.6f}", flush=True)

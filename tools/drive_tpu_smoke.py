"""End-to-end drive of the public surfaces on the attached accelerator.

The .claude/skills/verify recipe, runnable as a repo tool: masked
S3DIS-scale clouds (incl. an ALL-PADDING batch element) through the op
layer, the seg model + train step, and the __graft_entry__ hook. Run
with the axon plugin on the path:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/drive_tpu_smoke.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.devices(), flush=True)

from closerlook3d_tpu.ops import ball_query, knn
from closerlook3d_tpu.ops.sampling import furthest_point_sample, grid_subsample

B, N = 2, 15360
rng = np.random.default_rng(0)
xyz = jnp.asarray(rng.uniform(-2, 2, (B, N, 3)), jnp.float32)
mask = np.ones((B, N), bool)
mask[1, :] = False  # an ALL-PADDING cloud in the batch
mask[0, 12000:] = False  # and a partially padded one
mask = jnp.asarray(mask)

idx, nmask = ball_query(xyz, xyz, 0.1, 26, query_mask=mask,
                        support_mask=mask)
assert idx.shape == (B, N, 26)
assert not bool(nmask[1].any()), "all-padding cloud must have no neighbors"
assert int(idx.min()) >= 0 and int(idx.max()) < N
print("ball_query ok: nbrs/valid-pt =",
      float(jnp.sum(nmask)) / float(jnp.sum(mask)), flush=True)

ki, kd = knn(xyz[:, :4096], xyz, 3, support_mask=mask)
assert np.isfinite(np.asarray(kd)).all()
print("knn ok", flush=True)

fidx, fmask = furthest_point_sample(xyz, 4096, mask)
assert fidx.shape == (B, 4096)
sx, sm = grid_subsample(xyz, 0.08, 4096, mask)
assert np.isfinite(np.asarray(sx)).all()
assert not bool(sm[1].any())
print("fps/grid_subsample ok", flush=True)

# model + train step at S3DIS scale through the public API
from closerlook3d_tpu.models import build_model
from closerlook3d_tpu.parallel.mesh import make_mesh, shard_batch
from closerlook3d_tpu.train.schedules import make_optimizer
from closerlook3d_tpu.train.state import create_train_state
from closerlook3d_tpu.train.step import make_train_step
from closerlook3d_tpu.utils.config import load_config

cfg = load_config()
cfg.task = "scene_segmentation"
cfg.num_points = N
cfg.num_classes = 13
cfg.sampling = "grid"
cfg.radius = 0.1
cfg.sampleDl = 0.08
cfg.npoints = [N, 4096, 1152, 304, 88]
cfg.batch_size = B
cfg.input_features = "ones,rgb,height"
cfg.precision = "bf16"

feats = np.concatenate([np.ones((B, N, 1), np.float32),
                        rng.uniform(0, 1, (B, N, 3)).astype(np.float32),
                        np.asarray(xyz)[..., 2:3]], axis=-1)
host = {"xyz": np.asarray(xyz), "mask": np.asarray(mask),
        "features": feats,
        "labels": rng.integers(0, 13, (B, N)).astype(np.int32)}
mesh = make_mesh(data_parallel=len(jax.devices()), model_parallel=1)
model, loss_fn = build_model(cfg)
opt, _ = make_optimizer(cfg, steps_per_epoch=10)
db = shard_batch(host, mesh)
state = create_train_state(cfg, model, opt, jax.random.PRNGKey(0), db,
                           mesh)
step = make_train_step(model, loss_fn, cfg.task, mesh)
losses = []
for i in range(3):
    state, m = step(state, db, jax.random.PRNGKey(1))
    losses.append(float(m["loss"]))
assert all(np.isfinite(losses)), losses
print("train_step ok (all-padding element included): losses", losses,
      flush=True)

import __graft_entry__ as ge
fn, args = ge.entry()
out = jax.jit(fn)(*args)
leaf = jax.tree_util.tree_leaves(out)[0]
assert np.isfinite(np.asarray(leaf, np.float32)).all()
print("entry() ok", flush=True)
print("DRIVE OK", flush=True)

"""Worker for the two-process multi-host CPU test (tests/test_multihost.py).

Spawned as `python multihost_worker.py <process_id> <port>`: initializes the
distributed runtime against a localhost coordinator, builds the DCN x ICI
hybrid mesh (data axis across processes, aug axis across each process's 4
fake devices), and runs the full sharded ASR batch with host-local inputs.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]

from deeplabv3plus_augmented_superresolution_tpu.parallel import (
    host_local_batch_to_global, initialize_distributed, make_multihost_mesh,
    multihost_mesh_shape)

ok = initialize_distributed(f"localhost:{port}", num_processes=2, process_id=pid)
assert ok
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4

mesh = make_multihost_mesh()
assert dict(mesh.shape) == {"data": 2, "aug": 4}, mesh.shape
assert multihost_mesh_shape(2, 4) == ((2, 1), (1, 4))

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

# Each host contributes its own slice of the global (data=2, aug=4) array.
local = np.full((1, 4), float(pid + 1), np.float32)
garr = host_local_batch_to_global(mesh, local, P("data", "aug"))
assert garr.shape == (2, 4)

total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
val = float(np.asarray(jax.device_get(total)))
assert val == 1.0 * 4 + 2.0 * 4, val
print(f"proc {pid}: multihost mesh OK, global sum {val}")

# Full ASR batch across hosts: each process contributes 1 local image;
# 10 copies pad to 12 on the 4-wide aug axis.
from deeplabv3plus_augmented_superresolution_tpu.models import (
    DeepLabConfig, build_model)
from deeplabv3plus_augmented_superresolution_tpu.parallel import (
    make_asr_batch_fn, shard_batch_multihost)
from deeplabv3plus_augmented_superresolution_tpu.pipeline import (
    sample_augmentations)
from deeplabv3plus_augmented_superresolution_tpu.sr import (
    OptimizerConfig, SRConfig)

cfg = DeepLabConfig(input_shape=(64, 64, 3), backbone="mobilenet",
                    final_upsample=False)
params, _ = build_model(cfg, seed=0)
sr_cfg = SRConfig(num_iter=2, num_aug=10, feature_size=(8, 8),
                  output_size=(64, 64), angle_max=0.2,
                  optimizer=OptimizerConfig(learning_rate=1e-2))
rng = np.random.default_rng(pid)
local_images = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
a, s = sample_augmentations(jax.random.key(7), 10, 0.2, 4.0)
fn = make_asr_batch_fn(mesh, cfg, sr_cfg, class_id=8, sr_types=("aug", "mean"))
args_g = shard_batch_multihost(mesh, params, local_images,
                               np.asarray(a)[None], np.asarray(s)[None])
out = fn(*args_g)
for k, v in out.items():
    assert v.shape == (2, 64, 64, 1), (k, v.shape)
    local = np.asarray([sh.data for sh in v.addressable_shards][0])
    assert np.isfinite(local).all(), k
print(f"proc {pid}: multihost ASR batch OK over mesh {dict(mesh.shape)}")

# DP training across hosts: global batch 8 = 2 hosts x 4 local devices, each
# process generating only its own 4 scenes; gradient all-reduce + global
# (synchronized) BN stats ride the same mesh.
import optax
from deeplabv3plus_augmented_superresolution_tpu.data.synthetic import (
    synthetic_batch)
from deeplabv3plus_augmented_superresolution_tpu.parallel import (
    make_sharded_train_step)

train_cfg = DeepLabConfig(input_shape=(32, 32, 3), classes=5,
                          backbone="mobilenet", alpha=0.35, weights=None,
                          final_upsample=True, compute_dtype="float32")
tparams, _ = build_model(train_cfg, seed=0)
tx = optax.sgd(1e-2)
step = make_sharded_train_step(mesh, train_cfg, tx)
rng_t = np.random.default_rng(100 + pid)
imgs, labs = synthetic_batch(rng_t, 4, size=(32, 32), class_ids=(1, 2))
to_g = lambda x, spec: host_local_batch_to_global(mesh, np.asarray(x), spec)
gp = jax.tree.map(lambda x: to_g(x, P()), tparams)
go = jax.tree.map(lambda x: to_g(x, P()), tx.init(tparams))
gi = to_g(imgs, P(("data", "aug")))
gl = to_g(labs.astype(np.int32), P(("data", "aug")))
gp, go, loss = step(gp, go, gi, gl)
lv = float(np.asarray(jax.device_get(loss)))
assert np.isfinite(lv), lv
print(f"proc {pid}: multihost train step OK, loss {lv:.4f}")

"""Multi-host (pod-style) data-parallel training walkthrough.

One JAX process drives one host's chips; a pod spans many processes.  This
example IS the per-process entry point — launch one copy per host:

    # on a real TPU pod (one command per host; the runtime discovers peers):
    python examples/multihost_train.py

    # simulated 2-process cluster on one machine (CPU, ~1 min):
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    GOALNET_PLATFORM=cpu GOALNET_COORDINATOR=127.0.0.1:12321 \
    GOALNET_NUM_PROCESSES=2 GOALNET_PROCESS_ID=0 python examples/multihost_train.py &
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    GOALNET_PLATFORM=cpu GOALNET_COORDINATOR=127.0.0.1:12321 \
    GOALNET_NUM_PROCESSES=2 GOALNET_PROCESS_ID=1 python examples/multihost_train.py &
    wait

Each process:

1. joins the distributed system (``parallel/multihost.initialize_from_env``);
2. builds ONE global mesh over every process's devices;
3. loads only ITS slice of each global batch and assembles a global
   ``jax.Array`` with ``shard_host_batch`` (shards stay on the devices of
   the process that loaded them — no host ever holds the full batch);
4. runs the SAME ``make_dp_train_step`` the single-process path uses: a jit
   over a global mesh emits the same XLA collectives whether the mesh spans
   one process or sixty-four.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cvml_goalnet_tpu.utils import apply_platform_override

apply_platform_override()

import numpy as np
import jax

from cvml_goalnet_tpu.parallel.multihost import (
    initialize_from_env,
    replicated_to_host,
    shard_host_batch,
)

initialize_from_env()
print(f"process {jax.process_index()}/{jax.process_count()}: "
      f"{jax.local_device_count()} local / {jax.device_count()} global devices")

from cvml_goalnet_tpu.config import (
    AudioConfig, MeshConfig, ModelConfig, PipelineConfig, PreprocessConfig)
from cvml_goalnet_tpu.parallel.dp import make_dp_train_step
from cvml_goalnet_tpu.parallel.mesh import build_mesh
from cvml_goalnet_tpu.train.state import create_train_state

n = jax.device_count()
cfg = PipelineConfig(
    preprocess=PreprocessConfig(frame_size=(24, 24)),
    audio=AudioConfig(n_fft=512, hop_length=128, n_mels=40, n_mfcc=13, bin_length=12),
    model=ModelConfig(vis_channels=(8, 16, 16), vis_feature_dim=32,
                      aud_channels=(8, 16), aud_feature_dim=16,
                      fusion_hidden=(32, 16)),
    mesh=MeshConfig(data=n, model=1),
)
state = create_train_state(jax.random.PRNGKey(0), cfg)
mesh = build_mesh(cfg.mesh, jax.devices())
step = make_dp_train_step(cfg, mesh)

# Every process uses the same seed for the GLOBAL batch definition, then
# loads only its slice — in production this is "each host reads its own
# shard of the dataset".
rng = np.random.default_rng(0)
b = 4 * n
pid, nproc = jax.process_index(), jax.process_count()
lo, hi = pid * b // nproc, (pid + 1) * b // nproc

for it in range(3):
    vis_g = rng.random((b, *cfg.preprocess.frame_size, 3)).astype(np.float32)
    aud_g = rng.random((b, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)
    lab_g = rng.integers(1, 6, b).astype(np.float32)
    vis = shard_host_batch(vis_g[lo:hi], mesh)
    aud = shard_host_batch(aud_g[lo:hi], mesh)
    lab = shard_host_batch(lab_g[lo:hi], mesh)
    params, ms, opt, loss = step(
        state.params, state.model_state, state.opt_state, vis, aud, lab,
        jax.random.PRNGKey(it))
    state = state._replace(params=params, model_state=ms, opt_state=opt)
    print(f"process {pid}: step {it} loss {float(replicated_to_host(loss)):.4f}")

print(f"process {pid}: done")
# tear the coordination service down explicitly — without this, interpreter
# exit can hang waiting on the distributed client's background threads
jax.distributed.shutdown()

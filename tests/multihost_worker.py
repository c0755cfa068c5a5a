"""Worker process for the 2-process distributed-runtime test.

Each process owns 4 virtual CPU devices; together they form an 8-device
global mesh and run ONE data-parallel train step of the real AVM through
``parallel.dp.make_dp_train_step``, feeding only their own half of the
global batch via ``parallel.multihost.shard_host_batch``.  The resulting
loss (replicated) is written to a result file for the parent test to compare
against the single-process run.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out>
"""

import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def tiny_dp_config(n_devices: int):
    """The shared tiny full-architecture config (worker + parent test must
    build the identical model so losses compare exactly)."""
    from cvml_goalnet_tpu.config import (
        AudioConfig, MeshConfig, ModelConfig, PipelineConfig, PreprocessConfig)

    return PipelineConfig(
        preprocess=PreprocessConfig(skip_frames=30, frame_size=(24, 24)),
        audio=AudioConfig(n_fft=512, hop_length=128, n_mels=40, n_mfcc=13,
                          bin_length=12),
        model=ModelConfig(vis_channels=(8, 16, 16), vis_feature_dim=32,
                          aud_channels=(8, 16), aud_feature_dim=16,
                          fusion_hidden=(32, 16)),
        mesh=MeshConfig(data=n_devices, model=1),
    )


def main() -> int:
    pid, nproc, port, out_fp = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from cvml_goalnet_tpu.parallel.multihost import (
        initialize_from_env,
        replicated_to_host,
        shard_host_batch,
    )

    initialize_from_env(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    n = jax.device_count()

    from cvml_goalnet_tpu.parallel.dp import make_dp_train_step
    from cvml_goalnet_tpu.parallel.mesh import build_mesh
    from cvml_goalnet_tpu.train.state import create_train_state

    cfg = tiny_dp_config(n)
    state = create_train_state(jax.random.PRNGKey(0), cfg)
    mesh = build_mesh(cfg.mesh, jax.devices())

    # deterministic GLOBAL batch; this process loads only its slice
    rng = np.random.default_rng(0)
    b = 2 * n
    vis_g = rng.random((b, *cfg.preprocess.frame_size, 3)).astype(np.float32)
    aud_g = rng.random((b, cfg.audio.bin_length, cfg.audio.n_mfcc)).astype(np.float32)
    lab_g = rng.integers(1, 6, b).astype(np.float32)
    lo, hi = pid * b // nproc, (pid + 1) * b // nproc
    vis = shard_host_batch(vis_g[lo:hi], mesh)
    aud = shard_host_batch(aud_g[lo:hi], mesh)
    lab = shard_host_batch(lab_g[lo:hi], mesh)

    step = make_dp_train_step(cfg, mesh)
    new_params, _, _, loss = step(
        state.params, state.model_state, state.opt_state, vis, aud, lab,
        jax.random.PRNGKey(1),
    )
    jax.block_until_ready(new_params)
    loss_host = float(replicated_to_host(loss))
    with open(out_fp, "w") as f:
        f.write(repr(loss_host))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Worker for the two-process distributed smoke test (test_distributed.py).

Each process: jax.distributed.initialize over localhost, 4 virtual CPU
devices (8 global), loads ITS shard of the sequence folders through the real
dataset machinery (parallel.shard_sequence_folders), assembles the global
batch (parallel.make_global_batch) and runs ONE data-parallel train step on
the global mesh.  Prints the loss; both processes must agree (it is a global
psum), and the single-process run of the same global batch must match.

Usage: python tests/dist_worker.py <coordinator> <num_procs> <pid> <data_root> <out_json>
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)


def local_batch_for(folders, data_root):
    """Deterministic one-window batch from each of this process's folders."""
    import numpy as np
    from rpg_ramnet_tpu.data import (SequenceSynchronizedFramesEventsDataset,
                                     CenterCrop)
    items = []
    for f in folders:
        ds = SequenceSynchronizedFramesEventsDataset(
            base_folder=os.path.join(data_root, f), event_folder="events/voxels",
            depth_folder="depth/data", frame_folder="rgb/data",
            sequence_length=2, step_size=2, clip_distance=80.0,
            every_x_rgb_frame=2, reg_factor=3.70378, transform=CenterCrop(32))
        items.append(ds[0])
    batch = {k: np.stack([it[k] for it in items]) for k in
             ("events", "image", "depth_events", "depth_image")}
    return batch


def main():
    coordinator, num_procs, pid, data_root, out_json = sys.argv[1:6]
    num_procs, pid = int(num_procs), int(pid)
    if num_procs > 1:
        # generous init timeout: on a loaded 1-core rig the sibling worker
        # can be starved for minutes before it reaches the coordinator
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_procs, process_id=pid,
                                   initialization_timeout=600)
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 4 * num_procs

    from test_train import tiny_config
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
    from rpg_ramnet_tpu.parallel import make_mesh, replicate
    from rpg_ramnet_tpu.parallel.input_pipeline import (
        shard_sequence_folders, make_global_batch, per_host_batch_size)
    from rpg_ramnet_tpu.train.optim import make_optimizer
    from rpg_ramnet_tpu.train.train_step import make_train_step

    cfg = tiny_config(every_x_rgb_frame=2)
    folders = sorted(os.listdir(data_root))
    mine = shard_sequence_folders(folders)
    assert per_host_batch_size(len(folders)) == len(mine)
    batch = make_global_batch(local_batch_for(mine, data_root), make_mesh())

    mesh = make_mesh()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), cfg.model)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)
    step = make_train_step(cfg, opt, mesh, donate=False)
    new_params, _, aux = step(params, opt_state, batch)
    loss = float(aux["loss"])
    gn = float(aux["grad_norm"])
    print(f"proc {pid}: loss={loss!r} grad_norm={gn!r}", flush=True)
    if pid == 0:
        with open(out_json, "w") as f:
            json.dump({"loss": loss, "grad_norm": gn,
                       "devices": len(jax.devices()),
                       "process_count": jax.process_count()}, f)


if __name__ == "__main__":
    main()

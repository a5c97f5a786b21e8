"""Multi-host input pipeline + mesh helpers (single-process degenerate path
plus pure-logic splits)."""
import numpy as np

import jax

from rpg_ramnet_tpu.parallel import (
    make_mesh, shard_sequence_folders, per_host_batch_size, make_global_batch,
    sharded_prefetch,
)


def test_folder_sharding_logic():
    folders = [f"seq{i:02d}" for i in range(7)]
    shards = [shard_sequence_folders(folders, pi, 3) for pi in range(3)]
    # disjoint and complete
    flat = sorted(sum(shards, []))
    assert flat == sorted(folders)
    assert all(len(s) >= 2 for s in shards)


def test_per_host_batch_size():
    assert per_host_batch_size(8, 4) == 2
    assert per_host_batch_size(8, 1) == 8


def test_make_global_batch_single_process():
    mesh = make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    g = make_global_batch(batch, mesh)
    assert g["x"].shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(g["x"]), batch["x"])
    # sharded over the data axis
    assert len(g["x"].sharding.device_set) == mesh.devices.size


def test_spatial_sharding_exactness():
    """H-dim spatial partitioning over the 'model' axis (conv halos via
    GSPMD) must be bit-compatible with unsharded execution, composed with
    DP on 'data' (2x4 mesh)."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.core.config import MeshConfig
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
    from rpg_ramnet_tpu.parallel import (shard_package_spatial,
                                         shard_state_spatial, replicate)

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "recurrent_block_type": "conv",
        "state_combination": "convgru", "num_encoders": 2,
        "base_num_channels": 4, "every_x_rgb_frame": 2, "baseline": False,
        "skip_type": "sum", "norm": "none"})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    rng = np.random.RandomState(0)
    pkg = {"x": None}
    pkg = {"events": rng.randn(2, 2, 32, 32, 5).astype(np.float32),
           "image": rng.rand(2, 32, 32, 1).astype(np.float32)}
    state = ERGB2DepthRecurrent.init_state(mcfg, 2, 32, 32)
    fwd = jax.jit(lambda p, s, x: ERGB2DepthRecurrent.forward_package(p, mcfg, s, x))
    _, ref = fwd(params, state, {k: jnp.asarray(v) for k, v in pkg.items()})

    mesh = make_mesh(MeshConfig(data=2, model=4))
    _, out = fwd(replicate(params, mesh),
                 shard_state_spatial(state, mesh),
                 shard_package_spatial(pkg, mesh))
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, rtol=1e-5)


def test_sharded_prefetch():
    mesh = make_mesh()
    batches = [{"x": np.full((8, 2), i, np.float32)} for i in range(5)]
    out = list(sharded_prefetch(iter(batches), mesh))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_array_equal(np.asarray(b["x"]), batches[i]["x"])


def test_dp_mesh_precomputed_inference_equals_single_device():
    """forward_sequence_precomputed under a DP mesh: the (l*b*k)-flattened
    encoder/gx batch and the snapshot concat cross the sharded batch axis,
    so GSPMD must reproduce single-device outputs (lanes sharded on
    'data')."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
    from rpg_ramnet_tpu.parallel import replicate, shard_batch

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "recurrent_block_type": "conv",
        "state_combination": "convgru", "num_encoders": 2,
        "base_num_channels": 4, "every_x_rgb_frame": 2, "baseline": False,
        "skip_type": "sum", "norm": "none"})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(3), mcfg)
    rng = np.random.RandomState(1)
    B, L, K, H, W = 8, 3, 2, 32, 32
    seq = {"events": rng.randn(B, L, K, H, W, 5).astype(np.float32),
           "image": rng.rand(B, L, H, W, 1).astype(np.float32)}
    state = ERGB2DepthRecurrent.init_state(mcfg, B, H, W)
    fwd = jax.jit(lambda p, s, q: ERGB2DepthRecurrent.forward_sequence_precomputed(
        p, mcfg, s, q))
    _, ref = fwd(params, state, {k: jnp.asarray(v) for k, v in seq.items()})

    mesh = make_mesh()
    _, out = fwd(replicate(params, mesh),
                 jax.tree_util.tree_map(
                     lambda v: jax.tree_util.tree_leaves(
                         shard_batch({"x": np.asarray(v)}, mesh))[0], state),
                 shard_batch(seq, mesh))
    for k in ref:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(ref[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)


def _tiny_mcfg(seed_key=0):
    from rpg_ramnet_tpu.core.config import ModelConfig
    return ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "recurrent_block_type": "conv",
        "state_combination": "convgru", "num_encoders": 2,
        "base_num_channels": 4, "every_x_rgb_frame": 2, "baseline": False,
        "skip_type": "sum", "norm": "none"})


def test_mesh_batched_streaming_engine_equals_single_device():
    """BatchedStreamingInference(mesh=...): lanes sharded over the mesh
    'data' axis must reproduce the unsharded engine exactly, including
    per-lane state resets mid-stream (the BASELINE config-5 product
    surface, not just the raw forward)."""
    from rpg_ramnet_tpu.eval.inference import BatchedStreamingInference
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = _tiny_mcfg()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(5), mcfg)
    N, K, H, W = 8, 2, 32, 32
    rng = np.random.RandomState(0)
    pkgs = [{"events": rng.randn(N, K, H, W, 5).astype(np.float32),
             "image": rng.rand(N, H, W, 1).astype(np.float32)}
            for _ in range(3)]
    resets = [np.ones(N, bool),
              rng.rand(N) < 0.4,          # mid-stream per-lane resets
              np.zeros(N, bool)]

    plain = BatchedStreamingInference(params, mcfg, N, H, W)
    sharded = BatchedStreamingInference(params, mcfg, N, H, W,
                                        mesh=make_mesh())
    for t, (pkg, rm) in enumerate(zip(pkgs, resets)):
        p_ref = plain.step(pkg, rm)
        p_out = sharded.step(pkg, rm)
        for k in p_ref:
            np.testing.assert_allclose(
                np.asarray(p_out[k]), np.asarray(p_ref[k]),
                atol=1e-5, rtol=1e-5, err_msg=f"step {t} key {k}")


def test_mesh_batched_streaming_phased_equals_single_device():
    """Mesh streaming under the IRREGULAR-TIMESTAMP (phased/MVSEC) arch:
    per-lane continuous times ride the same data-axis sharding as the
    inputs, so the sharded engine must reproduce the unsharded one exactly
    (closes the 'mesh streaming proven only for the conv/GRU arch' gap)."""
    from rpg_ramnet_tpu.core.config import ModelConfig
    from rpg_ramnet_tpu.eval.inference import BatchedStreamingInference
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5,
        "recurrent_block_type": "convlstm", "state_combination": "convlstm",
        "num_encoders": 2, "base_num_channels": 4, "every_x_rgb_frame": 2,
        "baseline": False, "skip_type": "sum", "norm": "none",
        "use_phased_arch": True, "spatial_resolution": [32, 32]})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(5), mcfg)
    N, K, H, W = 8, 2, 32, 32
    rng = np.random.RandomState(1)
    t0 = np.zeros((N, 1), np.float32)
    pkgs = []
    for _ in range(3):
        te = (t0 + np.cumsum(rng.uniform(0.01, 0.1, (N, K)),
                             axis=1)).astype(np.float32)
        ti = (te[:, -1] + rng.uniform(0.01, 0.1, N)).astype(np.float32)
        t0 = ti[:, None]
        pkgs.append({"events": rng.randn(N, K, H, W, 5).astype(np.float32),
                     "image": rng.rand(N, H, W, 1).astype(np.float32),
                     "times_events": te, "times_image": ti})
    resets = [np.ones(N, bool),
              rng.rand(N) < 0.4,          # mid-stream per-lane resets
              np.zeros(N, bool)]

    plain = BatchedStreamingInference(params, mcfg, N, H, W)
    sharded = BatchedStreamingInference(params, mcfg, N, H, W,
                                        mesh=make_mesh())
    for t, (pkg, rm) in enumerate(zip(pkgs, resets)):
        p_ref = plain.step(pkg, rm)
        p_out = sharded.step(pkg, rm)
        for k in p_ref:
            np.testing.assert_allclose(
                np.asarray(p_out[k]), np.asarray(p_ref[k]),
                atol=1e-5, rtol=1e-5, err_msg=f"step {t} key {k}")


def test_mesh_batched_chunked_streaming_equals_single_device(tmp_path):
    """run_batched_chunked_streaming(mesh=...): the full product path
    (dataset round-robin -> time-leading chunk buffers -> scan with
    per-step reset masks -> batched decode) under a DP mesh must produce
    identical per-item predictions to the single-device run."""
    from rpg_ramnet_tpu.data import CenterCrop, concatenate_subfolders
    from rpg_ramnet_tpu.data.synthetic import generate_eventscape_sequence
    from rpg_ramnet_tpu.eval.inference import run_batched_chunked_streaming
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    root = tmp_path / "split"
    for s in range(3):
        generate_eventscape_sequence(str(root / f"seq{s:02d}"), n_frames=8,
                                     height=32, width=32,
                                     events_per_frame=200, seed=20 + s)
    mcfg = _tiny_mcfg()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(9), mcfg)
    dataset = concatenate_subfolders(
        str(root), "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=2, reg_factor=3.70378,
        transform=CenterCrop(32))

    def run(mesh):
        out = {}
        run_batched_chunked_streaming(
            dataset, params, mcfg, n_lanes=8, chunk=2, mesh=mesh,
            on_prediction=lambda gidx, preds, item, seq_pos: out.__setitem__(
                gidx, {k: np.asarray(v) for k, v in preds.items()}))
        return out

    ref = run(None)
    out = run(make_mesh())
    assert set(out) == set(ref)
    for idx in ref:
        for k in ref[idx]:
            np.testing.assert_allclose(out[idx][k], ref[idx][k],
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"idx={idx} key={k}")


def test_spatial_mesh_streaming_engine_equals_plain():
    """StreamingInference(spatial_mesh=...): single-stream latency mode —
    H sharded over the 'model' axis (GSPMD conv halos) must reproduce the
    unsharded engine across carried state."""
    from rpg_ramnet_tpu.core.config import MeshConfig
    from rpg_ramnet_tpu.eval.inference import StreamingInference
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = _tiny_mcfg()
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(2), mcfg)
    K, H, W = 2, 32, 32
    rng = np.random.RandomState(3)
    pkgs = [{"events": rng.randn(K, H, W, 5).astype(np.float32),
             "image": rng.rand(H, W, 1).astype(np.float32)}
            for _ in range(3)]

    plain = StreamingInference(params, mcfg, batched_decode=True)
    mesh = make_mesh(MeshConfig(data=1, model=8))
    sharded = StreamingInference(params, mcfg, batched_decode=True,
                                 spatial_mesh=mesh)
    for t, pkg in enumerate(pkgs):
        p_ref = plain.step(pkg)
        p_out = sharded.step(pkg)
        for k in p_ref:
            np.testing.assert_allclose(p_out[k], p_ref[k],
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"step {t} key {k}")


def test_spatial_mesh_streaming_phased_equals_plain():
    """Spatial (H-sharded) streaming under the phased arch: the NHWC time
    gate broadcasts [H, W, C] tau/phase maps over the sharded H dim, so
    GSPMD must partition the gate with the states (elementwise — no halo);
    the sharded engine must match the plain one across carried state."""
    from rpg_ramnet_tpu.core.config import MeshConfig, ModelConfig
    from rpg_ramnet_tpu.eval.inference import StreamingInference
    from rpg_ramnet_tpu.models import ERGB2DepthRecurrent

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5,
        "recurrent_block_type": "convlstm", "state_combination": "convlstm",
        "num_encoders": 2, "base_num_channels": 4, "every_x_rgb_frame": 2,
        "baseline": False, "skip_type": "sum", "norm": "none",
        "use_phased_arch": True, "spatial_resolution": [32, 32]})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(2), mcfg)
    K, H, W = 2, 32, 32
    rng = np.random.RandomState(4)
    t0 = 0.0
    pkgs = []
    for _ in range(3):
        te = (t0 + np.cumsum(rng.uniform(0.01, 0.1, K))).astype(np.float32)
        ti = np.float32(te[-1] + rng.uniform(0.01, 0.1))
        t0 = float(ti)
        pkgs.append({"events": rng.randn(K, H, W, 5).astype(np.float32),
                     "image": rng.rand(H, W, 1).astype(np.float32),
                     "times_events": te, "times_image": ti})

    plain = StreamingInference(params, mcfg, batched_decode=True)
    mesh = make_mesh(MeshConfig(data=1, model=8))
    sharded = StreamingInference(params, mcfg, batched_decode=True,
                                 spatial_mesh=mesh)
    for t, pkg in enumerate(pkgs):
        p_ref = plain.step(pkg)
        p_out = sharded.step(pkg)
        for k in p_ref:
            np.testing.assert_allclose(p_out[k], p_ref[k],
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"step {t} key {k}")

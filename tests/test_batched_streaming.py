"""Lane-batched streaming inference must produce exactly the single-lane
(reference test.py) outputs at higher throughput."""
import numpy as np
import pytest

import jax

from rpg_ramnet_tpu.core.config import Config, ModelConfig
from rpg_ramnet_tpu.models import ERGB2DepthRecurrent
from rpg_ramnet_tpu.data import concatenate_subfolders, CenterCrop
from rpg_ramnet_tpu.data.synthetic import generate_split
from rpg_ramnet_tpu.eval.inference import (StreamingInference,
                                           run_batched_streaming)

from test_train import tiny_config


@pytest.fixture(scope="module")
def test_split(tmp_path_factory):
    root = tmp_path_factory.mktemp("bstream") / "test"
    generate_split(str(root), n_sequences=3, n_frames=18, height=32, width=32,
                   events_per_frame=400)
    return str(root)


def test_batched_equals_single_lane(test_split):
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)

    dataset = concatenate_subfolders(
        test_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        transform=CenterCrop(32))

    # single lane (reference semantics)
    single = {}
    engine = StreamingInference(params, mcfg)
    prev_d = -1
    for idx in range(len(dataset)):
        item, d = dataset[idx]
        if d != prev_d:
            engine.reset(1, 32, 32)
            prev_d = d
        preds = engine.step({"events": item["events"][0],
                             "image": item["image"][0]})
        single[idx] = preds["image"]

    # 2 lanes, 3 sequences (uneven: lane0 gets 2 sequences)
    batched = {}
    run_batched_streaming(
        dataset, params, mcfg, n_lanes=2,
        on_prediction=lambda gidx, preds, item, seq_pos: batched.__setitem__(
            gidx, preds["image"]))

    assert set(batched) == set(single)
    for idx in single:
        np.testing.assert_allclose(batched[idx], single[idx],
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=f"idx={idx}")


def test_sequence_scan_equals_streaming(test_split):
    """Whole-sequence lax.scan inference == per-package streaming."""
    from rpg_ramnet_tpu.eval.inference import SequenceScanInference
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(1), mcfg)
    dataset = concatenate_subfolders(
        test_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        transform=CenterCrop(32))
    sub = dataset.datasets[0]
    items = [sub[i] for i in range(len(sub))]
    ev = np.stack([it["events"][0] for it in items])
    im = np.stack([it["image"][0] for it in items])

    engine = StreamingInference(params, mcfg)
    engine.reset(1, 32, 32)
    stream_preds = [engine.step({"events": it["events"][0],
                                 "image": it["image"][0]}) for it in items]

    scan = SequenceScanInference(params, mcfg, chunk=4)  # forces tail pad
    scan_preds = scan.run_sequence(ev, im)
    for t, sp in enumerate(stream_preds):
        for k in sp:
            np.testing.assert_allclose(scan_preds[k][t], sp[k],
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"t={t} key={k}")


def test_sequence_batched_decode_equals_forward_sequence(test_split):
    """Deferred-decode sequence mode (ONE decoder pass over all L*(K+1)
    super-state snapshots) must be exactly forward_sequence: decodes never
    feed the recurrent state."""
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(5), mcfg)
    rng = np.random.default_rng(0)
    B, L, K, H, W = 2, 4, 3, 32, 32
    seq = {"events": rng.standard_normal(
               (B, L, K, H, W, mcfg.num_bins_events)).astype(np.float32),
           "image": rng.standard_normal(
               (B, L, H, W, mcfg.num_bins_rgb)).astype(np.float32)}
    state0 = ERGB2DepthRecurrent.init_state(mcfg, B, H, W)
    s_ref, p_ref = ERGB2DepthRecurrent.forward_sequence(
        params, mcfg, state0, seq)
    s_bd, p_bd = ERGB2DepthRecurrent.forward_sequence_batched_decode(
        params, mcfg, state0, seq)
    assert set(p_ref) == set(p_bd)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_bd[k]), np.asarray(p_ref[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), s_ref, s_bd)


def test_sequence_scan_batched_decode_equals_streaming(test_split):
    """SequenceScanInference(batched_decode=True) == per-package streaming,
    including the padded tail chunk."""
    from rpg_ramnet_tpu.eval.inference import SequenceScanInference
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(2), mcfg)
    dataset = concatenate_subfolders(
        test_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        transform=CenterCrop(32))
    sub = dataset.datasets[0]
    items = [sub[i] for i in range(len(sub))]
    ev = np.stack([it["events"][0] for it in items])
    im = np.stack([it["image"][0] for it in items])

    engine = StreamingInference(params, mcfg)
    engine.reset(1, 32, 32)
    stream_preds = [engine.step({"events": it["events"][0],
                                 "image": it["image"][0]}) for it in items]

    scan = SequenceScanInference(params, mcfg, chunk=4, batched_decode=True)
    scan_preds = scan.run_sequence(ev, im)
    for t, sp in enumerate(stream_preds):
        for k in sp:
            np.testing.assert_allclose(scan_preds[k][t], sp[k],
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"t={t} key={k}")


def test_chunked_streaming_equals_single_lane(test_split):
    """run_chunked_streaming (offline deferred-decode driver behind
    test.py --scan_chunk) == single-lane streaming on a multi-sequence
    dataset, including chunk-boundary state carry and padded tails."""
    from rpg_ramnet_tpu.eval.inference import run_chunked_streaming
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    dataset = concatenate_subfolders(
        test_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        transform=CenterCrop(32))

    single = {}
    engine = StreamingInference(params, mcfg)
    prev_d = -1
    for idx in range(len(dataset)):
        item, d = dataset[idx]
        if d != prev_d:
            engine.reset(1, 32, 32)
            prev_d = d
        preds = engine.step({"events": item["events"][0],
                             "image": item["image"][0]})
        single[idx] = preds["image"]

    chunked = {}
    seq_positions = {}
    # chunk=4 with per-sequence length != multiple of 4 exercises tail pad
    run_chunked_streaming(
        dataset, params, mcfg, chunk=4,
        on_prediction=lambda gidx, preds, item, seq_pos: (
            chunked.__setitem__(gidx, preds["image"]),
            seq_positions.__setitem__(gidx, seq_pos)))

    assert set(chunked) == set(single)
    for idx in single:
        np.testing.assert_allclose(chunked[idx], single[idx],
                                   atol=1e-5, rtol=1e-5, err_msg=f"idx={idx}")
    # sequence positions restart at 0 at each sequence boundary
    sizes = [len(d) for d in dataset.datasets]
    expect = [p for sz in sizes for p in range(sz)]
    assert [seq_positions[i] for i in range(len(dataset))] == expect


def test_chunked_streaming_decode_keys(test_split):
    """--scan_chunk composes with --decode_keys: only the requested keys
    are decoded (frame-rate mode), values equal to full decoding."""
    from rpg_ramnet_tpu.eval.inference import run_chunked_streaming
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    dataset = concatenate_subfolders(
        test_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        transform=CenterCrop(32))

    full, image_only = {}, {}
    run_chunked_streaming(
        dataset, params, mcfg, chunk=4,
        on_prediction=lambda gidx, preds, item, seq_pos: full.__setitem__(
            gidx, preds))
    run_chunked_streaming(
        dataset, params, mcfg, chunk=4, decode_keys=("image",),
        on_prediction=lambda gidx, preds, item, seq_pos: image_only.__setitem__(
            gidx, preds))
    assert set(image_only) == set(full)
    for idx in full:
        assert set(image_only[idx]) == {"image"}
        np.testing.assert_allclose(image_only[idx]["image"],
                                   full[idx]["image"],
                                   atol=1e-5, rtol=1e-5, err_msg=f"idx={idx}")

    # forced x-side precompute (auto-on only for bf16 configs): same
    # outputs through the chunked driver, including decode_keys
    pre = {}
    run_chunked_streaming(
        dataset, params, mcfg, chunk=4, precompute_x=True,
        on_prediction=lambda gidx, preds, item, seq_pos: pre.__setitem__(
            gidx, preds))
    assert set(pre) == set(full)
    for idx in full:
        for k in full[idx]:
            np.testing.assert_allclose(pre[idx][k], full[idx][k],
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"idx={idx} key={k}")


def test_phased_batched_and_chunked_decode_equal_sequential(tmp_path):
    """Phased (irregular-timestamp) regime through BOTH deferred-decode
    paths: per-package batched decode (StreamingInference batched_decode)
    and chunked streaming (run_chunked_streaming) must equal sequential
    per-package streaming — times feed only the PhasedLSTM gates, never
    the decoder."""
    import sys
    sys.path.insert(0, "tests")
    from test_phased_model import phased_config
    from rpg_ramnet_tpu.data.synthetic import generate_eventscape_sequence
    from rpg_ramnet_tpu.eval.inference import run_chunked_streaming

    root = tmp_path / "phased_split"
    for s in range(2):
        generate_eventscape_sequence(str(root / f"seq{s:02d}"), n_frames=12,
                                     height=32, width=32,
                                     events_per_frame=200, seed=10 + s)
    cfg = phased_config(spatial=(32, 32))
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(7), mcfg)
    dataset = concatenate_subfolders(
        str(root), "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        use_phased_arch=True, transform=CenterCrop(32))

    def stream(batched_decode):
        out = {}
        engine = StreamingInference(params, mcfg,
                                    batched_decode=batched_decode)
        prev_d = -1
        for idx in range(len(dataset)):
            item, d = dataset[idx]
            if d != prev_d:
                engine.reset(1, 32, 32)
                prev_d = d
            preds = engine.step({"events": item["events"][0],
                                 "image": item["image"][0],
                                 "times_events": item["times_events"][0],
                                 "times_image": item["times_image"][0]})
            out[idx] = preds["image"]
        return out

    single = stream(batched_decode=False)
    batched = stream(batched_decode=True)
    for idx in single:
        np.testing.assert_allclose(batched[idx], single[idx],
                                   atol=1e-5, rtol=1e-5, err_msg=f"idx={idx}")

    chunked = {}
    run_chunked_streaming(
        dataset, params, mcfg, chunk=4,
        on_prediction=lambda gidx, preds, item, seq_pos: chunked.__setitem__(
            gidx, preds["image"]))
    assert set(chunked) == set(single)
    for idx in single:
        np.testing.assert_allclose(chunked[idx], single[idx],
                                   atol=1e-5, rtol=1e-5, err_msg=f"idx={idx}")


def test_batched_phased_times_equals_single_lane(tmp_path):
    """Phased (irregular-timestamp) regime through the LANE-BATCHED path:
    times_events/times_image are lane-stacked and fed to the PhasedLSTM
    gates; outputs must equal single-lane streaming exactly (round-2 fix:
    run_batched_streaming previously dropped the times inputs)."""
    import sys
    sys.path.insert(0, "tests")
    from test_phased_model import phased_config
    from rpg_ramnet_tpu.data.synthetic import generate_eventscape_sequence

    root = tmp_path / "phased_split"
    for s in range(2):
        generate_eventscape_sequence(str(root / f"seq{s:02d}"), n_frames=12,
                                     height=32, width=32,
                                     events_per_frame=200, seed=s)
    cfg = phased_config(spatial=(32, 32))
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(3), mcfg)
    dataset = concatenate_subfolders(
        str(root), "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        use_phased_arch=True, transform=CenterCrop(32))

    single = {}
    engine = StreamingInference(params, mcfg)
    prev_d = -1
    for idx in range(len(dataset)):
        item, d = dataset[idx]
        if d != prev_d:
            engine.reset(1, 32, 32)
            prev_d = d
        preds = engine.step({"events": item["events"][0],
                             "image": item["image"][0],
                             "times_events": item["times_events"][0],
                             "times_image": item["times_image"][0]})
        single[idx] = preds["image"]

    batched = {}
    run_batched_streaming(
        dataset, params, mcfg, n_lanes=2,
        on_prediction=lambda gidx, preds, item, seq_pos: batched.__setitem__(
            gidx, preds["image"]))

    assert set(batched) == set(single)
    for idx in single:
        np.testing.assert_allclose(batched[idx], single[idx],
                                   atol=1e-5, rtol=1e-5, err_msg=f"idx={idx}")


def test_sequence_precomputed_equals_forward_sequence(test_split):
    """forward_sequence_precomputed (encoders + GRU x-side gate convs hoisted
    out of the scan as ONE batched pass; only the h-side GRU completions stay
    sequential) must match forward_sequence to float-summation tolerance —
    conv([x,h], W) == conv_x(x) + conv_h(h) exactly, ~1 ulp in float."""
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(5), mcfg)
    rng = np.random.default_rng(1)
    B, L, K, H, W = 2, 4, 3, 32, 32
    seq = {"events": rng.standard_normal(
               (B, L, K, H, W, mcfg.num_bins_events)).astype(np.float32),
           "image": rng.standard_normal(
               (B, L, H, W, mcfg.num_bins_rgb)).astype(np.float32)}
    state0 = ERGB2DepthRecurrent.init_state(mcfg, B, H, W)
    s_ref, p_ref = ERGB2DepthRecurrent.forward_sequence(
        params, mcfg, state0, seq)
    s_pre, p_pre = ERGB2DepthRecurrent.forward_sequence_precomputed(
        params, mcfg, state0, seq)
    assert set(p_ref) == set(p_pre)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_pre[k]), np.asarray(p_ref[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), s_ref, s_pre)

    # time-leading channel-first layout + decode_keys subset + squeeze
    seq_tcf = {
        "events_tcf": np.ascontiguousarray(
            np.transpose(seq["events"], (1, 0, 2, 5, 3, 4))),
        "image_tcf": np.ascontiguousarray(
            np.transpose(seq["image"], (1, 0, 4, 2, 3))),
    }
    s_t, p_t = ERGB2DepthRecurrent.forward_sequence_precomputed(
        params, mcfg, state0, seq_tcf, decode_keys=("events1", "image"),
        squeeze_preds=True)
    assert set(p_t) == {"events1", "image"}
    for k in p_t:
        np.testing.assert_allclose(np.asarray(p_t[k]),
                                   np.asarray(p_ref[k])[..., 0],
                                   atol=1e-5, rtol=1e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), s_ref, s_t)


def test_sequence_precomputed_rejects_unsupported_config():
    """Only state-independent encoders (recurrent_block_type='conv') +
    convgru state combination can hoist the x-side work."""
    cfg = tiny_config(every_x_rgb_frame=3)
    import dataclasses
    mcfg = dataclasses.replace(cfg.model, recurrent_block_type="convlstm")
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    state0 = ERGB2DepthRecurrent.init_state(mcfg, 1, 32, 32)
    with pytest.raises(ValueError, match="precompute"):
        ERGB2DepthRecurrent.forward_sequence_precomputed(
            params, mcfg, state0, {})


def test_sequence_precomputed_chunk_cells_matches_scan():
    """forward_sequence_precomputed(chunk_cells=True) — the whole-chunk
    resident-state Pallas h-side kernel (ops/gru_chunk.py, interpret mode
    on CPU) — must match the per-step scan path to bf16 tolerance, and
    reject unsupported shapes loudly."""
    from rpg_ramnet_tpu.ops import gru_chunk
    cfg = tiny_config(every_x_rgb_frame=3, compute_dtype="bfloat16")
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(7), mcfg)
    rng = np.random.default_rng(3)
    B, L, K, H, W = 1, 3, 3, 32, 32
    seq = {"events": rng.standard_normal(
               (B, L, K, H, W, mcfg.num_bins_events)).astype(np.float32),
           "image": rng.standard_normal(
               (B, L, H, W, mcfg.num_bins_rgb)).astype(np.float32)}
    import jax.numpy as jnp
    state0 = ERGB2DepthRecurrent.init_state(mcfg, B, H, W,
                                            dtype=jnp.bfloat16)
    s_ref, p_ref = ERGB2DepthRecurrent.forward_sequence_precomputed(
        params, mcfg, state0, seq)
    gru_chunk._INTERPRET = True
    try:
        s_ck, p_ck = ERGB2DepthRecurrent.forward_sequence_precomputed(
            params, mcfg, state0, seq, chunk_cells=True)
        # decode_keys subset exercises the snapshot position gather
        _, p_sub = ERGB2DepthRecurrent.forward_sequence_precomputed(
            params, mcfg, state0, seq, decode_keys=("events1", "image"),
            chunk_cells=True)
    finally:
        gru_chunk._INTERPRET = False
    assert set(p_ref) == set(p_ck)
    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(p_ck[k], np.float32), np.asarray(p_ref[k], np.float32),
            atol=2e-2, rtol=0, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=2e-2, rtol=0), s_ref, s_ck)
    assert set(p_sub) == {"events1", "image"}
    for k in p_sub:
        np.testing.assert_allclose(
            np.asarray(p_sub[k], np.float32), np.asarray(p_ref[k], np.float32),
            atol=2e-2, rtol=0, err_msg=k)

    # batch > 1 (the VMEM-resident h is single-lane) must raise
    state_b2 = ERGB2DepthRecurrent.init_state(mcfg, 2, H, W,
                                              dtype=jnp.bfloat16)
    seq_b2 = {k: np.repeat(v, 2, axis=0) for k, v in seq.items()}
    with pytest.raises(ValueError, match="chunk_cells"):
        ERGB2DepthRecurrent.forward_sequence_precomputed(
            params, mcfg, state_b2, seq_b2, chunk_cells=True)


def test_batched_chunked_streaming_equals_single_lane(test_split):
    """run_batched_chunked_streaming (lanes x chunk, per-step reset masks in
    the scan for mid-chunk sequence boundaries) == single-lane streaming,
    with and without forced x-side precompute."""
    from rpg_ramnet_tpu.eval.inference import run_batched_chunked_streaming
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    dataset = concatenate_subfolders(
        test_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        transform=CenterCrop(32))

    single = {}
    engine = StreamingInference(params, mcfg)
    prev_d = -1
    for idx in range(len(dataset)):
        item, d = dataset[idx]
        if d != prev_d:
            engine.reset(1, 32, 32)
            prev_d = d
        preds = engine.step({"events": item["events"][0],
                             "image": item["image"][0]})
        single[idx] = preds["image"]

    for pre in (False, True):
        got, positions = {}, {}
        run_batched_chunked_streaming(
            dataset, params, mcfg, n_lanes=2, chunk=4, precompute_x=pre,
            on_prediction=lambda gidx, preds, item, seq_pos: (
                got.__setitem__(gidx, preds["image"]),
                positions.__setitem__(gidx, seq_pos)))
        assert set(got) == set(single), f"pre={pre}"
        for idx in single:
            np.testing.assert_allclose(got[idx], single[idx],
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"idx={idx} pre={pre}")
        sizes = [len(d) for d in dataset.datasets]
        expect = [p for sz in sizes for p in range(sz)]
        assert [positions[i] for i in range(len(dataset))] == expect


def test_sequence_precomputed_convlstm_combination(test_split):
    """x-side precompute for the convlstm state-combination variant: the
    fused 4-gate conv splits the same way; supers are (hidden, cell) tuples
    and snapshots must carry hidden parts only."""
    cfg = tiny_config(state_combination="convlstm", every_x_rgb_frame=3)
    mcfg = cfg.model
    assert mcfg.state_combination == "convlstm"
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(7), mcfg)
    rng = np.random.default_rng(2)
    B, L, K, H, W = 2, 3, 3, 32, 32
    seq = {"events": rng.standard_normal(
               (B, L, K, H, W, mcfg.num_bins_events)).astype(np.float32),
           "image": rng.standard_normal(
               (B, L, H, W, mcfg.num_bins_rgb)).astype(np.float32)}
    state0 = ERGB2DepthRecurrent.init_state(mcfg, B, H, W)
    s_ref, p_ref = ERGB2DepthRecurrent.forward_sequence(
        params, mcfg, state0, seq)
    s_pre, p_pre = ERGB2DepthRecurrent.forward_sequence_precomputed(
        params, mcfg, state0, seq)
    assert set(p_ref) == set(p_pre)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_pre[k]), np.asarray(p_ref[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5), s_ref, s_pre)

    # package-scoped variant too (training path)
    s_pkg, p_pkg = ERGB2DepthRecurrent.forward_sequence_batched_decode(
        params, mcfg, state0, seq, package_precompute=True)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_pkg[k]), np.asarray(p_ref[k]),
                                   atol=1e-5, rtol=1e-5, err_msg=k)


def test_chunked_streaming_stateless_arch(test_split):
    """The chunked drivers' fallback for stateless archs (ERGB2Depth) must
    actually run: they pack only '*_tcf' (time-leading channel-first) keys,
    which ERGB2Depth.forward_sequence now consumes directly (round-2 advice:
    this path raised KeyError('image')).  Outputs must equal per-item
    forward_package."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.eval.inference import (run_chunked_streaming,
                                               run_batched_chunked_streaming)
    from rpg_ramnet_tpu.models.model import ERGB2Depth
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    params = ERGB2Depth.init_params(jax.random.PRNGKey(7), mcfg)
    dataset = concatenate_subfolders(
        test_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        transform=CenterCrop(32))

    ref = {}
    for idx in range(len(dataset)):
        item, _ = dataset[idx]
        _, preds = ERGB2Depth.forward_package(
            params, mcfg, (), {"image": jnp.asarray(item["image"])})
        ref[idx] = np.asarray(preds["image"][0])

    got = {}
    run_chunked_streaming(
        dataset, params, mcfg, arch="ERGB2Depth", chunk=4,
        on_prediction=lambda gidx, preds, item, seq_pos: got.__setitem__(
            gidx, preds["image"]))
    assert set(got) == set(ref)
    for idx in ref:
        np.testing.assert_allclose(got[idx], ref[idx], atol=1e-5, rtol=1e-5)

    got2 = {}
    run_batched_chunked_streaming(
        dataset, params, mcfg, arch="ERGB2Depth", n_lanes=2, chunk=3,
        on_prediction=lambda gidx, preds, item, seq_pos: got2.__setitem__(
            gidx, preds["image"]))
    assert set(got2) == set(ref)
    for idx in ref:
        np.testing.assert_allclose(got2[idx], ref[idx], atol=1e-5, rtol=1e-5)


def test_composed_decoder_optin_through_engines(test_split):
    """cfg.composed_decoder='on' routes the inference engines through the
    composed transposed-conv upsample layers (an explicit opt-in — 'auto'
    keeps streaming paths bit-identical): run_chunked_streaming,
    run_batched_streaming, and the latency-mode StreamingInference
    (batched_decode) all match the default path within float tolerance."""
    import dataclasses
    from rpg_ramnet_tpu.eval.inference import (run_chunked_streaming,
                                               run_batched_streaming)
    cfg = tiny_config(every_x_rgb_frame=3)
    mcfg = cfg.model
    mcfg_on = dataclasses.replace(mcfg, composed_decoder="on")
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    dataset = concatenate_subfolders(
        test_split, "SequenceSynchronizedFramesEventsDataset", "events/voxels",
        "depth/data", "rgb/data", sequence_length=1, step_size=1,
        clip_distance=80.0, every_x_rgb_frame=3, reg_factor=3.70378,
        transform=CenterCrop(32))

    ref, got = {}, {}
    run_chunked_streaming(
        dataset, params, mcfg, chunk=4,
        on_prediction=lambda g, p, item, sp: ref.__setitem__(g, p["image"]))
    run_chunked_streaming(
        dataset, params, mcfg_on, chunk=4,
        on_prediction=lambda g, p, item, sp: got.__setitem__(g, p["image"]))
    assert set(got) == set(ref)
    for idx in ref:
        np.testing.assert_allclose(got[idx], ref[idx], atol=1e-5, rtol=1e-5,
                                   err_msg=f"chunked idx={idx}")

    lanes = {}
    run_batched_streaming(
        dataset, params, mcfg_on, n_lanes=2,
        on_prediction=lambda g, p, item, sp: lanes.__setitem__(g, p["image"]))
    assert set(lanes) == set(ref)
    for idx in ref:
        np.testing.assert_allclose(lanes[idx], ref[idx], atol=1e-5, rtol=1e-5,
                                   err_msg=f"lanes idx={idx}")

    eng = StreamingInference(params, mcfg_on, batched_decode=True)
    eng.reset(1, 32, 32)
    item, _ = dataset[0]
    preds = eng.step({"events": item["events"][0], "image": item["image"][0]})
    np.testing.assert_allclose(preds["image"], ref[0], atol=1e-5, rtol=1e-5)


def test_sequence_precomputed_stream_cells_matches_scan():
    """forward_sequence_precomputed(stream_cells=True): the gx-streaming
    Pallas cells (ops/gru_stream, scalar-prefetched gx block indexing,
    interpret mode on CPU) must match the standard precomputed scan."""
    import jax.numpy as jnp
    from rpg_ramnet_tpu.ops import gru_stream

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "recurrent_block_type":
        "conv", "state_combination": "convgru", "num_encoders": 3,
        "base_num_channels": 4, "every_x_rgb_frame": 2, "baseline": False,
        "skip_type": "sum", "norm": "none", "compute_dtype": "bfloat16"})
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(0), mcfg)
    st0 = ERGB2DepthRecurrent.init_state(mcfg, 1, 64, 64)
    rng = np.random.RandomState(0)
    L, K = 3, 2
    seq = {"events": jnp.asarray(
               rng.randn(1, L, K, 64, 64, 5).astype(np.float32)),
           "image": jnp.asarray(rng.rand(1, L, 64, 64, 1).astype(np.float32))}
    sA, ref = ERGB2DepthRecurrent.forward_sequence_precomputed(
        params, mcfg, st0, seq)
    gru_stream._INTERPRET = True
    try:
        sB, got = ERGB2DepthRecurrent.forward_sequence_precomputed(
            params, mcfg, st0, seq, stream_cells=True)
    finally:
        gru_stream._INTERPRET = False
    for k in ref:
        d = np.max(np.abs(np.asarray(got[k], np.float32)
                          - np.asarray(ref[k], np.float32)))
        assert d < 0.05, (k, d)   # bf16 tolerance (f32-accum kernel gates)
    for a, b in zip(sA.super_states, sB.super_states):
        d = np.max(np.abs(np.asarray(a, np.float32)
                          - np.asarray(b, np.float32)))
        assert d < 0.05, d

    # rejection: batch > 1 / reset masks are unsupported
    st2 = ERGB2DepthRecurrent.init_state(mcfg, 2, 64, 64)
    seq2 = {"events": jnp.asarray(
                rng.randn(2, L, K, 64, 64, 5).astype(np.float32)),
            "image": jnp.asarray(rng.rand(2, L, 64, 64, 1).astype(np.float32))}
    import pytest
    with pytest.raises(ValueError):
        ERGB2DepthRecurrent.forward_sequence_precomputed(
            params, mcfg, st2, seq2, stream_cells=True)


def test_sequence_precomputed_stream_pair_matches_scan():
    """stream_cells + fused_pair='on': scales 0+1 share one scalar-
    prefetched launch per step; outputs must match the standard
    precomputed scan (interpret mode)."""
    import jax.numpy as jnp
    import dataclasses
    from rpg_ramnet_tpu.ops import gru_stream

    mcfg = ModelConfig.from_dict({
        "num_bins_rgb": 1, "num_bins_events": 5, "recurrent_block_type":
        "conv", "state_combination": "convgru", "num_encoders": 3,
        "base_num_channels": 4, "every_x_rgb_frame": 2, "baseline": False,
        "skip_type": "sum", "norm": "none", "compute_dtype": "bfloat16",
        "fused_pair": "on"})
    off = dataclasses.replace(mcfg, fused_pair="off")
    params = ERGB2DepthRecurrent.init_params(jax.random.PRNGKey(1), mcfg)
    st0 = ERGB2DepthRecurrent.init_state(mcfg, 1, 64, 64)
    rng = np.random.RandomState(1)
    L, K = 2, 2
    seq = {"events": jnp.asarray(
               rng.randn(1, L, K, 64, 64, 5).astype(np.float32)),
           "image": jnp.asarray(rng.rand(1, L, 64, 64, 1).astype(np.float32))}
    _, ref = ERGB2DepthRecurrent.forward_sequence_precomputed(
        params, off, st0, seq)
    gru_stream._INTERPRET = True
    try:
        _, got = ERGB2DepthRecurrent.forward_sequence_precomputed(
            params, mcfg, st0, seq, stream_cells=True)
    finally:
        gru_stream._INTERPRET = False
    for k in ref:
        d = np.max(np.abs(np.asarray(got[k], np.float32)
                          - np.asarray(ref[k], np.float32)))
        assert d < 0.05, (k, d)

"""Streaming inference engine.

Capability reference: RAM_Net/test.py:207-384 — strictly sequential batch-1
streaming with recurrent state carried across packages and reset at sequence
boundaries (dataset_idx changes).

TPU-first: the per-package forward is one jitted function reused across the
stream; throughput scaling comes from batching independent sequences into
LANES with per-lane reset masks (state carry is per-sequence, so lanes don't
interact) — see `BatchedStreamingInference`.  `CropParameters` reproduces the
reflection-pad-to-multiple-of-2^num_encoders trick of
utils/inference_utils.py:278-316 (static shapes matter even more on TPU).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import ModelConfig
from ..models.model import get_model


def optimal_crop_size(max_size: int, max_subsample_factor: int) -> int:
    """Smallest multiple of 2^num_encoders >= max_size
    (inference_utils.py:278-284)."""
    f = 2 ** max_subsample_factor
    return ((max_size + f - 1) // f) * f


@dataclasses.dataclass
class CropParameters:
    """Reflection-pad input to a 2^num_encoders multiple, then crop
    predictions back (inference_utils.py:287-316)."""
    width: int
    height: int
    num_encoders: int

    def __post_init__(self):
        self.width_crop = optimal_crop_size(self.width, self.num_encoders)
        self.height_crop = optimal_crop_size(self.height, self.num_encoders)
        self.padding_left = (self.width_crop - self.width) // 2
        self.padding_right = self.width_crop - self.width - self.padding_left
        self.padding_top = (self.height_crop - self.height) // 2
        self.padding_bottom = self.height_crop - self.height - self.padding_top

    def pad(self, x):
        """x: [..., H, W, C] -> reflection-padded to crop size."""
        pads = [(0, 0)] * (x.ndim - 3) + [
            (self.padding_top, self.padding_bottom),
            (self.padding_left, self.padding_right), (0, 0)]
        if isinstance(x, np.ndarray):
            return np.pad(x, pads, mode="reflect")
        return jnp.pad(x, pads, mode="reflect")

    def crop(self, x):
        h0, w0 = self.padding_top, self.padding_left
        return x[..., h0:h0 + self.height, w0:w0 + self.width, :]


class StreamingInference:
    """Single-lane streaming (exact reference behavior).

    decode_keys: restrict which predictions are decoded (e.g. ('image',)
    — the decoder is ~57% of per-package time at 256x512, so users who
    only need the frame-rate depth get ~2-3x throughput; the reference
    always decodes all keys).

    spatial_mesh: optional Mesh — shard the H dimension of inputs and
    recurrent state over the mesh 'model' axis (parallel.spatial); GSPMD
    inserts the conv halo exchanges.  The multi-device mode for
    LATENCY-bound single-stream inference (lanes can't help a single
    stream; spatial partitioning can)."""

    def __init__(self, params, cfg: ModelConfig, arch: str = "ERGB2DepthRecurrent",
                 decode_keys=None, batched_decode: bool = False,
                 spatial_mesh=None):
        """batched_decode: decode all K+1 predictions of a package in ONE
        stacked decoder pass (identical outputs; better MXU fill at low
        lane counts — model.forward_package_batched_decode)."""
        self.cfg = cfg
        self.model = get_model(arch)
        self._mesh = spatial_mesh
        if spatial_mesh is not None:
            from ..parallel import replicate
            params = replicate(params, spatial_mesh)
        self.params = params
        dk = tuple(decode_keys) if decode_keys else None
        # composed transposed-conv decoder layers: EXPLICIT opt-in only
        # (cfg.composed_decoder='on') on streaming paths — their contract
        # is bit-identical outputs, and composed deviates in float
        # summation order (auto stays off here; see statenet)
        comp = getattr(cfg, "composed_decoder", "auto") == "on"
        # fused Pallas recurrent cells on the streaming path: EXPLICIT
        # opt-in only (cfg.fused_gru='on'), same contract as composed —
        # the cells deviate from the single fused [x, h] conv by float
        # summation order (~1 ulp), breaking the engine's bit-identical
        # default.  This is the product surface for the fused phased
        # (irregular-timestamp) encoder cells and the fused convlstm/
        # convgru state combination.
        fus = getattr(cfg, "fused_gru", "auto") == "on"
        if batched_decode and dk is None and hasattr(
                self.model, "forward_package_batched_decode"):
            self._fwd = jax.jit(
                lambda p, s, pkg: self.model.forward_package_batched_decode(
                    p, cfg, s, pkg, allow_fused=fus, allow_fused_decoder=True,
                    allow_composed=comp))
        else:
            self._fwd = jax.jit(
                lambda p, s, pkg: self.model.forward_package(
                    p, cfg, s, pkg, decode_keys=dk, allow_fused=fus,
                    allow_fused_decoder=True, allow_composed=comp))
        self._state = None

    def reset(self, batch: int, height: int, width: int):
        self._state = self.model.init_state(self.cfg, batch, height, width)
        if self._mesh is not None:
            from ..parallel import shard_state_spatial
            self._state = shard_state_spatial(self._state, self._mesh)

    def step(self, pkg: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """pkg: {'events': [K,H,W,C], 'image': [H,W,C], optional
        'times_events' [K] / 'times_image' scalar} (unbatched) ->
        {key: [H,W,1]} predictions."""
        batched = {"events": jnp.asarray(pkg["events"])[None],
                   "image": jnp.asarray(pkg["image"])[None]}
        for tk in ("times_events", "times_image"):
            if tk in pkg:
                batched[tk] = jnp.asarray(np.atleast_1d(pkg[tk]))[None] \
                    if tk == "times_events" else jnp.asarray(pkg[tk]).reshape(1)
        h, w = pkg["image"].shape[0], pkg["image"].shape[1]
        if self._state is None:
            self.reset(1, h, w)
        if self._mesh is not None:
            from ..parallel import shard_package_spatial
            batched = shard_package_spatial(batched, self._mesh)
        self._state, preds = self._fwd(self.params, self._state, batched)
        return {k: np.asarray(v[0]) for k, v in preds.items()}

    def step_modality(self, x: np.ndarray, modality: str = "events") -> np.ndarray:
        """Single-modality streaming (events-only live demo): one encoder
        sweep + decoder per call.  x: [H, W, C] unbatched -> [H, W, 1]."""
        from ..models import statenet
        h, w = x.shape[0], x.shape[1]
        if self._state is None:
            self.reset(1, h, w)
        if not hasattr(self, "_fwd_mod"):
            def fwd_mod(p, s, xx, mod):
                s = statenet.forward_modality(p, self.cfg, xx, s, mod)
                return s, statenet.forward_decoder(p, self.cfg, s)
            self._fwd_mod = jax.jit(fwd_mod, static_argnames=("mod",))
        self._state, pred = self._fwd_mod(self.params, self._state,
                                          jnp.asarray(x)[None], modality)
        return np.asarray(pred[0])


def _resolve_precompute(cfg: ModelConfig, precompute_x, model) -> bool:
    """Tri-state precompute_x: None = auto (on only where measured faster —
    bf16 compute on the supported flagship config: the f32 gx buffers cost
    more HBM traffic than the halved sequential GRU work saves, PERF.md);
    True forces (model raises if the config is unsupported); False off."""
    from ..models import statenet
    if not hasattr(model, "forward_sequence_precomputed"):
        return False
    if precompute_x is None:
        return (statenet.supports_x_precompute(cfg)
                and cfg.compute_dtype == "bfloat16")
    return bool(precompute_x)


class SequenceScanInference:
    """Whole-sequence inference as one jitted lax.scan per chunk: fewer
    host->device dispatches than per-package streaming (identical outputs).
    Chunked so arbitrarily long sequences stream with bounded memory.

    batched_decode: defer every decode of the chunk and run ONE decoder
    pass over all chunk*(K+1) super-state snapshots
    (model.forward_sequence_batched_decode) — bit-identical outputs, much
    better MXU fill for the narrow-channel decoder (~57% of package time).
    This is the fast path for offline processing of recorded sequences
    (test.py semantics), where per-package latency doesn't matter.
    NOTE: on bf16 configs precompute_x auto-enables the x-side-hoisted
    forward (_resolve_precompute) — outputs then match per-package
    streaming within ~1 ulp, not bitwise; pass precompute_x=False for
    bit-exactness."""

    def __init__(self, params, cfg: ModelConfig, arch: str = "ERGB2DepthRecurrent",
                 chunk: int = 32, batched_decode: bool = False,
                 precompute_x: Optional[bool] = None):
        self.params = params
        self.cfg = cfg
        self.chunk = chunk
        self.model = get_model(arch)
        if batched_decode and _resolve_precompute(cfg, precompute_x,
                                                  self.model):
            self._fwd = jax.jit(
                lambda p, s, seq: self.model.forward_sequence_precomputed(
                    p, cfg, s, seq))
        elif batched_decode and hasattr(self.model,
                                        "forward_sequence_batched_decode"):
            comp = getattr(cfg, "composed_decoder", "auto") == "on"
            fus = getattr(cfg, "fused_gru", "auto") == "on"
            self._fwd = jax.jit(
                lambda p, s, seq: self.model.forward_sequence_batched_decode(
                    p, cfg, s, seq, allow_fused=fus, allow_fused_decoder=True,
                    allow_composed=comp))
        else:
            self._fwd = jax.jit(
                lambda p, s, seq: self.model.forward_sequence(p, cfg, s, seq))

    def run_sequence(self, events: np.ndarray, image: np.ndarray):
        """events: [T, K, H, W, C], image: [T, H, W, C] for ONE sequence
        (fresh zero state).  Returns {key: [T, H, W, 1]} predictions."""
        t_total = events.shape[0]
        h, w = image.shape[1], image.shape[2]
        state = self.model.init_state(self.cfg, 1, h, w)
        outs: Dict[str, List[np.ndarray]] = {}
        for t0 in range(0, t_total, self.chunk):
            ev = events[t0:t0 + self.chunk]
            im = image[t0:t0 + self.chunk]
            n = ev.shape[0]
            if n < self.chunk:
                # pad the tail chunk to the compiled length; drop padding
                # after (padded steps only corrupt the post-sequence state,
                # which is discarded)
                pad = self.chunk - n
                ev = np.concatenate([ev, np.zeros((pad,) + ev.shape[1:], ev.dtype)])
                im = np.concatenate([im, np.zeros((pad,) + im.shape[1:], im.dtype)])
            seq = {"events": jnp.asarray(ev)[None], "image": jnp.asarray(im)[None]}
            state, preds = self._fwd(self.params, state, seq)
            for k, v in preds.items():
                outs.setdefault(k, []).append(np.asarray(v)[:n, 0])
        return {k: np.concatenate(v) for k, v in outs.items()}


def run_chunked_streaming(dataset, params, cfg: ModelConfig,
                          arch: str = "ERGB2DepthRecurrent", chunk: int = 16,
                          on_prediction=None, batched_decode: bool = True,
                          decode_keys=None,
                          precompute_x: Optional[bool] = None):
    """Offline chunked streaming over a ConcatSequenceDataset: each sequence
    is processed `chunk` packages at a time through ONE jitted program
    (scan of encoders+state, then — with batched_decode — a single decoder
    pass over all chunk*(K+1) snapshots).  Outputs identical to per-package
    streaming (within ~1 ulp when precompute_x hoists the x-side GRU work,
    see _resolve_precompute); per-item latency is traded for throughput,
    which is exactly the reference test.py regime (recorded datasets,
    test.py:207-384).

    State is carried across chunks within a sequence and re-zeroed at every
    sequence boundary; the tail chunk is zero-padded to the compiled length
    (padding only corrupts the post-sequence state, which is discarded).
    The next chunk's items are prefetched on a host thread while the device
    runs the current one.
    """
    from concurrent.futures import ThreadPoolExecutor

    model = get_model(arch)
    dk = tuple(decode_keys) if decode_keys else None
    if batched_decode and _resolve_precompute(cfg, precompute_x, model):
        fwd = jax.jit(lambda p, s, seq: model.forward_sequence_precomputed(
            p, cfg, s, seq, decode_keys=dk))
    elif batched_decode and hasattr(model, "forward_sequence_batched_decode"):
        fwd = jax.jit(lambda p, s, seq: model.forward_sequence_batched_decode(
            p, cfg, s, seq, decode_keys=dk,
            allow_fused=getattr(cfg, "fused_gru", "auto") == "on",
            allow_fused_decoder=True,
            allow_composed=getattr(cfg, "composed_decoder", "auto") == "on"))
    else:
        fwd = jax.jit(lambda p, s, seq: model.forward_sequence(
            p, cfg, s, seq, decode_keys=dk))

    sizes = [len(d) for d in dataset.datasets]
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])

    def load_chunk(sub, t0, size):
        items = [sub[i] for i in range(t0, min(t0 + chunk, size))]
        # host-side TIME-LEADING CHANNEL-FIRST packing: an NHWC chunk
        # buffer scanned in-jit would be lane-padded 5->128 on the minor
        # channel dim (~25x HBM) and the in-jit moveaxis would materialize
        # the padded copy — the CLAUDE.md/PERF.md TPU layout rules.  The
        # '_tcf'/'_t' keys are consumed as-is by forward_sequence AND
        # forward_sequence_batched_decode.
        ev = np.stack([it["events"][0] for it in items])   # [n, K, H, W, C]
        im = np.stack([it["image"][0] for it in items])    # [n, H, W, C]
        out = {
            "events_tcf": np.ascontiguousarray(
                np.transpose(ev, (0, 1, 4, 2, 3))[:, None]),  # [n,1,K,C,H,W]
            "image_tcf": np.ascontiguousarray(
                np.transpose(im, (0, 3, 1, 2))[:, None]),     # [n,1,C,H,W]
        }
        # phased (irregular-timestamp) regime: chunk the continuous
        # timestamps too (they feed only the PhasedLSTM gates)
        if cfg.use_phased_arch and "times_events" in items[0]:
            out["times_events_t"] = np.stack(
                [np.atleast_1d(it["times_events"][0]) for it in items])[:, None]
            out["times_image_t"] = np.stack(
                [np.float32(np.asarray(it["times_image"][0]).ravel()[0])
                 for it in items])[:, None]
        n = len(items)
        if n < chunk:
            pad = chunk - n
            out = {k: np.concatenate(
                       [v, np.zeros((pad,) + v.shape[1:], v.dtype)])
                   for k, v in out.items()}
        h, w = im.shape[1], im.shape[2]
        return items, out, (h, w)

    pool = ThreadPoolExecutor(1)
    try:
        # flat list of (sub, t0) chunk tasks so prefetch crosses sequence
        # boundaries too
        tasks = [(s, t0) for s in range(len(sizes))
                 for t0 in range(0, sizes[s], chunk)]
        fut = pool.submit(load_chunk, dataset.datasets[tasks[0][0]],
                          tasks[0][1], sizes[tasks[0][0]]) if tasks else None
        state, cur_seq = None, -1
        for ti, (s, t0) in enumerate(tasks):
            items, arrs, (h, w) = fut.result()
            if ti + 1 < len(tasks):
                s2, t02 = tasks[ti + 1]
                fut = pool.submit(load_chunk, dataset.datasets[s2], t02,
                                  sizes[s2])
            if s != cur_seq:
                state = model.init_state(cfg, 1, h, w)
                cur_seq = s
            seq = {k: jnp.asarray(v) for k, v in arrs.items()}
            state, preds = fwd(params, state, seq)
            if on_prediction is not None:
                preds_np = {k: np.asarray(v) for k, v in preds.items()}
                for j, item in enumerate(items):
                    gidx = int(starts[s] + t0 + j)
                    on_prediction(gidx,
                                  {k: v[j, 0] for k, v in preds_np.items()},
                                  item, t0 + j)
    finally:
        pool.shutdown()


class BatchedStreamingInference:
    """Multi-lane streaming: N independent sequences advance in lockstep;
    a per-lane reset mask zeroes the recurrent state at each lane's sequence
    boundary.  Identical per-sequence outputs to single-lane at N x the
    throughput (BASELINE config 5).

    mesh: optional Mesh — lanes (the batch dim of every input, the state,
    and the reset mask) are sharded over the mesh 'data' axis and params
    replicated, so N lanes stream across the chips of a slice with XLA
    collectives riding ICI.  Per-lane outputs are identical to the
    single-device engine (tests/test_parallel.py)."""

    def __init__(self, params, cfg: ModelConfig, n_lanes: int,
                 height: int, width: int, arch: str = "ERGB2DepthRecurrent",
                 mesh=None):
        self.cfg = cfg
        self.n_lanes = n_lanes
        self.model = get_model(arch)
        self.state = self.model.init_state(cfg, n_lanes, height, width)
        self._mesh = mesh
        self._lane_sharding = None
        if mesh is not None:
            from ..parallel import batch_sharding, replicate
            n_data = mesh.shape["data"]
            if n_lanes % n_data:
                raise ValueError(
                    f"n_lanes={n_lanes} must divide evenly over the mesh "
                    f"data axis ({n_data} devices)")
            params = replicate(params, mesh)
            self._lane_sharding = batch_sharding(mesh)
            self.state = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._lane_sharding), self.state)
        self.params = params

        def fwd(params, state, pkg, reset_mask):
            # reset_mask: [N] bool; zero the state of resetting lanes
            def mask_leaf(leaf):
                m = reset_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
                return jnp.where(m, jnp.zeros_like(leaf), leaf)
            state = jax.tree_util.tree_map(mask_leaf, state)
            return self.model.forward_package(
                params, cfg, state, pkg,
                allow_fused=getattr(cfg, "fused_gru", "auto") == "on",
                allow_fused_decoder=True,
                allow_composed=getattr(cfg, "composed_decoder",
                                       "auto") == "on")

        self._fwd = jax.jit(fwd)

    def _put(self, x):
        x = jnp.asarray(x)
        if self._lane_sharding is not None:
            x = jax.device_put(x, self._lane_sharding)
        return x

    def step(self, pkg: Dict[str, Any], reset_mask: np.ndarray):
        """pkg: {'events': [N,K,H,W,C], 'image': [N,H,W,C], optional
        'times_events' [N,K] / 'times_image' [N] for the phased
        (irregular-timestamp) regime}; reset_mask: [N] bool."""
        dev_pkg = {"events": self._put(pkg["events"]),
                   "image": self._put(pkg["image"])}
        for tk in ("times_events", "times_image"):
            if tk in pkg:
                dev_pkg[tk] = self._put(pkg[tk])
        self.state, preds = self._fwd(self.params, self.state, dev_pkg,
                                      self._put(np.asarray(reset_mask)))
        return preds


def _round_robin_lanes(dataset, n_lanes: int):
    """Distribute a ConcatSequenceDataset's sequences round-robin over
    lanes: lane_items[lane] = [(global_idx, seq_pos), ...] back-to-back."""
    sizes = [len(d) for d in dataset.datasets]
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    lane_items: List[list] = [[] for _ in range(n_lanes)]
    for s, (start, size) in enumerate(zip(starts, sizes)):
        lane = s % n_lanes
        for i in range(size):
            lane_items[lane].append((int(start + i), i))
    return lane_items, starts, sizes


def run_batched_streaming(dataset, params, cfg: ModelConfig,
                          arch: str = "ERGB2DepthRecurrent",
                          n_lanes: int = 4, on_prediction=None, mesh=None):
    """Drive a ConcatSequenceDataset through lane-batched streaming.

    Sequences (sub-datasets) are distributed round-robin over `n_lanes`;
    each lane streams its sequences back-to-back with a reset at every
    sequence boundary.  Per-item outputs are identical to single-lane
    streaming; throughput scales with lanes (BASELINE config 5).

    on_prediction(global_idx, preds_dict, item) is called for every valid
    item in global dataset order is NOT guaranteed — callbacks receive the
    dataset-global index so writers can name files correctly.
    """
    lane_items, starts, sizes = _round_robin_lanes(dataset, n_lanes)
    max_len = max(len(li) for li in lane_items) if lane_items else 0

    item0, _ = dataset[0]
    ev_zero = np.zeros_like(item0["events"][0])
    im_zero = np.zeros_like(item0["image"][0])
    # phased (irregular-timestamp) regime: lane-batch the continuous
    # timestamps too (reference statenet.py:204,241 `times` args)
    use_times = cfg.use_phased_arch and "times_events" in item0
    if use_times:
        tev_zero = np.zeros_like(item0["times_events"][0])
        tim_zero = np.zeros((), np.float32)
    h, w = item0["image"].shape[1], item0["image"].shape[2]
    engine = BatchedStreamingInference(params, cfg, n_lanes, h, w, arch,
                                       mesh=mesh)

    for t in range(max_len):
        ev_list, im_list, resets, metas = [], [], [], []
        tev_list, tim_list = [], []
        for lane in range(n_lanes):
            if t < len(lane_items[lane]):
                gidx, seq_pos = lane_items[lane][t]
                item, _ = dataset[gidx]
                metas.append((lane, gidx, seq_pos, item))
                ev_list.append(item["events"][0])
                im_list.append(item["image"][0])
                if use_times:
                    tev_list.append(np.atleast_1d(item["times_events"][0]))
                    tim_list.append(np.float32(np.asarray(item["times_image"][0]).ravel()[0]))
                resets.append(seq_pos == 0)
            else:
                ev_list.append(ev_zero)
                im_list.append(im_zero)
                if use_times:
                    tev_list.append(np.atleast_1d(tev_zero))
                    tim_list.append(tim_zero)
                resets.append(True)
        pkg = {"events": np.stack(ev_list), "image": np.stack(im_list)}
        if use_times:
            pkg["times_events"] = np.stack(tev_list)
            pkg["times_image"] = np.stack(tim_list)
        preds = engine.step(pkg, np.asarray(resets))
        if on_prediction is not None:
            preds_np = {k: np.asarray(v) for k, v in preds.items()}
            for lane, gidx, seq_pos, item in metas:
                on_prediction(gidx, {k: v[lane] for k, v in preds_np.items()},
                              item, seq_pos)


def run_batched_chunked_streaming(dataset, params, cfg: ModelConfig,
                                  arch: str = "ERGB2DepthRecurrent",
                                  n_lanes: int = 8, chunk: int = 2,
                                  on_prediction=None, decode_keys=None,
                                  precompute_x: Optional[bool] = None,
                                  mesh=None):
    """Lane-batched AND chunked offline streaming: sequences round-robin
    over `n_lanes` lanes (run_batched_streaming) while `chunk` packages per
    lane are scanned in ONE jitted program with a single batched decoder
    pass over all chunk*n_lanes*(K+1) snapshots (run_chunked_streaming) —
    the highest-throughput offline mode on v5e (PERF.md lane sweep).

    Sequence boundaries fall mid-chunk, so a per-step per-lane reset mask
    rides the scan ('reset_t' [L, B] bool zeroes the recurrent state before
    the flagged package); padded steps past a lane's last item stay reset.
    Outputs are identical to single-lane streaming per item (within ~1 ulp
    when precompute_x is on — see _resolve_precompute).

    mesh: optional Mesh — lanes sharded over the mesh 'data' axis (batch is
    axis 1 of the time-leading chunk buffers), params replicated.  The
    BASELINE config-5 streaming mode end-to-end: data-parallel lane-batched
    chunked inference.
    """
    from concurrent.futures import ThreadPoolExecutor

    model = get_model(arch)
    dk = tuple(decode_keys) if decode_keys else None
    if _resolve_precompute(cfg, precompute_x, model):
        fwd = jax.jit(lambda p, s, seq: model.forward_sequence_precomputed(
            p, cfg, s, seq, decode_keys=dk))
    elif hasattr(model, "forward_sequence_batched_decode"):
        fwd = jax.jit(lambda p, s, seq: model.forward_sequence_batched_decode(
            p, cfg, s, seq, decode_keys=dk,
            allow_fused=getattr(cfg, "fused_gru", "auto") == "on",
            allow_fused_decoder=True,
            allow_composed=getattr(cfg, "composed_decoder", "auto") == "on"))
    else:
        # stateless archs (ERGB2Depth): plain forward_sequence; resets are
        # irrelevant without recurrent state
        fwd = jax.jit(lambda p, s, seq: model.forward_sequence(
            p, cfg, s, seq, decode_keys=dk))

    lane_items, starts, sizes = _round_robin_lanes(dataset, n_lanes)
    max_len = max(len(li) for li in lane_items) if lane_items else 0
    if max_len == 0:
        return

    item0, _ = dataset[0]
    ev_zero = np.zeros_like(item0["events"][0])    # [K, H, W, C]
    im_zero = np.zeros_like(item0["image"][0])     # [H, W, C]
    use_times = cfg.use_phased_arch and "times_events" in item0
    h, w = item0["image"].shape[1], item0["image"].shape[2]

    def load_chunk(t0):
        """[chunk, n_lanes, ...] time-leading channel-first buffers + the
        per-step reset mask and (step, lane) -> (item, gidx, seq_pos) map."""
        ev = np.empty((chunk, n_lanes) + ev_zero.shape, ev_zero.dtype)
        im = np.empty((chunk, n_lanes) + im_zero.shape, im_zero.dtype)
        reset = np.zeros((chunk, n_lanes), bool)
        tev = np.zeros((chunk, n_lanes) + np.shape(
            np.atleast_1d(item0["times_events"][0])), np.float32) \
            if use_times else None
        tim = np.zeros((chunk, n_lanes), np.float32) if use_times else None
        metas = {}
        for j in range(chunk):
            t = t0 + j
            for lane in range(n_lanes):
                if t < len(lane_items[lane]):
                    gidx, seq_pos = lane_items[lane][t]
                    item, _ = dataset[gidx]
                    metas[(j, lane)] = (item, gidx, seq_pos)
                    ev[j, lane] = item["events"][0]
                    im[j, lane] = item["image"][0]
                    reset[j, lane] = seq_pos == 0
                    if use_times:
                        tev[j, lane] = np.atleast_1d(item["times_events"][0])
                        tim[j, lane] = np.float32(
                            np.asarray(item["times_image"][0]).ravel()[0])
                else:
                    ev[j, lane] = ev_zero
                    im[j, lane] = im_zero
                    reset[j, lane] = True
        out = {
            # [L, B, K, C, H, W] / [L, B, C, H, W] — the TPU layout rules
            # (see run_chunked_streaming.load_chunk)
            "events_tcf": np.ascontiguousarray(np.moveaxis(ev, -1, 3)),
            "image_tcf": np.ascontiguousarray(np.moveaxis(im, -1, 2)),
            "reset_t": reset,
        }
        if use_times:
            out["times_events_t"] = tev
            out["times_image_t"] = tim
        return out, metas

    state = model.init_state(cfg, n_lanes, h, w)
    if mesh is not None:
        from ..parallel import batch_sharding, replicate, shard_batch
        n_data = mesh.shape["data"]
        if n_lanes % n_data:
            raise ValueError(
                f"n_lanes={n_lanes} must divide evenly over the mesh data "
                f"axis ({n_data} devices)")
        params = replicate(params, mesh)
        lane0 = batch_sharding(mesh)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, lane0), state)
    pool = ThreadPoolExecutor(1)
    try:
        t0s = list(range(0, max_len, chunk))
        fut = pool.submit(load_chunk, t0s[0])
        for ci, t0 in enumerate(t0s):
            arrs, metas = fut.result()
            if ci + 1 < len(t0s):
                fut = pool.submit(load_chunk, t0s[ci + 1])
            if mesh is not None:
                seq = shard_batch(arrs, mesh)     # lanes on axis 1 (*_tcf)
            else:
                seq = {k: jnp.asarray(v) for k, v in arrs.items()}
            state, preds = fwd(params, state, seq)
            if on_prediction is not None:
                preds_np = {k: np.asarray(v) for k, v in preds.items()}
                for (j, lane), (item, gidx, seq_pos) in metas.items():
                    on_prediction(gidx,
                                  {k: v[j, lane] for k, v in preds_np.items()},
                                  item, seq_pos)
    finally:
        pool.shutdown()


def optimal_scale(prediction: np.ndarray, target: np.ndarray,
                  reg_factor: float, clip_distance: float) -> float:
    """Metric-space optimal scale accumulation (test.py:365-378)."""
    pred = np.exp(reg_factor * (prediction - 1.0)) * clip_distance
    targ = np.exp(reg_factor * (target - 1.0)) * clip_distance
    return float(np.sum(pred * targ) / np.sum(pred * pred))

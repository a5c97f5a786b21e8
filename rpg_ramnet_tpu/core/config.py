"""Typed configuration for the framework.

Parses the reference's JSON config schema (see
/root/reference/RAM_Net/configs/*.json and RAM_Net/model/model.py:12-77 for
field names and defaults) into dataclasses.  The JSON files of the reference
are usable as-is; TPU-specific extras (mesh shape, compute dtype, prefetch
depth) are optional additional keys.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union


def _get(d: Dict[str, Any], key: str, default):
    v = d.get(key, default)
    return v


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Mirrors reference BaseERGB2Depth config unpacking (model/model.py:12-77)."""
    num_bins_rgb: int = 1
    num_bins_events: int = 5
    skip_type: str = "sum"                 # sum | concat | no_skip
    state_combination: str = "sum"         # sum | conv | convlstm | convgru
    num_encoders: int = 4
    base_num_channels: int = 32
    num_residual_blocks: int = 2
    recurrent_block_type: str = "convlstm"  # convlstm | conv
    norm: Optional[str] = None              # None | 'BN' | 'IN' ('none' -> None)
    use_upsample_conv: bool = True
    every_x_rgb_frame: int = 1
    baseline: Union[bool, str] = False      # False | 'rgb' | 'e' | 'ergb' | 'ergb0'
    loss_composition: Union[bool, Sequence[str]] = False
    kernel_size: int = 5
    num_output_channels: int = 1
    activation: str = "sigmoid"
    spatial_resolution: Tuple[int, int] = (112, 112)
    use_phased_arch: bool = False
    # --- TPU extras (no reference counterpart) ---
    compute_dtype: str = "float32"          # 'float32' | 'bfloat16'
    fast_upsample: bool = False             # subpixel decoder (exact; see PERF.md)
    # fused Pallas h-side ConvGRU cell on the precomputed inference path
    # (ops/gru_hside.py): 'auto' = on for supported shapes on a
    # SINGLE-device TPU (statenet._use_fused_cell enforces
    # jax.device_count()==1 — the kernels ignore shardings); 'on'/'off'
    # force.  f32-accumulated gates (~bf16-eps from the XLA path).
    fused_gru: str = "auto"
    # cross-scale merged GRU h-side launch (ops/gru_pair.py): scales 0+1 in
    # one pallas_call, removing one custom-call boundary per modality step.
    # OPT-IN ONLY ('on'); requires fused_gru to be active for both scales.
    fused_pair: str = "auto"
    # gx-streaming h-side cells on the precomputed single-stream path
    # (ops/gru_stream.py): the scan closes over the full gx buffers and
    # cells read their step blocks via scalar-prefetched index maps — no
    # per-step operand materialization.  OPT-IN ONLY ('on') pending
    # hardware measurement; batch-1, convgru, bf16.
    fused_stream: str = "auto"
    # fused Pallas upsample+5x5-conv decoder layers on inference paths
    # (ops/upsample_conv.py): OPT-IN ONLY ('on'); 'auto' is off — the
    # kernel wins isolated microbenches but loses in context on v5e
    # (statenet._use_fused_decoder has the measurements).  Like fused_gru,
    # the Pallas kernel ignores shardings: 'on' is intended for
    # SINGLE-DEVICE runs (a warning fires under a multi-device TPU mesh).
    fused_decoder: str = "auto"
    # composed stride-2 transposed-conv upsample layers (pure XLA,
    # differentiable): 'auto' = large decode batches (>=24) in bf16 on
    # TPU — 1.5-1.6x the two-stage layers there, a loss at latency
    # batches (statenet._use_composed_decoder)
    composed_decoder: str = "auto"

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "ModelConfig":
        norm = d.get("norm")
        if norm in ("none", "None", ""):
            norm = None
        baseline = d.get("baseline", False)
        return ModelConfig(
            num_bins_rgb=int(d.get("num_bins_rgb", 1)),
            num_bins_events=int(d.get("num_bins_events", 5)),
            skip_type=str(d.get("skip_type", "sum")),
            state_combination=str(d.get("state_combination", "sum")),
            num_encoders=int(d.get("num_encoders", 4)),
            base_num_channels=int(d.get("base_num_channels", 32)),
            num_residual_blocks=int(d.get("num_residual_blocks", 2)),
            recurrent_block_type=str(d.get("recurrent_block_type", "convlstm")),
            norm=norm,
            use_upsample_conv=bool(d.get("use_upsample_conv", True)),
            every_x_rgb_frame=int(d.get("every_x_rgb_frame", 1)),
            baseline=baseline,
            loss_composition=d.get("loss_composition", False),
            kernel_size=int(d.get("kernel_size", 5)),
            num_output_channels=int(d.get("num_output_channels", 1)),
            activation=str(d.get("activation", "sigmoid")),
            spatial_resolution=tuple(d.get("spatial_resolution", (112, 112))),
            use_phased_arch=bool(d.get("use_phased_arch", False)),
            compute_dtype=str(d.get("compute_dtype", "float32")),
            fast_upsample=bool(d.get("fast_upsample", False)),
            fused_gru=str(d.get("fused_gru", "auto")),
            fused_pair=str(d.get("fused_pair", "auto")),
            fused_stream=str(d.get("fused_stream", "auto")),
            fused_decoder=str(d.get("fused_decoder", "auto")),
            composed_decoder=str(d.get("composed_decoder", "auto")),
        )

    @property
    def max_num_channels(self) -> int:
        return self.base_num_channels * (2 ** self.num_encoders)

    @property
    def encoder_input_sizes(self) -> List[int]:
        return [self.base_num_channels * (2 ** i) for i in range(self.num_encoders)]

    @property
    def encoder_output_sizes(self) -> List[int]:
        return [self.base_num_channels * (2 ** (i + 1)) for i in range(self.num_encoders)]

    @property
    def is_baseline(self) -> bool:
        return bool(self.baseline)


@dataclasses.dataclass(frozen=True)
class DataSplitConfig:
    """Mirrors config['data_loader'][split] (reference train.py:99-137)."""
    type: str = "SequenceSynchronizedFramesEventsDataset"
    base_folder: str = ""
    event_folder: str = "events/voxels"
    depth_folder: str = "depth/data"
    frame_folder: str = "rgb/data"
    flow_folder: str = ""
    semantic_folder: str = "semantic/data"
    proba_pause_when_running: float = 0.0
    proba_pause_when_paused: float = 0.0
    step_size: int = 1
    clip_distance: float = 100.0
    every_x_rgb_frame: int = 1
    scale_factor: float = 1.0
    reg_factor: float = 5.7
    baseline: Union[bool, str] = False

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "DataSplitConfig":
        return DataSplitConfig(
            type=str(d.get("type", "SequenceSynchronizedFramesEventsDataset")),
            base_folder=str(d.get("base_folder", "")),
            event_folder=str(d.get("event_folder", "events/voxels")),
            depth_folder=str(d.get("depth_folder", "depth/data")),
            frame_folder=str(d.get("frame_folder", "rgb/data")),
            flow_folder=str(d.get("flow_folder", "")),
            semantic_folder=str(d.get("semantic_folder", "semantic/data")),
            proba_pause_when_running=float(d.get("proba_pause_when_running", 0.0)),
            proba_pause_when_paused=float(d.get("proba_pause_when_paused", 0.0)),
            step_size=int(d.get("step_size", 1)),
            clip_distance=float(d.get("clip_distance", 100.0)),
            every_x_rgb_frame=int(d.get("every_x_rgb_frame", 1)),
            scale_factor=float(d.get("scale_factor", 1.0)),
            reg_factor=float(d.get("reg_factor", 5.7)),
            baseline=d.get("baseline", False),
        )


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    epochs: int = 100
    sequence_length: int = 10
    save_dir: str = "runs"
    save_freq: int = 4
    verbosity: int = 2
    monitor: str = "val_loss"
    monitor_mode: str = "min"
    num_previews: int = 2
    num_val_previews: int = 2
    still_previews: bool = False
    movie: bool = True
    grid_loss: bool = False
    state_preview: bool = False   # '--record' state-change figures (lstm_trainer.py:49,295-377)
    loss_composition: Union[bool, Sequence[str]] = False
    loss_weights: Sequence[float] = (1.0,)
    # TPU extras
    legacy_loss_scaling: bool = False   # replicate reference loss-aliasing scale (x num_keys)
    # Preview TB metrics: the reference evaluates each key's FIRST-timestep
    # prediction against the LAST supervised key's step-0 ground truth
    # (lstm_trainer.py:283 sets new_target per supervised key, :377 appends the
    # final one, :516 compares predicted_targets[key][0] vs groundtruth_targets[0]).
    # True = corrected semantics instead: per-key GT, averaged over ALL timesteps.
    preview_metrics_all_steps: bool = False
    log_every: int = 25
    remat: bool = True                  # jax.checkpoint per TBPTT step (activation memory)
    remat_chunk: int = 1                # packages per checkpoint (recompute/memory trade)
    # decode the supervised keys ONCE outside the (remat'd) scan as one
    # L*B*|keys| batch: better decoder MXU fill, no decoder recompute in
    # the backward (identical losses/gradients; phased/times supported;
    # BN/IN training mode falls back to the in-scan decode — batch stats
    # must match the reference's per-step statistics)
    deferred_decode: bool = False
    # with deferred_decode: batch each package's state-independent x-side
    # work (encoder sweeps + ConvGRU x-side gate convs) inside the scan
    # step, leaving only h-side GRU completions sequential (requires
    # recurrent_block_type='conv' + convgru; gradients equal to float
    # summation order — NOT bitwise)
    precompute_x: bool = False
    # what the per-step jax.checkpoint SAVES: 'none' = recompute the whole
    # step in the backward (minimum memory); 'enc_out' = save the per-scale
    # encoder conv outputs (checkpoint_name tags in statenet) so the
    # backward skips the head+encoder recompute at ~2.7 GiB extra
    # activations for the flagship recipe.  '+'-join to save several tags.
    remat_policy: str = "none"

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "TrainerConfig":
        lc = d.get("loss_composition", False)
        if isinstance(lc, list):
            lc = tuple(lc)
        return TrainerConfig(
            epochs=int(d.get("epochs", 100)),
            sequence_length=int(d.get("sequence_length", 10)),
            save_dir=str(d.get("save_dir", "runs")),
            save_freq=int(d.get("save_freq", 4)),
            verbosity=int(d.get("verbosity", 2)),
            monitor=str(d.get("monitor", "val_loss")),
            monitor_mode=str(d.get("monitor_mode", "min")),
            num_previews=int(d.get("num_previews", 2)),
            num_val_previews=int(d.get("num_val_previews", 2)),
            still_previews=bool(d.get("still_previews", False)),
            movie=bool(d.get("movie", True)),
            grid_loss=bool(d.get("grid_loss", False)),
            state_preview=bool(d.get("state_preview", False)),
            loss_composition=lc,
            loss_weights=tuple(d.get("loss_weights", (1.0,))),
            legacy_loss_scaling=bool(d.get("legacy_loss_scaling", False)),
            preview_metrics_all_steps=bool(d.get("preview_metrics_all_steps", False)),
            log_every=int(d.get("log_every", 25)),
            remat=bool(d.get("remat", True)),
            remat_chunk=int(d.get("remat_chunk", 1)),
            deferred_decode=bool(d.get("deferred_decode", False)),
            precompute_x=bool(d.get("precompute_x", False)),
            remat_policy=str(d.get("remat_policy", "none")),
        )


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """TPU mesh description (no reference counterpart; see SURVEY.md §2.5)."""
    data: int = -1        # -1: all devices on the data axis
    model: int = 1
    dcn_data: int = 1     # reserved multi-slice axis

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "MeshConfig":
        return MeshConfig(
            data=int(d.get("data", -1)),
            model=int(d.get("model", 1)),
            dcn_data=int(d.get("dcn_data", 1)),
        )


@dataclasses.dataclass(frozen=True)
class Config:
    name: str = "run"
    arch: str = "ERGB2DepthRecurrent"
    use_phased_arch: bool = False
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train_data: DataSplitConfig = dataclasses.field(default_factory=DataSplitConfig)
    val_data: DataSplitConfig = dataclasses.field(default_factory=DataSplitConfig)
    batch_size: int = 8
    num_workers: int = 4
    normalize: bool = True
    shuffle: bool = True
    optimizer_type: str = "Adam"
    optimizer: Dict[str, Any] = dataclasses.field(default_factory=lambda: {"lr": 3e-4})
    lr_scheduler_type: str = "ExponentialLR"
    lr_scheduler_freq: int = 100
    lr_scheduler: Dict[str, Any] = dataclasses.field(default_factory=lambda: {"gamma": 0.5})
    loss_type: str = "scale_invariant_loss"
    loss_config: Dict[str, Any] = dataclasses.field(default_factory=dict)
    grad_loss_weight: Optional[float] = None     # None: no multi-scale gradient loss
    mse_loss_weight: Optional[float] = None
    mse_loss_downsampling_factor: float = 0.5
    metrics: Sequence[str] = ("mse", "abs_rel_diff", "scale_invariant_error", "median_error")
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    raw: Dict[str, Any] = dataclasses.field(default_factory=dict, hash=False, compare=False)

    @staticmethod
    def from_dict(cfg: Dict[str, Any]) -> "Config":
        """Parse a reference-schema JSON config dict.

        Mirrors the plumbing done in reference train.py:198-201 (model section
        inherits gpu/every_x_rgb_frame/baseline/loss_composition from other
        sections).
        """
        dl = cfg.get("data_loader", {})
        model_d = dict(cfg.get("model", {}))
        train_d = dl.get("train", {})
        trainer_d = cfg.get("trainer", {})
        # model inherits these from data_loader/trainer sections (train.py:198-201)
        model_d.setdefault("every_x_rgb_frame", train_d.get("every_x_rgb_frame", 1))
        model_d.setdefault("baseline", train_d.get("baseline", False))
        model_d.setdefault("loss_composition", trainer_d.get("loss_composition", False))
        model_d.setdefault("use_phased_arch", cfg.get("use_phased_arch", False))

        grad_loss = cfg.get("grad_loss")
        mse_loss = cfg.get("mse_loss")
        loss = cfg.get("loss", {})
        return Config(
            name=str(cfg.get("name", "run")),
            arch=str(cfg.get("arch", "ERGB2DepthRecurrent")),
            use_phased_arch=bool(cfg.get("use_phased_arch", False)),
            model=ModelConfig.from_dict(model_d),
            train_data=DataSplitConfig.from_dict(train_d),
            val_data=DataSplitConfig.from_dict(dl.get("validation", train_d)),
            batch_size=int(dl.get("batch_size", 8)),
            num_workers=int(dl.get("num_workers", 4)),
            normalize=bool(dl.get("normalize", True)),
            shuffle=bool(dl.get("shuffle", True)),
            optimizer_type=str(cfg.get("optimizer_type", "Adam")),
            optimizer=dict(cfg.get("optimizer", {"lr": 3e-4})),
            lr_scheduler_type=str(cfg.get("lr_scheduler_type", "ExponentialLR")),
            lr_scheduler_freq=int(cfg.get("lr_scheduler_freq", 100)),
            lr_scheduler=dict(cfg.get("lr_scheduler", {"gamma": 0.5})),
            loss_type=str(loss.get("type", "scale_invariant_loss")),
            loss_config=dict(loss.get("config", {})),
            grad_loss_weight=(float(grad_loss.get("weight", 1.0)) if grad_loss is not None else None),
            mse_loss_weight=(float(mse_loss.get("weight", 1.0)) if mse_loss is not None else None),
            mse_loss_downsampling_factor=(
                float(mse_loss.get("downsampling_factor", 0.5)) if mse_loss is not None else 0.5),
            metrics=tuple(cfg.get("metrics", ("mse", "abs_rel_diff", "scale_invariant_error", "median_error"))),
            trainer=TrainerConfig.from_dict(trainer_d),
            mesh=MeshConfig.from_dict(cfg.get("mesh", {})),
            raw=cfg,
        )

    @staticmethod
    def load(path: str) -> "Config":
        with open(path) as f:
            return Config.from_dict(json.load(f))

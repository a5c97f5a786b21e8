from .config import Config, ModelConfig, DataSplitConfig, TrainerConfig, MeshConfig
from .registry import Registry, MODELS, DATASETS, LOSSES, METRICS

__all__ = [
    "Config", "ModelConfig", "DataSplitConfig", "TrainerConfig", "MeshConfig",
    "Registry", "MODELS", "DATASETS", "LOSSES", "METRICS",
]

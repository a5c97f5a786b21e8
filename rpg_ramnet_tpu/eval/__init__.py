from . import metrics, inference, writers, evaluation, filters

__all__ = ["metrics", "inference", "writers", "evaluation", "filters"]

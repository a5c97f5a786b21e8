from . import layers, statenet, unet
from .model import ERGB2Depth, ERGB2DepthRecurrent, get_model, prediction_keys, event_loop_range
from .statenet import StateNetState, ModalityState, init_state

__all__ = [
    "layers", "statenet", "unet",
    "ERGB2Depth", "ERGB2DepthRecurrent", "get_model", "prediction_keys",
    "event_loop_range", "StateNetState", "ModalityState", "init_state",
]

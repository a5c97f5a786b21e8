from .platform import ensure_platform
from .timers import Timer, DeviceTimer, profile_trace, print_timing_info
from .training_utils import (count_parameters, select_evenly_spaced_elements,
                             flow2rgb, plot_grad_flow_bars)
from .image import robust_min, robust_max, normalize

__all__ = [
    "ensure_platform", "Timer", "DeviceTimer", "profile_trace",
    "print_timing_info", "count_parameters", "select_evenly_spaced_elements",
    "flow2rgb", "plot_grad_flow_bars",
]

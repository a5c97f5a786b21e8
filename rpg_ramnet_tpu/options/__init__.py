from .inference_options import set_inference_options, set_depth_inference_options

__all__ = ["set_inference_options", "set_depth_inference_options"]

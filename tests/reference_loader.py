"""Import the reference PyTorch implementation (read-only) for numerical
parity testing.  We never copy reference code; we import it as the oracle."""
import sys

REF_ROOT = "/root/reference/RAM_Net"


def reference_modules():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib
    mm = importlib.import_module("model.model")
    sub = importlib.import_module("model.submodules")
    un = importlib.import_module("model.unet")
    return mm, sub, un


def make_reference_model(arch: str, model_cfg: dict):
    """Build a reference torch model on CPU."""
    import torch
    mm, _, _ = reference_modules()
    torch.manual_seed(0)
    model = getattr(mm, arch)(dict(model_cfg))
    model.gpu = torch.device("cpu")  # model.py:77 hardcodes cuda; run on cpu
    model.eval()
    return model

"""Drive the bench hardware parity guard with the opt-in legs ON REAL TPU.

Verifies two things end-to-end (2026-08-18 guard change):
  1. default-on legs (fused cells+decoder, composed decoder) still PASS;
  2. opt-in legs that the rig's chipless AOT compile helper rejects
     (pair / stream, PERF.md round-4) are RECORDED into optin_errors and
     do NOT fail the guard — i.e. check_fused_parity returns a float and
     never raises for a rig availability problem.
Writes exp/guard_optin_verify.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform   # noqa: E402
ensure_platform()

from bench import check_fused_parity               # noqa: E402

errs = {}
out = {}
try:
    out["worst_diff"] = check_fused_parity(include_optin=True,
                                           optin_errors=errs)
    out["guard_raised"] = False
except Exception as e:
    out["guard_raised"] = True
    out["guard_error"] = str(e)[:300]
out["optin_errors"] = {k: v[:160] for k, v in errs.items()}
print(json.dumps(out), flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "guard_optin_verify.json"), "w") as f:
    json.dump(out, f, indent=1)

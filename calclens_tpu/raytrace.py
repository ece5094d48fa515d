"""CLI entry point: python -m calclens_tpu.raytrace <config> [restart_plane]

The reference's main.c: read config, run the multiple-plane trace (resuming
from a restart file when present), or the CMB propagation mode when
CMBLensing is set (main.c:95-101).
"""

from __future__ import annotations

import os
import sys
import time

from .config import read_config
from .driver import Raytracer


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m calclens_tpu.raytrace <config> [restart_plane]",
              file=sys.stderr)
        return 2
    t0 = time.perf_counter()
    cfg = read_config(argv[0])
    if cfg.DebugNans:
        import jax

        jax.config.update("jax_debug_nans", True)
    rt = Raytracer(cfg)

    rpath = rt.restart_path()
    opath = rt.orbax_restart_path()
    legacy = os.path.join(cfg.OutputPath or ".", "restart.0")
    if os.path.isdir(opath):
        rt.load_restart_orbax(opath)
        if len(argv) > 1:
            rt.current_plane = int(argv[1])
        print(f"resuming at plane {rt.current_plane} from {opath}",
              file=sys.stderr)
    elif os.path.exists(rpath):
        rt.load_restart(rpath)
        if len(argv) > 1:
            rt.current_plane = int(argv[1])
        print(f"resuming at plane {rt.current_plane} from {rpath}",
              file=sys.stderr)
    elif os.path.exists(legacy):
        # a REFERENCE run's binary restart files (restart.c layout)
        rt.load_legacy_restart(cfg.OutputPath or ".")
        if len(argv) > 1:
            rt.current_plane = int(argv[1])
        print(f"resuming at plane {rt.current_plane} from legacy {legacy}",
              file=sys.stderr)
    else:
        rt.init_rays()

    if cfg.CMBLensing:
        run_cmb_mode(rt)
    else:
        rt.run(start_time=t0)
    return 0


def run_cmb_mode(rt):
    """CMB-lensing mode with the reference's full output set
    (propagate_to_cmb_from_restart.c:184-492): propagate the restart rays to
    chi(z=1100), then write

      * restart_rays_at_cmb.0 — the updated rays in the reference restart
        byte layout (gated by WriteRaysAtCMB; the reference's
        write_restart_files_for_rays_at_cmb const, :203,389-438);
      * CMB_convergence_<nside>.fits — per-pixel mean kappa, 0 where no
        rays land (gated by WriteCMBMaps, :440-480);
      * CMB_rays_<nside>.fits — the 7-column lens-map sums (:482-492).
    """
    import numpy as np

    from . import maps as lm
    from .io import legacy_restart as lr

    cfg = rt.cfg
    outdir = cfg.OutputPath or "."
    os.makedirs(outdir, exist_ok=True)
    map_order = cfg.CMBMapOrder if cfg.CMBMapOrder >= 0 else lm.CMB_MAP_ORDER
    nside = 1 << map_order

    accum = rt.propagate_to_cmb(map_order=map_order)

    written = []
    if cfg.WriteRaysAtCMB:
        from .utils.tunnel import fetch

        path = lr.write_legacy_restart(
            outdir, cfg, fetch(rt.rays_packed), rt.ray_nest,
            current_plane=getattr(rt, "current_plane", cfg.NumLensPlanes),
            filename="restart_rays_at_cmb.0")
        written.append(path)
    if cfg.WriteCMBMaps:
        conv = lm.convergence_from_accum(accum)
        cpath = os.path.join(outdir, f"CMB_convergence_{nside}.fits")
        lm.write_single_map_fits(conv, nside, cpath)
        rpath = os.path.join(outdir, f"CMB_rays_{nside}.fits")
        lm.write_lens_map_fits(accum, nside, rpath)
        written += [cpath, rpath]
    for p in written:
        print(f"wrote {p}", file=sys.stderr)
    return written


if __name__ == "__main__":
    sys.exit(main())

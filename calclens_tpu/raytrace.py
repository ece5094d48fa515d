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
        from . import maps as lm

        accum = rt.propagate_to_cmb()
        conv = lm.convergence_from_accum(accum)
        out = os.path.join(cfg.OutputPath or ".",
                           f"Convergence_{1 << lm.CMB_MAP_ORDER}_cmb.fits")
        lm.write_single_map_fits(conv, 1 << lm.CMB_MAP_ORDER, out)
        print(f"wrote CMB convergence map {out}", file=sys.stderr)
    else:
        rt.run(start_time=t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Ray output in the reference's FITS layout (rayio.c:255-826).

File <OutputPath>/<RayOutputName>%04d.%04d (CurrentMapNum, fileNum):
  primary image HDU: int64 [2*NbundleCells] = concat(NumRaysInPeanoCell,
      StartRaysInPeanoCell), keys NumFiles, PeanoCellHEALPixOrder,
      RayHEALPixOrder;
  BINTABLE "Rays": nest (K), ra, dec, A00, A01, A10, A11 (D)
      [+ alpha0, alpha1 when OutputRayDeflections] [+ phi when OutputPhi],
  rows grouped by bundle-cell Peano index, nest-ordered within a cell.

Rays are written in the observer frame and ra-dec basis (rayio.c:299-347) and
restored afterwards; this module works on host numpy copies so the device
pytree is never mutated.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from ..healpix import core as hp
from ..rays import frames
from . import fits


def _to_obs_radec(cfg, rays, ray_nest):
    obs = jnp.asarray(hp.pix2vec_nest(ray_nest, cfg.rayOrder), rays.n.dtype)
    r = frames.paratrans_rays_curr2obs(rays, obs)
    return frames.rot_rays_ang2radec(r)


def write_rays(cfg, rays, ray_nest, map_num=0):
    """Write all rays to cfg.NumRayOutputFiles FITS files.  Returns paths."""
    out = _to_obs_radec(cfg, rays, ray_nest)
    n = np.asarray(out.n, np.float64)
    A = np.asarray(out.A, np.float64)
    alpha = np.asarray(out.alpha, np.float64)
    phi = np.asarray(out.phi, np.float64)
    nest = np.asarray(ray_nest, np.int64)

    theta, phival = hp.vec2ang(n)
    ra, dec = hp.ang2radec(theta, phival)

    k2 = 2 * (cfg.rayOrder - cfg.bundleOrder)
    nbc = int(hp.order2npix(cfg.bundleOrder))
    cell_nest = nest >> k2
    cell_peano = hp.nest2peano(cell_nest, cfg.bundleOrder)

    # sort rows by (peano cell, nest within cell) — the reference's layout
    order = np.lexsort((nest, cell_peano))
    counts = np.bincount(cell_peano, minlength=nbc).astype(np.int64)

    fields = [("nest", "<i8"), ("ra", "<f8"), ("dec", "<f8"),
              ("A00", "<f8"), ("A01", "<f8"), ("A10", "<f8"), ("A11", "<f8")]
    if cfg.OutputRayDeflections:
        fields += [("alpha0", "<f8"), ("alpha1", "<f8")]
    if cfg.OutputPhi:
        fields += [("phi", "<f8")]
    rec = np.zeros(len(nest), dtype=np.dtype(fields))
    rec["nest"] = nest[order]
    rec["ra"] = ra[order]
    rec["dec"] = dec[order]
    rec["A00"] = A[order, 0, 0]
    rec["A01"] = A[order, 0, 1]
    rec["A10"] = A[order, 1, 0]
    rec["A11"] = A[order, 1, 1]
    if cfg.OutputRayDeflections:
        rec["alpha0"] = alpha[order, 0]
        rec["alpha1"] = alpha[order, 1]
    if cfg.OutputPhi:
        rec["phi"] = phi[order]

    # split peano cells into NumRayOutputFiles contiguous groups with roughly
    # equal ray counts (the reference's per-file task decomposition)
    nfiles = max(1, int(cfg.NumRayOutputFiles))
    csum = np.cumsum(counts)
    total = csum[-1]
    edges = np.searchsorted(csum, total * np.arange(1, nfiles) / nfiles) + 1
    cell_groups = np.split(np.arange(nbc), edges)

    os.makedirs(cfg.OutputPath, exist_ok=True)
    paths = []
    row0 = 0
    for fileNum, cells in enumerate(cell_groups):
        fc = np.zeros(nbc, dtype=np.int64)
        fc[cells] = counts[cells]
        start = np.zeros(nbc, dtype=np.int64)
        np.cumsum(fc[:-1], out=start[1:])
        start[fc == 0] = 0
        nrows = int(fc.sum())
        hdr = {
            "NumFiles": (nfiles, "number of files that rays are split into"),
            "PeanoCellHEALPixOrder": (cfg.bundleOrder,
                                      "HEALPix order of peano indexed cells"),
            "RayHEALPixOrder": (cfg.rayOrder, "HEALPix order of ray grid"),
        }
        prim = fits.image_hdu(np.concatenate([fc, start]), header=hdr)
        tbl = fits.bintable_hdu(rec[row0: row0 + nrows], name="Rays")
        path = os.path.join(
            cfg.OutputPath, f"{cfg.RayOutputName}{map_num:04d}.{fileNum:04d}")
        fits.write_fits(path, [prim, tbl])
        paths.append(path)
        row0 += nrows
    return paths


def read_rays(path):
    """Read one ray file -> (header, NumRaysInPeanoCell, StartRaysInPeanoCell,
    structured row array)."""
    hdus = fits.read_fits(path)
    hdr, layout = hdus[0]
    nbc = len(layout) // 2
    return hdr, layout[:nbc], layout[nbc:], hdus[1][1]

"""Ray output in the reference's FITS layout (rayio.c:255-826).

File <OutputPath>/<RayOutputName>%04d.%04d (CurrentMapNum, fileNum):
  primary image HDU: int64 [2*NbundleCells] = concat(NumRaysInPeanoCell,
      StartRaysInPeanoCell), keys NumFiles, PeanoCellHEALPixOrder,
      RayHEALPixOrder;
  BINTABLE "Rays": nest (K), ra, dec, A00, A01, A10, A11 (D)
      [+ alpha0, alpha1 when OutputRayDeflections] [+ phi when OutputPhi],
  rows grouped by bundle-cell Peano index, nest-ordered within a cell.

Rays are written in the observer frame and ra-dec basis (rayio.c:299-347).

Two writers share the layout helpers:

- `write_rays` — host-side, takes an unpacked Rays pytree (small runs, tests).
- `write_rays_sharded` — shard-parallel: the obs-frame transform runs on
  device (elementwise, sharding-preserving) and each output file's rows are
  gathered ON DEVICE, so only file-sized blocks ever reach the host.  This is
  the analog of the reference's NumRayOutputFiles sub-communicator writes
  (rayio.c:280-334): at rayOrder 14-16 a single-host gather of the global
  [21, N] buffer is the scaling wall; here the global buffer never leaves
  the device mesh.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from ..healpix import core as hp
from ..rays import frames
from ..rays import soa
from . import fits


# ----------------------------------------------------------------------------
# shared layout helpers
# ----------------------------------------------------------------------------

def _file_cell_groups(counts, nfiles):
    """Split peano cells into nfiles contiguous groups with roughly equal ray
    counts (the reference's per-file task decomposition)."""
    nbc = len(counts)
    csum = np.cumsum(counts)
    total = csum[-1]
    edges = np.searchsorted(csum, total * np.arange(1, nfiles) / nfiles) + 1
    return np.split(np.arange(nbc), edges)


def _layout_arrays(counts, cells, nbc):
    """(NumRaysInPeanoCell, StartRaysInPeanoCell) for one file covering
    `cells` (peano indices)."""
    fc = np.zeros(nbc, dtype=np.int64)
    fc[cells] = counts[cells]
    start = np.zeros(nbc, dtype=np.int64)
    np.cumsum(fc[:-1], out=start[1:])
    start[fc == 0] = 0
    return fc, start


def _ray_fields(cfg):
    fields = [("nest", "<i8"), ("ra", "<f8"), ("dec", "<f8"),
              ("A00", "<f8"), ("A01", "<f8"), ("A10", "<f8"), ("A11", "<f8")]
    if cfg.OutputRayDeflections:
        fields += [("alpha0", "<f8"), ("alpha1", "<f8")]
    if cfg.OutputPhi:
        fields += [("phi", "<f8")]
    return fields


def _file_header(cfg, nfiles):
    return {
        "NumFiles": (nfiles, "number of files that rays are split into"),
        "PeanoCellHEALPixOrder": (cfg.bundleOrder,
                                  "HEALPix order of peano indexed cells"),
        "RayHEALPixOrder": (cfg.rayOrder, "HEALPix order of ray grid"),
    }


def _make_rec(cfg, nest, n, A00, A01, A10, A11, alpha0, alpha1, phi):
    """Build one file's structured row array.  `n` is [rows, 3] float64;
    ra/dec are derived here (f64 host conversion, matching write_rays)."""
    theta, phival = hp.vec2ang(n)
    ra, dec = hp.ang2radec(theta, phival)
    rec = np.zeros(len(nest), dtype=np.dtype(_ray_fields(cfg)))
    rec["nest"] = nest
    rec["ra"] = ra
    rec["dec"] = dec
    rec["A00"] = A00
    rec["A01"] = A01
    rec["A10"] = A10
    rec["A11"] = A11
    if cfg.OutputRayDeflections:
        rec["alpha0"] = alpha0
        rec["alpha1"] = alpha1
    if cfg.OutputPhi:
        rec["phi"] = phi
    return rec


def _ray_path(cfg, map_num, fileNum):
    return os.path.join(
        cfg.OutputPath, f"{cfg.RayOutputName}{map_num:04d}.{fileNum:04d}")


# ----------------------------------------------------------------------------
# binary (non-FITS) container — file_write_rays2bin (rayio.c:828-1046)
# ----------------------------------------------------------------------------
#
# Record stream, each block framed by int32 markers (the reference leaves the
# opening markers uninitialized and sets only the final one to
# NumRaysInFile*recsize; we write every marker as its block's byte count, the
# Fortran-unformatted convention its layout mimics — readers of either file
# skip 4 bytes regardless):
#   [i4] IOheader{NumFiles i8, PeanoCellHEALPixOrder i8, RayHEALPixOrder i8,
#                 flag_defl i8, flag_phi i8, pad to 256 B} [i4]
#   [i4] NumRaysInPeanoCell   i8[NbundleCells] [i4]
#   [i4] StartRaysInPeanoCell i8[NbundleCells] [i4]
#   [i4] packed ray records (same fields/order as the FITS bintable) [i4]

_BIN_HEADER_BYTES = 256


def _bin_header(cfg, nfiles):
    hdr = np.zeros(_BIN_HEADER_BYTES, np.uint8)
    hdr[:40] = np.frombuffer(
        np.array([nfiles, cfg.bundleOrder, cfg.rayOrder,
                  int(bool(cfg.OutputRayDeflections)),
                  int(bool(cfg.OutputPhi))], "<i8").tobytes(), np.uint8)
    return hdr.tobytes()


def _marker(nbytes):
    return np.array([nbytes], "<i4").tobytes()


def _write_bin_file(path, cfg, nfiles, fc, start, rec):
    with open(path, "wb") as fp:
        hdr = _bin_header(cfg, nfiles)
        fp.write(_marker(len(hdr)) + hdr + _marker(len(hdr)))
        for arr in (fc, start):
            b = np.asarray(arr, "<i8").tobytes()
            fp.write(_marker(len(b)) + b + _marker(len(b)))
        b = rec.tobytes()
        fp.write(_marker(len(b)) + b + _marker(len(b)))


def read_rays_bin(path):
    """Read one binary ray file -> (header dict, NumRaysInPeanoCell,
    StartRaysInPeanoCell, structured row array) — mirror of read_rays."""
    with open(path, "rb") as fp:
        raw = fp.read()
    off = 4
    nf, bo, ro, fd, fph = np.frombuffer(raw[off: off + 40], "<i8")
    hdr = {"NumFiles": int(nf), "PeanoCellHEALPixOrder": int(bo),
           "RayHEALPixOrder": int(ro), "flag_defl": int(fd),
           "flag_phi": int(fph)}
    off += _BIN_HEADER_BYTES + 8
    nbc = int(hp.order2npix(bo))
    counts = np.frombuffer(raw[off: off + 8 * nbc], "<i8")
    off += 8 * nbc + 8
    starts = np.frombuffer(raw[off: off + 8 * nbc], "<i8")
    off += 8 * nbc + 8
    fields = [("nest", "<i8"), ("ra", "<f8"), ("dec", "<f8"),
              ("A00", "<f8"), ("A01", "<f8"), ("A10", "<f8"), ("A11", "<f8")]
    if fd:
        fields += [("alpha0", "<f8"), ("alpha1", "<f8")]
    if fph:
        fields += [("phi", "<f8")]
    dt = np.dtype(fields)
    nrows = int(counts.sum())
    rec = np.frombuffer(raw[off: off + nrows * dt.itemsize], dt)
    return hdr, counts, starts, rec


def _emit_ray_file(cfg, path, nfiles, fc, start, rec):
    """Write one output file in cfg.RayOutputFormat ('fits' | 'bin')."""
    if cfg.RayOutputFormat.lower() in ("bin", "binary"):
        _write_bin_file(path, cfg, nfiles, fc, start, rec)
    else:
        prim = fits.image_hdu(np.concatenate([fc, start]),
                              header=_file_header(cfg, nfiles))
        fits.write_fits(path, [prim, fits.bintable_hdu(rec, name="Rays")])


# ----------------------------------------------------------------------------
# host-side writer (unpacked pytree)
# ----------------------------------------------------------------------------

def _to_obs_radec(cfg, rays, ray_nest):
    obs = jnp.asarray(hp.pix2vec_nest(ray_nest, cfg.rayOrder), rays.n.dtype)
    r = frames.paratrans_rays_curr2obs(rays, obs)
    return frames.rot_rays_ang2radec(r)


def write_rays(cfg, rays, ray_nest, map_num=0):
    """Write all rays to cfg.NumRayOutputFiles FITS files.  Returns paths."""
    from ..utils.tunnel import fetch

    out = _to_obs_radec(cfg, rays, ray_nest)
    n = fetch(out.n).astype(np.float64)
    A = fetch(out.A).astype(np.float64)
    alpha = fetch(out.alpha).astype(np.float64)
    phi = fetch(out.phi).astype(np.float64)
    nest = np.asarray(ray_nest, np.int64)

    k2 = 2 * (cfg.rayOrder - cfg.bundleOrder)
    nbc = int(hp.order2npix(cfg.bundleOrder))
    cell_peano = hp.nest2peano(nest >> k2, cfg.bundleOrder)

    # sort rows by (peano cell, nest within cell) — the reference's layout
    order = np.lexsort((nest, cell_peano))
    counts = np.bincount(cell_peano, minlength=nbc).astype(np.int64)

    nfiles = max(1, int(cfg.NumRayOutputFiles))
    cell_groups = _file_cell_groups(counts, nfiles)

    os.makedirs(cfg.OutputPath, exist_ok=True)
    paths = []
    row0 = 0
    for fileNum, cells in enumerate(cell_groups):
        fc, start = _layout_arrays(counts, cells, nbc)
        nrows = int(fc.sum())
        rows = order[row0: row0 + nrows]
        rec = _make_rec(cfg, nest[rows], n[rows],
                        A[rows, 0, 0], A[rows, 0, 1],
                        A[rows, 1, 0], A[rows, 1, 1],
                        alpha[rows, 0], alpha[rows, 1], phi[rows])
        path = _ray_path(cfg, map_num, fileNum)
        _emit_ray_file(cfg, path, nfiles, fc, start, rec)
        paths.append(path)
        row0 += nrows
    return paths


# ----------------------------------------------------------------------------
# shard-parallel writer (packed device buffer)
# ----------------------------------------------------------------------------

_gather_jit = None


def _gather_cols(cols, idx):
    global _gather_jit
    if _gather_jit is None:
        _gather_jit = jax.jit(lambda c, i: jnp.take(c, i, axis=1))
    return _gather_jit(cols, idx)


def _idx_dtype(n):
    # uint32 covers rayOrder <= 14 full sky; int64 needs jax x64
    return np.uint32 if n <= (1 << 32) else np.int64


def write_rays_sharded(cfg, rays_packed, ray_nest=None, map_num=0):
    """Write all rays from the packed (possibly mesh-sharded) device buffer
    without materializing the global [21, N] array on any host.

    ray_nest None means the full-sky grid in RING storage order (nest index
    derived per file); otherwise it is the host nest-index array in storage
    order (ra-dec restricted runs).  Output layout is identical to
    `write_rays`; values agree to f32 arithmetic (the transform runs on
    device instead of host).
    """
    N = int(rays_packed.shape[1])
    k2 = 2 * (cfg.rayOrder - cfg.bundleOrder)
    nbc = int(hp.order2npix(cfg.bundleOrder))
    nfiles = max(1, int(cfg.NumRayOutputFiles))

    # observer pixel (RING) per storage slot, for the on-device transform
    if ray_nest is None:
        ring_pix = jnp.arange(N, dtype=jnp.int32)
    else:
        npix = int(hp.order2npix(cfg.rayOrder))
        ring_pix = jnp.asarray(
            hp.nest2ring(np.asarray(ray_nest), cfg.rayOrder).astype(
                _idx_dtype(npix)))
    cols = jax.jit(soa.output_rows_obs_radec, static_argnums=2)(
        rays_packed, ring_pix, cfg.rayOrder)

    if ray_nest is None:
        # full grid: per-cell counts are uniform; the storage index of any
        # nest value is its RING pixel — computed per file only
        cellsz = 1 << k2
        counts = np.full(nbc, cellsz, dtype=np.int64)
        peano_of_nest = hp.nest2peano(np.arange(nbc, dtype=np.int64),
                                      cfg.bundleOrder)
        nest_of_peano = np.empty(nbc, np.int64)
        nest_of_peano[peano_of_nest] = np.arange(nbc, dtype=np.int64)

        def file_rows(cells):
            cnest = nest_of_peano[cells]
            nest = ((cnest[:, None] << k2)
                    + np.arange(cellsz, dtype=np.int64)[None, :]).ravel()
            return nest, hp.nest2ring(nest, cfg.rayOrder).astype(_idx_dtype(N))
    else:
        nest_all = np.asarray(ray_nest, np.int64)
        cell_peano = hp.nest2peano(nest_all >> k2, cfg.bundleOrder)
        order = np.lexsort((nest_all, cell_peano))
        counts = np.bincount(cell_peano, minlength=nbc).astype(np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)])

        def file_rows(cells):
            # `order` slices per peano cell are contiguous
            rows = np.concatenate(
                [order[offsets[c]: offsets[c + 1]] for c in cells]
            ) if len(cells) else np.empty(0, np.int64)
            return nest_all[rows], rows.astype(_idx_dtype(N))

    cell_groups = _file_cell_groups(counts, nfiles)
    os.makedirs(cfg.OutputPath, exist_ok=True)
    paths = []
    for fileNum, cells in enumerate(cell_groups):
        fc, start = _layout_arrays(counts, cells, nbc)
        nest_f, idx_f = file_rows(cells)
        # device-side cross-shard gather of just this file's rows (the
        # reference's sub-communicator send, rayio.c:280-334); only the
        # [10, rows] block reaches the host
        from ..utils.tunnel import fetch

        blk = fetch(_gather_cols(cols, jnp.asarray(idx_f))).astype(
            np.float64)
        rec = _make_rec(cfg, nest_f, blk[0:3].T, blk[3], blk[4], blk[5],
                        blk[6], blk[7], blk[8], blk[9])
        path = _ray_path(cfg, map_num, fileNum)
        _emit_ray_file(cfg, path, nfiles, fc, start, rec)
        paths.append(path)
    return paths


def read_rays(path):
    """Read one ray file -> (header, NumRaysInPeanoCell, StartRaysInPeanoCell,
    structured row array)."""
    hdus = fits.read_fits(path)
    hdr, layout = hdus[0]
    nbc = len(layout) // 2
    return hdr, layout[:nbc], layout[nbc:], hdus[1][1]

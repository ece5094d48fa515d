"""Lens maps: per-ray accumulation onto coarse HEALPix maps + FITS output
(reference maputils.c).

At each configured map redshift the driver accumulates per-pixel sums of
(count, A00, A01, A10, A11, ra, dec) over all rays (updateLensMap,
maputils.c:129-165; NGP on the NESTED map at map_order), reduces across
devices, and writes:
  Convergence_<nside>_<mapnum>.fits : SIGNAL = 1 - (A00+A11)/2 per-pixel mean
  Rays_<nside>_<mapnum>.fits        : 8-column table of per-pixel means
The closed-form flat-LCDM distance (Gauss 2F1 form, maputils.c:19-38) maps
the redshift list to lens-plane numbers.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import hyp2f1

from .healpix import core as hp
from .healpix import jaxhp
from .io import fits

DRIVER_MAP_ORDER = 11  # reference raytrace.c map_n_side = 2048
CMB_MAP_ORDER = 12     # propagate_to_cmb_from_restart.c order-12 maps
HUBBLE_DISTANCE = 2997.92458  # Mpc/h


def comoving_distance_2f1(z, omega_m):
    """Closed-form flat-LCDM comoving distance (maputils.c:19-38)."""
    z = np.asarray(z, dtype=np.float64)
    ol = 1.0 - omega_m
    inv_omlf = 1.0 / (ol + (1.0 + z) ** 3 * omega_m)
    near = ol * inv_omlf > 0.99
    full = HUBBLE_DISTANCE * (
        2.0 * hyp2f1(0.5, 1.0, 7.0 / 6.0, ol)
        - 2.0 * hyp2f1(0.5, 1.0, 7.0 / 6.0, ol * inv_omlf)
        * np.sqrt(inv_omlf) * (1.0 + z)
    )
    return np.where(near, HUBBLE_DISTANCE * z, full)


def map_plane_nums(redshifts, omega_m, max_comv_distance, num_lens_planes):
    """Redshift list -> lens-plane numbers (getMapLensPlaneNums)."""
    binL = max_comv_distance / num_lens_planes
    r = comoving_distance_2f1(np.asarray(redshifts, np.float64), omega_m)
    return np.round(r / binL).astype(np.int64)


def read_map_redshifts(path):
    """One redshift per line (readMapRedshifts)."""
    with open(path) as fp:
        return np.asarray([float(line) for line in fp if line.strip()])


class LensMapAccum(NamedTuple):
    """Per-pixel sums at map_order (NESTED)."""

    count: jnp.ndarray  # [npix] int32
    A00: jnp.ndarray
    A01: jnp.ndarray
    A10: jnp.ndarray
    A11: jnp.ndarray
    ra: jnp.ndarray
    dec: jnp.ndarray

    @classmethod
    def zeros(cls, map_order, dtype=jnp.float64):
        npix = int(hp.order2npix(map_order))
        z = jnp.zeros((npix,), dtype)
        return cls(jnp.zeros((npix,), jnp.int32), z, z, z, z, z, z)

    @classmethod
    def from_stacked(cls, stacked):
        """Device-accumulated [7, npix] rows (count, A00, A01, A10, A11,
        ra, dec) -> host LensMapAccum (the only host transfer of the
        device lens-map path — coarse-map sized, never ray-buffer sized)."""
        from .utils.tunnel import fetch

        h = fetch(stacked).astype(np.float64)
        return cls(np.rint(h[0]).astype(np.int32), h[1], h[2], h[3], h[4],
                   h[5], h[6])


def update_lens_map(accum: LensMapAccum, rays, ray_nest, ray_order: int,
                    map_order: int) -> LensMapAccum:
    """Scatter-add every ray into its coarse NESTED map pixel
    (updateLensMap, maputils.c:129-165).  ray_nest may be a device array."""
    lpix = jnp.asarray(ray_nest) >> jnp.int64(2 * (ray_order - map_order))
    lpix = lpix.astype(jnp.int32)
    nhat = rays.n / jnp.linalg.norm(rays.n, axis=-1, keepdims=True)
    theta = jnp.arccos(jnp.clip(nhat[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(nhat[..., 1], nhat[..., 0])
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    ra = jnp.degrees(phi)
    dec = 90.0 - jnp.degrees(theta)
    one = jnp.ones(lpix.shape, jnp.int32)
    return LensMapAccum(
        count=accum.count.at[lpix].add(one),
        A00=accum.A00.at[lpix].add(rays.A[..., 0, 0]),
        A01=accum.A01.at[lpix].add(rays.A[..., 0, 1]),
        A10=accum.A10.at[lpix].add(rays.A[..., 1, 0]),
        A11=accum.A11.at[lpix].add(rays.A[..., 1, 1]),
        ra=accum.ra.at[lpix].add(ra.astype(accum.ra.dtype)),
        dec=accum.dec.at[lpix].add(dec.astype(accum.dec.dtype)),
    )


# ----------------------------------------------------------------------------
# device-resident accumulation (no full ray-buffer host gather)
#
# The reference never centralizes rays for lens maps: each task NGP-
# accumulates its own rays and MPI_Reduce combines the coarse maps
# (maputils.c:129-192).  The host-gather path above (update_lens_map on the
# .rays property) is 21*N*4 B of host traffic — >= 270 GB at production
# rayOrder 14-16.  These functions accumulate on device from the packed
# f32[21, N] buffer; only the [7, npix_map] result ever reaches the host.
# ----------------------------------------------------------------------------

def lens_vals_packed(packed):
    """Packed rays [21, N] -> the seven accumulation rows [7, N]
    (count, A00, A01, A10, A11, ra, dec) — updateLensMap's per-ray terms
    (maputils.c:129-165), componentwise."""
    nx, ny, nz = packed[0], packed[1], packed[2]
    inv = 1.0 / jnp.sqrt(nx * nx + ny * ny + nz * nz)
    hz = jnp.clip(nz * inv, -1.0, 1.0)
    theta = jnp.arccos(hz)
    phi = jnp.arctan2(ny, nx)
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    ra = jnp.degrees(phi)
    dec = 90.0 - jnp.degrees(theta)
    one = jnp.ones_like(nx)
    return jnp.stack([one, packed[6], packed[7], packed[8], packed[9],
                      ra, dec])


@partial(jax.jit, static_argnums=(1, 2, 3))
def accum_lens_map_fullsky(packed, ray_order: int, map_order: int,
                           npix_map: int):
    """Full-sky single-device accumulation WITHOUT any scatter: ray i sits
    at RING pixel i (driver init), and in NEST order every map_order parent
    owns exactly 4^k consecutive children — so a single row-gather into NEST
    order followed by a reshape-sum replaces the ~25 M elem/s TPU
    scatter-add (docs/TPU_NOTES.md) with a gather + reduction."""
    N = packed.shape[1]
    k = ray_order - map_order
    perm = jaxhp.nest2ring_dev(jnp.arange(N, dtype=jnp.int32), ray_order)
    vals = lens_vals_packed(packed)[:, perm]
    return jnp.sum(vals.reshape(7, npix_map, 1 << (2 * k)), axis=-1)


def update_lens_map_stacked(accum7, packed, lpix):
    """Scatter-add packed rays into the stacked [7, npix_map] accumulator at
    coarse NEST pixels lpix [N] (general path: cut-sky ray sets)."""
    return accum7.at[:, lpix].add(lens_vals_packed(packed).astype(
        accum7.dtype))


def accum_lens_map_sharded(packed, ray_order: int, map_order: int, mesh):
    """Mesh path: each shard scatter-adds its ray block locally, then one
    reduce-scatter combines the coarse maps — the TPU analog of the
    reference's per-task updateLensMap + MPI_Reduce (maputils.c:168-192).
    packed is P(None, AXIS)-sharded; returns [7, npix_map] block-sharded on
    the last axis.  No participant ever holds the global ray buffer."""
    from jax.sharding import PartitionSpec as P
    from .parallel.sharding import AXIS

    npix_map = int(hp.order2npix(map_order))
    n = mesh.devices.size
    N = packed.shape[1]
    assert N % n == 0 and npix_map % n == 0

    def body(pk):
        i0 = jax.lax.axis_index(AXIS).astype(jnp.int32) * (N // n)
        rpix = i0 + jnp.arange(N // n, dtype=jnp.int32)
        lpix = jaxhp.coarse_nest_from_ring(rpix, ray_order, map_order)
        loc = jnp.zeros((7, npix_map), packed.dtype)
        loc = loc.at[:, lpix].add(lens_vals_packed(pk))
        return jax.lax.psum_scatter(loc, AXIS, scatter_dimension=1,
                                    tiled=True)

    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P(None, AXIS),
                               out_specs=P(None, AXIS)),
                 static_argnums=())
    return fn(packed)


def accum_lens_map_packed(packed, ray_nest, ray_order: int, map_order: int,
                          mesh=None):
    """Dispatch: device lens-map accumulation from the packed ray buffer.

    ray_nest None means the full-sky RING-ordered grid (driver init_rays);
    otherwise it is the host nest-index array of a cut-sky ray set (small).
    Returns stacked [7, npix_map]; wrap with LensMapAccum.from_stacked for
    the FITS writers."""
    npix_map = int(hp.order2npix(map_order))
    if ray_nest is None and mesh is not None:
        return accum_lens_map_sharded(packed, ray_order, map_order, mesh)
    if ray_nest is None:
        return accum_lens_map_fullsky(packed, ray_order, map_order, npix_map)
    lpix = (np.asarray(ray_nest, np.int64)
            >> (2 * (ray_order - map_order))).astype(np.int32)
    accum7 = jnp.zeros((7, npix_map), packed.dtype)
    return jax.jit(update_lens_map_stacked)(accum7, packed,
                                            jnp.asarray(lpix))


def _healpix_header(nside):
    return {
        "PIXTYPE": ("HEALPIX", "HEALPIX Pixelisation"),
        "ORDERING": ("NESTED", "Pixel ordering scheme, either RING or NESTED"),
        "NSIDE": (nside, "Resolution parameter for HEALPIX"),
        "FIRSTPIX": 0,
        "LASTPIX": 12 * nside * nside,
        "COORDSYS": ("C", "Pixelisation coordinate system"),
    }


def write_lens_map_fits(accum: LensMapAccum, nside, filename):
    """8-column per-pixel-mean table (writeFITSHEALPixLensMap)."""
    cnt = np.asarray(accum.count, np.int64)
    good = cnt > 0
    safe = np.where(good, cnt, 1).astype(np.float64)

    def avg(x):
        return np.where(good, np.asarray(x, np.float64) / safe, 0.0)

    npix = len(cnt)
    rec = np.zeros(npix, dtype=np.dtype([
        ("NEST_IDX", "<i4"), ("N_RAYS", "<i4"),
        ("A00", "<f8"), ("A01", "<f8"), ("A10", "<f8"), ("A11", "<f8"),
        ("ra", "<f8"), ("dec", "<f8"),
    ]))
    rec["NEST_IDX"] = np.arange(npix)
    rec["N_RAYS"] = cnt
    for k in ("A00", "A01", "A10", "A11", "ra", "dec"):
        rec[k] = avg(getattr(accum, k))
    fits.write_fits(filename, [
        fits.image_hdu(np.zeros(0, np.int16)),
        fits.bintable_hdu(rec, name="CMB_lensing_map",
                          header=_healpix_header(nside)),
    ])


def write_single_map_fits(signal, nside, filename, ordering="NESTED"):
    """HEALPix-convention single-column SIGNAL map
    (writeSingleFITSHEALPixLensMap)."""
    rec = np.zeros(12 * nside * nside, dtype=np.dtype([("SIGNAL", "<f4")]))
    rec["SIGNAL"] = np.asarray(signal, np.float32)
    hdr = _healpix_header(nside)
    hdr["ORDERING"] = (ordering, "Pixel ordering scheme, either RING or NESTED")
    fits.write_fits(filename, [
        fits.image_hdu(np.zeros(0, np.int16)),
        fits.bintable_hdu(rec, name="BINTABLE", header=hdr),
    ])


def write_debug_field_maps(field_maps, order, output_path, plane_num):
    """DEBUG_IO analog (shtpoissonsolve.c:584-604): dump the potential and
    its five covariant derivative maps per plane as RING-ordered FITS."""
    import os

    os.makedirs(output_path, exist_ok=True)
    names = ("pot", "dtheta", "dphi", "dthetatheta", "dthetaphi", "dphiphi")
    paths = []
    for name, m in zip(names, field_maps):
        p = os.path.join(output_path, f"debug_{name}_{plane_num:04d}.fits")
        write_single_map_fits(np.asarray(m), 1 << order, p, ordering="RING")
        paths.append(p)
    return paths


def convergence_from_accum(accum: LensMapAccum):
    """kappa = 1 - (A00 + A11)/2 per-pixel mean (raytrace.c:299-301)."""
    cnt = np.asarray(accum.count, np.float64)
    good = cnt > 0
    safe = np.where(good, cnt, 1.0)
    a00 = np.asarray(accum.A00, np.float64)
    a11 = np.asarray(accum.A11, np.float64)
    return np.where(good, 1.0 - 0.5 * (a00 + a11) / safe, 0.0).astype(np.float32)


def write_map_outputs(accum: LensMapAccum, map_order, output_path, map_num):
    """Write both Convergence_ and Rays_ files (raytrace.c:271-333)."""
    import os

    os.makedirs(output_path, exist_ok=True)
    nside = 1 << map_order
    conv = convergence_from_accum(accum)
    cpath = os.path.join(output_path, f"Convergence_{nside}_{map_num}.fits")
    write_single_map_fits(conv, nside, cpath)
    rpath = os.path.join(output_path, f"Rays_{nside}_{map_num}.fits")
    write_lens_map_fits(accum, nside, rpath)
    return cpath, rpath

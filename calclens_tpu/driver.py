"""Multiple-plane ray-trace driver (reference raytrace.c).

The outer loop over lens planes runs on the host (each plane loads particles
from disk); everything inside a plane — deposit, SHT Poisson solve,
interpolation, propagation — is jitted device code.
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .config import RayTraceConfig
from .cosmology import Cosmology, RHO_CRIT, CSOL
from .healpix import core as hp
from .healpix import jaxhp
from .io import lensplanes
from .poisson import sht_poisson_solve
from .rays import propagate as rp
from .sht.plan import SHTPlan

MIN_SMOOTH_TO_RAY_RATIO = 0.5  # reference raytrace.h:123


def gauss_beam(fwhm_rad: float, lmax: int):
    """Gaussian beam window b_l = exp(-l(l+1) sigma^2 / 2)."""
    sigma = fwhm_rad / np.sqrt(8.0 * np.log(2.0))
    ls = np.arange(lmax + 1, dtype=np.float64)
    return np.exp(-0.5 * ls * (ls + 1.0) * sigma * sigma)


@dataclass
class PlaneParams:
    """Per-plane radii and unit factors (reference set_plane_params,
    raytrace.c:384-500)."""

    plane_num: int
    rad_minus1: float
    rad: float
    rad_plus1: float
    densfact: float
    backdens: float
    zlens: float


def plane_params(cfg: RayTraceConfig, cosmo: Cosmology, plane_num: int) -> PlaneParams:
    binL = cfg.maxComvDistance / cfg.NumLensPlanes
    rad_minus1 = 0.0 if plane_num < 1 else (plane_num - 1.0) * binL + binL / 2.0
    rad = plane_num * binL + binL / 2.0
    rad_plus1 = (
        cfg.maxComvDistance
        if plane_num + 1 == cfg.NumLensPlanes
        else (plane_num + 1.0) * binL + binL / 2.0
    )
    if cfg.PointMassTest and not cfg.NFWHaloTest:
        radialvolume = rad * rad * binL  # 2nd-order estimate, exact for a point
    else:
        radialvolume = ((rad + binL / 2.0) ** 3 - (rad - binL / 2.0) ** 3) / 3.0
    zw = 1.0 / cosmo.acomvdist(rad) - 1.0
    densfact = (
        3.0 * 100.0 * 100.0 / CSOL / CSOL * cfg.OmegaM * rad * (1.0 + zw) * binL
        / (radialvolume * RHO_CRIT * cfg.OmegaM)
    )
    backdens = (
        0.0
        if cfg.NoBackDens
        else 3.0 * 100.0 * 100.0 / CSOL / CSOL * cfg.OmegaM * rad * (1.0 + zw) * binL
    )
    return PlaneParams(plane_num, rad_minus1, rad, float(rad_plus1), densfact, backdens, zw)


class Raytracer:
    """End-to-end multiple-plane ray tracer.

    Rays live on the full HEALPix grid at rayOrder (restricted to the ra/dec
    box when one is configured), as a struct-of-arrays pytree sharded over
    pixels in the multi-chip path.
    """

    def __init__(self, cfg: RayTraceConfig, dtype=None):
        self.cfg = cfg
        self.dtype = dtype or (jnp.float64 if cfg.Precision == "f64" else jnp.float32)
        self.cosmo = Cosmology(cfg.OmegaM)
        window = None
        if cfg.SmoothingBeamFWHM > 0.0:
            lmax = 3 * (1 << cfg.poissonOrder) - 1
            window = gauss_beam(cfg.SmoothingBeamFWHM, lmax)
        self.plan = SHTPlan(cfg.poissonOrder, dtype=self.dtype, window=window)
        self.tab = jaxhp.InterpTables(cfg.poissonOrder, dtype=self.dtype)
        self.rays = None
        self.ray_nest = None  # host int64 nest index per ray
        self.current_plane = 0
        self.timings = []

    # ------------------------------------------------------------------
    def active_ray_pixels(self):
        """nest pixel indices at rayOrder inside the configured sky box
        (reference init_bundlecells + init_rays)."""
        cfg = self.cfg
        npix = int(hp.order2npix(cfg.rayOrder))
        full_sky = (
            cfg.minRa <= 0.0 and cfg.maxRa >= 360.0
            and cfg.minDec <= -90.0 and cfg.maxDec >= 90.0
        )
        nest = np.arange(npix, dtype=np.int64)
        if full_sky:
            return nest
        theta, phi = hp.pix2ang_nest(nest, cfg.rayOrder)
        ra, dec = hp.ang2radec(theta, phi)
        keep = (ra >= cfg.minRa) & (ra <= cfg.maxRa) & (dec >= cfg.minDec) & (dec <= cfg.maxDec)
        return nest[keep]

    def init_rays(self):
        cfg = self.cfg
        self.ray_nest = self.active_ray_pixels()
        vec = hp.pix2vec_nest(self.ray_nest, cfg.rayOrder)
        binL = cfg.maxComvDistance / cfg.NumLensPlanes
        self.rays = rp.init_rays(vec, binL / 2.0, dtype=self.dtype)
        self.current_plane = 0

    # ------------------------------------------------------------------
    def load_particles(self, plane_num: int):
        fn = lensplanes.plane_filename(self.cfg.LensPlanePath, self.cfg.LensPlaneName, plane_num)
        return lensplanes.read_plane(fn)

    def step(self, plane_num: int, pos=None, mass=None):
        """One plane: Poisson solve at planeRad then propagate to planeRadPlus1."""
        t0 = time.perf_counter()
        pp = plane_params(self.cfg, self.cosmo, plane_num)
        if pos is None:
            pos, mass = self.load_particles(plane_num)
        rays = rp.zero_plane_fields(self.rays)
        maps = None
        if len(pos):
            rays, maps = sht_poisson_solve(
                self.plan, self.tab, rays,
                jnp.asarray(pos, self.dtype), jnp.asarray(mass, self.dtype),
                pp.densfact, pp.backdens, scheme=self.cfg.DepositScheme,
            )
        rays = rp.rayprop_sphere(rays, pp.rad_plus1, pp.rad, pp.rad_minus1,
                                 born=self.cfg.BornApprx)
        self.rays = jax.block_until_ready(rays)
        self.current_plane = plane_num + 1
        self.timings.append((plane_num, time.perf_counter() - t0))
        return maps

    def run(self, progress=True):
        if self.rays is None:
            self.init_rays()
        for p in range(self.current_plane, self.cfg.NumLensPlanes):
            self.step(p)
            if progress:
                pp = plane_params(self.cfg, self.cosmo, p)
                print(
                    f"plane {p:4d}/{self.cfg.NumLensPlanes} "
                    f"[dist={pp.rad:.2f} Mpc/h, z={pp.zlens:.2f}] "
                    f"{self.timings[-1][1]:.3f}s",
                    file=sys.stderr,
                )
        return self.rays

"""Point-mass analytic end-to-end test harness.

TPU-framework analog of the reference's POINTMASSTEST pipeline
(lensplanes/make_lensplanes_pointmass_test.c): writes a lens-plane set
containing a single particle of mass M at (ra, dec, chi), plus the analytic
lensing quantities to compare the trace against.

Analytic solution, in the framework's conventions (h=1 units; the deposited
"charge" is q = M * densfact with densfact = 8 pi G (1+z_L) / (c^2 chi_L),
raytrace.c:417-423):

  potential      phi(gamma)  = (q/2pi) ln sin(gamma/2) + const   [a well]
  deflection     alpha(gamma) = (q/4pi) cot(gamma/2)   [toward the mass]
                 ~ 4 G M (1+z_L) / (c^2 chi_L gamma)  for small gamma
  shear (source at w_s, single plane at w_L, small gamma):
                 gamma_t = (w_s - w_L)/w_s * alpha(gamma)/gamma, kappa = 0.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.special import eval_legendre

from ..config import RayTraceConfig
from ..cosmology import Cosmology, RHO_CRIT, CSOL
from ..healpix import core as hp
from ..io import lensplanes

G_OVER_C2 = 3.0 * (100.0 / CSOL) ** 2 / (8.0 * np.pi * RHO_CRIT)  # Mpc/Msun (h=1)


def make_pointmass_planes(cfg: RayTraceConfig, snap_to_pixel_order=None):
    """Write cfg.NumLensPlanes plane files with one particle of cfg.partMass
    at (raPointMass, decPointMass, radPointMass).  Returns the particle's
    unit vector (optionally snapped to its deposit-pixel center so analytic
    comparisons are free of NGP quantization)."""
    os.makedirs(cfg.LensPlanePath, exist_ok=True)
    theta, phi = hp.radec2ang(cfg.raPointMass, cfg.decPointMass)
    vec = hp.ang2vec(theta, phi)
    if snap_to_pixel_order is not None:
        pix = hp.ang2pix_ring(theta, phi, snap_to_pixel_order)
        vec = hp.pix2vec_ring(pix, snap_to_pixel_order)
    pos = vec * cfg.radPointMass

    binL = cfg.maxComvDistance / cfg.NumLensPlanes
    mass_plane = min(int(cfg.radPointMass / binL), cfg.NumLensPlanes - 1)
    for p in range(cfg.NumLensPlanes):
        fn = lensplanes.plane_filename(cfg.LensPlanePath, cfg.LensPlaneName, p)
        if p == mass_plane:
            lensplanes.write_plane(fn, cfg.SHTOrder, pos[None, :], [cfg.partMass])
        else:
            lensplanes.write_plane(fn, cfg.SHTOrder, np.zeros((0, 3)), [])
    return vec, mass_plane


def charge(cfg: RayTraceConfig, cosmo: Cosmology, chi_lens: float) -> float:
    """q = M * densfact for the point-mass radial-volume convention."""
    z = 1.0 / cosmo.acomvdist(chi_lens) - 1.0
    return float(cfg.partMass * 8.0 * np.pi * G_OVER_C2 * (1.0 + z) / chi_lens)


def alpha_exact(gamma, q):
    """Exact on-sphere bend angle (toward the mass)."""
    return q / (4.0 * np.pi) / np.tan(gamma / 2.0)


def alpha_smallangle(gamma, q):
    return q / (2.0 * np.pi * gamma)


def alpha_bandlimited(gamma, q, lmax, bl=None):
    """Deflection of the lmax-truncated harmonic representation:
    alpha = q * sum_{l=1}^{lmax} b_l (2l+1)/(4 pi l(l+1)) * (-dP_l(cos g)/dg),
    with an optional window b_l matching the solver's smoothing beam."""
    gamma = np.atleast_1d(gamma)
    x = np.cos(gamma)
    total = np.zeros_like(gamma)
    if bl is None:
        bl = np.ones(lmax + 1)
    for l in range(1, lmax + 1):
        # dP_l/dgamma = -sin(g) P_l'(x);  P_l'(x) = l (x P_l - P_{l-1})/(x^2-1)
        pl = eval_legendre(l, x)
        plm1 = eval_legendre(l - 1, x)
        dpdx = l * (x * pl - plm1) / (x * x - 1.0)
        total += bl[l] * (2 * l + 1.0) / (4.0 * np.pi * l * (l + 1.0)) * (np.sin(gamma) * dpdx)
    return q * total


def shear_tangential(gamma, q, w_lens, w_source):
    """|shear| of the final inverse-magnification matrix for a source at
    w_source (small-angle, single plane)."""
    f = (w_source - w_lens) / w_source
    return f * alpha_smallangle(gamma, q) / gamma

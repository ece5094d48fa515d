"""3D FFT potential path (THREEDPOT; reference fftpoissondriver.c).

Point particle in a periodic box: the FFT potential must reproduce -G M / r
at box-interior distances, and the ray path integral must reproduce the
thin-lens deflection alpha = 4 G M / (c^2 b) (truncated to the shell path).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from calclens_tpu import fftpot
from calclens_tpu.config import RayTraceConfig
from calclens_tpu.cosmology import Cosmology, RHO_CRIT, CSOL
from calclens_tpu.driver import Raytracer
from calclens_tpu.io import lgadget
from calclens_tpu.rays.propagate import init_rays

G = fftpot.FOUR_PI_G / (4.0 * np.pi)  # Mpc (km/s)^2 / Msun


def test_potential_gaussian_blob():
    """A resolved Gaussian blob's exterior potential must follow -GM/r.

    (A bare delta is not a valid pointwise probe: the kernel deconvolves the
    CIC window twice — the second power is cancelled by the trilinear ray
    sampling, so pointwise grid values of an unresolved source ring at the
    Nyquist.  The delta case is covered end-to-end by the deflection test.)
    """
    L, nfft = 200.0, 64
    dL = L / nfft
    rng = np.random.default_rng(0)
    n = 200000
    c = L / 2.0
    pos = np.mod(c + rng.normal(scale=2.5 * dL, size=(n, 3)), L)
    grid = np.asarray(fftpot.compute_potential_grid(pos, L, nfft, 1.0, 0.3, n))
    M = RHO_CRIT * 0.3 * L ** 3  # n particles of mass M/n
    i0 = int(c / dL)  # blob center cell
    dis = (6, 8, 10, 13)
    got = np.array([grid[(i0 + di) % nfft, i0, i0] for di in dis])
    r = np.array([(di + 0.5 - (c / dL - i0)) for di in dis]) * dL
    want = -G * M / r
    dgot = got[:-1] - got[-1]
    dwant = want[:-1] - want[-1]
    rel = np.abs(dgot - dwant) / np.abs(dwant)
    assert np.max(rel) < 0.1, (dgot, dwant, rel)


def test_ray_deflection_toward_point_mass():
    L, nfft = 200.0, 64
    chi_l = 500.0
    binL = 250.0
    mp = RHO_CRIT * 0.3 * L ** 3  # single particle, n_total=1
    pos = np.array([[100.0, 100.0, 100.0]])
    grid = fftpot.compute_potential_grid(pos, L, nfft, 1.0, 0.3, 1)

    # the periodic grid tiles space; place rays so their chords pass at
    # impact parameter b from the (wrapped) particle position at chi_l
    # direction of the particle image at radius chi_l: the particle is at
    # (100,100,100) + 200k; pick k so |p| ~ chi_l: k=(2,1,1): (500,300,300)
    pvec = np.array([500.0, 300.0, 300.0])
    prad = np.linalg.norm(pvec)
    phat = pvec / prad
    # perpendicular direction
    e1 = np.cross(phat, [0, 0, 1.0])
    e1 /= np.linalg.norm(e1)
    bs = np.array([10.0, 15.0, 20.0, 30.0])
    nhat = phat[None, :] + (bs / prad)[:, None] * e1[None, :]
    nhat /= np.linalg.norm(nhat, axis=1, keepdims=True)

    rays = init_rays(jnp.asarray(nhat, jnp.float64), prad, dtype=jnp.float64)
    nint = int(binL / (L / nfft) * 2)
    out = fftpot.threedpot_apply_to_rays(
        rays, jnp.asarray(grid, jnp.float64), nfft, nint,
        jnp.float64(L), jnp.float64(prad), jnp.float64(binL))
    alpha = np.asarray(out.alpha)
    amag = np.hypot(alpha[:, 0], alpha[:, 1])

    # truncated thin-lens: alpha = 4GM/(c^2 b) * x/sqrt(1+x^2), x = binL/(2b)
    x = binL / 2.0 / bs
    want = 4.0 * G * mp / CSOL ** 2 / bs * (x / np.sqrt(1.0 + x * x))
    rel = np.abs(amag - want) / want
    assert np.median(rel) < 0.2, (amag, want)

    # direction: toward the mass
    gvec = phat - nhat * (nhat @ phat)[:, None]
    gvec /= np.linalg.norm(gvec, axis=1, keepdims=True)
    phihat = np.stack([-nhat[:, 1], nhat[:, 0], np.zeros(len(nhat))], 1)
    phihat /= np.linalg.norm(phihat, axis=1, keepdims=True)
    thetahat = np.cross(phihat, nhat)
    avec = alpha[:, :1] * thetahat + alpha[:, 1:2] * phihat
    cosang = np.sum(avec * gvec, 1) / np.linalg.norm(avec, axis=1)
    assert np.all(cosang > 0.97)

    # convergence trace relation: for a point lens kappa ~ 0 off-center
    U = np.asarray(out.U)
    assert np.all(np.isfinite(U))


def test_threedpot_driver_end_to_end(tmp_path):
    # snapshot with one particle; trace a small full-sky ray grid
    L = 200.0
    snap = tmp_path / "snap_000"
    lgadget.write_snapshot(str(snap), np.array([[100.0, 100.0, 100.0]]),
                           mass1_1e10=RHO_CRIT * 0.3 * L ** 3 / 1e10,
                           time=1.0, boxsize=L)
    lst = tmp_path / "snaps.txt"
    lst.write_text(f"{snap}\n")
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
        rayOrder=4, bundleOrder=2, SHTOrder=4,
        ThreeDPot=True, ThreeDPotSnapList=str(lst), NFFT=32,
        Precision="f64",
    ).finalize()
    rt = Raytracer(cfg)
    rt.init_rays()
    for p in range(cfg.NumLensPlanes):
        rt.step(p)
    r = np.linalg.norm(np.asarray(rt.rays.n), axis=1)
    np.testing.assert_allclose(r, 1000.0, rtol=1e-9)
    assert np.all(np.isfinite(np.asarray(rt.rays.A)))
    # deflections happened (nonzero shear somewhere)
    kap = 1 - 0.5 * (np.asarray(rt.rays.A)[:, 0, 0] + np.asarray(rt.rays.A)[:, 1, 1])
    assert np.max(np.abs(kap)) > 0

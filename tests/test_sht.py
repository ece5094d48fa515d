"""SHT engine tests: recurrence vs scipy, synthesis vs brute force, adjoint
analysis, derivative maps vs numerical d/dtheta of Y_lm, f32 stability."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.special import sph_harm_y

from calclens_tpu.healpix import core as hp
from calclens_tpu.sht.plan import SHTPlan
from calclens_tpu.sht import transforms as T


@pytest.fixture(scope="module")
def plan4():
    return SHTPlan(4, dtype=jnp.float64, ring_block=64)


def random_alm(plan, seed=2):
    rng = np.random.default_rng(seed)
    alm = np.zeros((plan.nl, plan.nm), dtype=complex)
    for l in range(plan.nl):
        for m in range(l + 1):
            alm[l, m] = rng.normal() + (1j * rng.normal() if m > 0 else 0.0)
    return alm


def lam_ref(l, m, theta):
    """CS-free normalized associated Legendre at phi=0."""
    return np.real(sph_harm_y(l, m, theta, 0.0)) * (-1) ** m


def test_lambda_recurrence_all_lm(plan4):
    plan = plan4
    state = T._init_state(plan)
    theta = np.array(plan.theta_host[: plan.J])
    worst = 0.0
    for l in range(plan.nl):
        state, lam, lam_prev = T._lam_step(plan, state, l)
        lam = np.array(lam)
        for m in range(l + 1):
            worst = max(worst, np.abs(lam[m] - lam_ref(l, m, theta)).max())
    assert worst < 1e-12


def test_alm2map_vs_bruteforce(plan4):
    plan = plan4
    alm = random_alm(plan)
    theta, phi = hp.pix2ang_ring(np.arange(plan.npix), plan.order)
    mref = np.zeros(plan.npix)
    for l in range(plan.nl):
        for m in range(l + 1):
            Y = sph_harm_y(l, m, theta, phi) * (-1) ** m
            mref += (2.0 if m > 0 else 1.0) * np.real(alm[l, m] * Y)
    mj = np.array(T.alm2map(plan, jnp.asarray(alm)))
    assert np.abs(mj - mref).max() < 1e-10 * np.abs(mref).max()


def test_map2alm_vs_bruteforce(plan4):
    """map2alm must equal the weighted direct sum  sum_p w_p map_p lam e^{-im phi}."""
    plan = plan4
    rng = np.random.default_rng(7)
    m_ = rng.normal(size=plan.npix)
    theta, phi = hp.pix2ang_ring(np.arange(plan.npix), plan.order)
    w = 4.0 * np.pi / plan.npix
    alm = np.array(T.map2alm(plan, jnp.asarray(m_)))
    for l in [0, 1, 3, 10, plan.nl - 1]:
        for mm in set([0, 1, l // 2, l]):
            if mm > l:
                continue
            ref = np.sum(w * m_ * lam_ref(l, mm, theta) * np.exp(-1j * mm * phi))
            assert abs(alm[l, mm] - ref) < 1e-11 * max(1.0, abs(ref)), (l, mm)


def test_roundtrip_quadrature_low_l(plan4):
    """synthesis -> analysis recovers low-l alm to HEALPix quadrature accuracy."""
    plan = plan4
    alm = random_alm(plan)
    alm[12:, :] = 0.0  # bandlimit to l < 3/4 nside for good quadrature
    mj = T.alm2map(plan, jnp.asarray(alm))
    alm2 = np.array(T.map2alm(plan, mj))
    err = np.abs(alm2[:12] - alm[:12]).max() / np.abs(alm[:12]).max()
    assert err < 0.02, err


def test_alm2allmaps_derivatives(plan4):
    """Check all six outputs against numerical theta-derivatives of Y_lm."""
    plan = plan4
    # single mode l=5, m=3 with complex coefficient
    l0, m0 = 5, 3
    alm = np.zeros((plan.nl, plan.nm), dtype=complex)
    alm[l0, m0] = 1.3 - 0.7j
    pot, gt, gp, gtt, gtp, gpp = [np.array(x) for x in T.alm2allmaps(plan, jnp.asarray(alm))]

    theta, phi = hp.pix2ang_ring(np.arange(plan.npix), plan.order)
    h = 1e-6

    def f(th, ph):
        Y = sph_harm_y(l0, m0, th, ph) * (-1) ** m0
        return 2.0 * np.real(alm[l0, m0] * Y)

    pot_ref = f(theta, phi)
    gt_ref = (f(theta + h, phi) - f(theta - h, phi)) / (2 * h)
    gp_ref = (f(theta, phi + h) - f(theta, phi - h)) / (2 * h) / np.sin(theta)
    gtt_ref = (f(theta + h, phi) - 2 * pot_ref + f(theta - h, phi)) / h**2
    # covariant U_thetaphi = (d_t d_p f - cot * d_p f)/sin
    dtdp = (
        f(theta + h, phi + h) - f(theta + h, phi - h)
        - f(theta - h, phi + h) + f(theta - h, phi - h)
    ) / (4 * h * h)
    gtp_ref = (dtdp - (np.cos(theta) / np.sin(theta)) * gp_ref * np.sin(theta)) / np.sin(theta)
    dpp = (f(theta, phi + h) - 2 * pot_ref + f(theta, phi - h)) / h**2
    gpp_ref = dpp / np.sin(theta) ** 2 + (np.cos(theta) / np.sin(theta)) * gt_ref

    scale = np.abs(gtt_ref).max()
    assert np.abs(pot - pot_ref).max() < 1e-8
    assert np.abs(gt - gt_ref).max() < 1e-5
    assert np.abs(gp - gp_ref).max() < 1e-5
    assert np.abs(gtt - gtt_ref).max() < 1e-3 * scale
    assert np.abs(gtp - gtp_ref).max() < 1e-3 * scale
    assert np.abs(gpp - gpp_ref).max() < 1e-3 * scale


def test_f32_matches_f64():
    """f32 plan (TPU mode) agrees with f64 to single precision, incl. the
    scaled-recurrence underflow region near the poles."""
    order = 6
    p64 = SHTPlan(order, dtype=jnp.float64, ring_block=256)
    p32 = SHTPlan(order, dtype=jnp.float32, ring_block=256)
    alm = random_alm(p64, seed=5)
    m64 = np.array(T.alm2map(p64, jnp.asarray(alm)))
    m32 = np.array(T.alm2map(p32, jnp.asarray(alm, dtype=np.complex64)))
    scale = np.abs(m64).max()
    assert np.abs(m32 - m64).max() < 3e-4 * scale
    a64 = np.array(T.map2alm(p64, jnp.asarray(m64)))
    a32 = np.array(T.map2alm(p32, jnp.asarray(m64, dtype=np.float32)))
    assert np.abs(a32 - a64).max() < 3e-4 * np.abs(a64).max()
    assert np.isfinite(m32).all() and np.isfinite(a32).all()


def test_poisson_laplacian_consistency(plan4):
    """alm2allmaps Hessian trace must equal -density after the 1/l(l+1)
    Poisson multiply: U_tt + U_pp = laplacian(phi) = -sigma (bandlimited)."""
    plan = plan4
    alm = random_alm(plan, seed=11)
    alm[0, 0] = 0.0
    alm[12:, :] = 0.0
    ls = np.arange(plan.nl)[:, None].astype(float)
    alm_phi = np.where(ls > 0, -alm / np.maximum(ls * (ls + 1.0), 1.0), 0.0)
    sigma = np.array(T.alm2map(plan, jnp.asarray(alm)))
    _, gt, gp, gtt, gtp, gpp = T.alm2allmaps(plan, jnp.asarray(alm_phi))
    # with phi_lm = -sigma_lm/(l(l+1)) and laplacian(Y) = -l(l+1) Y the solved
    # equation is laplacian(phi) = +sigma (potential well at overdensities;
    # alpha = -grad phi points toward mass, shtpoissonsolve.c:693-694)
    lap = np.array(gtt) + np.array(gpp)
    assert np.abs(lap - sigma).max() < 1e-8 * np.abs(sigma).max()

"""HEALPix index machinery vs golden vectors dumped from the reference's
compiled healpix_utils.c (tools/gen_healpix_fixtures.c)."""
import os
import struct

import numpy as np
import pytest

from calclens_tpu.healpix import core as hp

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


class Golden:
    def __init__(self, path):
        with open(path, "rb") as f:
            buf = f.read()
        off = 0

        def take(dtype, n):
            nonlocal off
            a = np.frombuffer(buf, dtype=dtype, count=n, offset=off)
            off += a.nbytes
            return a

        self.order, self.N = take(np.int64, 2)
        N = self.N
        self.pix = take(np.int64, N)
        self.nest2ring = take(np.int64, N)
        self.ring2nest = take(np.int64, N)
        self.nest2peano = take(np.int64, N)
        self.peano2nest = take(np.int64, N)
        self.ring2ang = take(np.float64, 2 * N).reshape(N, 2)
        self.ang = take(np.float64, 2 * N).reshape(N, 2)
        self.ang2ring = take(np.int64, N)
        self.ang2nest = take(np.int64, N)
        interp = []
        for i in range(N):
            p = take(np.int64, 4)
            w = take(np.float64, 4)
            interp.append((p, w))
        self.interp_pix = np.array([p for p, w in interp])
        self.interp_wgt = np.array([w for p, w in interp])
        nring = 4 * (1 << self.order) - 1
        ri = []
        for r in range(nring):
            sp = take(np.int64, 1)[0]
            rp = take(np.int64, 1)[0]
            ct = take(np.float64, 1)[0]
            st = take(np.float64, 1)[0]
            sh = take(np.int64, 1)[0]
            ri.append((sp, rp, ct, st, sh))
        self.ringinfo = np.array(ri, dtype=np.float64)
        assert off == len(buf)


@pytest.fixture(scope="module", params=[2, 5, 9])
def golden(request):
    path = os.path.join(FIXDIR, f"healpix_golden_order{request.param}.bin")
    if not os.path.exists(path):
        pytest.skip("golden fixtures not generated")
    return Golden(path)


def test_nest_ring_conversions(golden):
    g = golden
    np.testing.assert_array_equal(hp.nest2ring(g.pix, g.order), g.nest2ring)
    np.testing.assert_array_equal(hp.ring2nest(g.pix, g.order), g.ring2nest)


def test_peano_conversions(golden):
    g = golden
    np.testing.assert_array_equal(hp.nest2peano(g.pix, g.order), g.nest2peano)
    np.testing.assert_array_equal(hp.peano2nest(g.pix, g.order), g.peano2nest)
    # roundtrip
    np.testing.assert_array_equal(
        hp.peano2nest(hp.nest2peano(g.pix, g.order), g.order), g.pix
    )


def test_pix2ang_ring(golden):
    g = golden
    theta, phi = hp.pix2ang_ring(g.pix, g.order)
    np.testing.assert_allclose(theta, g.ring2ang[:, 0], rtol=0, atol=1e-12)
    np.testing.assert_allclose(phi, g.ring2ang[:, 1], rtol=0, atol=1e-12)


def test_ang2pix(golden):
    g = golden
    np.testing.assert_array_equal(
        hp.ang2pix_ring(g.ang[:, 0], g.ang[:, 1], g.order), g.ang2ring
    )
    np.testing.assert_array_equal(
        hp.ang2pix_nest(g.ang[:, 0], g.ang[:, 1], g.order), g.ang2nest
    )


def test_get_interpol(golden):
    g = golden
    pix, wgt = hp.get_interpol(g.ang[:, 0], g.ang[:, 1], g.order)
    np.testing.assert_array_equal(pix, g.interp_pix)
    np.testing.assert_allclose(wgt, g.interp_wgt, rtol=0, atol=1e-11)


def test_ring_info(golden):
    g = golden
    rt = hp.build_ring_table(g.order)
    np.testing.assert_array_equal(rt.startpix, g.ringinfo[:, 0].astype(np.int64))
    np.testing.assert_array_equal(rt.ringpix, g.ringinfo[:, 1].astype(np.int64))
    np.testing.assert_allclose(np.cos(rt.theta), g.ringinfo[:, 2], atol=1e-12)
    np.testing.assert_array_equal(
        rt.shifted.astype(np.int64), g.ringinfo[:, 4].astype(np.int64)
    )


def test_vector_roundtrips(golden):
    g = golden
    order = g.order
    npix = int(hp.order2npix(order))
    pix = np.arange(npix, dtype=np.int64) if npix <= 50000 else g.pix
    np.testing.assert_array_equal(hp.ring2nest(hp.nest2ring(pix, order), order), pix)
    theta, phi = hp.pix2ang_ring(pix, order)
    np.testing.assert_array_equal(hp.ang2pix_ring(theta, phi, order), pix)
    vec = hp.pix2vec_ring(pix, order)
    np.testing.assert_array_equal(hp.vec2pix_ring(vec, order), pix)


def test_interp_weights_sum_to_one(golden):
    g = golden
    _, wgt = hp.get_interpol(g.ang[:, 0], g.ang[:, 1], g.order)
    np.testing.assert_allclose(wgt.sum(axis=1), 1.0, atol=1e-12)


def test_query_disc_contains_center():
    order = 6
    rng = np.random.default_rng(1)
    for _ in range(20):
        theta = np.arccos(rng.uniform(-1, 1))
        phi = rng.uniform(0, 2 * np.pi)
        rad = rng.uniform(0.01, 0.5)
        pix = hp.query_disc(theta, phi, rad, order)
        center = hp.ang2pix_ring(theta, phi, order)
        assert center in pix
        # every returned pixel center is within radius + pixel diagonal
        t, p = hp.pix2ang_ring(pix, order)
        v0 = hp.ang2vec(theta, phi)
        v = hp.ang2vec(t, p)
        ang = np.arccos(np.clip(v @ v0, -1, 1))
        assert np.all(ang <= rad + 2 * np.pi / (4 * (1 << order)))


def test_neighbors_nest_reciprocal():
    order = 4
    npix = int(hp.order2npix(order))
    pix = np.arange(npix, dtype=np.int64)
    nb = hp.neighbors_nest(pix, order)
    # every pixel appears in its neighbors' neighbor lists
    for i in [0, 17, 100, npix - 1]:
        for j in nb[i]:
            if j >= 0:
                assert i in hp.neighbors_nest(np.array([j]), order)[0]


def test_query_disc_tree_covers_exact_disc():
    """The tree walk (healpix_fastdiscquery.c:225-372) must return a
    superset of all pixels whose centers lie within the radius, and no
    pixel farther than radius + the inclusive pad."""
    order = 5
    npix = int(hp.order2npix(order))
    allv = hp.pix2vec_nest(np.arange(npix, dtype=np.int64), order)
    rng = np.random.default_rng(3)
    for rad in (0.3, 0.6, 1.0, 2.0, 3.0):
        theta = np.arccos(rng.uniform(-1, 1))
        phi = rng.uniform(0, 2 * np.pi)
        got = hp.query_disc_tree(theta, phi, rad, order)
        v0 = hp.ang2vec(theta, phi)
        ang = np.arccos(np.clip(allv @ v0, -1, 1))
        exact = np.flatnonzero(ang <= rad)
        assert np.all(np.isin(exact, got)), (rad, len(exact), len(got))
        pad = 1.362 * np.pi / (4 * (1 << (order - 1)))
        assert np.all(ang[got] <= rad + pad + 2 * np.pi / (4 * (1 << order)))


def test_query_disc_fast_dispatch_matches_ring_walk():
    """Small radii use the ring-walk, large the tree; both must cover the
    exact disc set (query_disc_inclusive_nest_fast, :30-43)."""
    order = 5
    npix = int(hp.order2npix(order))
    allv = hp.pix2vec_nest(np.arange(npix, dtype=np.int64), order)
    for rad in (0.2, 0.8):
        theta, phi = 1.1, 2.2
        got = hp.query_disc_fast(theta, phi, rad, order)
        v0 = hp.ang2vec(theta, phi)
        ang = np.arccos(np.clip(allv @ v0, -1, 1))
        exact = np.flatnonzero(ang <= rad)
        assert np.all(np.isin(exact, got)), rad


@pytest.mark.parametrize("order", [3, 7, 13])
@pytest.mark.parametrize("f64", [False, True])
def test_ring_geo_closed_matches_table(order, f64):
    """The closed-form device ring geometry (jaxhp._ring_geo_closed, the
    gather-free replacement for the InterpTables lookups in the interp hot
    path) must reproduce the golden-tested host RingTable for EVERY ring:
    startpix/ringpix exactly (int32 through order 13), shift exactly, and
    theta to dtype precision."""
    import jax.numpy as jnp
    from calclens_tpu.healpix import jaxhp

    rt = hp.build_ring_table(order)
    ir = jnp.arange(1, rt.nrings + 1, dtype=jnp.int32)
    fdtype = jnp.float64 if f64 else jnp.float32
    sp, nr, shift, thr = jaxhp._ring_geo_closed(ir, rt.nside, rt.npix, fdtype)
    np.testing.assert_array_equal(np.asarray(sp, dtype=np.int64), rt.startpix)
    np.testing.assert_array_equal(np.asarray(nr, dtype=np.int64), rt.ringpix)
    np.testing.assert_array_equal(
        np.asarray(shift), rt.shifted.astype(np.float64) * 0.5)
    np.testing.assert_allclose(
        np.asarray(thr, dtype=np.float64), rt.theta,
        rtol=0, atol=(1e-12 if f64 else 4e-7))


@pytest.mark.parametrize("order", [3, 7, 13])
def test_ring_decode_pix_roundtrip(order):
    """jaxhp.ring_decode_pix must invert startpix+idx for every pixel
    (sampled at high order): ring/idx reconstruction from a gathered tap id
    is the basis of the mispairing-proof interp weights."""
    import jax.numpy as jnp
    from calclens_tpu.healpix import jaxhp

    rt = hp.build_ring_table(order)
    npix = int(rt.npix)
    if npix <= 200000:
        pix = np.arange(npix, dtype=np.int64)
    else:
        rng = np.random.default_rng(0)
        pix = rng.integers(0, npix, size=200000)
        pix = np.concatenate([pix, [0, npix - 1, npix // 2]])
    ring, idx = jaxhp.ring_decode_pix(jnp.asarray(pix, jnp.int32),
                                      rt.nside, npix)
    ring = np.asarray(ring, dtype=np.int64)
    idx = np.asarray(idx, dtype=np.int64)
    np.testing.assert_array_equal(rt.startpix[ring - 1] + idx, pix)
    assert np.all(idx >= 0) and np.all(idx < rt.ringpix[ring - 1])

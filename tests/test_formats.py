"""pixLC / LGadget binary formats, lens-plane maker, profiler."""
import numpy as np

from calclens_tpu.healpix import core as hp
from calclens_tpu.io import lensplanes, lgadget, pixlc
from calclens_tpu import lensplane_maker as lpm
from calclens_tpu.utils.profile import Profiler


def test_pixlc_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    file_order = 1
    nside = 2
    pos = rng.normal(size=(100, 3))
    pos = pos / np.linalg.norm(pos, axis=1, keepdims=True) * 300.0
    nest = hp.vec2pix_nest(pos, file_order)
    for cell in np.unique(nest):
        pixlc.write_cell(str(tmp_path), "lc", 3, int(cell), pos[nest == cell],
                         mass_1e10=2.5, indexnside=nside, filenside=nside)
    rpos, rmass = pixlc.read_plane(str(tmp_path), "lc", 3)
    assert len(rpos) == 100
    np.testing.assert_allclose(rmass, 2.5e10)
    order_a = np.lexsort(rpos.T)
    order_b = np.lexsort(pos.T)
    np.testing.assert_allclose(rpos[order_a], pos[order_b], rtol=1e-6)

    # restricted read: single peano cell at file order
    peano = hp.nest2peano(np.unique(nest)[:1], file_order)
    rpos2, _ = pixlc.read_plane(str(tmp_path), "lc", 3, peano_cells=peano,
                                read_order=file_order)
    assert 0 < len(rpos2) < 100


def test_lgadget_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 1000, size=(64, 3))
    fn = str(tmp_path / "snap_000")
    lgadget.write_snapshot(fn, pos, mass1_1e10=3.0, time=0.5, boxsize=1000.0)
    hd = lgadget.read_header(fn)
    assert hd["npart"] == 64
    assert abs(hd["mass"] - 3.0e10) < 1
    assert abs(hd["time"] - 0.5) < 1e-12
    rpos, rmass, _ = lgadget.read_positions(fn)
    np.testing.assert_allclose(rpos, pos, atol=1e-3)
    np.testing.assert_allclose(rmass, 3.0e10)


def test_lensplane_maker(tmp_path):
    rng = np.random.default_rng(2)
    n = 5000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rad = rng.uniform(10.0, 990.0, n)
    pos = v * rad[:, None]
    mass = np.full(n, 1.0e12)

    def chunks():
        for i0 in range(0, n, 1024):
            yield pos[i0: i0 + 1024], mass[i0: i0 + 1024]

    counts = lpm.make_lensplanes(chunks(), str(tmp_path), "plane", 10, 1000.0,
                                 lens_plane_order=2)
    assert sum(counts) == n
    # read back each plane and verify radial binning + totals
    tot = 0
    for p in range(10):
        rpos, rmass = lensplanes.read_plane(
            lensplanes.plane_filename(str(tmp_path), "plane", p))
        r = np.linalg.norm(rpos, axis=1)
        if len(r):
            assert np.all((r >= p * 100.0) & (r < (p + 1) * 100.0))
        tot += len(rpos)
    assert tot == n

    maps = lpm.make_debug_maps(str(tmp_path), "plane", 10, map_order=3)
    assert abs(maps.sum() - mass.sum()) < 1e-3 * mass.sum()


def test_profiler():
    import time

    prof = Profiler(keep_timeseries=True)
    prof.log_tag("SHT")
    time.sleep(0.01)
    prof.log_tag("SHT")
    with prof("RAYPROP"):
        time.sleep(0.005)
    assert prof.get("SHT") >= 0.01
    assert prof.get("RAYPROP") >= 0.005
    assert prof.count["SHT"] == 1
    assert len(prof.series) == 2
    assert "SHT" in prof.report()


def test_reference_example_config_parses(tmp_path):
    """The reference repo's shipped raytrace.cfg must parse cleanly,
    including its empty-valued string tags."""
    import os
    import shutil
    import warnings

    src = "/root/reference/raytrace.cfg"
    if not os.path.exists(src):
        import pytest

        pytest.skip("reference config not present")
    from calclens_tpu.config import read_config

    shutil.copy(src, tmp_path / "r.cfg")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg = read_config(str(tmp_path / "r.cfg"))
    assert cfg.NumLensPlanes == 50
    assert cfg.SHTOrder == 7
    assert cfg.rayOrder == 8
    assert abs(cfg.OmegaM - 0.27) < 1e-12
    assert not w, [str(x.message) for x in w]


def test_keep_rand_frac_subsampling(tmp_path):
    """KEEP_RAND_FRAC: subsample particles, rescale mass so the total mass is
    preserved in expectation (read_lensplanes_hdf5.c:90-122)."""
    import numpy as np

    from calclens_tpu.config import RayTraceConfig
    from calclens_tpu.driver import Raytracer
    from calclens_tpu.io import lensplanes

    rng = np.random.default_rng(0)
    n = 20000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pos = v * 300.0
    lensplanes.write_plane(
        lensplanes.plane_filename(str(tmp_path), "p", 1), 3, pos,
        np.full(n, 2.0e12))
    cfg = RayTraceConfig(OmegaM=0.3, maxComvDistance=1000.0, NumLensPlanes=4,
                         LensPlanePath=str(tmp_path), LensPlaneName="p",
                         rayOrder=4, bundleOrder=2, SHTOrder=4,
                         KeepRandFrac=0.25).finalize()
    rt = Raytracer(cfg)
    p2, m2 = rt.load_particles(1)
    assert 0.2 * n < len(p2) < 0.3 * n
    total = n * 2.0e12
    assert abs(m2.sum() - total) / total < 0.05
    np.testing.assert_allclose(m2, 2.0e12 / 0.25)

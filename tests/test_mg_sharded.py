"""Mesh-sharded multigrid refinement (round-3 VERDICT missing #2).

The reference runs the MG solve distributed: each task owns bundle cells and
exchanges particles and the SHT potential map as needed
(mgpoissonsolve.c:59-123, poissondrivers.c:64-75).  The TPU form shards the
independent patch batch [C, N, N] over the mesh axis (mgdriver._cst_patch):
deposit reduce-scatters, the FAS cycles run C/n patches per device, and only
the solved patch potentials are all-gathered for the ray-side interpolation.
These tests prove (a) sharded == single-device on the point-mass problem,
(b) the deposit actually lowers to a reduce-scatter, and (c, slow) the
production-shape non-SHTONLY step compiles within a 16 GB chip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from calclens_tpu.config import RayTraceConfig
from calclens_tpu.driver import Raytracer
from calclens_tpu.parallel.sharding import make_mesh
from calclens_tpu.testing import pointmass as pm


def _run_pointmass_mg(tmp_path, mesh):
    cfg = RayTraceConfig(
        OmegaM=0.3, maxComvDistance=2000.0, NumLensPlanes=8,
        LensPlanePath=str(tmp_path), LensPlaneName="pmplane",
        SHTOrder=5, rayOrder=6, bundleOrder=2,
        partMass=5.0e16, raPointMass=32.0, decPointMass=14.0,
        radPointMass=625.0, PointMassTest=True, Precision="f64",
        SHTOnly=False,
    ).finalize()
    mass_vec, mass_plane = pm.make_pointmass_planes(cfg)
    rt = Raytracer(cfg, mesh=mesh)
    rt.init_rays()
    for p in range(mass_plane + 1):
        rt.step(p)
    return np.asarray(rt.rays_packed)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_mg_matches_single_device(tmp_path):
    """plane_step_mg on the 8-device mesh == single device (point mass)."""
    single = _run_pointmass_mg(tmp_path / "s", None)
    sharded = _run_pointmass_mg(tmp_path / "m", make_mesh(8))
    assert single.shape == sharded.shape
    np.testing.assert_allclose(sharded, single, rtol=1e-10, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_mg_deposit_reduce_scatters(tmp_path):
    """The patch deposit must lower to a reduce-scatter on the mesh — not a
    full [C, N, N] all-reduce on every device — and the only all-gather at
    patch scale is the solved potential for the ray side."""
    import re

    from calclens_tpu import mgdriver, poisson
    from calclens_tpu.healpix import core as hp
    from calclens_tpu.healpix import jaxhp
    from calclens_tpu.sht.plan import SHTPlan
    from calclens_tpu.rays import soa
    from calclens_tpu.mg import choose_patch_n

    mesh = make_mesh(8)
    order, ray_order, bo = 5, 5, 2
    plan = SHTPlan(order, dtype=jnp.float64, mesh=mesh)
    tab = jaxhp.InterpTables(order, dtype=jnp.float64)
    cell = np.sqrt(4.0 * np.pi / hp.order2npix(bo))
    n = choose_patch_n(4.0 * cell, cell / 16.0, n_min=32, n_max=64)
    setup = mgdriver.MGSetup(bo, n, ray_order, dtype=jnp.float64)

    npix_ray = int(hp.order2npix(ray_order))
    packed = jax.ShapeDtypeStruct((21, npix_ray), jnp.float32)
    ray_nest = jax.ShapeDtypeStruct((npix_ray,), jnp.int64)
    npart = 4096
    pos = jax.ShapeDtypeStruct((npart, 3), jnp.float64)
    mass = jax.ShapeDtypeStruct((npart,), jnp.float64)
    z = jax.ShapeDtypeStruct((), jnp.float64)
    scal = poisson.PlaneScalars(z, z, z, z, z)

    lowered = jax.jit(
        poisson.plane_step_mg, static_argnums=(0, 1, 2, 7, 8, 11, 12)
    ).lower(plan, tab, setup, packed, ray_nest, pos, mass, "NGP", False,
            scal, None, -1.0, None)
    txt = lowered.compile().as_text()
    assert "reduce-scatter" in txt, "patch deposit did not reduce-scatter"
    # all-gathers at most patch-batch sized (the solved u for the rays);
    # never the Np-scaled scatter operand
    C = int(hp.order2npix(bo))
    lev_n = setup.levels[0].N
    patch_elems = C * lev_n * lev_n
    for m in re.finditer(r"all-gather[^=]*=?\s*\w*\[([0-9,]+)\]", txt):
        dims = [int(d) for d in m.group(1).split(",") if d]
        nel = int(np.prod(dims)) if dims else 0
        assert nel <= 2 * patch_elems, f"all-gather of {nel} elements"


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_mg_step_production_shape_fits():
    """Non-SHTONLY production-shape proof (round-3 VERDICT missing #2): the
    MG plane step at rayOrder 12 / SHTOrder 10 / bundleOrder 6 (the mode's
    design point — the SHT supplies only the long-range field, MG the small
    scales) AOT-compiles on the 8-device mesh within a 16 GB chip."""
    from calclens_tpu import mgdriver, poisson
    from calclens_tpu.healpix import core as hp
    from calclens_tpu.healpix import jaxhp
    from calclens_tpu.sht.plan import SHTPlan
    from calclens_tpu.mg import choose_patch_n

    mesh = make_mesh(8)
    order, ray_order, bo = 10, 12, 6
    plan = SHTPlan(order, dtype=jnp.float32, mesh=mesh)
    tab = jaxhp.InterpTables(order, dtype=jnp.float32)
    cell = np.sqrt(4.0 * np.pi / hp.order2npix(bo))
    n = choose_patch_n(4.0 * cell, cell / 16.0, n_min=64, n_max=256)
    setup = mgdriver.MGSetup(bo, n, ray_order, dtype=jnp.float32)

    from jax.sharding import NamedSharding, PartitionSpec as P
    from calclens_tpu.parallel.sharding import AXIS

    batch = NamedSharding(mesh, P(AXIS))
    rows = NamedSharding(mesh, P(None, AXIS))
    rep = NamedSharding(mesh, P())
    npix_ray = int(hp.order2npix(ray_order))
    packed = jax.ShapeDtypeStruct((21, npix_ray), jnp.float32, sharding=rows)
    ray_nest = jax.ShapeDtypeStruct((npix_ray,), jnp.int64, sharding=batch)
    npart = 1 << 20
    pos = jax.ShapeDtypeStruct((npart, 3), jnp.float32, sharding=batch)
    mass = jax.ShapeDtypeStruct((npart,), jnp.float32, sharding=batch)
    z = jax.ShapeDtypeStruct((), jnp.float32, sharding=rep)
    scal = poisson.PlaneScalars(z, z, z, z, z)

    compiled = jax.jit(
        poisson.plane_step_mg, static_argnums=(0, 1, 2, 7, 8, 11, 12),
        donate_argnums=(3,),
    ).lower(plan, tab, setup, packed, ray_nest, pos, mass, "NGP", False,
            scal, None, -1.0, None).compile()
    mem = compiled.memory_analysis()
    peak = (int(mem.peak_memory_in_bytes) + int(mem.argument_size_in_bytes)
            + int(mem.output_size_in_bytes) - int(mem.alias_size_in_bytes))
    assert peak < 16 * 1024**3, f"per-device peak {peak/2**30:.2f} GiB"
    assert "reduce-scatter" in compiled.as_text()

"""Spherical Poisson solve driver (reference shtpoissonsolve.c + poissondrivers.c).

Pipeline per lens plane (SHTONLY + full-sky default path, SURVEY.md 3.2):
  particles -> deposit onto poissonOrder RING map -> scale by densfact/pixarea
  and subtract the mean background -> map2alm -> alm *= -1/(l(l+1)) (monopole
  zeroed) -> alm2allmaps (phi + 5 covariant derivatives) -> bilinear+parallel-
  transport interpolation onto rays, alpha -= grad(phi), U += hess(phi).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .healpix import jaxhp
from .ops import deposit as dep
from .ops.interp import FieldMaps, shear_interp, apply_lensing_fields
from .rays import propagate as rp
from .sht import transforms as T
from .sht.plan import SHTPlan


class PlaneScalars(NamedTuple):
    """Per-plane scalars passed as device values so one compiled plane step
    serves every plane (set_plane_params outputs, raytrace.c:384-500)."""

    densfact: jnp.ndarray
    backdens: jnp.ndarray
    wp: jnp.ndarray      # next plane radius (propagation target)
    wpm1: jnp.ndarray    # current plane radius
    wpm2: jnp.ndarray    # previous plane radius


@partial(jax.jit, static_argnums=0)
def solve_potential(plan: SHTPlan, density):
    """Scaled surface density map -> FieldMaps (phi and covariant derivs)."""
    alm = T.map2alm(plan, density)
    ls = jnp.arange(plan.nl, dtype=plan.dtype)[:, None]
    inv = jnp.where(ls > 0, -1.0 / jnp.maximum(ls * (ls + 1.0), 1.0), 0.0)
    if plan.window_dev is not None:
        inv = inv * plan.window_dev[:, None]
    alm = alm * inv.astype(plan.dtype)
    return FieldMaps(*T.alm2allmaps(plan, alm))


@partial(jax.jit, static_argnums=(0, 2))
def solve_potential_sph(plan: SHTPlan, densities, sph):
    """sigma-bucketed maps [B, npix] -> FieldMaps; each bucket's alm gets its
    spline-kernel window b_l(sigma_b) before the Poisson filter (the harmonic
    form of the reference's real-space SPH deposit).  The CIC assignment
    window is divided out so the kernel is effectively centered at the exact
    particle position (error budget in deposit_sph_bucketed's docstring)."""
    sigmas = sph
    w2 = dep.pixwin_disc_bl(plan.order, plan.lmax) ** 2
    alm = 0.0
    for b, sig in enumerate(sigmas):
        bl = jnp.asarray(dep.kernel_bl(float(sig), plan.lmax) / w2,
                         plan.dtype)
        alm = alm + T.map2alm(plan, densities[b]) * bl[:, None]
    ls = jnp.arange(plan.nl, dtype=plan.dtype)[:, None]
    inv = jnp.where(ls > 0, -1.0 / jnp.maximum(ls * (ls + 1.0), 1.0), 0.0)
    if plan.window_dev is not None:
        inv = inv * plan.window_dev[:, None]
    alm = alm * inv.astype(plan.dtype)
    return FieldMaps(*T.alm2allmaps(plan, alm))


def sht_poisson_solve(plan: SHTPlan, tab: jaxhp.InterpTables, rays,
                      pos, mass, densfact, backdens, vacmask=None,
                      scheme: str = "NGP", density=None, sph=None):
    """Full solve: deposit + solve + interpolate onto rays.

    pos [N,3]/mass [N] are this plane's particles (device arrays); `density`
    may be passed instead for the UseHEALPixLensPlaneMaps path (raw mass per
    pixel / MASS_SCALE, ring ordered).  For scheme "SPH", sph is the static
    tuple (sigma_grid..., comv_smoothing_scale, min_sl, max_sl).
    Returns (rays', FieldMaps).
    """
    pixarea = 4.0 * jnp.pi / plan.npix
    if scheme == "SPH" and density is None:
        *sigmas, csl, min_sl, max_sl = sph
        sl = dep.smoothing_lengths(pos, csl, min_sl, max_sl)
        dens_b = dep.deposit_sph_bucketed(plan.order, pos, mass, sl,
                                          np.asarray(sigmas), plan.npix,
                                          tab=tab)
        dens_b = dep.scale_density(dens_b, densfact, 0.0, pixarea)
        # backdens is a monopole shift (zeroed by the filter) except in
        # cut-sky mode, where it applies to the summed map
        if vacmask is not None:
            dens_b = jnp.where(vacmask[None, :], 0.0, dens_b)
            dens_b = dens_b.at[0].add(
                jnp.where(vacmask, 0.0, -backdens * jnp.ones(plan.npix,
                                                             dens_b.dtype)))
        maps = solve_potential_sph(plan, dens_b, tuple(sigmas))
        pot, grad, U = shear_interp(tab, maps, rays.n)
        return apply_lensing_fields(rays, pot, grad, U), maps
    if density is None:
        if scheme == "NGP":
            density = dep.deposit_ngp(plan.order, pos, mass, plan.npix)
        elif scheme == "CIC":
            density = dep.deposit_cic(tab, pos, mass)
        else:
            raise NotImplementedError(f"deposit scheme {scheme}")
    density = dep.scale_density(density, densfact, backdens, pixarea, vacmask)
    maps = solve_potential(plan, density)
    pot, grad, U = shear_interp(tab, maps, rays.n)
    return apply_lensing_fields(rays, pot, grad, U), maps


# Ray-side chunk threshold: the SoA layout fits unchunked to ~32M rays;
# lax.map chunking costs ~6x in serialization (measured on v5e), so chunk
# only when the buffer genuinely cannot fit
RAY_CHUNK = 1 << 24


def _ray_side_packed(tab, maps, packed, scal, born, plan=None):
    """SoA interpolation + propagation on the packed f32[21, N] ray buffer
    (rays/soa.py): componentwise math, no small trailing dims, chunked.

    On a mesh with full-sky RING-ordered rays this dispatches to the halo-
    exchange path (parallel/halo.py): the six maps stay block-sharded and
    each shard gathers taps from its block plus an H-pixel halo, so no
    participant materializes a full [npix] map."""
    import os

    from .rays import soa

    N = packed.shape[1]
    # full-sky ray buffer at some order? (N = 12 * 4^ray_order)
    log2q = max((N // 12).bit_length() - 1, 0)
    ray_order = log2q // 2
    fullsky = log2q % 2 == 0 and N == 12 * 4**ray_order

    if plan is not None and plan.spec is not None:
        n = plan.spec.mesh.devices.size
        if fullsky and N % n == 0 and plan.npix % n == 0:
            from .parallel import halo

            maps6 = maps if isinstance(maps, jnp.ndarray) else jnp.stack(
                [maps.pot, maps.gt, maps.gp, maps.gtt, maps.gtp, maps.gpp])
            H = halo.required_halo(ray_order, plan.order, n)
            return halo.interp_and_prop_sharded(
                tab, maps6, packed, scal.wp, scal.wpm1, scal.wpm2, born,
                plan.spec.mesh, H, ray_order, plan.order)

    if (plan is not None and plan.spec is None and fullsky
            and packed.dtype == jnp.dtype(jnp.float32)
            and plan.order == tab.order):
        # windowed fast path: per-chunk map windows keep every tap gather in
        # the <= 2M-pixel fast regime (~128 vs ~57 M idx/s on v5e; see
        # rays/interp_fast.py).  Only pays off when the map itself exceeds
        # the fast-gather ceiling.
        from .rays import interp_fast

        wmax = interp_fast.default_wmax(plan.order)
        if (tab.npix > wmax
                and os.environ.get("CALCLENS_INTERP_WINDOWED", "1") != "0"):
            drift = int(os.environ.get("CALCLENS_INTERP_DRIFT", "16"))
            wplan = interp_fast.get_plan(ray_order, plan.order, drift, wmax)
            out, _viol = interp_fast.interp_and_prop_fullsky(
                tab, maps, packed, scal.wp, scal.wpm1, scal.wpm2, born,
                wplan)
            return out

    def block(b):
        return soa.interp_and_prop_chunk(tab, maps, b, scal.wp, scal.wpm1,
                                         scal.wpm2, born)

    return soa.chunked(block, packed, RAY_CHUNK)


def _ray_side(tab, maps, rays, scal, born):
    """AoS-view wrapper around the packed ray side (kept for the
    NamedTuple-based API)."""
    from .rays import soa

    out = _ray_side_packed(tab, maps, soa.pack(rays), scal, born)
    return soa.unpack(out)


def _cst_blocks(plan, density):
    """Constrain a flat [.., npix] map to contiguous pixel blocks on the mesh:
    the deposit's global reduction becomes a reduce-scatter instead of a
    full-map all-reduce (reference map_shuffle.c:633-875 peano2ring-as-sum)."""
    if plan.spec is None:
        return density
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .parallel.sharding import AXIS

    spec = P(*((None,) * (density.ndim - 1)), AXIS)
    return jax.lax.with_sharding_constraint(
        density, NamedSharding(plan.spec.mesh, spec))


def _solve_maps(plan, tab, pos, mass, scheme, scal, vacmask, sph):
    """Deposit + spectral solve -> FieldMaps (scheme-dispatched)."""
    pixarea = 4.0 * jnp.pi / plan.npix
    if scheme == "SPH":
        *sigmas, csl, min_sl, max_sl = sph
        sl = dep.smoothing_lengths(pos, csl, min_sl, max_sl)
        dens_b = dep.deposit_sph_bucketed(plan.order, pos, mass, sl,
                                          np.asarray(sigmas), plan.npix,
                                          tab=tab)
        dens_b = _cst_blocks(plan, dens_b)
        dens_b = dep.scale_density(dens_b, scal.densfact, 0.0, pixarea)
        if vacmask is not None:
            dens_b = jnp.where(vacmask[None, :], 0.0, dens_b)
            dens_b = dens_b.at[0].add(jnp.where(vacmask, 0.0, -scal.backdens
                                                * jnp.ones(plan.npix,
                                                           dens_b.dtype)))
        return solve_potential_sph(plan, dens_b, tuple(sigmas))
    if scheme == "CIC":
        density = dep.deposit_cic(tab, pos, mass)
    else:
        density = dep.deposit_ngp(plan.order, pos, mass, plan.npix)
    density = _cst_blocks(plan, density)
    density = dep.scale_density(density, scal.densfact, scal.backdens,
                                pixarea, vacmask)
    return solve_potential(plan, density)


@partial(jax.jit, static_argnums=(0, 1, 5, 6, 7, 10), donate_argnums=(2,))
def plane_step_packed(plan: SHTPlan, tab: jaxhp.InterpTables, packed, pos,
                      mass, scheme: str, born: bool, with_maps: bool,
                      scal: PlaneScalars, vacmask=None, sph=None):
    """plane_step on the packed f32[21, N] ray buffer (the production ray
    layout on TPU; see rays/soa.py)."""
    from .rays import soa

    packed = soa.zero_plane_rows(packed)
    maps = _solve_maps(plan, tab, pos, mass, scheme, scal, vacmask, sph)
    maps = jax.lax.optimization_barrier(maps)
    packed = _ray_side_packed(tab, maps, packed, scal, born, plan)
    return packed, (maps if with_maps else None)


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=(1,))
def empty_plane_step_packed(born: bool, packed, scal: PlaneScalars,
                            radial: bool = False):
    """Particle-free plane: zero the per-plane rows and propagate.

    radial=True takes the reference's alpha == 0 rayprop branch (radial
    position rescale, rayprop.c:125-131) — the deterministic behavior of
    its CMB propagation and NOBACKDENS zero-particle skip.  The default
    keeps the beta chord: with background subtraction the reference runs
    the full solve on an empty plane and its noise-level alpha chords along
    the (un-rotated) beta, which the exact chord reproduces."""
    from .rays import soa

    packed = soa.zero_plane_rows(packed)
    return soa.chunked(
        lambda b: soa.prop_only_chunk(b, scal.wp, scal.wpm1, scal.wpm2, born,
                                      radial_when_straight=radial),
        packed, RAY_CHUNK)


@partial(jax.jit, static_argnums=(0, 1, 4, 5), donate_argnums=(2,))
def plane_step_density_packed(plan: SHTPlan, tab: jaxhp.InterpTables, packed,
                              density, born: bool, with_maps: bool,
                              scal: PlaneScalars, vacmask=None):
    from .rays import soa

    packed = soa.zero_plane_rows(packed)
    pixarea = 4.0 * jnp.pi / plan.npix
    density = dep.scale_density(density, scal.densfact, scal.backdens,
                                pixarea, vacmask)
    maps = solve_potential(plan, density)
    packed = _ray_side_packed(tab, maps, packed, scal, born, plan)
    return packed, (maps if with_maps else None)


@partial(jax.jit, static_argnums=(0, 1, 5, 6, 7, 10))
def plane_step(plan: SHTPlan, tab: jaxhp.InterpTables, rays, pos, mass,
               scheme: str, born: bool, with_maps: bool,
               scal: PlaneScalars, vacmask=None, sph=None):
    """One fully-fused lens-plane step: zero per-plane fields, deposit + SHT
    Poisson solve + interpolate to rays, then propagate to the next plane.

    Compiled once per (plan, particle-bucket-size); per-plane scalars are
    device values.  This is the unit the driver calls per plane and the unit
    the multi-chip mesh shards (rays/particles on the batch axis, the SHT
    internally on rings/m via the plan's sharding constraints).
    """
    rays = rp.zero_plane_fields(rays)
    maps = _solve_maps(plan, tab, pos, mass, scheme, scal, vacmask, sph)
    rays = _ray_side(tab, maps, rays, scal, born)
    return rays, (maps if with_maps else None)


@partial(jax.jit, static_argnums=(0, 1, 4, 5))
def plane_step_density(plan: SHTPlan, tab: jaxhp.InterpTables, rays, density,
                       born: bool, with_maps: bool, scal: PlaneScalars,
                       vacmask=None):
    """Plane step from a precomputed surface-density map (the
    UseHEALPixLensPlaneMaps path, shtpoissonsolve.c:336-436).  density is
    mass per pixel / MASS_SCALE in RING order."""
    rays = rp.zero_plane_fields(rays)
    pixarea = 4.0 * jnp.pi / plan.npix
    density = dep.scale_density(density, scal.densfact, scal.backdens,
                                pixarea, vacmask)
    maps = solve_potential(plan, density)
    rays = _ray_side(tab, maps, rays, scal, born)
    return rays, (maps if with_maps else None)


@partial(jax.jit, static_argnums=(0, 1, 2, 7, 8, 11, 12))
def plane_step_mg(plan: SHTPlan, tab: jaxhp.InterpTables, mgsetup, packed,
                  ray_nest, pos, mass, scheme: str, born: bool,
                  scal: PlaneScalars, vacmask=None, conv_fact: float = -1.0,
                  sph=None):
    """Non-SHTONLY plane step: SHT solve for the long-range potential MAP
    only, then batched tangent-patch multigrid refinement supplies the rays'
    deflections/shear from finite differences of the patch potential
    (reference poissondrivers.c:14-80 + mgpoissonsolve.c).  Operates on the
    packed ray buffer; the AoS views are transient in-graph."""
    from . import mgdriver
    from .rays import soa

    rays = soa.unpack(soa.zero_plane_rows(packed))
    if scheme == "CIC":
        density = dep.deposit_cic(tab, pos, mass)
    else:
        density = dep.deposit_ngp(plan.order, pos, mass, plan.npix)
    density = _cst_blocks(plan, density)
    pixarea = 4.0 * jnp.pi / plan.npix
    density = dep.scale_density(density, scal.densfact, scal.backdens,
                                pixarea, vacmask)
    alm = T.map2alm(plan, density)
    ls = jnp.arange(plan.nl, dtype=plan.dtype)[:, None]
    inv = jnp.where(ls > 0, -1.0 / jnp.maximum(ls * (ls + 1.0), 1.0), 0.0)
    if plan.window_dev is not None:
        inv = inv * plan.window_dev[:, None]
    potmap = T.alm2map(plan, alm * inv.astype(plan.dtype))
    sl = None
    if scheme == "SPH" and sph is not None:
        *sigmas, csl, min_sl, max_sl = sph
        sl = dep.smoothing_lengths(pos, csl, min_sl, max_sl)
    rays = mgdriver.mg_refine(
        mgsetup, tab, rays, ray_nest, mgsetup.ray_order, potmap,
        pos, mass, scal.densfact, scal.backdens, conv_fact=conv_fact, sl=sl,
        spec=plan.spec)
    out = soa.pack(rays)
    return soa.chunked(
        lambda b: soa.prop_only_chunk(b, scal.wp, scal.wpm1, scal.wpm2, born),
        out, RAY_CHUNK)


@partial(jax.jit, static_argnums=(0,))
def empty_plane_step(born: bool, rays, scal: PlaneScalars):
    """Plane with no particles: zero fields and propagate only (the
    reference's zero-particle NOBACKDENS skip, poissondrivers.c:82-157)."""
    rays = rp.zero_plane_fields(rays)
    return rp.rayprop_sphere(rays, scal.wp, scal.wpm1, scal.wpm2, born=born)


# ----------------------------------------------------------------------------
# phase-split entry points (cfg.Profile observability mode): the same plane
# step cut at the reference's phase boundaries so the driver can host-time
# each phase with a device sync between (profile.c tags; per-plane rows in
# shtpoissonsolve.c:521-576).  A few % slower than the fused step (lost
# cross-phase overlap) — enabled only when profiling.
# ----------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0, 1, 4), static_argnames=("sph",))
def phase_deposit(plan: SHTPlan, tab, pos, mass, scheme: str,
                  scal: PlaneScalars, vacmask=None, sph=None):
    """Particles -> scaled surface-density map (DEPOSIT).

    scheme "SPH" returns the sigma-bucketed [B, npix] maps (the harmonic-
    smoothing form of the reference's adaptive spline deposit,
    shtpoissonsolve.c:187-291) for phase_analysis_sph; the other schemes
    return the flat [npix] map for phase_analysis."""
    pixarea = 4.0 * jnp.pi / plan.npix
    if scheme == "SPH":
        *sigmas, csl, min_sl, max_sl = sph
        sl = dep.smoothing_lengths(pos, csl, min_sl, max_sl)
        dens_b = dep.deposit_sph_bucketed(plan.order, pos, mass, sl,
                                          np.asarray(sigmas), plan.npix,
                                          tab=tab)
        dens_b = _cst_blocks(plan, dens_b)
        dens_b = dep.scale_density(dens_b, scal.densfact, 0.0, pixarea)
        if vacmask is not None:
            dens_b = jnp.where(vacmask[None, :], 0.0, dens_b)
            dens_b = dens_b.at[0].add(
                jnp.where(vacmask, 0.0, -scal.backdens
                          * jnp.ones(plan.npix, dens_b.dtype)))
        return dens_b
    if scheme == "CIC":
        density = dep.deposit_cic(tab, pos, mass)
    else:
        density = dep.deposit_ngp(plan.order, pos, mass, plan.npix)
    density = _cst_blocks(plan, density)
    return dep.scale_density(density, scal.densfact, scal.backdens,
                             pixarea, vacmask)


@partial(jax.jit, static_argnums=0)
def phase_analysis(plan: SHTPlan, density):
    """density -> Poisson-filtered alm (SHTSOLVE: map2alm + -1/l(l+1))."""
    alm = T.map2alm(plan, density)
    ls = jnp.arange(plan.nl, dtype=plan.dtype)[:, None]
    inv = jnp.where(ls > 0, -1.0 / jnp.maximum(ls * (ls + 1.0), 1.0), 0.0)
    if plan.window_dev is not None:
        inv = inv * plan.window_dev[:, None]
    return alm * inv.astype(plan.dtype)


@partial(jax.jit, static_argnums=0)
def _sph_first_alm(plan: SHTPlan, density, bl):
    return T.map2alm(plan, density) * bl[:, None]


@partial(jax.jit, static_argnums=0, donate_argnums=(1,))
def _sph_accum_alm(plan: SHTPlan, alm_acc, density, bl):
    return alm_acc + T.map2alm(plan, density) * bl[:, None]


@partial(jax.jit, static_argnums=0, donate_argnums=(1,))
def _poisson_filter(plan: SHTPlan, alm):
    ls = jnp.arange(plan.nl, dtype=plan.dtype)[:, None]
    inv = jnp.where(ls > 0, -1.0 / jnp.maximum(ls * (ls + 1.0), 1.0), 0.0)
    if plan.window_dev is not None:
        inv = inv * plan.window_dev[:, None]
    return alm * inv.astype(plan.dtype)


def phase_analysis_sph(plan: SHTPlan, dens_b, sigmas):
    """Bucketed [B, npix] maps -> Poisson-filtered alm (SHTSOLVE, SPH form:
    per-bucket map2alm x spline-kernel window, summed).  Host-level loop —
    one jit call per bucket with a donated alm accumulator — so peak HBM is
    ONE transform's working set above the resident bucketed maps (the same
    reasoning as the host-streamed synthesis; at order 12 a fused 8-bucket
    analysis would hold every bucket's ring-stage temporaries at once)."""
    w2 = dep.pixwin_disc_bl(plan.order, plan.lmax) ** 2
    alm = None
    for b, sig in enumerate(sigmas):
        bl = jnp.asarray(dep.kernel_bl(float(sig), plan.lmax) / w2,
                         plan.dtype)
        if alm is None:
            alm = _sph_first_alm(plan, dens_b[b], bl)
        else:
            alm = _sph_accum_alm(plan, alm, dens_b[b], bl)
    return _poisson_filter(plan, alm)


@partial(jax.jit, static_argnums=0)
def phase_synthesis(plan: SHTPlan, alm):
    """alm -> six field maps (SHT: alm2allmaps)."""
    return FieldMaps(*T.alm2allmaps(plan, alm))


def phase_synthesis_host(plan: SHTPlan, alm):
    """Host-level synthesis dispatch: at NSIDE >= 4096 single-chip, stream
    the six-map synthesis over j-blocks as separate jit calls so each
    block's temporaries are freed before the next block runs (the only way
    to bound peak HBM — the TPU compiler deletes in-graph optimization
    barriers; see transforms.alm2allmaps_host_streamed).

    Returns the STACKED [6, npix] map array in the streamed case (the
    interpolation's native format; unstacking into FieldMaps would allocate
    six more map-sized buffers — 4.5 GB at NSIDE 4096)."""
    nblk = T._synth_stream_blocks(plan)
    if nblk > 1:
        return T.alm2allmaps_host_streamed(plan, alm, nblk)
    return phase_synthesis(plan, alm)


@partial(jax.jit, static_argnums=(0, 1, 5), donate_argnums=(2,))
def phase_rayside(plan: SHTPlan, tab, packed, maps, scal: PlaneScalars,
                  born: bool):
    """Interp + propagate on the packed buffer (INTERP+RAYPROP)."""
    from .rays import soa

    packed = soa.zero_plane_rows(packed)
    return _ray_side_packed(tab, maps, packed, scal, born, plan)

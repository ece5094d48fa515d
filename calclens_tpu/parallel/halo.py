"""Sharded field-map interpolation via ring halo exchange.

TPU-native replacement for the reference's buffer-map-cell exchange
(map_shuffle.c:380-508) feeding the per-ray interpolation
(shtpoissonsolve.c:666-705).  The six field maps stay sharded as equal
contiguous RING-pixel blocks across the mesh; each shard receives only a
halo of H pixels from each neighbor (ppermute), so NO participant ever
materializes a full [npix] map — the requirement for NSIDE 8192 where the
six f32 maps (~19 GB) exceed single-chip HBM.

Why contiguous blocks align: HEALPix pixels are equal-area, so the fraction
of pixels below colatitude theta is the same function of theta at every
order (up to ring quantization).  Rays are stored in RING order (driver
init), so ray shard k and map shard k cover the same latitude band; a ray's
four bilinear taps (two adjacent rings, two pixels each, at the ray's phi)
land within its own map block plus a halo bounded by ring quantization +
the accumulated deflection (arcminutes).  `required_halo` computes the
quantization bound exactly from the ring tables and adds a configurable
drift margin.

Pole folds (get_interpol ir==0 / ir==4nside branches) tap the first/last 4
pixels of the map; only rays in the first/last ray ring trigger them, and
those rays always live on shard 0 / n-1 where the pixels are block-local.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .sharding import AXIS
from ..healpix import core as hp


def required_halo(ray_order: int, map_order: int, n_shards: int,
                  drift_rad: float = 0.02) -> int:
    """Halo size in map pixels for the sharded interp.

    Exact per-ring quantization bound: for a ray at global pixel fraction f
    in ray ring i at azimuth fraction u, the tap index on map ring r is
    startpix_map[r] + u * ringpix_map[r] (+-2 for pixel-center offsets);
    the window assumes the tap sits at f * npix_map.  The deviation is
    linear in u, so its max over the ring is at the endpoints.  drift_rad
    adds margin for accumulated ray deflection (rays move off their initial
    pixel centers by the total bend angle, arcminutes in practice).
    """
    rt_ray = hp.build_ring_table(ray_order)
    rt_map = hp.build_ring_table(map_order)
    npix_ray = float(rt_ray.npix)
    npix_map = float(rt_map.npix)
    nrings_map = 4 * rt_map.nside - 1

    # taps of ray ring i go to map rings bracketing theta_i: ring_above and
    # ring_above + 1 (1-indexed ir in get_interpol; row = ir - 1)
    theta = rt_ray.theta
    z = np.cos(theta)
    az = np.abs(z)
    nside_m = rt_map.nside
    ir_cap = (nside_m * np.sqrt(np.maximum(3.0 * (1.0 - az), 0.0))).astype(np.int64)
    ir_eq = (nside_m * (2.0 - 1.5 * z)).astype(np.int64)
    ring_above = np.where(az <= 2.0 / 3.0, ir_eq,
                          np.where(z > 0, ir_cap, 4 * nside_m - ir_cap - 1))
    dev = 0.0
    for ir in (ring_above, ring_above + 1):
        row = np.clip(ir, 1, nrings_map) - 1
        sp_m = rt_map.startpix[row].astype(np.float64)
        np_m = rt_map.ringpix[row].astype(np.float64)
        sp_r = rt_ray.startpix.astype(np.float64)
        np_r = rt_ray.ringpix.astype(np.float64)
        for u in (0.0, 1.0):
            tap = sp_m + u * np_m
            f = (sp_r + u * np_r) / npix_ray
            dev = max(dev, float(np.max(np.abs(tap - f * npix_map))))

    # drift margin: deflection drift_rad in rings (ring spacing >= pi/(4 nside))
    drift_rings = int(np.ceil(drift_rad / (np.pi / (4 * rt_map.nside)))) + 2
    H = int(dev) + 4 + drift_rings * 4 * rt_map.nside
    blk = rt_map.npix // n_shards
    if H > blk:
        # the drift margin no longer fits one neighbor block: taps beyond the
        # window would be silently clamped (soa.interp_and_prop_chunk); warn
        # so the caller can widen shards or check deflections
        import warnings

        warnings.warn(
            f"required_halo truncated: need {H} map pixels but the shard "
            f"block is only {blk}; rays deflected beyond one block will "
            f"read clamped (wrong) pixels. Use fewer shards or set "
            f"CALCLENS_DEBUG_HALO=1 to NaN-poison out-of-window taps.",
            stacklevel=2)
    return min(H, blk)  # window never exceeds 3 blocks


@partial(jax.jit,
         static_argnames=("tab", "born", "mesh", "halo", "ray_order",
                          "map_order"))
def interp_and_prop_sharded(tab, maps6, packed, wp, wpm1, wpm2, born: bool,
                            mesh, halo: int, ray_order: int, map_order: int):
    """Fused ray side on the mesh: maps stay block-sharded, rays sharded.

    maps6  [6, npix]  P(None, AXIS) — equal contiguous RING blocks
    packed [21, N]    P(None, AXIS)
    Returns updated packed [21, N] with the same sharding.
    """
    from ..rays import interp_fast, soa

    n = mesh.devices.size
    npix = maps6.shape[1]
    blk = npix // n
    assert blk * n == npix and packed.shape[1] % n == 0
    H = int(halo)

    def body(maps_blk, ray_blk, wp, wpm1, wpm2):
        # halo exchange: previous shard's last H columns, next shard's first
        # H columns (edge shards receive zeros — never indexed, see module
        # docstring on pole folds)
        left = jax.lax.ppermute(maps_blk[:, blk - H:], AXIS,
                                [(i, i + 1) for i in range(n - 1)])
        right = jax.lax.ppermute(maps_blk[:, :H], AXIS,
                                 [(i + 1, i) for i in range(n - 1)])
        win = jnp.concatenate([left, maps_blk, right], axis=1)
        base = jax.lax.axis_index(AXIS).astype(jnp.int32) * blk - H
        if win.shape[1] > interp_fast.WMAX_DEFAULT and \
                jnp.issubdtype(ray_blk.dtype, jnp.float32):
            # dynamic sub-windows keep every tap gather in the fast
            # (<= 2M px) operand regime — the per-shard window at
            # production orders is ~100M px, the ~57 M idx/s wall that
            # dominated the order-13 projection's ray side
            col_chunk, wc = interp_fast.dynwin_params(ray_order, map_order)
            return interp_fast.interp_and_prop_dynwin(
                tab, win, ray_blk, wp, wpm1, wpm2, born, base, col_chunk,
                wc)
        return soa.interp_and_prop_chunk(tab, win, ray_blk, wp, wpm1, wpm2,
                                         born, pix_base=base)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS), P(), P(), P()),
        out_specs=P(None, AXIS),
    )(maps6, packed, wp, wpm1, wpm2)

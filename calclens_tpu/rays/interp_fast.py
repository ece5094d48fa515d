"""Windowed ray interpolation: the full-sky production fast path.

The ray side's wall is the tap gather (shtpoissonsolve.c:666-705 structure:
four bilinear taps per ray, six field maps per tap).  XLA:TPU's gather runs
~57 M indices/s from HBM-resident tables but ~128 M idx/s when the operand
is <= ~2M pixels (measured on v5e, tools/exp_gather_scan.py /
tools/exp_gather2.py — the lowering switches to a faster table-resident
form).  Full-sky rays are stored in RING order (driver.init_rays), so a
contiguous block of ray rows only ever taps a contiguous band of map rings:
this module splits the rays into static chunks whose tap windows (whole map
rings, plus a drift margin for accumulated deflection) each fit the fast
gather regime, slices the stacked [7, npix] map per chunk, and gathers
locally.

Correctness under drift: window bounds are static (ring geometry of the
UNDEFLECTED grid + `drift_rings` map rings of margin).  Rays deflected
beyond the margin would tap outside their window; those taps are clamped
and COUNTED — the interp returns a violation scalar the driver checks (and
falls back to the global-gather path / raises the margin).  Production
deflections are arcminutes (README.md:31-37 regime); the default margin of
16 map rings covers ~18 arcmin of colatitude drift at NSIDE 4096 — an order
of magnitude above physical deflections.

The per-tap field+geometry pairing reuses the materialized-id defense of
`soa.interp_and_prop_chunk` (the 7th window row carries the pixel id), so a
knife-edge flip still yields a consistent (field, transport, weight) tap
set.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..healpix import core as hp
from ..healpix import jaxhp


# fast-gather operand ceiling (pixels): tables at/below this size gather at
# ~128 M idx/s on v5e vs ~57 M above (tools/exp_gather_scan.py)
WMAX_DEFAULT = 1 << 21


def default_wmax(map_order: int) -> int:
    """Measured v5e sweet spots (tools/profile_rayside.py windowed): at map
    order 11 a 2M window ran 0.878 s vs 0.434 s at 1M (the 2M operand sits
    at the plateau edge); at order 12 both run ~0.60 s but 1M costs 3x the
    chunks (and compile time).  Orders <= 10 fit few chunks either way."""
    return (1 << 20) if map_order <= 11 else (1 << 21)


class WindowedInterpPlan:
    """Static chunk/window table for full-sky rays at `ray_order` against a
    map at `map_order` (host numpy; hashable by identity, cached)."""

    def __init__(self, ray_order: int, map_order: int,
                 drift_rings: int = 16, wmax: int = WMAX_DEFAULT):
        self.ray_order = ray_order
        self.map_order = map_order
        self.drift_rings = drift_rings
        rt_r = hp.build_ring_table(ray_order)
        rt_m = hp.build_ring_table(map_order)
        npix_m = int(rt_m.npix)
        nrings_r = 4 * rt_r.nside - 1
        nrings_m = 4 * rt_m.nside - 1
        sp_m = np.append(rt_m.startpix, npix_m).astype(np.int64)

        # undeflected tap rings per ray ring: ring_above(theta_i) and +1
        # (get_interpol structure); theta-aligned grids make this 4i +- 1,
        # but compute it exactly from the geometry
        z = np.cos(rt_r.theta)
        az = np.abs(z)
        nside_m = rt_m.nside
        ir_cap = (nside_m * np.sqrt(np.maximum(3.0 * (1.0 - az), 0.0))
                  ).astype(np.int64)
        ir_eq = (nside_m * (2.0 - 1.5 * z)).astype(np.int64)
        ra = np.where(az <= 2.0 / 3.0, ir_eq,
                      np.where(z > 0, ir_cap, 4 * nside_m - ir_cap - 1))
        # +-1 on top of drift: the knife-edge ring_above ambiguity at
        # theta-nested grids
        rlo = np.clip(ra - 1 - drift_rings, 1, nrings_m)
        rhi = np.clip(ra + 2 + drift_rings, 1, nrings_m)
        # pole folds tap pixels [0, 4) / [npix-4, npix): covered because
        # rlo(ray ring 1) = 1 and rhi(last) = nrings_m for any drift >= 3

        # greedy chunking over ray rings: grow while the window span fits
        chunks = []  # (row0, row1, w0) ; uniform window width self.W
        i = 1
        wspan = 0
        while i <= nrings_r:
            p_lo = int(sp_m[rlo[i - 1] - 1])
            j = i
            while j <= nrings_r:
                hi = int(sp_m[rhi[j - 1]])
                if hi - p_lo > wmax and j > i:
                    break
                if hi - p_lo > wmax:
                    # single ray ring exceeding wmax (tiny ray order vs huge
                    # map): widen this one window
                    j += 1
                    break
                j += 1
            j -= 1
            p_hi = int(sp_m[rhi[j - 1]])
            row0 = int(rt_r.startpix[i - 1])
            row1 = int(rt_r.startpix[j - 1] + rt_r.ringpix[j - 1])
            chunks.append((row0, row1, p_lo, p_hi))
            wspan = max(wspan, p_hi - p_lo)
            i = j + 1
        self.W = min(wspan, npix_m)
        out = []
        for row0, row1, p_lo, p_hi in chunks:
            # uniform W: extend downward (window may only grow)
            w0 = max(0, min(p_lo, npix_m - self.W))
            out.append((row0, row1, w0))
        self.chunks = tuple(out)
        self.npix_m = npix_m

    def __repr__(self):
        return (f"WindowedInterpPlan(ray={self.ray_order}, "
                f"map={self.map_order}, W={self.W}, "
                f"nchunks={len(self.chunks)})")


_plans = {}


def get_plan(ray_order: int, map_order: int, drift_rings: int = 16,
             wmax: int = WMAX_DEFAULT) -> WindowedInterpPlan:
    key = (ray_order, map_order, drift_rings, wmax)
    p = _plans.get(key)
    if p is None:
        p = _plans[key] = WindowedInterpPlan(ray_order, map_order,
                                             drift_rings, wmax)
    return p


def _gather_tap_fields_grp(chunks, W, maps6, pix4):
    """Per-tap windowed gathers for one super-chunk: maps6 [6, npix] + tap
    ids [4][rows] (row-local to the group) -> (fld4 [4][7, rows] with the
    materialized id as row 6, viol int32 scalar).

    Gathers run per static chunk from a [7, W] window slice so every gather
    operand sits in the fast (<= 2M px) regime.  Out-of-window taps (drift
    beyond the margin) are NaN-poisoned and counted."""
    parts = [[] for _ in range(4)]
    viol = jnp.zeros((), jnp.int32)
    wiota = jnp.arange(W, dtype=jnp.int32)
    for row0, row1, w0 in chunks:
        # id row built PER WINDOW: a global [7, npix] maps7 concat would
        # materialize a second map-sized buffer (5.6 GB at order 12) on top
        # of the resident maps — the difference between the order-12 step
        # fitting HBM and not
        iota = jax.lax.bitcast_convert_type(
            (wiota + jnp.int32(w0)) | jnp.int32(0x40000000), jnp.float32)
        win = jnp.concatenate(
            [jax.lax.slice(maps6, (0, w0), (6, w0 + W)), iota[None, :]],
            axis=0)
        for k in range(4):
            pk = jax.lax.slice(pix4[k], (row0,), (row1,)) - jnp.int32(w0)
            inside = (pk >= 0) & (pk < W)
            viol = viol + jnp.sum(~inside, dtype=jnp.int32)
            pk = jnp.clip(pk, 0, W - 1)
            f = win[:, pk]
            # NaN-poison out-of-window taps: a clamped tap would pair a
            # WRONG pixel's field with its (consistent) geometry — silently
            # inaccurate.  Poisoning fails loudly; raise
            # CALCLENS_INTERP_DRIFT or set CALCLENS_INTERP_WINDOWED=0 if a
            # run ever trips this (margin is ~10x physical deflections).
            f = jnp.where(inside, f, jnp.nan)
            parts[k].append(f)
    fld4 = [jnp.concatenate(p, axis=1) if len(p) > 1 else p[0]
            for p in parts]
    return fld4, viol


def interp_and_prop_dynwin(tab, win6, packed, wp, wpm1, wpm2, born: bool,
                           pix_base, col_chunk: int, wc: int):
    """Dynamic-sub-window interp for a map WINDOW (the sharded halo path,
    parallel/halo.py): win6 [6, Wwin] is a contiguous RING-pixel window
    whose first column is global pixel `pix_base` (a traced scalar —
    per-shard under shard_map); packed [21, rows] are RING-sorted rays
    whose taps lie inside the window.

    Rays are processed in `col_chunk`-column chunks; each chunk's taps are
    gathered from a dynamic sub-window of STATIC width `wc` based at the
    chunk's minimum tap (data-derived, so no per-shard static tables are
    needed — SPMD-safe).  Keeps every gather operand in the fast
    (<= 2M px) regime; the whole-window gather ran ~57 M idx/s at
    production widths (docs/TPU_NOTES.md).  Taps beyond the sub-window
    (per-ray deflection spread > wc - chunk span) are NaN-poisoned like
    the full-sky fast path."""
    from . import soa

    Wwin = win6.shape[1]
    wc = min(wc, Wwin)
    r = packed
    nx, ny, nz = r[0], r[1], r[2]
    rad = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    hx, hy, hz = nx / rad, ny / rad, nz / rad
    theta = jnp.arccos(jnp.clip(hz, -1.0, 1.0))
    phi = jnp.arctan2(hy, hx)
    phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
    pix4, _ = jaxhp.get_interpol_soa(tab, theta, phi)

    rows = r.shape[1]
    base_g = jnp.asarray(pix_base, jnp.int32)
    wiota = jnp.arange(wc, dtype=jnp.int32)
    parts = [[] for _ in range(4)]
    for c0 in range(0, rows, col_chunk):
        c1 = min(c0 + col_chunk, rows)
        pk = [jax.lax.slice(pix4[k], (c0,), (c1,)) for k in range(4)]
        mn = jnp.minimum(jnp.minimum(jnp.min(pk[0]), jnp.min(pk[1])),
                         jnp.minimum(jnp.min(pk[2]), jnp.min(pk[3])))
        base_c = jnp.clip(mn - base_g, 0, Wwin - wc)
        sub = jax.lax.dynamic_slice(win6, (jnp.int32(0), base_c), (6, wc))
        iota = jax.lax.bitcast_convert_type(
            (wiota + base_c + base_g) | jnp.int32(0x40000000), jnp.float32)
        win7 = jnp.concatenate([sub, iota[None, :]], axis=0)
        for k in range(4):
            local = pk[k] - (base_g + base_c)
            inside = (local >= 0) & (local < wc)
            f = win7[:, jnp.clip(local, 0, wc - 1)]
            parts[k].append(jnp.where(inside, f, jnp.nan))
    fld4 = [jnp.concatenate(p, axis=1) if len(p) > 1 else p[0]
            for p in parts]
    return soa._finish_from_fields(tab, fld4, r, theta, phi, hx, hy, hz,
                                   wp, wpm1, wpm2, born)


def dynwin_params(ray_order: int, map_order: int, drift_rings: int = 8,
                  wc: int = None):
    """(col_chunk, wc) for interp_and_prop_dynwin: the chunk's tap spread
    is its ray span times the pixel ratio plus ring-quantization slack plus
    the per-ray deflection spread (drift_rings map rings both ways)."""
    wc = wc or WMAX_DEFAULT
    q = max(1, 4 ** (map_order - ray_order))
    nside_m = 1 << map_order
    margin = 2 * (drift_rings + 3) * 4 * nside_m
    col_chunk = max((wc - margin) // q, 1 << 14)
    # if the chunk floor binds, widen wc so the window still covers the
    # chunk's span (tiny wc only occurs under test overrides)
    wc = max(wc, col_chunk * q + margin)
    return col_chunk, wc


# max rays whose gathered tap fields ([4, 7, rows] f32) are materialized at
# once: bounds the fast path's transient to ~1.9 GB (ray orders >= 11
# exceeded HBM with the whole-buffer form)
ROWS_SUPER = 1 << 24


def interp_and_prop_fullsky(tab, maps, packed, wp, wpm1, wpm2, born: bool,
                            wplan: WindowedInterpPlan):
    """Windowed-gather version of `soa.interp_and_prop_chunk` for full-sky
    RING-ordered rays on a single chip.  Returns (packed', viol) where viol
    counts taps that fell outside their static window (0 in any physical
    run; nonzero means the drift margin must be raised and the plane redone
    via the global path).

    Bit-identical to the global-gather path when viol == 0: the same pixels
    are gathered (just through per-chunk window slices) and the downstream
    math is shared (`soa._finish_from_fields`)."""
    from . import soa

    maps6 = maps if isinstance(maps, jnp.ndarray) else jnp.stack(
        [maps.pot, maps.gt, maps.gp, maps.gtt, maps.gtp, maps.gpp])

    # group window-chunks into super-chunks of <= ROWS_SUPER rows; each
    # group's gathers AND tap math run before the next group's, bounding
    # the [4, 7, rows] field transient
    groups = []
    cur = []
    rows = 0
    for ch in wplan.chunks:
        if cur and rows + (ch[1] - ch[0]) > ROWS_SUPER:
            groups.append(cur)
            cur, rows = [], 0
        cur.append(ch)
        rows += ch[1] - ch[0]
    groups.append(cur)

    outs = []
    viol = jnp.zeros((), jnp.int32)
    for grp in groups:
        row0, row1 = grp[0][0], grp[-1][1]
        r = jax.lax.slice(packed, (0, row0), (packed.shape[0], row1))
        nx, ny, nz = r[0], r[1], r[2]
        rad = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        hx, hy, hz = nx / rad, ny / rad, nz / rad
        theta = jnp.arccos(jnp.clip(hz, -1.0, 1.0))
        phi = jnp.arctan2(hy, hx)
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        pix4, _ = jaxhp.get_interpol_soa(tab, theta, phi)
        grp0 = tuple((a - row0, b - row0, w0) for a, b, w0 in grp)
        fld4, v = _gather_tap_fields_grp(grp0, wplan.W, maps6, pix4)
        viol = viol + v
        outs.append(soa._finish_from_fields(
            tab, fld4, r, theta, phi, hx, hy, hz, wp, wpm1, wpm2, born))
    out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    return out, viol

"""SHT plan: static host-built tables for a given HEALPix order.

TPU-native replacement for the reference's ``healpixsht_plan``
(healpix_shtrans.c:54-160).  Where the reference plans a ring/m MPI
decomposition with a polynomial cost model, the TPU formulation is dense and
statically shaped: every per-ring quantity becomes a padded device array, the
ring<->m "transpose" becomes an axis choice in sharded matmuls (map space is
sharded by rings, harmonic space by m; `lax.all_to_all` converts between the
two in the multi-chip path), and load balance is exact by construction because
per-ring compute is uniform after padding.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..healpix import core as hp


class SHTPlan:
    """Static geometry + device tables for spherical-harmonic transforms.

    Parameters
    ----------
    order : HEALPix order of the map (nside = 2**order).
    lmax : band limit; defaults to 3*nside - 1 (reference healpix_shtrans.c:518).
    dtype : jnp.float32 or jnp.float64 (CPU tests).
    ring_weights : optional [4*nside] array of quadrature ring-weight
        corrections w_r (the reference's ring weight files store w_r - 1...
        here pass the full multiplicative correction, 1.0 = uniform).
    """

    def __init__(self, order, lmax=None, dtype=jnp.float32, ring_weights=None,
                 ring_block=None, lblock=16, window=None, mesh=None):
        self.order = int(order)
        self.nside = nside = 1 << self.order
        assert nside <= 8192, "CZT int32 phase arithmetic requires nside <= 8192"
        self.npix = int(hp.order2npix(order))
        self.lmax = int(lmax) if lmax is not None else 3 * nside - 1
        self.nm = self.lmax + 1
        self.nl = self.lmax + 1
        self.nrings = 4 * nside - 1
        self.J = 2 * nside  # number of northern ring pairs incl. equator
        self.P = 4 * nside  # max pixels per ring (padded ring length)
        self.L = 8 * nside  # CZT FFT length (>= P + max(P, nm) - 1)
        self.dtype = dtype
        self.cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
        self.lblock = int(lblock)
        if ring_block is None:
            ring_block = max(64, min(4096, (1 << 26) // self.L))
        # never pad beyond one block over the true ring count
        ring_block = min(ring_block, ((self.nrings + 63) // 64) * 64)
        # pad rings to a multiple of ring_block for lax.map chunking
        self.ring_block = int(ring_block)
        self.nrings_pad = ((self.nrings + ring_block - 1) // ring_block) * ring_block

        rt = hp.build_ring_table(order)
        self.rt = rt

        # --- host tables ---
        npr = np.zeros(self.nrings_pad, dtype=np.int64)
        npr[: self.nrings] = rt.ringpix
        npr[self.nrings:] = 4  # harmless dummy rings (masked out)
        self.npix_ring = npr
        start = np.zeros(self.nrings_pad, dtype=np.int64)
        start[: self.nrings] = rt.startpix
        self.startpix = start
        shifted = np.zeros(self.nrings_pad, dtype=np.int64)
        shifted[: self.nrings] = rt.shifted.astype(np.int64)
        self.shift_host = shifted
        theta = np.full(self.nrings_pad, np.pi / 2, dtype=np.float64)
        theta[: self.nrings] = rt.theta
        self.theta_host = theta

        # flat gather index: map[npix] -> ring matrix [nrings_pad, P]
        ringidx = np.zeros((self.nrings_pad, self.P), dtype=np.int64)
        ringmask = np.zeros((self.nrings_pad, self.P), dtype=bool)
        for r in range(self.nrings):
            n = rt.ringpix[r]
            ringidx[r, :n] = rt.startpix[r] + np.arange(n)
            ringmask[r, :n] = True
        assert self.npix < 2**31, "device int32 gather limit"
        self.ring_gather = np.asarray(ringidx, dtype=np.int32)
        self._ringidx_host = ringidx
        self.ring_mask = np.asarray(ringmask)

        # inverse: ring matrix flattened [nrings_pad * P] -> map[npix]
        flat = np.zeros(self.npix, dtype=np.int64)
        for r in range(self.nrings):
            n = rt.ringpix[r]
            flat[rt.startpix[r]: rt.startpix[r] + n] = r * self.P + np.arange(n)
        self.map_gather = np.asarray(flat, dtype=np.int64 if self.nrings_pad * self.P >= 2**31 else np.int32)

        # quadrature weights: 4pi/npix times optional ring correction
        w = np.full(self.nrings_pad, 4.0 * np.pi / self.npix, dtype=np.float64)
        if ring_weights is not None:
            rw = np.asarray(ring_weights, dtype=np.float64)
            # ring_weights indexed by pair (0..2nside-1); expand to all rings
            pair = np.minimum(np.arange(self.nrings), self.nrings - 1 - np.arange(self.nrings))
            w[: self.nrings] *= rw[pair]
        w[self.nrings:] = 0.0
        self.qweight_host = w

        # --- northern-half tables (pair index j: ring j north, ring
        #     nrings-1-j south; j == J-1 is the equator, its own partner) ---
        jj = np.arange(self.J)
        th = rt.theta[jj]
        ndt = np.dtype(dtype)
        self.cth = np.asarray(np.cos(th), dtype=ndt)
        self.sth = np.asarray(np.sin(th), dtype=ndt)
        self.cot = np.asarray(np.cos(th) / np.sin(th), dtype=ndt)
        self.inv_sth = np.asarray(1.0 / np.sin(th), dtype=ndt)
        # ln(sin theta) evaluated in f64 then stored: the MXU kernel's
        # log2-space diagonal seed multiplies this by m (up to ~24575), so
        # ln(f32(sin)) would lose ~1e-3 absolute accuracy at high m
        self.ln_sth = np.asarray(np.log(np.sin(th)), dtype=np.float32)
        self.wN = np.asarray(w[jj], dtype=ndt)
        wS = w[self.nrings - 1 - jj].copy()
        wS[self.J - 1] = 0.0  # equator has no southern partner
        self.wS = np.asarray(wS, dtype=ndt)

        # per-ring dtype tables on device
        self.theta_dev = np.asarray(theta, dtype=ndt)
        self.sth_ring = np.asarray(np.sin(theta), dtype=ndt)
        self.cot_ring = np.asarray(np.cos(theta) / np.sin(theta), dtype=ndt)
        self.n_dev = np.asarray(npr, dtype=np.int32)
        self.shift_dev = np.asarray(shifted, dtype=np.int32)
        self.qweight_dev = np.asarray(w, dtype=ndt)

        # m index vector
        self.m_int = np.arange(self.nm, dtype=np.int32)
        self.m_f = np.arange(self.nm, dtype=ndt)

        # optional l-space window b_l (pixel window / smoothing beam — the
        # reference's plan.window_function, healpix_shtrans.h:30-45); None
        # means no window is applied in the Poisson filter.
        if window is not None:
            wl = np.ones(self.nl, dtype=np.float64)
            wa = np.asarray(window, dtype=np.float64)
            wl[: min(self.nl, len(wa))] = wa[: self.nl]
            self.window_dev = np.asarray(wl, dtype=np.dtype(dtype))
        else:
            self.window_dev = None

        # None = auto (Pallas Legendre kernels on TPU f32); True/False forces
        self.use_pallas = None

        # optional device mesh: transforms add with_sharding_constraint at the
        # ring-space / m-space boundaries so GSPMD inserts the ring<->m
        # all-to-all (the reference's MPI transpose) over ICI
        if mesh is not None:
            from ..parallel.sharding import ShardingPlan

            self.spec = ShardingPlan(mesh)
        else:
            self.spec = None

    # The index arrays below are computed IN-GRAPH from [nrings]-sized host
    # tables instead of being embedded as O(npix) constants: at high orders
    # constant index tables blow the compiled program size (hundreds of MB).

    def _pix2ring_ingraph(self):
        """(ring index, offset in ring) per map pixel, computed on device."""
        p = jnp.arange(self.npix, dtype=jnp.int32)
        sp = jnp.asarray(self.startpix[: self.nrings], jnp.int32)
        r = jnp.searchsorted(sp, p, side="right") - 1
        return r, p - sp[r]

    def rings_to_map(self, X):
        """[..., nrings_pad, P] ring matrix -> [..., npix] RING-ordered map."""
        r, off = self._pix2ring_ingraph()
        idx = r * self.P + off
        flatX = X.reshape(X.shape[:-2] + (self.nrings_pad * self.P,))
        return jnp.take(flatX, idx, axis=-1)

    def map_to_rings(self, m):
        """[..., npix] RING-ordered map -> [..., nrings_pad, P] (zero padded)."""
        sp = jnp.asarray(self.startpix, jnp.int32)
        npr = jnp.asarray(self.npix_ring, jnp.int32)
        j = jnp.arange(self.P, dtype=jnp.int32)
        rows = jnp.arange(self.nrings_pad, dtype=jnp.int32)
        mask = (j[None, :] < npr[:, None]) & (rows[:, None] < self.nrings)
        idx = jnp.where(mask, sp[:, None] + j[None, :], 0)
        X = jnp.take(m, idx.reshape(-1), axis=-1)
        X = X.reshape(m.shape[:-1] + (self.nrings_pad, self.P))
        return jnp.where(mask, X, 0)

"""Ring-space DFT stage, v2 (replaces the uniform chirp-Z formulation).

HEALPix ring lengths are 4i (polar caps, i < nside) and 4*nside (equatorial
belt, 2*nside+1 of the 4*nside-1 rings).  Exploiting that structure:

  * equatorial belt: one batched real FFT of length P = 4*nside — no chirp-Z
    at all; analysis recovers m > P/2 from Hermitian symmetry, synthesis is
    an irfft of the (m < nm < P) spectrum;
  * polar caps: rings bucketed by length octave; each bucket runs a chirp-Z
    (czt.py) with K = max ring length in the bucket and FFT length
    L = 2*n_max — a ring of length n only needs its own n DFT values, since
    G_m is n-periodic in m (analysis replicates by m mod n; synthesis folds
    q_m into m mod n bins first).

Versus the uniform CZT (three length-8*nside FFTs for every ring) this is a
~4x FLOP reduction, and the cost structure matches the reference's
per-ring-length FFTW plans (healpix_shtrans.c:168-205) the TPU way: a few
large static-shape batched FFTs instead of thousands of tiny ones.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .czt import czt
from ..healpix import core as hp


def _pad_rows(n, mult=8):
    return ((n + mult - 1) // mult) * mult


class RingStage:
    """Host-built tables + device methods for map <-> per-ring Fourier modes.

    G layout: [nrings_pad, nm] complex, ring r at row r (same contract as the
    uniform-CZT path, so fold_pairs/unfold_pairs are unchanged).
    """

    def __init__(self, order, nm, nrings_pad, dtype=jnp.float32,
                 min_bucket_n=64):
        self.order = order
        self.nside = nside = 1 << order
        self.P = P = 4 * nside
        self.nm = nm
        self.nrings = 4 * nside - 1
        self.nrings_pad = nrings_pad
        self.dtype = dtype
        self.cdtype = jnp.complex64 if dtype == jnp.float32 else jnp.complex128

        rt = hp.build_ring_table(order)
        ringpix = rt.ringpix
        startpix = rt.startpix
        shifted = rt.shifted

        rings = np.arange(self.nrings)
        eq = ringpix == P
        self.eq_rows = rings[eq]
        cap_rows = rings[~eq]

        # --- equatorial gather [n_eq_pad, P] ---
        ne = len(self.eq_rows)
        self.ne_pad = _pad_rows(ne)
        gi = np.zeros((self.ne_pad, P), dtype=np.int64)
        for k, r in enumerate(self.eq_rows):
            gi[k] = startpix[r] + np.arange(P)
        self.eq_gather = gi.astype(np.int32)
        self.eq_rows_pad = np.concatenate(
            [self.eq_rows, np.full(self.ne_pad - ne, self.nrings_pad - 1)])
        self.eq_valid = np.arange(self.ne_pad) < ne

        # --- cap buckets by length octave ---
        self.buckets = []
        if len(cap_rows):
            nmax_all = int(ringpix[cap_rows].max())
            hi = 1 << int(np.ceil(np.log2(nmax_all)))
            while True:
                lo = hi // 2
                if lo <= min_bucket_n:
                    sel = cap_rows[ringpix[cap_rows] <= hi]
                else:
                    sel = cap_rows[(ringpix[cap_rows] > lo)
                                   & (ringpix[cap_rows] <= hi)]
                if len(sel):
                    self.buckets.append(self._make_bucket(sel, int(hi),
                                                          ringpix, startpix))
                if lo <= min_bucket_n:
                    break
                hi = lo
        # quick sanity: every ring appears exactly once
        covered = set(self.eq_rows.tolist())
        for b in self.buckets:
            covered.update(b["rows"].tolist())
        assert len(covered) == self.nrings

        # phases e^{+-i m phi0} per canonical ring row [nrings_pad, nm]
        m = np.arange(nm)
        ph = np.zeros((nrings_pad, nm))
        for r in range(self.nrings):
            if shifted[r]:
                ph[r] = np.pi * m / ringpix[r]
        self._phase_ang = ph

        # map scatter for synthesis: map[npix] built by one gather from the
        # concatenation [eq X (ne_pad*P) | bucket0 X (rows0*n0) | ...]
        npix = int(hp.order2npix(order))
        src = np.zeros(npix, dtype=np.int64)
        off_eq = 0
        for k, r in enumerate(self.eq_rows):
            src[startpix[r]: startpix[r] + P] = off_eq + k * P + np.arange(P)
        off = self.ne_pad * P
        for b in self.buckets:
            nmax = b["nmax"]
            for k, r in enumerate(b["rows"]):
                n = ringpix[r]
                src[startpix[r]: startpix[r] + n] = off + k * nmax + np.arange(n)
            off += b["rows_pad"] * nmax
        self.map_src = src.astype(np.int64 if off >= 2**31 else np.int32)
        self.total_len = off

    def _make_bucket(self, rows, nmax, ringpix, startpix):
        nr = len(rows)
        nr_pad = _pad_rows(nr)
        gi = np.zeros((nr_pad, nmax), dtype=np.int64)
        mask = np.zeros((nr_pad, nmax), dtype=bool)
        nvec = np.full(nr_pad, nmax, dtype=np.int32)  # dummies at nmax: keeps
        # the synthesis fold depth (jmax) tied to real ring lengths
        for k, r in enumerate(rows):
            n = ringpix[r]
            gi[k, :n] = startpix[r] + np.arange(n)
            mask[k, :n] = True
            nvec[k] = n
        L = 2 * nmax
        return dict(rows=rows, rows_pad=nr_pad, nmax=nmax, gather=gi.astype(np.int32),
                    mask=mask, n=nvec, L=L,
                    rows_dev=np.concatenate(
                        [rows, np.full(nr_pad - nr, self.nrings_pad - 1)]
                    ).astype(np.int32),
                    valid=np.arange(nr_pad) < nr)

    # ------------------------------------------------------------------
    def analysis(self, maps):
        """RING map(s) [..., npix] -> G [..., nrings_pad, nm] complex.

        G[r, m] = e^{-i m phi0_r} * DFT_{n_r}(x_r)[m mod n_r]
        """
        nm, P = self.nm, self.P
        lead = maps.shape[:-1]
        out = jnp.zeros(lead + (self.nrings_pad, nm), dtype=self.cdtype)

        # equatorial belt: batched rfft + Hermitian unfold to m < nm
        Xe = jnp.take(maps, self.eq_gather.reshape(-1), axis=-1)
        Xe = Xe.reshape(lead + (self.ne_pad, P))
        Fh = jnp.fft.rfft(Xe, axis=-1)              # [..., ne_pad, P/2+1]
        mi = np.arange(nm)
        lowm = mi <= P // 2
        idx = np.where(lowm, mi, P - mi).astype(np.int32)
        Ge = jnp.take(Fh, idx, axis=-1)
        Ge = jnp.where(np.asarray(lowm), Ge, jnp.conj(Ge))
        out = out.at[..., self.eq_rows_pad[self.eq_valid], :].set(
            Ge[..., self.eq_valid, :])

        # cap buckets: CZT to n_max freqs, replicate by m mod n
        for b in self.buckets:
            Xb = jnp.take(maps, b["gather"].reshape(-1), axis=-1)
            Xb = Xb.reshape(lead + (b["rows_pad"], b["nmax"]))
            Xb = jnp.where(np.asarray(b["mask"]), Xb, 0)
            Xf = Xb.reshape((-1, b["rows_pad"], b["nmax"]))
            Gs = []
            for i in range(Xf.shape[0]):
                Gs.append(czt(Xf[i], jnp.asarray(b["n"]), K=b["nmax"],
                              L=b["L"], sign=-1, cdtype=self.cdtype))
            Gb = jnp.stack(Gs).reshape(lead + (b["rows_pad"], b["nmax"]))
            mmod = np.mod(np.arange(nm)[None, :], b["n"][:, None]).astype(np.int32)
            Gb = jnp.take_along_axis(
                Gb, jnp.broadcast_to(mmod, lead + mmod.shape), axis=-1)
            out = out.at[..., b["rows_dev"][b["valid"]], :].set(
                Gb[..., b["valid"], :])

        return out * self._phase(-1)

    def synthesis(self, Q):
        """Q [..., nrings_pad, nm] -> RING map(s) [..., npix] (real)."""
        nm, P = self.nm, self.P
        lead = Q.shape[:-2]
        wfold = np.where(np.arange(nm) == 0, 1.0, 2.0)
        Y = Q * jnp.asarray(wfold, self.dtype) * self._phase(+1)

        pieces = []
        # equatorial: Hermitian half-spectrum then irfft.  Modes with
        # m > P/2 alias: Re[a_m e^{2pi i m p/P}] = Re[conj(a_m) e^{2pi i (P-m) p/P}]
        Ye = Y[..., self.eq_rows_pad, :]
        nlo = min(nm, P // 2 + 1)
        half = jnp.zeros(lead + (self.ne_pad, P // 2 + 1), dtype=Y.dtype)
        low = jnp.concatenate([Ye[..., :1], 0.5 * Ye[..., 1:nlo]], axis=-1)
        if nlo == P // 2 + 1:
            # irfft does not double the Nyquist bin: keep a_{P/2} whole
            low = low.at[..., -1].set(Ye[..., P // 2])
        half = half.at[..., :nlo].set(low)
        if nm > P // 2 + 1:
            hi_m = np.arange(P // 2 + 1, nm)
            half = half.at[..., P - hi_m].add(0.5 * jnp.conj(Ye[..., hi_m]))
        Xe = jnp.fft.irfft(half, n=P, axis=-1) * P
        pieces.append(Xe.astype(self.dtype).reshape(lead + (-1,)))

        for b in self.buckets:
            Yb = Y[..., b["rows_dev"], :]
            # fold m into m mod n bins (q is n-periodic in the synthesis sum)
            nmax = b["nmax"]
            nreal = b["n"][b["valid"]]
            jmax = int(np.ceil(nm / int(nreal.min()))) if len(nreal) else 1
            bidx = np.arange(nmax)[None, :, None]
            jj = np.arange(jmax)[None, None, :]
            src = bidx + jj * b["n"][:, None, None]          # [rows, nmax, jmax]
            ok = (src < nm) & (bidx < b["n"][:, None, None])
            srcc = np.where(ok, src, 0).astype(np.int32).reshape(b["rows_pad"], -1)
            idxb = jnp.broadcast_to(jnp.asarray(srcc),
                                    lead + (b["rows_pad"], nmax * jmax))
            g = jnp.take_along_axis(Yb, idxb, axis=-1)
            g = jnp.where(np.asarray(ok.reshape(b["rows_pad"], -1)), g, 0)
            qf = jnp.sum(g.reshape(lead + (b["rows_pad"], nmax, jmax)), axis=-1)
            # inverse DFT at the ring's own n points via CZT (+1 sign)
            qff = qf.reshape((-1, b["rows_pad"], nmax))
            Xs = []
            for i in range(qff.shape[0]):
                Xs.append(czt(qff[i], jnp.asarray(b["n"]), K=nmax,
                              L=b["L"], sign=+1, cdtype=self.cdtype))
            Xb = jnp.real(jnp.stack(Xs)).reshape(lead + (b["rows_pad"], nmax))
            pieces.append(Xb.astype(self.dtype).reshape(lead + (-1,)))

        allv = jnp.concatenate(pieces, axis=-1)
        return jnp.take(allv, self.map_src, axis=-1)

    def _phase(self, sign):
        ph = sign * self._phase_ang[:, : self.nm]
        return jnp.asarray(np.cos(ph) + 1j * np.sin(ph), self.cdtype)

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

All O(npix)/O(nrings*nm) index and phase arrays are computed in-graph from
[nrings]-sized tables — large literal constants blow up the compiled-program
size at high orders.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .czt import czt
from ..healpix import core as hp


def _pad_rows(n, mult=8):
    return ((n + mult - 1) // mult) * mult


def _next_fft_len(n: int) -> int:
    """Smallest 2^k or 3*2^k >= n (XLA FFT handles both efficiently)."""
    p2 = 1 << (int(n) - 1).bit_length()
    p3 = 3 * (1 << max((int(n) - 1) // 3, 1).bit_length())
    while p3 < n:
        p3 *= 2
    return min(p2, p3)


class RingStage:
    """Host-built (small) tables + device methods for map <-> ring modes.

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
        self.npix = int(hp.order2npix(order))

        rt = hp.build_ring_table(order)
        self.startpix = rt.startpix.astype(np.int64)
        self.ringpix = rt.ringpix.astype(np.int64)
        self.shifted = rt.shifted.copy()

        rings = np.arange(self.nrings)
        eq = self.ringpix == P
        self.eq_rows = rings[eq]
        cap_rows = rings[~eq]

        ne = len(self.eq_rows)
        self.ne_pad = _pad_rows(ne)
        self.eq_rows_pad = np.concatenate(
            [self.eq_rows, np.full(self.ne_pad - ne, self.nrings_pad - 1)])
        self.eq_valid = np.arange(self.ne_pad) < ne
        # padded rows read pixel 0 harmlessly (they are never scattered back)
        self.eq_start = np.concatenate(
            [self.startpix[self.eq_rows], np.zeros(self.ne_pad - ne, np.int64)])

        # --- cap buckets by length octave ---
        self.buckets = []
        if len(cap_rows):
            nmax_all = int(self.ringpix[cap_rows].max())
            hi = 1 << int(np.ceil(np.log2(nmax_all)))
            while True:
                lo = hi // 2
                if lo <= min_bucket_n:
                    sel = cap_rows[self.ringpix[cap_rows] <= hi]
                else:
                    sel = cap_rows[(self.ringpix[cap_rows] > lo)
                                   & (self.ringpix[cap_rows] <= hi)]
                if len(sel):
                    self.buckets.append(self._make_bucket(sel, int(hi)))
                if lo <= min_bucket_n:
                    break
                hi = lo
        covered = set(self.eq_rows.tolist())
        for b in self.buckets:
            covered.update(b["rows"].tolist())
        assert len(covered) == self.nrings

        # per-ring sin(theta) (host, closed form) for the turning-point m
        # cutoff: analysis columns m > m_cutoff(lmax, sth_r) multiply an
        # underflowed lambda in the Legendre stage, so cap chirp-Zs only
        # need K = m_cutoff frequencies (margin validated in
        # tests/test_mcut.py)
        r1 = rings + 1  # 1-based ring index from the north pole
        z = np.where(
            r1 < nside, 1.0 - r1**2 / (3.0 * nside**2),
            np.where(r1 > 3 * nside,
                     (4 * nside - r1) ** 2 / (3.0 * nside**2) - 1.0,
                     4.0 / 3.0 - 2.0 * r1 / (3.0 * nside)))
        self.sth_allrings = np.sqrt(np.maximum(1.0 - z * z, 0.0))

        # --- analysis buckets: grouped by the padded FFT length needed to
        # emit the first K = m_cutoff(lmax, sth) frequencies directly (the
        # chirp DFT is m-periodic by construction, so direct emission
        # replaces the per-bucket m-mod-n replication gather — ~nrings*nm
        # gathered elements — and the cutoff bounds K without error at f32:
        # the dropped columns face an underflowed lambda).  Rings whose
        # L = next_fft_len(n + K - 1) coincides share one chirp-Z call
        # (each call has a large fixed overhead on TPU, docs/TPU_NOTES.md).
        # the analysis cap rows are fetched with an ALIGNED BLOCK gather:
        # row r's pixels live at the contiguous range [startpix_r,
        # startpix_r + n_r), so gathering whole B-pixel blocks of the map
        # costs 1/B the gather indices (the ~110 M elem/s gather wall was
        # ~1.7 s of the NSIDE 4096 analysis); the row content then sits at
        # offset d_r = startpix_r mod B, which shifts the ring DFT by an
        # exact per-ring phase e^{-2i pi d m / n} — folded into the phi0
        # phase table (ashift below) for free.
        self.B = min(128, 1 << (2 * order + 2))
        B = self.B
        assert self.npix % B == 0
        self.abuckets = []
        if len(cap_rows):
            from .transforms import m_cutoff

            Kr = np.array([m_cutoff(nm - 1, self.sth_allrings[r], nm,
                                    granularity=256)
                           for r in cap_rows])
            # +B: the block-gathered content of a row ends at d + n < n + B
            Lkey = np.array([_next_fft_len(int(n) + B + int(K) - 1)
                             for n, K in zip(self.ringpix[cap_rows], Kr)])
            for L in np.unique(Lkey):
                sel = cap_rows[Lkey == L]
                b = self._make_bucket(sel, int(self.ringpix[sel].max()))
                b["L"] = int(L)
                b["K"] = int(Kr[Lkey == L].max())
                b["Nk"] = b["nmax"] + B  # true max content end
                assert b["L"] >= b["Nk"] + b["K"] - 1, b
                # aligned block-gather tables
                nbl = (b["nmax"] - 1) // B + 2
                b["nbl"] = nbl
                # czt zero-pads the [rows, nbl*B] input into length L: at
                # tiny orders the padded block width can exceed the
                # content-based L (B dominates n + K)
                b["L"] = max(b["L"], _next_fft_len(nbl * B))
                bstart = np.zeros(b["rows_pad"], np.int64)
                bstart[: len(b["rows"])] = self.startpix[b["rows"]] // B
                bidx = np.minimum(bstart[:, None] + np.arange(nbl)[None, :],
                                  self.npix // B - 1)
                b["bidx"] = bidx.astype(np.int64)
                d = np.zeros(b["rows_pad"], np.int64)
                d[: len(b["rows"])] = self.startpix[b["rows"]] % B
                b["d"] = d
                self.abuckets.append(b)

        # analysis phase table: phi0 shift MINUS the block-gather offset
        # correction (2*d_r in half-pixel units of pi/n_r); exact int
        # arithmetic (the m*shift product is reduced mod 2n before the
        # float conversion, keeping cos/sin arguments small)
        ash = np.zeros(nrings_pad, dtype=np.int64)
        ash[: self.nrings] = self.shifted.astype(np.int64)
        for b in self.abuckets:
            rows = b["rows"]
            ash[rows] -= 2 * b["d"][: len(rows)]
        self.ashift_allrows = ash

        # per-ring row base inside the concatenated synthesis output
        base = np.zeros(self.nrings, dtype=np.int64)
        for k, r in enumerate(self.eq_rows):
            base[r] = k * P
        off = self.ne_pad * P
        for b in self.buckets:
            for k, r in enumerate(b["rows"]):
                base[r] = off + k * b["nmax"]
            off += b["rows_pad"] * b["nmax"]
        self.piece_base = base
        self.total_len = off

        # per-ring n for the phase computation, padded rows harmless
        npad = np.full(nrings_pad, P, dtype=np.int64)
        npad[: self.nrings] = self.ringpix
        self.n_allrows = npad
        sh = np.zeros(nrings_pad, dtype=np.float64)
        sh[: self.nrings] = self.shifted.astype(np.float64)
        self.shift_allrows = sh

    def _make_bucket(self, rows, nmax):
        nr = len(rows)
        nr_pad = _pad_rows(nr)
        nvec = np.full(nr_pad, nmax, dtype=np.int32)
        nvec[:nr] = self.ringpix[rows]
        start = np.zeros(nr_pad, dtype=np.int64)
        start[:nr] = self.startpix[rows]
        return dict(rows=rows, rows_pad=nr_pad, nmax=nmax, n=nvec, L=2 * nmax,
                    start=start,
                    rows_dev=np.concatenate(
                        [rows, np.full(nr_pad - nr, self.nrings_pad - 1)]
                    ).astype(np.int32),
                    valid=np.arange(nr_pad) < nr)

    # ------------------------------------------------------------------
    def _phase(self, sign):
        """e^{sign*i*m*phi0_r} [nrings_pad, nm], computed in-graph."""
        m = jnp.arange(self.nm, dtype=self.dtype)
        n = jnp.asarray(self.n_allrows, self.dtype)
        sh = jnp.asarray(self.shift_allrows, self.dtype)
        ang = (sign * jnp.pi) * sh[:, None] * m[None, :] / n[:, None]
        return (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(self.cdtype)

    def _phase_analysis(self):
        """e^{-i pi m (shift - 2 d)/n} [nrings_pad, nm]: the phi0 phase with
        the block-gather offset correction folded in; the integer m*shift
        product is reduced mod 2n BEFORE the float conversion so the cos/sin
        arguments stay small (exact for |shift| < B <= 128, m < 2^24/2B)."""
        m = jnp.arange(self.nm, dtype=jnp.int64 if jax.config.jax_enable_x64
                       else jnp.int32)
        n = jnp.asarray(self.n_allrows, m.dtype)[:, None]
        sh = jnp.asarray(self.ashift_allrows, m.dtype)[:, None]
        t = (m[None, :] * sh) % (2 * n)  # non-negative (python mod)
        ang = (-jnp.pi) * (t.astype(self.dtype) / n.astype(self.dtype))
        return (jnp.cos(ang) + 1j * jnp.sin(ang)).astype(self.cdtype)

    def _gather_rows_blocked(self, maps, b):
        """Aligned block-row gather for analysis bucket b: [..., rows_pad,
        nbl*B] with row r's ring pixels at columns [d_r, d_r + n_r) and
        zeros elsewhere."""
        B = self.B
        mr = maps.reshape(maps.shape[:-1] + (self.npix // B, B))
        X = jnp.take(mr, jnp.asarray(b["bidx"].reshape(-1)), axis=-2)
        X = X.reshape(maps.shape[:-1] + (b["rows_pad"], b["nbl"] * B))
        itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        j = jnp.arange(b["nbl"] * B, dtype=itype)[None, :]
        d = jnp.asarray(b["d"], itype)[:, None]
        nn = jnp.asarray(b["n"], itype)[:, None]
        return jnp.where((j >= d) & (j < d + nn), X, 0)

    def _gather_rows(self, maps, start, width, nvec=None):
        """maps[..., npix] -> [..., rows, width] rows starting at start[r]."""
        # int32 holds npix up to order 13 (NSIDE 8192, npix ~ 8e8 < 2^31);
        # use int64 only when the runtime actually provides it (x64 mode)
        itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        j = jnp.arange(width, dtype=itype)
        idx = jnp.asarray(np.asarray(start, itype))[:, None] + j[None, :]
        if nvec is not None:
            mask = j[None, :] < jnp.asarray(nvec, itype)[:, None]
            idx = jnp.where(mask, idx, 0)
        X = jnp.take(maps, idx.reshape(-1), axis=-1)
        X = X.reshape(maps.shape[:-1] + idx.shape)
        if nvec is not None:
            X = jnp.where(mask, X, 0)
        return X

    def analysis(self, maps):
        """RING map(s) [..., npix] -> G [..., nrings_pad, nm] complex.

        G[r, m] = e^{-i m phi0_r} * DFT_{n_r}(x_r)[m mod n_r]

        Assembled by CONCATENATION in ring order — every piece (each cap
        bucket's north side, the belt, each bucket's south side) covers a
        contiguous ring range, so no [nrings, nm] scatter is needed
        (TPU scatter-set runs ~25M elem/s: it was ~5 s of the NSIDE 4096
        analysis).  The belt rows are likewise a contiguous pixel slice of
        the RING map (reshape, not gather).
        """
        nm, P = self.nm, self.P
        lead = maps.shape[:-1]
        nlead = int(np.prod(lead)) if lead else 1

        # equatorial belt: contiguous pixel slice + batched rfft + Hermitian
        # unfold to m < nm
        ne = len(self.eq_rows)
        p0 = int(self.startpix[self.eq_rows[0]])
        Xe = maps[..., p0: p0 + ne * P].reshape(lead + (ne, P))
        Fh = jnp.fft.rfft(Xe, axis=-1)              # [..., ne, P/2+1]
        H = P // 2 + 1
        if nm <= H:
            # all modes are in the rfft half-spectrum directly (always true
            # for lmax <= 2*nside): a pure slice, no gather/conj pass
            Ge = Fh[..., :nm]
        else:
            # m in [H, nm) aliases to conj(Fh[P - m]); the sources P - m are
            # the REVERSED contiguous column range (P - nm, P - H] — a
            # slice + flip + conj instead of a [ne, nm] gather (gathers run
            # ~110 M elem/s on TPU, docs/TPU_NOTES.md)
            assert nm <= P, (nm, P)
            folded = jnp.conj(jnp.flip(Fh[..., P - nm + 1: P - H + 1],
                                       axis=-1))
            Ge = jnp.concatenate([Fh, folded], axis=-1)

        # cap buckets: one chirp-Z per L-group emitting ALL nm frequencies
        # directly — the chirp DFT sum is m-periodic with period n by
        # construction, so no m-mod-n replication gather is needed.
        # Leading (stream) dims are folded into the czt row axis: one big
        # batched FFT instead of per-stream calls.
        north_pieces = {}
        south_pieces = {}
        for k, b in enumerate(self.abuckets):
            Xb = self._gather_rows_blocked(maps, b)
            Xf = Xb.reshape((nlead * b["rows_pad"], b["nbl"] * self.B))
            nrow = jnp.tile(jnp.asarray(b["n"]), nlead)
            K = b.get("K", nm)
            Gb = czt(Xf, nrow, K=K, L=b["L"], sign=-1,
                     cdtype=self.cdtype, Nk=b["Nk"])
            Gb = Gb.reshape(lead + (b["rows_pad"], K))
            if K < nm:
                # columns beyond the bucket's turning-point cutoff face an
                # underflowed lambda downstream: zero-fill, don't compute
                Gb = jnp.pad(Gb, ((0, 0),) * (Gb.ndim - 1) + ((0, nm - K),))
            # bucket rows = [contiguous north range..., contiguous south
            # range..., padding]; split into the two ring-ordered pieces
            rows = b["rows"]
            nn = int(np.sum(rows < self.eq_rows[0]))
            assert np.all(np.diff(rows) > 0)
            north_pieces[k] = (rows[0] if nn else None,
                               Gb[..., :nn, :])
            south_pieces[k] = (rows[nn] if nn < len(rows) else None,
                               Gb[..., nn: len(rows), :])

        # concatenate pieces in ascending first-ring order
        pieces = []
        for k in sorted(north_pieces, key=lambda k: north_pieces[k][0]
                        if north_pieces[k][0] is not None else 1 << 60):
            r0, piece = north_pieces[k]
            if r0 is not None:
                pieces.append((int(r0), piece))
        pieces.append((int(self.eq_rows[0]), Ge))
        for k in south_pieces:
            r0, piece = south_pieces[k]
            if r0 is not None:
                pieces.append((int(r0), piece))
        pieces.sort(key=lambda t: t[0])
        # verify exact tiling of 0..nrings-1
        nxt = 0
        for r0, piece in pieces:
            assert r0 == nxt, (r0, nxt)
            nxt += piece.shape[-2]
        assert nxt == self.nrings, (nxt, self.nrings)
        pad = jnp.zeros(lead + (self.nrings_pad - self.nrings, nm),
                        self.cdtype)
        out = jnp.concatenate([p for _, p in pieces] + [pad], axis=-2)
        return out * self._phase_analysis()

    def synthesis_hybrid(self, Q):
        """Q [..., nrings_pad, nm] -> RING map(s) [..., npix] (real).

        Equatorial belt via irfft (cheap); ALL cap rings through one no-fold
        chirp-Z straight over the nm input modes (K = max cap length,
        L = 2 * P): half the uniform path's rows, none of the per-bucket FFT
        call overhead, no fold-depth blowup for tiny rings."""
        nm, P = self.nm, self.P
        lead = Q.shape[:-2]
        wfold = np.where(np.arange(nm) == 0, 1.0, 2.0)
        Y = Q * jnp.asarray(wfold, self.dtype) * self._phase(+1)

        # equator (same as synthesis())
        Ye = Y[..., self.eq_rows_pad, :]
        k = np.arange(P // 2 + 1)
        direct_ok = k < nm
        kd = np.where(direct_ok, k, 0)
        fac = np.where(k == 0, 1.0, np.where(k == P // 2, 1.0, 0.5))
        direct = jnp.take(Ye, kd, axis=-1) * jnp.asarray(
            fac * direct_ok, np.float32)
        ksrc = P - k
        fold_ok = (ksrc < nm) & (k > 0) & (k != P // 2)
        ks = np.where(fold_ok, ksrc, 0)
        folded = 0.5 * jnp.conj(jnp.take(Ye, ks, axis=-1)) * jnp.asarray(
            fold_ok.astype(np.float32))
        Xe = (jnp.fft.irfft(direct + folded, n=P, axis=-1) * P).astype(self.dtype)

        # all caps in one chirp-Z over the full nm input modes
        cap_rows = np.concatenate([b["rows"] for b in self.buckets]) \
            if self.buckets else np.zeros(0, np.int64)
        cap_rows = np.sort(cap_rows)
        ncap = len(cap_rows)
        ncap_pad = _pad_rows(max(ncap, 8))
        rows_dev = np.concatenate(
            [cap_rows, np.full(ncap_pad - ncap, self.nrings_pad - 1)])
        nvec = np.full(ncap_pad, P, np.int32)
        nvec[:ncap] = self.ringpix[cap_rows]
        start = np.zeros(ncap_pad, np.int64)
        start[:ncap] = self.startpix[cap_rows]
        nmax = int(nvec[:ncap].max()) if ncap else 4
        Lc = 2 * P  # >= nm + nmax - 1 = 7*nside - 5

        Yc = Y[..., rows_dev, :]
        Yf = Yc.reshape((-1, ncap_pad, nm))
        Xs = [czt(Yf[i], jnp.asarray(nvec), K=nmax, L=Lc, sign=+1,
                  cdtype=self.cdtype)
              for i in range(Yf.shape[0])]
        Xc = jnp.real(jnp.stack(Xs)).reshape(lead + (ncap_pad, nmax)
                                             ).astype(self.dtype)

        # assemble via one gather (in-graph ring decode)
        allv = jnp.concatenate(
            [Xe.reshape(lead + (-1,)), Xc.reshape(lead + (-1,))], axis=-1)
        base = np.zeros(self.nrings, np.int64)
        for kk, r in enumerate(self.eq_rows):
            base[r] = kk * P
        off = self.ne_pad * P
        for kk, r in enumerate(cap_rows):
            base[r] = off + kk * nmax
        itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        p = jnp.arange(self.npix, dtype=itype)
        sp = jnp.asarray(self.startpix.astype(itype))
        r = jnp.searchsorted(sp, p, side="right") - 1
        idx = jnp.asarray(base.astype(itype))[r] + (p - sp[r])
        return jnp.take(allv, idx, axis=-1)

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
        # gather-only Hermitian half-spectrum build (scatter .at[].add is
        # serialized on TPU): half[k] = direct(k) + 0.5 conj(a_{P-k})
        k = np.arange(P // 2 + 1)
        direct_ok = k < nm
        kd = np.where(direct_ok, k, 0)
        fac = np.where(k == 0, 1.0, np.where(k == P // 2, 1.0, 0.5))
        direct = jnp.take(Ye, kd, axis=-1) * jnp.asarray(
            fac * direct_ok, np.float32)
        ksrc = P - k
        fold_ok = (ksrc < nm) & (k > 0) & (k != P // 2)
        ks = np.where(fold_ok, ksrc, 0)
        folded = 0.5 * jnp.conj(jnp.take(Ye, ks, axis=-1)) * jnp.asarray(
            fold_ok.astype(np.float32))
        half = direct + folded
        Xe = jnp.fft.irfft(half, n=P, axis=-1) * P
        pieces.append(Xe.astype(self.dtype).reshape(lead + (-1,)))

        for b in self.buckets:
            Yb = Y[..., b["rows_dev"], :]
            # fold m into m mod n bins (q is n-periodic in the synthesis sum)
            nmax = b["nmax"]
            nreal = np.asarray(b["n"])[b["valid"]]
            jmax = int(np.ceil(nm / int(nreal.min()))) if len(nreal) else 1
            bidx = jnp.arange(nmax, dtype=jnp.int32)[None, :, None]
            jj = jnp.arange(jmax, dtype=jnp.int32)[None, None, :]
            nv = jnp.asarray(b["n"], jnp.int32)[:, None, None]
            src = bidx + jj * nv
            ok = (src < nm) & (bidx < nv)
            srcc = jnp.where(ok, src, 0).reshape(b["rows_pad"], -1)
            idxb = jnp.broadcast_to(srcc, lead + (b["rows_pad"], nmax * jmax))
            g = jnp.take_along_axis(Yb, idxb, axis=-1)
            g = jnp.where(ok.reshape(b["rows_pad"], -1), g, 0)
            qf = jnp.sum(g.reshape(lead + (b["rows_pad"], nmax, jmax)), axis=-1)
            nlead = int(np.prod(lead)) if lead else 1
            qff = qf.reshape((nlead * b["rows_pad"], nmax))
            nrow = jnp.tile(jnp.asarray(b["n"]), nlead)
            Xb = jnp.real(czt(qff, nrow, K=nmax, L=b["L"], sign=+1,
                              cdtype=self.cdtype))
            Xb = Xb.reshape(lead + (b["rows_pad"], nmax))
            pieces.append(Xb.astype(self.dtype).reshape(lead + (-1,)))

        allv = jnp.concatenate(pieces, axis=-1)
        # map[p] = allv[piece_base[ring(p)] + offset(p)] with ring/offset
        # computed in-graph (no O(npix) constant index table)
        itype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
        p = jnp.arange(self.npix, dtype=itype)
        sp = jnp.asarray(self.startpix.astype(itype))
        r = jnp.searchsorted(sp, p, side="right") - 1
        idx = jnp.asarray(self.piece_base.astype(itype))[r] + (p - sp[r])
        return jnp.take(allv, idx, axis=-1)

"""Batched chirp-Z transform: exact per-ring DFTs with one static shape.

HEALPix rings have 4, 8, ..., 4*nside pixels, so a naive batched FFT cannot
evaluate every ring's DFT.  The reference runs a separate FFTW plan per ring
(healpix_shtrans.c:168-205); on TPU that would mean thousands of tiny kernels
with dynamic shapes.  Instead every ring's length-n DFT is evaluated with the
Bluestein/chirp-Z factorization at a single padded FFT length L = 8*nside:

    X_k = w_k * IFFT_L( FFT_L(x_j * w_j) * FFT_L(v) )_k,
    w_t = exp(s*i*pi*t^2/n),  v_t = conj(w_t),  s = -1 analysis / +1 synthesis

which is uniform over rings (n enters only through the chirp phases) and maps
onto large batched XLA FFTs.  Chirp phases use exact integer reduction
t^2 mod 2n in int32 (valid for t <= 2^15.5, i.e. nside <= 8192) so phase error
stays at f32 rounding level even for t^2 ~ 2^30.

The chirp tables (w and FFT(v)) depend only on the ring lengths n — not on
the data — so callers transforming S streams over the same rings pass
x as [S, R, N] and the tables are built (or cached) once per ring instead of
S-fold: the v-FFT and the cos/sin chirp generation shrink by S.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _chirp(tmax, n, L, sign, cdtype):
    """w_t = exp(sign * i*pi*t^2/n) for t = 0..tmax-1, per row n [R]."""
    rdtype = jnp.float32 if cdtype == jnp.complex64 else jnp.float64
    t = jnp.arange(tmax, dtype=jnp.int32)[None, :]
    n = n[:, None].astype(jnp.int32)
    t2 = (t * t) % (2 * n)  # exact: t*t < 2^31 for t <= 46340
    ph = (jnp.pi * sign) * (t2.astype(rdtype) / n.astype(rdtype))
    return (jnp.cos(ph) + 1j * jnp.sin(ph)).astype(cdtype)


def czt_tables(n, N, K, L, sign, cdtype, Nk=None):
    """Data-independent chirp tables for rings n [R]: (w [R, tmax], Vf [R, L]).

    w is the pre/post-multiply chirp; Vf = FFT_L of the wrapped conjugate
    chirp (the convolution kernel).  Both depend only on (n, shapes), so they
    can be built once per ring set and reused across streams, j-blocks, and
    lens planes.

    Nk: max input position with NONZERO content + 1 (default N).  Callers
    whose rows are zero beyond Nk (e.g. the aligned block gather pads rows to
    a multiple of the block size) can pass Nk < N so the negative-lag kernel
    coverage — and the L >= Nk + K - 1 requirement — follow the true content
    width, not the padded buffer width."""
    R = n.shape[0]
    Nk = N if Nk is None else Nk
    tmax = max(N, K)
    # the convolution reads lags k - j for output k < K and nonzero input
    # j < Nk, so the kernel needs exactly positions [0, K) (positive lags)
    # and [L - Nk + 1, L) (negative lags, v_{-t} = v_t at position L - t);
    # writing any more (e.g. tmax entries on both sides) silently corrupts
    # needed lags whenever L is tight and Nk != K
    assert L >= Nk + K - 1, (Nk, K, L)
    w = _chirp(tmax, n, L, +sign, cdtype)
    v = _chirp(tmax, n, L, -sign, cdtype)
    vc = jnp.zeros((R, L), dtype=cdtype)
    vc = vc.at[:, :K].set(v[:, :K])
    vc = vc.at[:, L - Nk + 1:].add(v[:, 1: Nk][:, ::-1])
    return w, jnp.fft.fft(vc, axis=1)


def czt(x, n, K, L, sign, cdtype, tables=None, Nk=None):
    """Chirp-Z transform of each row of x.

    x : [..., R, N] complex (or real) input rows; entries at j >= Nk (or at
        j >= n[r] when the row is start-aligned) must be 0.  Leading axes
        are streams sharing the same rings (and tables).  The sum runs over
        ALL nonzero positions j with the exact e^{s*2i pi jk/n} phase, so a
        row whose content sits shifted by d pixels evaluates to
        e^{s*2i pi dk/n} times the unshifted DFT — callers correct the
        shift with a per-row output phase.
    n : [R] int32 per-row DFT length (the "ring length").
    K : number of output frequencies per row (static).
    sign : +1 evaluates sum_j x_j e^{+2i pi jk/n}, -1 the forward DFT.
    tables : optional precomputed czt_tables(n, N, K, L, sign, cdtype).
    Nk : see czt_tables.
    Returns [..., R, K] complex.
    """
    N = x.shape[-1]
    if tables is None:
        tables = czt_tables(n, N, K, L, sign, cdtype, Nk=Nk)
    w, Vf = tables
    a = jnp.zeros(x.shape[:-1] + (L,), dtype=cdtype)
    a = a.at[..., :N].set(x.astype(cdtype) * w[..., :N])
    X = jnp.fft.ifft(jnp.fft.fft(a, axis=-1) * Vf, axis=-1)
    return X[..., :K] * w[..., :K]


def czt_blocked(x, n, K, L, sign, cdtype, block, tables=None):
    """Apply czt in row blocks of size `block` to bound peak memory.

    Blocks are unrolled in the graph (a handful at most): lax.map's
    serialization costs several x on TPU.  Blocking is over the ring axis
    (second-to-last); leading stream axes ride along whole."""
    R = x.shape[-2]
    assert R % block == 0, (R, block)
    if R == block:
        return czt(x, n, K, L, sign, cdtype, tables=tables)
    outs = []
    for i in range(0, R, block):
        tab = None
        if tables is not None:
            tab = (tables[0][i: i + block], tables[1][i: i + block])
        outs.append(czt(x[..., i: i + block, :], n[i: i + block], K, L,
                        sign, cdtype, tables=tab))
    return jnp.concatenate(outs, axis=-2)

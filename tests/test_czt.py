"""Chirp-Z kernel-lag coverage: exactness for every (N, K, L) regime.

The Bluestein kernel needs positions [0, K) for positive lags and
[L - N + 1, L) for negative lags.  An earlier version wrapped max(N, K) - 1
negative lags, corrupting needed positive lags whenever L was tight and
N != K — the regime both the analysis stage (K = nm > N = ring length) and
the streamed synthesis cap ranges (N = nm < K = ring length) live in.
The reference's per-ring FFTW plans (healpix_shtrans.c:168-205) have no
such regime because they always transform exactly n points.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from calclens_tpu.sht.czt import czt, czt_tables


def _ref_dft(x, n, K, sign):
    j = np.arange(len(x))
    k = np.arange(K)[:, None]
    return (x * np.exp(sign * 2j * np.pi * k * j / n)).sum(axis=1)


CASES = [
    # (n, N, K, L): analysis-like (K > N, tight L = next_fft_len(N + K - 1))
    (4, 4, 17, 24),
    (8, 8, 17, 24),
    (12, 12, 17, 32),
    (28, 28, 17, 48),
    (124, 124, 65, 192),
    (4095, 4095, 2049, 6144),
    # synthesis-like (N > K: dense input modes j >= n are fine)
    (28, 17, 28, 48),
    (124, 65, 124, 192),
    # square and roomy-L regimes
    (20, 20, 17, 48),
    (16, 16, 16, 32),
]


@pytest.mark.parametrize("n,N,K,L", CASES)
def test_czt_exact(n, N, K, L):
    rng = np.random.default_rng(n + K)
    x = np.zeros(N, complex)
    nz = min(n, N)
    x[:nz] = rng.normal(size=nz) + 1j * rng.normal(size=nz)
    for sign in (-1, +1):
        out = np.asarray(czt(jnp.asarray(x)[None, :], jnp.asarray([n]),
                             K=K, L=L, sign=sign, cdtype=jnp.complex128))[0]
        ref = _ref_dft(x[:nz], n, K, sign)
        sc = max(np.abs(ref).max(), 1.0)
        assert np.abs(out - ref).max() < 1e-10 * sc


def test_czt_tables_reject_short_L():
    with pytest.raises(AssertionError):
        czt_tables(jnp.asarray([8]), N=8, K=17, L=16, sign=-1,
                   cdtype=jnp.complex128)

"""Slab-decomposed distributed 3D real FFT (reference DD-4: fftw3-mpi slab
decomposition, fftpoissonsolve.c:486-519).

The grid is sharded on axis 0 (x slabs) over the mesh axis.  Forward:
local rfft(z) + fft(y), one all_to_all transposes x-slabs into y-slabs, then
fft(x) runs locally — exactly the fftw_mpi transpose algorithm, with the
pairwise MPI exchange replaced by `lax.all_to_all` over ICI.  The Poisson
kernel multiply happens in the y-sharded layout; the inverse retraces the
steps.  Everything lives inside one shard_map region so XLA fuses the local
FFT stages with the kernel multiply.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import AXIS


def _fwd_local(x, ax):
    """[Nloc, N, N] real -> [N, Nloc_y, Nz] complex, y-sharded."""
    X = jnp.fft.rfft(x, axis=2)
    X = jnp.fft.fft(X, axis=1)
    p = jax.lax.axis_size(ax)
    nloc, N, K = X.shape
    X = X.reshape(nloc, p, N // p, K)
    # scatter y-chunks, gather x-chunks: [p*nloc = N, N/p, K]
    X = jax.lax.all_to_all(X, ax, split_axis=1, concat_axis=0)
    X = X.reshape(N, N // p, K)
    return jnp.fft.fft(X, axis=0)


def _inv_local(X, ax, nfft):
    """Inverse of _fwd_local; returns [Nloc, N, N] real x-slabs."""
    p = jax.lax.axis_size(ax)
    X = jnp.fft.ifft(X, axis=0)
    # x chunk j -> device j; received sender-s block carries y-chunk s.
    # untiled all_to_all REMOVES the split axis and INSERTS a new sender
    # axis at concat_axis: [p, xloc, yloc, K] -> [xloc, p(sender), yloc, K],
    # so merging (sender, yloc) rebuilds y in global order
    K = X.shape[-1]
    X = X.reshape(p, nfft // p, nfft // p, K)
    X = jax.lax.all_to_all(X, ax, split_axis=0, concat_axis=1)
    X = X.reshape(nfft // p, nfft, K)
    X = jnp.fft.ifft(X, axis=1)
    return jnp.fft.irfft(X, n=nfft, axis=2)


def poisson_slab(counts, nfft: int, kern_fn, mesh: Mesh):
    """counts [nfft]^3 (x-slab sharded) -> kern-filtered real grid, same
    sharding.  kern_fn(kx [n,1,1], ky [1,m,1], kz [1,1,k]) -> kernel values;
    evaluated in the y-sharded spectral layout."""
    p = mesh.devices.size
    assert nfft % p == 0, (nfft, p)

    kfull = np.fft.fftfreq(nfft).astype(np.float32) * nfft
    khalf = np.fft.rfftfreq(nfft).astype(np.float32) * nfft

    def body(x):
        ax = AXIS
        X = _fwd_local(x, ax)
        i = jax.lax.axis_index(ax)
        nly = nfft // p
        kx = jnp.asarray(kfull)[:, None, None]
        ky = jax.lax.dynamic_slice(jnp.asarray(kfull), (i * nly,), (nly,))[
            None, :, None]
        kz = jnp.asarray(khalf)[None, None, :]
        X = X * kern_fn(kx, ky, kz).astype(X.dtype)
        return _inv_local(X, ax, nfft)

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    sh = NamedSharding(mesh, P(AXIS, None, None))
    counts = jax.lax.with_sharding_constraint(counts, sh)
    out = shard_map(body, mesh=mesh, in_specs=P(AXIS, None, None),
                    out_specs=P(AXIS, None, None))(counts)
    return out

"""Slab-decomposed distributed 3D FFT Poisson solve (reference DD-4,
fftw3-mpi slab decomposition) == single-device solve, on the 8-device CPU
mesh."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from calclens_tpu import fftpot
from calclens_tpu.parallel.sharding import AXIS


def test_slab_poisson_matches_single_device():
    nfft = 32
    rng = np.random.default_rng(0)
    counts = jnp.asarray(rng.poisson(2.0, (nfft, nfft, nfft))
                         .astype(np.float32))
    L, a, mp = 100.0, 0.8, 1.0e10

    ref = fftpot.potential_from_counts(counts, nfft, L, a, mp)

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, (AXIS,))
    out = fftpot.potential_from_counts_slab(counts, nfft, L, a, mp, mesh)

    ref = np.asarray(ref)
    out = np.asarray(out)
    sc = np.max(np.abs(ref))
    assert np.max(np.abs(out - ref)) < 2e-5 * sc

    # output really is sharded as x slabs
    shards = out if not hasattr(out, "sharding" ) else out
    # (np.asarray collapsed it; check the device array directly)
    dev_out = fftpot.potential_from_counts_slab(counts, nfft, L, a, mp, mesh)
    assert len(dev_out.sharding.device_set) == 8

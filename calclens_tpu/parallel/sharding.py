"""Device mesh + sharding specs (the TPU replacement for the reference's five
MPI distribution schemes, SURVEY.md section 2.6).

The reference shards rays/particles by Peano-indexed bundle cells (DD-1), the
SHT map by rings (DD-2), and harmonic space by m (DD-3), converting between
DD-2 and DD-3 with a pairwise hypercube MPI transpose.  Here a single 1-D
`jax.sharding.Mesh` axis ("shard") carries all three: rays and particles are
sharded on their leading axis, ring-space matrices on the ring-pair axis, and
harmonic arrays on the m axis.  The ring<->m transpose becomes an XLA
all-to-all inserted at the `with_sharding_constraint` boundaries in
sht/transforms.py (the ICI analog of map2alm_transpose_mpi.c:317-381), and the
deposit's global map reduction (map_shuffle.c:633-875) becomes a psum.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


class ShardingPlan:
    """Named shardings for every distributed array family."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.n = mesh.devices.size
        # rays / particles: leading-axis sharded (DD-1 analog)
        self.batch = NamedSharding(mesh, P(AXIS))
        # ring-space [nrings_pad, P] or pair-space [nm, J]: see specs below
        self.rings = NamedSharding(mesh, P(AXIS, None))
        # harmonic [nm, J] sharded by m (DD-3 analog)
        self.m_rows = NamedSharding(mesh, P(AXIS, None))
        # alm [nl, nm] sharded by m
        self.alm = NamedSharding(mesh, P(None, AXIS))
        self.replicated = NamedSharding(mesh, P())

    def ray_sharding(self):
        """Sharding pytree for the Rays struct (leading ray axis)."""
        from ..rays.propagate import Rays

        return Rays(
            n=self.batch, beta=self.batch, A=self.batch, Aprev=self.batch,
            alpha=self.batch, U=self.batch, phi=self.batch,
        )


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k

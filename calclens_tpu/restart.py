"""Checkpoint / resume (reference restart.c).

The reference writes per-task raw binaries holding the full ray state plus
domain-decomposition metadata, and refuses to resume under a different task
count or compile configuration (restart.c:66-124).  Here the ray pytree is a
single global array family, so one .npz holds everything; compatibility
checks validate the config fields that change the physics or the layout.
Cadence control (WallTimeBetweenRestart / WallTimeLimit pressure,
raytrace.c:136-173) lives in the driver loop.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

_COMPAT_FIELDS = (
    "OmegaM", "maxComvDistance", "NumLensPlanes", "rayOrder", "bundleOrder",
    "SHTOrder", "minRa", "maxRa", "minDec", "maxDec",
)


def write_restart_orbax(path, cfg, rays_packed, ray_nest, current_plane,
                        map_num=0):
    """Orbax checkpoint of the packed (possibly sharded) ray buffer — the
    multi-host production form: each host writes only its shards, so no
    device->single-host gather is needed (the TPU analog of the reference's
    per-task restart files, restart.c:18-219)."""
    import orbax.checkpoint as ocp

    from .utils.tunnel import _is_axon, fetch

    ckptr = ocp.StandardCheckpointer()
    # the axon dev tunnel cannot move >32 KiB device->host in one message
    # (orbax's internal transfer hangs); pre-fetch chunked there.  On real
    # backends the device array is handed to orbax so multi-host runs keep
    # shard-parallel writes.
    state = {
        "rays_packed": fetch(rays_packed) if _is_axon() else rays_packed,
        # empty arrays are unsupported: full-sky (lazy nest view) stores [-1]
        "ray_nest": np.asarray(ray_nest) if ray_nest is not None
        else np.array([-1], np.int64),
        "current_plane": np.int64(current_plane),
        "map_num": np.int64(map_num),
        "compat": np.array([float(getattr(cfg, f)) for f in _COMPAT_FIELDS]),
    }
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def read_restart_orbax(path, cfg):
    """Returns (rays_packed, ray_nest-or-None, current_plane, map_num)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path))
    compat = np.asarray(state["compat"])
    want = np.array([float(getattr(cfg, f)) for f in _COMPAT_FIELDS])
    bad = np.flatnonzero(~np.isclose(compat, want))
    if len(bad):
        names = [_COMPAT_FIELDS[i] for i in bad]
        raise ValueError(f"restart incompatible with config: {names}")
    nest = np.asarray(state["ray_nest"])
    return (jnp.asarray(state["rays_packed"]),
            None if (len(nest) == 1 and nest[0] < 0) else nest,
            int(state["current_plane"]), int(state["map_num"]))


def write_restart(path, cfg, rays, ray_nest, current_plane, map_num=0):
    """Atomic write: .tmp then rename; previous file moved to .bak
    (restart.c:38-53)."""
    tmp = path + ".tmp"
    np.savez(
        tmp if tmp.endswith(".npz") else tmp,
        n=np.asarray(rays.n), beta=np.asarray(rays.beta),
        A=np.asarray(rays.A), Aprev=np.asarray(rays.Aprev),
        alpha=np.asarray(rays.alpha), U=np.asarray(rays.U),
        phi=np.asarray(rays.phi),
        ray_nest=np.asarray(ray_nest),
        current_plane=np.int64(current_plane),
        map_num=np.int64(map_num),
        compat=np.array([float(getattr(cfg, f)) for f in _COMPAT_FIELDS]),
    )
    saved = tmp + ".npz" if not tmp.endswith(".npz") else tmp
    if os.path.exists(path):
        os.replace(path, path + ".bak")
    os.replace(saved, path)


def read_restart(path, cfg, dtype=jnp.float32):
    """Returns (rays, ray_nest, current_plane, map_num); raises on config
    mismatch (the reference MPI_Aborts, restart.c:66-124)."""
    from .rays.propagate import Rays

    with np.load(path) as z:
        compat = z["compat"]
        want = np.array([float(getattr(cfg, f)) for f in _COMPAT_FIELDS])
        bad = np.flatnonzero(~np.isclose(compat, want))
        if len(bad):
            names = [_COMPAT_FIELDS[i] for i in bad]
            raise ValueError(f"restart incompatible with config: {names}")
        ndt = np.dtype(dtype)
        rays = Rays(
            n=np.asarray(z["n"], ndt), beta=np.asarray(z["beta"], ndt),
            A=np.asarray(z["A"], ndt), Aprev=np.asarray(z["Aprev"], ndt),
            alpha=np.asarray(z["alpha"], ndt), U=np.asarray(z["U"], ndt),
            phi=np.asarray(z["phi"], ndt),
        )
        return rays, z["ray_nest"].copy(), int(z["current_plane"]), int(z["map_num"])

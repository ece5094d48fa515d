"""Device->host transfer helper for the axon remote-TPU tunnel.

The axon runtime (the single-chip dev tunnel this environment exposes)
forwards host<->device traffic over a websocket with a 32 KiB message
buffer: any single device_get above that size never completes (measured:
8192 f32 elements fetch in ~30 ms, 16384 hang forever and wedge the tunnel
for minutes).  Real TPU runtimes have no such limit, so this is an
environment workaround, not a design property: `fetch` transparently
chunks large transfers into <= 32 KiB slices on axon and is a plain
`np.asarray` everywhere else.

Every host-side consumer of bulk device data (restart writes, ray/galaxy
output, lens-map reduction) routes through `fetch`.
"""

from __future__ import annotations

import numpy as np

# max payload per device_get message on the axon tunnel (process_api runs
# with --max-ws-buffer-size 32768; fetches of exactly 32 KiB succeed)
_MAX_BYTES = 32 * 1024


def _is_axon() -> bool:
    import jax

    try:
        return jax.devices()[0].client.platform == "axon"
    except Exception:
        try:
            return jax.devices()[0].platform == "axon"
        except Exception:
            return False


def fetch(x, max_bytes: int = _MAX_BYTES):
    """Device array -> host numpy array, chunk-safe on the axon tunnel.

    On non-axon backends (or for host inputs) this is np.asarray(x).  On
    axon, the array is flattened on device and fetched in <= max_bytes
    slices; each slice dispatch is an O(1) device op, so peak device memory
    is unchanged."""
    import jax
    import jax.numpy as jnp

    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np.asarray(x)
    x = jnp.asarray(x)
    nbytes = x.size * x.dtype.itemsize
    if nbytes <= max_bytes or not _is_axon():
        return np.asarray(x)
    step = max(1, max_bytes // x.dtype.itemsize)
    flat = x.reshape(-1)
    out = np.empty(x.size, dtype=x.dtype)
    for i in range(0, x.size, step):
        out[i: i + step] = np.asarray(flat[i: i + step])
    return out.reshape(x.shape)


def fetch_tree(tree):
    """jax.tree_util map of fetch over a pytree."""
    import jax

    return jax.tree_util.tree_map(fetch, tree)

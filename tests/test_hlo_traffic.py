"""HLO-derived collective traffic accounting (BASELINE.md multi-chip
projection): the parser must find the sharded step's collectives and the
per-device per-plane send volume must stay bounded by O(npix) bytes —
the structural guarantee that communication never becomes the binding term
at scale (reference analog: the pairwise transpose + shuffles move O(npix)
per task per plane, map2alm_transpose_mpi.c:317-381)."""
import numpy as np
import jax
import pytest

from calclens_tpu.parallel.sharding import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_collective_traffic_accounting_order9():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import __graft_entry__ as g
    from hlo_traffic import collective_traffic

    order = 9
    npix = 12 * 4**order
    mesh = make_mesh(8)
    fn, avals = g._build_abstract(order, order, mesh, npart=1 << 16)
    txt = jax.jit(fn, donate_argnums=(0,)).lower(*avals).compile().as_text()
    t = collective_traffic(txt, 8)

    # the ring<->m transpose must be there and carry real bytes
    assert t["all-to-all"] > 0
    assert t["total_send_bytes"] > 0
    assert len(t["ops"]) > 4
    # bounded: per-device send volume stays O(npix) bytes per plane
    # (order 12 measures ~70 B/pixel; allow 3x headroom for small-order
    # fixed costs)
    assert t["total_send_bytes"] < 210 * npix, (
        t["total_send_bytes"] / npix)
    # no single collective moves more than the 4/3-npix layout conversion
    # in f32 x 6 maps (the documented largest term)
    biggest = max(op["out_bytes"] for op in t["ops"])
    assert biggest <= 6 * 4 * npix * 4 // 3, biggest


def test_collective_traffic_regex_rot_guard():
    """A mesh-compiled module that parses to zero collectives must raise
    (regex rot protection), not silently report a free step."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from hlo_traffic import collective_traffic

    plain = "ENTRY main { ROOT %x = f32[8,8] add(f32[8,8] %a, f32[8,8] %b) }"
    with pytest.raises(RuntimeError, match="regex"):
        collective_traffic(plain, 8)
    # single-device modules legitimately have no collectives
    t = collective_traffic(plain, 1)
    assert t["total_send_bytes"] == 0

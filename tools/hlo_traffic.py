#!/usr/bin/env python
"""Per-plane ICI traffic from the compiled sharded plane step's HLO.

AOT-lowers the fully-sharded plane step (same build as the order-12/13
memory+collective proofs, tests/test_multichip.py) on an N-virtual-device
CPU mesh, walks the optimized HLO, and accounts every cross-device
collective's PER-DEVICE send bytes:

  all-to-all [S]            -> sends |S| * (n-1)/n        (shape is per-device)
  collective-permute [S]    -> sends |S|
  all-gather out [S_out]    -> sends |S_out| / n * (n-1)  (ring algorithm)
  all-reduce [S]            -> sends 2 |S| (n-1)/n        (ring: RS + AG)
  reduce-scatter in [S]     -> sends |S| * (n-1)/n

The result feeds the multi-chip throughput projection in BASELINE.md:
comm_time >= per_device_bytes / ICI_bandwidth is a LOWER bound on the
communication cost of one lens plane, to combine with measured single-chip
phase times (perfect-compute-scaling assumption).

Usage: python tools/hlo_traffic.py [--order 12] [--ndev 8] [--ray-order same]
"""
import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "c64": 8, "c128": 16,
               "s64": 8, "s32": 4, "s16": 2, "s8": 1, "u64": 8, "u32": 4,
               "u16": 2, "u8": 1, "pred": 1}

_SHAPE = re.compile(r"([a-z]\d+|pred)\[([0-9,]*)\]")


def _shape_bytes(txt):
    """Sum of byte sizes of every shape literal in txt (handles tuples)."""
    total = 0
    for m in _SHAPE.finditer(txt):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES.get(dt, 4)
    return total


def collective_traffic(hlo_text, ndev, expect_collectives=None):
    """Per-device send bytes by collective kind for ONE execution.

    The result is a LOWER bound on real ICI traffic: the regex walk only
    sees ops it recognizes, and the ring-algorithm byte models
    (all-gather/all-reduce) assume the best-case schedule.  As regex-rot
    protection, a mesh-compiled module (ndev > 1, or expect_collectives
    explicitly True) that yields ZERO parsed collectives raises instead of
    silently reporting a free step."""
    out = {"all-to-all": 0, "collective-permute": 0, "all-gather": 0,
           "all-reduce": 0, "reduce-scatter": 0, "ops": []}
    for line in hlo_text.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (.*?) (all-to-all|all-gather|"
                     r"all-reduce|reduce-scatter|collective-permute)", ls)
        if not m:
            continue
        outshape, kind = m.groups()
        nbytes = _shape_bytes(outshape)
        if kind == "all-to-all":
            send = nbytes * (ndev - 1) // ndev
        elif kind == "collective-permute":
            send = nbytes
        elif kind == "all-gather":
            send = nbytes * (ndev - 1) // ndev  # out is n x shard
        elif kind == "all-reduce":
            send = 2 * nbytes * (ndev - 1) // ndev
        else:  # reduce-scatter: out is 1/n of in
            send = nbytes * (ndev - 1)
        out[kind] += send
        out["ops"].append({"kind": kind, "out_bytes": nbytes,
                           "send_bytes": send})
    out["total_send_bytes"] = sum(out[k] for k in
                                  ("all-to-all", "collective-permute",
                                   "all-gather", "all-reduce",
                                   "reduce-scatter"))
    if expect_collectives is None:
        expect_collectives = ndev > 1
    if expect_collectives and not out["ops"]:
        raise RuntimeError(
            "no collectives parsed from a mesh-compiled HLO module — the "
            "op-line regex no longer matches the HLO text format (regex "
            "rot); fix _SHAPE/the kind regex before trusting any traffic "
            "numbers")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=12)
    ap.add_argument("--ray-order", type=int, default=-1)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    ray_order = args.ray_order if args.ray_order > 0 else args.order

    import __graft_entry__ as g

    g._force_virtual_cpu_devices(args.ndev)
    import jax

    from calclens_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(args.ndev)
    fn, avals = g._build_abstract(args.order, ray_order, mesh)
    compiled = jax.jit(fn, donate_argnums=(0,)).lower(*avals).compile()
    txt = compiled.as_text()
    t = collective_traffic(txt, args.ndev)
    mem = compiled.memory_analysis()
    peak = (int(mem.peak_memory_in_bytes) + int(mem.argument_size_in_bytes)
            + int(mem.output_size_in_bytes) - int(mem.alias_size_in_bytes))
    res = {
        "order": args.order, "ray_order": ray_order, "ndev": args.ndev,
        "per_device_peak_gib": round(peak / 2**30, 2),
        "send_bytes_per_device": {
            k: t[k] for k in ("all-to-all", "collective-permute",
                              "all-gather", "all-reduce", "reduce-scatter")},
        "total_send_bytes_per_device": t["total_send_bytes"],
        "total_send_gib_per_device": round(t["total_send_bytes"] / 2**30, 3),
        "n_collectives": len(t["ops"]),
        # ICI per-chip aggregate bandwidth (public Cloud TPU specs):
        # v5e 1600 Gbps = 200 GB/s, v5p 4800 Gbps = 600 GB/s
        "comm_seconds_v5e_200GBs": round(t["total_send_bytes"] / 200e9, 3),
        "comm_seconds_v5p_600GBs": round(t["total_send_bytes"] / 600e9, 3),
    }
    print(json.dumps(res if args.json else res, indent=None if args.json
                     else 2))


if __name__ == "__main__":
    main()

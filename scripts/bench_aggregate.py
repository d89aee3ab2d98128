#!/usr/bin/env python
"""Microbench: GraphSAGE aggregation — XLA segment_sum vs the Pallas kernel.

VERDICT round-2 weak #6: the Pallas gather/scatter kernel shipped untested
against the production default. This measures BOTH implementations at the
flagship graph size (the 36k-node / ~217k-edge surface graphs of the
DOF100K dataset) on the real chip, forward and forward+backward (the
training hot path), so the `aggregate_impl` default is a recorded decision
rather than a guess. Reference context: the reference's PyG SAGEConv rides
torch_scatter (models/gnn_model.py); here both paths are TPU-native.

Usage: python scripts/bench_aggregate.py [--nodes N] [--edges E] [--reps R]
Prints one JSON line per (impl, mode).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tpufem.models.sage import segment_mean_aggregate  # noqa: E402


def run_size(N: int, E: int, C: int, reps: int) -> None:
    rng = np.random.default_rng(0)
    # surface-mesh-like connectivity: ~6 neighbours per node, sorted by dst
    dst = np.sort(rng.integers(0, N, E)).astype(np.int32)
    src = ((dst + rng.integers(1, 7, E)) % N).astype(np.int32)
    edge_index = jnp.asarray(np.stack([src, dst]))
    edge_mask = jnp.ones((E,), jnp.float32)
    h = jnp.asarray(rng.standard_normal((N, C), np.float32))

    from tpufem.ops.gather_scatter import gather_mean_aggregate

    impls = {
        "segment": lambda x: segment_mean_aggregate(x, edge_index, edge_mask, N),
        "pallas": lambda x: gather_mean_aggregate(x, edge_index, edge_mask, N),
    }

    results = {}
    for name, fn in impls.items():
        fwd = jax.jit(fn)
        loss = jax.jit(jax.grad(lambda x: (fn(x) ** 2).sum()))
        for mode, f in (("fwd", fwd), ("fwd+bwd", loss)):
            out = f(h)
            np.asarray(out)  # compile + sync via host fetch (axon gotcha)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(h)
            np.asarray(out)
            dt = (time.perf_counter() - t0) / reps * 1e3
            results[f"{name}:{mode}"] = dt
            print(
                json.dumps(
                    {
                        "impl": name,
                        "mode": mode,
                        "ms": round(dt, 3),
                        "nodes": N,
                        "edges": E,
                        "hidden": C,
                        "device": str(jax.devices()[0]),
                    }
                ),
                flush=True,
            )

    # numeric agreement between the two implementations
    a = np.asarray(impls["segment"](h))
    b = np.asarray(impls["pallas"](h))
    rel = float(np.abs(a - b).max() / max(np.abs(a).max(), 1e-30))
    print(json.dumps({"nodes": N, "agreement_rel_max": rel}), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=0,
                    help="0 = bench both the kernel-eligible size (24k nodes, "
                         "VMEM-resident accumulator) and the flagship size "
                         "(36.9k nodes, where the pallas path falls back to "
                         "XLA segment_sum)")
    ap.add_argument("--edges", type=int, default=0)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    if args.nodes:
        run_size(args.nodes, args.edges or 6 * args.nodes, args.hidden, args.reps)
    else:
        run_size(24_064, 144_384, args.hidden, args.reps)
        run_size(36_864, 221_184, args.hidden, args.reps)


if __name__ == "__main__":
    main()

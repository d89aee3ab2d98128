#!/usr/bin/env python
"""Measure GraphSAGE neighbor aggregation: XLA segment_sum vs the Pallas
sorted-segment kernel, on the flagship graph size, on the real chip.

VERDICT round 2, #6: BASELINE's north star names Pallas gather/scatter message
passing — measure it and set `aggregate_impl`'s default deliberately. Prints
one JSON line with both timings; the README/ARCHITECTURE record the outcome.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    from tpufem.mesher import DOF100K, structured_wing_mesh
    from tpufem.models.graph import build_graph, pad_graph
    from tpufem.models.sage import segment_mean_aggregate
    from tpufem.ops.gather_scatter import gather_mean_aggregate
    from tpufem.sets import build_boundary_sets, face_normals_areas

    params = {"span_m": 1.4, "chord_m": 0.35, "sweep_deg": 15.0,
              "thickness_ratio": 0.10}
    mesh = structured_wing_mesh(
        params["span_m"], params["chord_m"], params["sweep_deg"],
        params["thickness_ratio"], DOF100K,
    )
    bs = build_boundary_sets(mesh)
    faces = mesh.surf_faces[bs.surf_all_faces]
    surf_nodes = np.unique(faces)
    normals, _ = face_normals_areas(mesh.nodes, faces)
    rng = np.random.default_rng(0)
    surface = {
        "node_id": surf_nodes.astype(np.int64),
        "pos": mesh.nodes[surf_nodes].astype(np.float32),
        "normal": np.zeros((len(surf_nodes), 3), np.float32),
        "stress_vm": rng.uniform(1e5, 5e7, len(surf_nodes)).astype(np.float32),
        "disp": np.zeros((len(surf_nodes), 3), np.float32),
        "loss_mask": np.ones(len(surf_nodes), bool),
    }
    g = build_graph(surface, faces, params)
    n_pad = -(-g.num_nodes // 128) * 128
    e_pad = -(-g.num_edges // 128) * 128
    g = pad_graph(g, n_pad, e_pad)
    print(f"flagship graph: {g.num_nodes} nodes, {g.num_edges} edges "
          f"(padded {n_pad}/{e_pad})", flush=True)

    h = jnp.asarray(rng.normal(size=(n_pad, args.hidden)).astype(np.float32))
    edge_index = jnp.asarray(g.edge_index)
    edge_mask = jnp.asarray(g.edge_mask)

    seg_fn = jax.jit(lambda h_: segment_mean_aggregate(h_, edge_index, edge_mask, n_pad))
    # exactly SAGEConv's aggregate_impl="pallas" branch
    pal_fn = jax.jit(lambda h_: gather_mean_aggregate(h_, edge_index, edge_mask, n_pad))

    def timeit(fn, name):
        out = fn(h)
        _ = np.asarray(out)  # warm + compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(h)
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"{name}: {dt:.3f} ms", flush=True)
        return dt, out

    t_seg, o_seg = timeit(seg_fn, "segment_sum mean")
    t_pal, o_pal = timeit(pal_fn, "pallas sorted-segment mean")
    err = float(jnp.abs(o_seg - o_pal).max())
    print(json.dumps({
        "metric": "sage_aggregation_ms_flagship_graph",
        "value": round(min(t_seg, t_pal), 4),
        "unit": "ms",
        "detail": {
            "segment_ms": round(t_seg, 4),
            "pallas_ms": round(t_pal, 4),
            "winner": "pallas" if t_pal < t_seg else "segment",
            "max_abs_diff": err,
            "nodes": int(n_pad),
            "edges": int(e_pad),
            "hidden": args.hidden,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()

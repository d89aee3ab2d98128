#!/usr/bin/env python
"""Measure GraphSAGE aggregation: XLA segment_sum vs the Pallas kernel.

Decides the `aggregate_impl` default (tpufem.models.sage.SAGEConfig) with a
measurement instead of a guess: builds the flagship-scale training graph (the
surface graph of the DOF100K wing — the graphs the production surrogate
trains on), then times (a) the isolated mean-aggregation op and (b) the full
GraphSAGE forward, under jit, for both implementations.

Reference analog: the PyG GraphSAGE message passing the reference runs on GPU
(/root/reference/src/deep_fem_uav_wing/model.py); here the op choice is a TPU
question (XLA:TPU scatter-add vs a sorted-segment MXU one-hot kernel), so it
is settled on the chip. Prints one JSON line.
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


def flagship_graph():
    from tpufem.mesher import DOF100K, structured_wing_mesh
    from tpufem.models.graph import build_graph, pad_graph
    from tpufem.sets import build_boundary_sets, face_normals_areas

    params = {"span_m": 1.6, "chord_m": 0.4, "sweep_deg": 20.0,
              "thickness_ratio": 0.10}
    mesh = structured_wing_mesh(
        params["span_m"], params["chord_m"], params["sweep_deg"],
        params["thickness_ratio"], DOF100K,
    )
    bs = build_boundary_sets(mesh)
    faces = mesh.surf_faces[bs.surf_all_faces]
    surf_nodes = np.unique(faces)
    normals, areas = face_normals_areas(mesh.nodes, faces)
    acc = np.zeros_like(mesh.nodes)
    np.add.at(acc, faces.reshape(-1), np.repeat(normals * areas[:, None], 3, axis=0))
    acc /= np.maximum(np.linalg.norm(acc, axis=1, keepdims=True), 1e-30)
    rng = np.random.default_rng(0)
    surface = {
        "node_id": surf_nodes.astype(np.int64),
        "pos": mesh.nodes[surf_nodes].astype(np.float32),
        "normal": acc[surf_nodes].astype(np.float32),
        "stress_vm": rng.uniform(1e5, 5e7, len(surf_nodes)).astype(np.float32),
        "disp": rng.normal(size=(len(surf_nodes), 3)).astype(np.float32),
        "loss_mask": mesh.nodes[surf_nodes, 1] > 0.05 * params["span_m"],
    }
    g = build_graph(surface, faces, params)
    # pad to the next multiples the trainer would use (keeps shapes realistic)
    return pad_graph(g, -(-g.num_nodes // 1024) * 1024, -(-g.num_edges // 4096) * 4096)


def time_fn(fn, args, reps):
    out = fn(*args)  # compile
    np.asarray(out)  # host fetch: block_until_ready unreliable over the tunnel
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    from tpufem.models.sage import GraphSAGE, SAGEConfig, segment_mean_aggregate
    from tpufem.ops.gather_scatter import gather_mean_aggregate

    g = flagship_graph()
    x = jnp.asarray(g.x)
    ei = jnp.asarray(g.edge_index)
    em = jnp.asarray(g.edge_mask)
    h = jnp.asarray(np.random.default_rng(1).normal(
        size=(g.x.shape[0], 128)).astype(np.float32))

    res = {"num_nodes": int(g.x.shape[0]), "num_edges": int(ei.shape[1])}

    seg = jax.jit(lambda h: segment_mean_aggregate(h, ei, em, h.shape[0]))
    pal = jax.jit(lambda h: gather_mean_aggregate(h, ei, em, h.shape[0]))
    np.testing.assert_allclose(np.asarray(seg(h)), np.asarray(pal(h)),
                               atol=1e-4, rtol=1e-4)
    res["agg_segment_ms"] = round(time_fn(seg, (h,), args.reps) * 1e3, 4)
    res["agg_pallas_ms"] = round(time_fn(pal, (h,), args.reps) * 1e3, 4)

    for impl in ("segment", "pallas"):
        model = GraphSAGE(SAGEConfig(aggregate_impl=impl))
        params = model.init(jax.random.PRNGKey(0), x, ei, em)
        fwd = jax.jit(lambda p, x: model.apply(p, x, ei, em))
        res[f"forward_{impl}_ms"] = round(
            time_fn(fwd, (params, x), args.reps) * 1e3, 4)

    res["winner"] = ("pallas" if res["forward_pallas_ms"] < res["forward_segment_ms"]
                     else "segment")
    res["device"] = jax.devices()[0].device_kind
    print(json.dumps(res))


if __name__ == "__main__":
    main()

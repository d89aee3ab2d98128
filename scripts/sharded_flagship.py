#!/usr/bin/env python
"""Sharded flagship: the 2.51M-DOF tet10 wing (DOF1M_TET10, 96x128x8) solved
by the span-sharded stencil-MG solver (tpufem.parallel.shard_stencil) over a
jax.sharding.Mesh — the same resolution, wing, pressure, and tolerance as the
single-chip record (results/flagship_tet10_2p5mdof.json), so the iteration
counts are directly comparable.

Runs anywhere a device mesh exists; for the virtual-CPU evidence run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/sharded_flagship.py --out results/sharded_tet10_2p5mdof_cpu_mesh.json

Reference role: the CalculiX solve at scale (reference src/.../fem.py:524-533),
re-imagined as a multi-chip SPMD solve; BASELINE config 5's mesh-sharded path
at the full flagship resolution (round-3 verdict next-round item 4).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# honor a cpu request before backend init (sitecustomize force-sets axon)
if "cpu" in os.environ.get("JAX_PLATFORMS", "").split(","):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")


def _single_chip_record_iters() -> int | None:
    """Iteration count of the committed single-chip record, for comparability
    (read from the artifact rather than hardcoded — advisor r4)."""
    rec = Path(__file__).resolve().parents[1] / "results" / "flagship_tet10_2p5mdof.json"
    try:
        return int(json.loads(rec.read_text())["detail"]["iters"])
    except Exception:  # noqa: BLE001 — comparability note only, never fatal
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/sharded_tet10_2p5mdof_cpu_mesh.json")
    # tol 1e-6 matches the single-chip flagship record's certified decade
    # (flagship_tet10_2p5mdof.json: TRUE rel 3.5e-7) so sharded-vs-single-chip
    # iteration counts compare on equal residual footing. Measured on the
    # 8-virtual-CPU mesh: 188 iters to rel 9.0e-7. Note the single-chip 310
    # counts EVERY iteration across the correction-cascade rounds (re-solves
    # included, stencil_mg.WingStencilT.solve), while this run is one straight
    # MG-PCG — fewer iterations at the same decade is expected, not anomalous.
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--maxiter", type=int, default=600)
    ap.add_argument("--pressure", type=float, default=5e3)
    ap.add_argument("--n_chord", type=int, default=96)
    ap.add_argument("--n_span", type=int, default=128)
    ap.add_argument("--n_thick", type=int, default=8)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from tpufem.fem.tet10_stencil import grid_meta2
    from tpufem.mesher import WingMeshResolution
    from tpufem.parallel.meshes import make_mesh
    from tpufem.parallel.shard_stencil import ShardedStencilSolver

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    res = WingMeshResolution(args.n_chord, args.n_span, args.n_thick, 0.006, "le")
    dof = 3 * grid_meta2(res)["num_nodes"]
    p4 = (1.6, 0.4, 20.0, 0.10)  # the single-chip flagship wing
    print(f"sharded flagship: {dof} DOF tet10 ({args.n_chord}x{args.n_span}x"
          f"{args.n_thick}) over {n_dev} devices ({jax.devices()[0].platform})",
          flush=True)

    t0 = time.perf_counter()
    solver = ShardedStencilSolver(res, n_dev, element="tet10", dtype=jnp.float64)
    setup_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    u, iters, rel = solver.solve(
        p4, mesh, pressure=args.pressure, tol=args.tol, maxiter=args.maxiter
    )
    solve_s = time.perf_counter() - t1
    conv = bool(rel <= args.tol)
    assert np.isfinite(np.asarray(u)).all()

    out = {
        "metric": "fem_tet10_2p5mdof_sharded_mg",
        "value": round(solve_s, 3),
        "unit": "s",
        "detail": {
            "dof": int(dof),
            "devices": n_dev,
            "platform": jax.devices()[0].platform,
            "iters": int(iters),
            "rel_residual": float(rel),
            "converged": conv,
            "tol": args.tol,
            "single_chip_record_iters": _single_chip_record_iters(),
            "iters_note": "single-chip record iters count every iteration "
                          "across the correction-cascade rounds (re-solves "
                          "included); this run is one straight sharded MG-PCG",
            "setup_s": round(setup_s, 3),
            "solver": "span-sharded stencil MG-PCG (shard_map + ppermute halos, "
                      "sharded V-cycle, replicated coarse tail)",
            "cmd": "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 "
                   "python scripts/sharded_flagship.py",
        },
    }
    print(json.dumps(out), flush=True)
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    if not conv:
        raise SystemExit(f"NOT CONVERGED: rel {float(rel):.3e} after {int(iters)} iters")


if __name__ == "__main__":
    main()

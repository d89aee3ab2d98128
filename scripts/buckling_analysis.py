"""Linearized buckling CLI: critical load factors + mode GLBs for one wing.

Beyond-parity capability (the reference pipeline is static-only): static
pre-solve at the reference pressure -> per-element stress -> subspace
iteration on the (K, -K_G) pencil (tpufem.fem.buckling). The reported
load_factor is the multiple of the applied pressure at which the linearized
structure loses stability.

Example:
    python scripts/buckling_analysis.py --pressure 5e3 --n_modes 4 --glb \
        --out results/buckling_demo
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import numpy as np

jax.config.update("jax_enable_x64", True)  # f64 operator (emulated on TPU)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--span", type=float, default=1.2)
    ap.add_argument("--chord", type=float, default=0.35)
    ap.add_argument("--sweep", type=float, default=10.0)
    ap.add_argument("--thickness", type=float, default=0.10)
    ap.add_argument("--pressure", type=float, default=5e3)
    ap.add_argument("--n_chord", type=int, default=32)
    ap.add_argument("--n_span", type=int, default=40)
    ap.add_argument("--n_thick", type=int, default=4)
    ap.add_argument("--n_modes", type=int, default=4)
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--inner_tol", type=float, default=1e-8)
    ap.add_argument("--inner_maxiter", type=int, default=400)
    ap.add_argument("--chunk_iters", type=int, default=200)
    ap.add_argument("--tol", type=float, default=1e-5,
                    help="load-factor relative-change stop (engineering precision;\n the clustered K_G pencil converges slowly below this)")
    ap.add_argument("--max_sweeps", type=int, default=60)
    ap.add_argument("--glb", action="store_true", help="write per-mode GLBs")
    ap.add_argument("--out", default="results/buckling")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS env is "
                         "ignored on the axon platform)")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpufem.fem.buckling import WingBuckling
    from tpufem.mesher import WingMeshResolution

    res = WingMeshResolution(args.n_chord, args.n_span, args.n_thick, 0.006, "le")
    p4 = (args.span, args.chord, args.sweep, args.thickness)
    wb = WingBuckling(
        res, p4, pressure=args.pressure,
        inner_tol=args.inner_tol, inner_maxiter=args.inner_maxiter,
        chunk_iters=args.chunk_iters,
    )
    t0 = time.perf_counter()
    out = wb.solve(
        n_modes=args.n_modes, block=args.block, tol=args.tol,
        max_sweeps=args.max_sweeps,
    )
    wall = time.perf_counter() - t0

    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    record = {
        "params": {"span_m": args.span, "chord_m": args.chord,
                   "sweep_deg": args.sweep, "thickness_ratio": args.thickness},
        "pressure_pa": args.pressure,
        "resolution": [args.n_chord, args.n_span, args.n_thick],
        "n_dof": 3 * wb.num_nodes,
        "load_factor": out.load_factor,
        "factors": [None if not np.isfinite(v) else v for v in out.factors],
        "sweeps": out.sweeps,
        "converged": out.converged,
        "wall_s": round(wall, 3),
    }
    (outdir / "buckling_report.json").write_text(json.dumps(record, indent=2))

    if args.glb:
        from tpufem.viz.colormaps import normalize_range, viridis
        from tpufem.viz.glb import GLBMesh, write_glb

        mesh = wb.mesh
        for i in range(args.n_modes):
            if not np.isfinite(out.factors[i]):
                continue
            phi = out.modes[:, :, i]
            amp = np.linalg.norm(phi, axis=1)
            peak = float(amp.max()) or 1.0
            scale = 0.15 * args.span / peak
            verts = (mesh.nodes + scale * phi).astype(np.float32)
            rgb = viridis(normalize_range(amp, 0.0, peak))
            rgba = np.concatenate([rgb, np.ones((len(rgb), 1))], axis=1)
            write_glb(
                outdir / f"buckling_mode_{i + 1:02d}_x{out.factors[i]:.0f}.glb",
                GLBMesh(vertices=verts, faces=mesh.surf_faces, colors=rgba,
                        name=f"buckling{i + 1}"),
            )

    print(json.dumps(record))


if __name__ == "__main__":
    main()

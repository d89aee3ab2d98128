"""Frequency-vs-load sweep: stress-stiffened modal spectra up to buckling.

Beyond-parity capability (the reference pipeline is static-only): one static
pre-solve gives sigma0, WingBuckling gives the critical factor lambda_cr,
then WingPrestressedModal sweeps the (K + p K_G, M) pencil over load factors
p — the classic frequency-collapse curve (f1 -> 0 as p -> lambda_cr) used to
read buckling margins from vibration tests. One compilation serves the whole
sweep (p is a traced scalar) and each point warm-starts from the previous
subspace.

Example:
    python scripts/prestress_sweep.py --pressure 5e3 --n_modes 4 \
        --n_points 8 --out results/prestress_sweep
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
    ap.add_argument("--n_points", type=int, default=8,
                    help="sweep points from 0 to max_frac*lambda_cr")
    ap.add_argument("--max_frac", type=float, default=0.95,
                    help="top of the sweep as a fraction of lambda_cr (the "
                         "pencil is singular AT lambda_cr; CG slows as the "
                         "lowest mode softens)")
    ap.add_argument("--load_factors", type=float, nargs="*", default=None,
                    help="explicit load factors (skips the buckling pre-solve)")
    ap.add_argument("--block", type=int, default=None)
    ap.add_argument("--inner_tol", type=float, default=1e-8)
    ap.add_argument("--inner_maxiter", type=int, default=800)
    ap.add_argument("--chunk_iters", type=int, default=200)
    ap.add_argument("--tol", type=float, default=1e-8,
                    help="eigenvalue relative-change stop per sweep point")
    ap.add_argument("--max_sweeps", type=int, default=40)
    ap.add_argument("--buckling_tol", type=float, default=1e-5)
    ap.add_argument("--out", default="results/prestress_sweep")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS env is "
                         "ignored on the axon platform)")
    args = ap.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from tpufem.fem.buckling import WingBuckling, WingPrestressedModal
    from tpufem.mesher import WingMeshResolution

    res = WingMeshResolution(args.n_chord, args.n_span, args.n_thick, 0.006, "le")
    p4 = (args.span, args.chord, args.sweep, args.thickness)
    kw = dict(
        pressure=args.pressure, inner_tol=args.inner_tol,
        inner_maxiter=args.inner_maxiter, chunk_iters=args.chunk_iters,
    )

    t0 = time.perf_counter()
    lam_cr = None
    if args.load_factors is not None:
        factors = list(args.load_factors)
    else:
        wb = WingBuckling(res, p4, **kw)
        bout = wb.solve(n_modes=1, tol=args.buckling_tol)
        lam_cr = bout.load_factor
        factors = list(np.linspace(0.0, args.max_frac * lam_cr, args.n_points))
        print(f"[prestress] lambda_cr = {lam_cr:.1f} "
              f"({bout.sweeps} sweeps, converged={bout.converged})", flush=True)

    wpm = WingPrestressedModal(res, p4, **kw)
    outs = wpm.frequency_sweep(
        factors, n_modes=args.n_modes, block=args.block, tol=args.tol,
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
        "n_dof": 3 * wpm.num_nodes,
        "lambda_cr": lam_cr,
        "load_factors": factors,
        "freqs_hz": [o.freqs_hz.tolist() for o in outs],
        "sweeps": [o.sweeps for o in outs],
        "converged": [bool(o.converged) for o in outs],
        "max_eig_residual": [float(o.eig_residual.max()) for o in outs],
        "wall_s": round(wall, 3),
    }
    (outdir / "prestress_sweep.json").write_text(json.dumps(record, indent=2))
    print(json.dumps(record))


if __name__ == "__main__":
    main()

"""Verify: WingStencilT (changed host-judge paths) on the real TPU.

Drives both changed branches — refine (the single-case engine default) and
outer_f64 (the bench/certification path) — on a small wing mesh, checks the
solution against an independent scipy direct factorization of the same
discrete system, then applies the spec physics judgments (converged, tip
sag, root>>tip vM).
"""
import time
import numpy as np
import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from tpufem.fem.stencil_mg import WingStencilT  # noqa: E402
from tpufem.mesher import WingMeshResolution  # noqa: E402

res = WingMeshResolution(24, 32, 4, te_floor_frac=0.006, spacing="le")
p4 = np.array([[1.2, 0.35, 10.0, 0.10], [1.8, 0.25, 25.0, 0.07]], np.float64)

st = WingStencilT(res, dtype=jnp.float32)

t0 = time.time()
out = st.solve(p4, pressure=5e3, tol=1e-6, maxiter=2000, chunk_iters=200,
               refine_steps=6, inner_tol=1e-3)
rel_r = np.asarray(out.rel_residual)
print(f"refine: iters={out.iters} rel={rel_r} conv={np.asarray(out.converged)}"
      f" ({time.time()-t0:.1f}s incl compile)", flush=True)
assert bool(np.all(np.asarray(out.converged))), rel_r
assert np.asarray(out.u).dtype == np.float64

t0 = time.time()
o64 = st.solve(p4, pressure=5e3, tol=1e-6, maxiter=2000, chunk_iters=200,
               outer_f64=True)
rel64 = np.asarray(o64.rel_residual)
print(f"outer64: iters={o64.iters} rel={rel64} conv={np.asarray(o64.converged)}"
      f" ({time.time()-t0:.1f}s)", flush=True)
assert bool(np.all(np.asarray(o64.converged))), rel64

# the two certified paths must agree on the solution
du = np.abs(np.asarray(out.u) - np.asarray(o64.u)).max()
su = np.abs(np.asarray(o64.u)).max()
print(f"refine-vs-outer64 solution agreement: {du/su:.3e}", flush=True)
assert du / su < 1e-5

# independent anchor: scipy direct factorization of the same system
from tpufem.fem.refsolve import direct_solve  # noqa: E402
from tpufem.mesher import structured_wing_mesh  # noqa: E402
from tpufem.sets import build_boundary_sets  # noqa: E402

for b in range(p4.shape[0]):
    mesh = structured_wing_mesh(*p4[b], res)
    sets = build_boundary_sets(mesh)
    u_ref, _, vm_ref = direct_solve(mesh, sets, pressure=5e3)
    u = np.asarray(o64.u)[:, :, b]
    err = np.abs(u - u_ref).max() / np.abs(u_ref).max()
    print(f"case {b}: vs scipy direct rel err {err:.3e}", flush=True)
    assert err < 1e-6, err

    # physics judgments (reference spec.md:309-353 analog)
    vm = np.asarray(o64.vm)[:, b]
    y = mesh.nodes[:, 1]
    span = y.max() - y.min()
    tip = y > y.max() - 0.15 * span
    root = y < y.min() + 0.15 * span
    tip_uz = u[tip, 2].mean()
    ratio = vm[root].mean() / max(vm[tip].mean(), 1e-12)
    print(f"case {b}: tip mean u_z {tip_uz:.3e}  root/tip vM {ratio:.1f}",
          flush=True)
    assert tip_uz < 0, "wing must sag under upper-surface pressure"
    assert ratio > 3.0, "root stress must dominate tip"

print("VERIFY s3 OK", flush=True)

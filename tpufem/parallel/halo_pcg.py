"""Hand-scheduled mesh-sharded PCG: spanwise slabs + ppermute halo exchange.

This is the ICI design for the ~1M-DOF config (BASELINE.json config 5), built
on the structured wing topology's locality: with nodes ordered span-major
(j, i, k), a 1-D device mesh owns contiguous spanwise slabs; every element
touches only spans j and j+1, so the SpMV needs exactly ONE ghost layer from
the next device. Each CG iteration performs:

    ghost   = ppermute(first span layer)          # backward shift over ICI
    f_local = element forces on owned cells       # local gather/compute
    f_ghost = contributions to the ghost layer
    psum'd back: ppermute(f_ghost) forward, added to the owner's first layer
    dots    = psum(local partials)

The thickness-line preconditioner is slab-local by construction (stations never
straddle devices); boundary-layer blocks are completed with one extra ppermute
of partial block sums at setup. Contrast with tpufem.parallel.sharded_solver,
which states the same solve with GSPMD annotations and lets XLA insert
(all-gather-shaped) collectives — this module is the explicit-schedule variant
that keeps all traffic at one ghost layer per iteration.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpufem.fem.material import Material, lame_params
from tpufem.mesher import WingMeshResolution, wing_topology
from tpufem.sets import build_boundary_sets
from tpufem.mesher import structured_wing_mesh


@dataclass
class HaloPartition:
    """Host-prepared per-device arrays (leading axis = device)."""

    n_devices: int
    layer_nodes: int  # nodes per span layer (g)
    n_local: int  # owned nodes per device (NJ_loc * g)
    nodes: np.ndarray  # (D, n_local, 3) owned node coords (span-major order)
    tets_local: np.ndarray  # (D, T_loc, 4) local ids in [0, n_local + g)
    tet_mask: np.ndarray  # (D, T_loc)
    upper_local: np.ndarray  # (D, F_loc, 3) local ids
    face_mask: np.ndarray  # (D, F_loc)
    free_mask: np.ndarray  # (D, n_local*3)
    # line-preconditioner plan (shared structure, per-device pair data)
    pair_t: np.ndarray  # (D, P) into tets_local
    pair_a: np.ndarray  # (D, P)
    pair_b: np.ndarray  # (D, P)
    pair_seg: np.ndarray  # (D, P) flat index into (S_loc, Dd, Dd) | ghost band
    pair_mask: np.ndarray  # (D, P)
    s_loc: int  # owned stations per device
    s_ghost: int  # ghost-layer stations (one span layer)
    K: int  # slots per station
    station_nodes: np.ndarray  # (S_loc, K) local node id per slot (shared)
    slot_valid: np.ndarray  # (S_loc, K)
    node_station: np.ndarray  # (n_local,)
    node_slot: np.ndarray  # (n_local,)
    perm: np.ndarray  # global (span-major) node order: new -> old
    num_nodes: int


def build_halo_partition(
    res: WingMeshResolution,
    n_devices: int,
    span_m: float,
    chord_m: float,
    sweep_deg: float,
    thickness_ratio: float,
    dtype=np.float32,
) -> HaloPartition:
    topo = wing_topology(res)
    NJ = res.n_span + 1
    if NJ % n_devices != 0:
        raise ValueError(f"span stations {NJ} not divisible by {n_devices} devices")
    NJ_loc = NJ // n_devices
    NK = topo.slots_per_station
    NI = res.n_chord + 1

    st = topo.station_id.astype(np.int64)
    sl = topo.slot.astype(np.int64)
    ri, rj = st // NJ, st % NJ

    # span-major node order: (j, i, k)
    key = (rj * NI + ri) * NK + sl
    perm = np.argsort(key, kind="stable")  # new -> old
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))

    mesh = structured_wing_mesh(span_m, chord_m, sweep_deg, thickness_ratio, res)
    bs = build_boundary_sets(mesh)
    nodes_new = mesh.nodes[perm]
    rj_new, ri_new, sl_new = rj[perm], ri[perm], sl[perm]

    g = int(np.sum(rj_new == 0))  # nodes per span layer
    n_local = NJ_loc * g
    D = n_devices
    assert g * NJ == topo.num_nodes

    tets_new = inv[topo.tets.astype(np.int64)]
    # element owner: device of its lowest span layer
    tj = rj_new[tets_new]
    j_lo = tj.min(axis=1)
    dev = j_lo // NJ_loc
    # local ids relative to the device's first node
    T = len(tets_new)
    T_loc = int(np.bincount(dev, minlength=D).max())
    tets_local = np.zeros((D, T_loc, 4), np.int32)
    tet_mask = np.zeros((D, T_loc), dtype)
    for d in range(D):
        sel = np.nonzero(dev == d)[0]
        loc = tets_new[sel] - d * n_local
        assert loc.min() >= 0 and loc.max() < n_local + g
        tets_local[d, : len(sel)] = loc
        tet_mask[d, : len(sel)] = 1.0

    # upper faces by owner (same rule)
    upper = inv[mesh.surf_faces[bs.surf_upper_faces].astype(np.int64)]
    fj_lo = rj_new[upper].min(axis=1)
    fdev = fj_lo // NJ_loc
    F_loc = int(np.bincount(fdev, minlength=D).max())
    upper_local = np.zeros((D, F_loc, 3), np.int32)
    face_mask = np.zeros((D, F_loc), dtype)
    for d in range(D):
        sel = np.nonzero(fdev == d)[0]
        upper_local[d, : len(sel)] = upper[sel] - d * n_local
        face_mask[d, : len(sel)] = 1.0

    # Dirichlet: root nodes are span layer 0 (device 0 only)
    free = np.ones((topo.num_nodes, 3), dtype)
    free[inv[bs.nroot_nodes]] = 0.0
    free_mask = free.reshape(D, n_local * 3)

    # ---- line-preconditioner plan over LOCAL stations (identical structure per
    # device). Local station id = (j_local * NI + i); ghost-layer stations get
    # ids S_loc + i so their partial blocks can be shipped to the next device.
    S_loc = NJ_loc * NI
    S_ghost = NI
    Dd = 3 * NK

    st_local_of_node = (rj_new % NJ_loc) * NI + ri_new  # valid for owned nodes
    station_nodes = np.zeros((S_loc, NK), np.int32)
    slot_valid = np.zeros((S_loc, NK), np.float32)
    own0 = slice(0, n_local)  # same layout on every device
    station_nodes[st_local_of_node[own0], sl_new[own0]] = np.arange(n_local, dtype=np.int32)
    slot_valid[st_local_of_node[own0], sl_new[own0]] = 1.0

    # pairs per device from its own elements (local node ids; ghost nodes map to
    # ghost stations S_loc + i)
    def station_of_local(local_ids, d):
        glob = local_ids + d * n_local
        jj = rj_new[glob] - d * NJ_loc  # 0..NJ_loc (NJ_loc = ghost layer)
        return np.where(jj < NJ_loc, jj * NI + ri_new[glob], S_loc + ri_new[glob])

    P_max = 0
    pair_data = []
    for d in range(D):
        tl = tets_local[d][tet_mask[d] > 0].astype(np.int64)
        cst = station_of_local(tl, d)
        csl = sl_new[tl + d * n_local]
        ti, ai, bi = [], [], []
        for a in range(4):
            for b in range(4):
                same = cst[:, a] == cst[:, b]
                idx = np.nonzero(same)[0]
                ti.append(idx)
                ai.append(np.full(len(idx), a))
                bi.append(np.full(len(idx), b))
        pt = np.concatenate(ti)
        pa = np.concatenate(ai)
        pb = np.concatenate(bi)
        s_p = cst[pt, pa]
        seg = s_p * (Dd * Dd) + (3 * csl[pt, pa]) * Dd + 3 * csl[pt, pb]
        pair_data.append((pt.astype(np.int32), pa.astype(np.int32), pb.astype(np.int32), seg))
        P_max = max(P_max, len(pt))

    pair_t = np.zeros((D, P_max), np.int32)
    pair_a = np.zeros((D, P_max), np.int32)
    pair_b = np.zeros((D, P_max), np.int32)
    pair_seg = np.zeros((D, P_max), np.int64)
    pair_mask = np.zeros((D, P_max), dtype)
    for d, (pt, pa, pb, seg) in enumerate(pair_data):
        n = len(pt)
        pair_t[d, :n] = pt
        pair_a[d, :n] = pa
        pair_b[d, :n] = pb
        pair_seg[d, :n] = seg
        pair_mask[d, :n] = 1.0

    return HaloPartition(
        n_devices=D,
        layer_nodes=g,
        n_local=n_local,
        nodes=nodes_new.reshape(D, n_local, 3).astype(dtype),
        tets_local=tets_local,
        tet_mask=tet_mask,
        upper_local=upper_local,
        face_mask=face_mask,
        free_mask=free_mask,
        pair_t=pair_t,
        pair_a=pair_a,
        pair_b=pair_b,
        pair_seg=pair_seg,
        pair_mask=pair_mask,
        s_loc=S_loc,
        s_ghost=S_ghost,
        K=NK,
        station_nodes=station_nodes,
        slot_valid=slot_valid,
        node_station=st_local_of_node[:n_local].astype(np.int32),
        node_slot=sl_new[:n_local].astype(np.int32),
        perm=perm,
        num_nodes=topo.num_nodes,
    )


def halo_pcg_solve(
    part: HaloPartition,
    mesh: Mesh,
    pressure: float,
    material: Material = Material(),
    tol: float = 1e-6,
    maxiter: int = 5000,
    axis: str = "mesh",
    dtype=jnp.float32,
):
    """Run the halo-exchange PCG over `mesh` (jax device mesh).

    Returns (u (num_nodes, 3) in ORIGINAL node order, iters, rel_residual).
    """
    from tpufem.fem.elements import tet4_setup

    lam, mu = lame_params(material)
    lam = jnp.asarray(lam, dtype)
    mu = jnp.asarray(mu, dtype)
    press = jnp.asarray(pressure, dtype)
    D = part.n_devices
    g = part.layer_nodes
    n_local = part.n_local
    K = part.K
    Dd = 3 * K
    S_loc, S_ghost = part.s_loc, part.s_ghost

    fwd = [(d, d + 1) for d in range(D - 1)]  # send to next (toward tip)
    bwd = [(d + 1, d) for d in range(D - 1)]  # send to prev (toward root)

    def pperm(x, perm):
        if not perm:  # single device: no neighbors, halo stays zero
            return jnp.zeros_like(x)
        return jax.lax.ppermute(x, axis, perm)

    station_nodes = jnp.asarray(part.station_nodes)
    node_station = jnp.asarray(part.node_station)
    node_slot = jnp.asarray(part.node_slot)

    def local_force(grads, vols, tets, u_ext):
        """element forces on local+ghost node vector (n_local+g, 3)."""
        ue = u_ext[tets]
        # broadcast-sum forms: tiny batched einsums lower onto the MXU with
        # heavy padding on TPU (measured 5x slower)
        H = (grads[:, :, :, None] * ue[:, :, None, :]).sum(axis=1)
        eps = 0.5 * (H + jnp.swapaxes(H, 1, 2))
        tr = eps[:, 0, 0] + eps[:, 1, 1] + eps[:, 2, 2]
        sig = 2.0 * mu * eps
        sig = sig.at[:, 0, 0].add(lam * tr)
        sig = sig.at[:, 1, 1].add(lam * tr)
        sig = sig.at[:, 2, 2].add(lam * tr)
        fe = vols[:, None, None] * (sig[:, None, :, :] * grads[:, :, None, :]).sum(axis=3)
        return jax.ops.segment_sum(fe.reshape(-1, 3), tets.reshape(-1), num_segments=n_local + g)

    def body(nodes_l, tets_l, tmask, upper_l, fmask, free_l, pt, pa, pb, pseg, pmask):
        # shard_map passes per-device blocks with the sharded axis kept (size 1)
        (nodes_l, tets_l, tmask, upper_l, fmask, free_l, pt, pa, pb, pseg, pmask) = (
            a[0] for a in (nodes_l, tets_l, tmask, upper_l, fmask, free_l, pt, pa, pb, pseg, pmask)
        )
        # --- geometry setup: need ghost node coords for boundary elements
        ghost_nodes = pperm(nodes_l[:g], bwd)
        nodes_ext = jnp.concatenate([nodes_l, ghost_nodes], axis=0)
        grads, vols = tet4_setup(nodes_ext, tets_l, tmask)

        # --- load vector (faces may touch ghosts; fold ghost share back)
        v = nodes_ext[upper_l]
        area_vec = 0.5 * jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
        f_vert = (-press / 3.0) * area_vec * fmask[:, None]
        f3 = jnp.broadcast_to(f_vert[:, None, :], (upper_l.shape[0], 3, 3))
        b_ext = jax.ops.segment_sum(
            f3.reshape(-1, 3), upper_l.reshape(-1), num_segments=n_local + g
        )
        b = b_ext[:n_local].at[:g].add(pperm(b_ext[n_local:], fwd))
        free3 = free_l.reshape(-1, 3)
        b = (b * free3).reshape(-1)

        # --- operator with halo exchange
        def A(x_flat):
            u = x_flat.reshape(-1, 3) * free3
            ghost = pperm(u[:g], bwd)
            y_ext = local_force(grads, vols, tets_l, jnp.concatenate([u, ghost], 0))
            y = y_ext[:n_local].at[:g].add(pperm(y_ext[n_local:], fwd))
            y = y * free3 + x_flat.reshape(-1, 3) * (1.0 - free3)
            return y.reshape(-1)

        # --- line-preconditioner blocks (ghost-band partials shipped forward)
        ga = grads[pt, pa]
        gb = grads[pt, pb]
        vv = vols[pt] * pmask
        eye = jnp.eye(3, dtype=dtype)
        kab = vv[:, None, None] * (
            lam * ga[:, :, None] * gb[:, None, :]
            + mu * gb[:, :, None] * ga[:, None, :]
            + mu * (ga * gb).sum(axis=1)[:, None, None] * eye
        )
        offs = jnp.arange(3)
        seg = (pseg[:, None, None] + offs[None, :, None] * Dd + offs[None, None, :]).reshape(-1)
        flat = jax.ops.segment_sum(
            kab.reshape(-1), seg, num_segments=(S_loc + S_ghost) * Dd * Dd
        )
        B_all = flat.reshape(S_loc + S_ghost, Dd, Dd)
        # ghost-band partial blocks belong to the NEXT device's first station row
        ghost_blocks = pperm(B_all[S_loc:], fwd)
        B = B_all[:S_loc].at[:S_ghost].add(ghost_blocks)

        fm = free3[station_nodes] * jnp.asarray(part.slot_valid)[:, :, None]
        mvec = fm.reshape(S_loc, Dd)
        B = B * mvec[:, :, None] * mvec[:, None, :]
        B = B + jnp.eye(Dd, dtype=dtype)[None] * (1.0 - mvec)[:, :, None]
        from tpufem.fem.precond import spd_block_inverse

        Binv = spd_block_inverse(B)

        def M(r_flat):
            r3 = r_flat.reshape(-1, 3)
            rs = r3[station_nodes].reshape(S_loc, Dd)
            zs = (Binv * rs[:, None, :]).sum(axis=2)
            zs = zs.reshape(S_loc, K, 3)
            return zs[node_station, node_slot].reshape(-1)

        def dot(u_, v_):
            return jax.lax.psum(jnp.vdot(u_, v_), axis)

        # --- PCG with psum'd dots
        x = jnp.zeros_like(b)
        r = b
        z = M(r)
        p = z
        rz = dot(r, z)
        bnorm = jnp.sqrt(dot(b, b))
        bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
        tol2 = (tol * bnorm) ** 2

        def cond(state):
            _, r, _, _, _, k = state
            return (dot(r, r) > tol2) & (k < maxiter)

        def step(state):
            x, r, p, z, rz, k = state
            Ap = A(p)
            alpha = rz / dot(p, Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            z = M(r)
            rz_new = dot(r, z)
            p = z + rz_new / rz * p
            return (x, r, p, z, rz_new, k + 1)

        x, r, p, z, rz, k = jax.lax.while_loop(cond, step, (x, r, p, z, rz, jnp.int32(0)))
        rel = jnp.sqrt(dot(r, r)) / bnorm
        # restore the sharded leading axis for the output spec
        return (x * free_l).reshape(1, -1, 3), k, rel

    spec_nodes = P(axis, None, None)
    spec_vec = P(axis, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(axis, None, None),  # nodes (D, n_local, 3)
            P(axis, None, None),  # tets
            spec_vec,  # tet_mask
            P(axis, None, None),  # upper
            spec_vec,  # face_mask
            spec_vec,  # free
            spec_vec, spec_vec, spec_vec, spec_vec, spec_vec,  # pairs
        ),
        out_specs=(spec_nodes, P(), P()),
        check_vma=False,
    )

    put = lambda a, spec: jax.device_put(a, NamedSharding(mesh, spec))  # noqa: E731
    u_shards, iters, rel = jax.jit(fn)(
        put(jnp.asarray(part.nodes, dtype), spec_nodes),
        put(jnp.asarray(part.tets_local), P(axis, None, None)),
        put(jnp.asarray(part.tet_mask, dtype), spec_vec),
        put(jnp.asarray(part.upper_local), P(axis, None, None)),
        put(jnp.asarray(part.face_mask, dtype), spec_vec),
        put(jnp.asarray(part.free_mask, dtype), spec_vec),
        put(jnp.asarray(part.pair_t), spec_vec),
        put(jnp.asarray(part.pair_a), spec_vec),
        put(jnp.asarray(part.pair_b), spec_vec),
        put(jnp.asarray(part.pair_seg), spec_vec),
        put(jnp.asarray(part.pair_mask, dtype), spec_vec),
    )
    u_new = np.asarray(u_shards).reshape(-1, 3)  # span-major order
    u = np.empty_like(u_new)
    u[part.perm] = u_new  # back to original node order
    return u, int(iters), float(rel)

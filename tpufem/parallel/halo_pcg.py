"""Hand-scheduled mesh-sharded PCG: spanwise slabs + ppermute halo exchange.

The ICI design for the large-mesh configs (BASELINE.json config 5), built on
the structured wing topology's locality. Nodes are ordered span-major by their
"layer" (tet4: span station j; tet10: doubled-grid station j2), so a 1-D
device mesh owns contiguous spanwise slabs and every element touches at most
`W` consecutive layers (tet4: 2, tet10: 3). Per CG iteration:

    ghost   = ppermute(first (W-1)-layer nodes)   # backward shift over ICI
    f_local = element forces on owned cells       # local compute
    f_ghost = contributions to the ghost layers, ppermute'd forward and added
    dots    = psum(local partials)

Generalizations over the round-1 version (VERDICT round 1, "next round" #1):
  - tet4 AND tet10 elements (ghost width follows the element's layer span);
  - UNEVEN slabs: layers are np.array_split across devices and every
    per-device array is padded to the maximum slab size, so any layer count
    >= n_devices * W works (the old `NJ % n_devices == 0` constraint excluded
    the flagship resolution outright);
  - the full two-level preconditioner inside the sharded operator: slab-local
    thickness-line blocks (ghost station bands shipped forward at setup) PLUS
    the rigid-body-mode coarse correction, whose small dense system is
    psum-reduced and solved redundantly on every device.

Contrast with tpufem.parallel.sharded_solver (GSPMD annotations, XLA inserts
collectives — kept as a test-only cross-check): this module keeps all traffic
at one (W-1)-layer ghost exchange per iteration.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpufem.fem.material import Material, lame_params
from tpufem.fem.precond import build_rbm_groups, spd_block_inverse
from tpufem.mesher import WingMeshResolution, structured_wing_mesh, wing_topology
from tpufem.sets import build_boundary_sets


@dataclass
class HaloPartition:
    """Host-prepared per-device arrays (leading axis = device).

    Node layout per device: slots [0, n_max) hold owned nodes (padded; padding
    slots are fully masked), slots [n_max, n_max + g_max) hold ghosts = the
    next device's first nodes in its local order.
    """

    n_devices: int
    element: str  # 'tet4' | 'tet10'
    V: int  # nodes per element
    W: int  # element layer span (ghost width = W - 1)
    n_max: int  # owned-node slots per device
    g_max: int  # ghost slots
    NI: int  # stations per layer
    K: int  # slots per station
    s_max: int  # owned-station slots per device (NI * max layers)
    s_ghost: int  # ghost-station slots (NI * (W - 1))
    nodes: np.ndarray  # (D, n_max, 3)
    node_mask: np.ndarray  # (D, n_max)
    elems: np.ndarray  # (D, T_max, V) local ids in [0, n_max + g_max)
    elem_mask: np.ndarray  # (D, T_max)
    faces: np.ndarray  # (D, F_max, Vf) loaded faces, local ids
    face_mask: np.ndarray  # (D, F_max)
    free: np.ndarray  # (D, n_max, 3)
    node_station: np.ndarray  # (D, n_max) local station in [0, s_max + s_ghost)
    node_slot: np.ndarray  # (D, n_max)
    elem_station: np.ndarray  # (D, T_max, V)
    elem_slot: np.ndarray  # (D, T_max, V)
    station_nodes: np.ndarray  # (D, s_max, K) local node id per slot
    slot_valid: np.ndarray  # (D, s_max, K)
    node_group: np.ndarray  # (D, n_max) global RBM group of each owned node
    n_groups: int
    perm: np.ndarray  # global span-major order: new -> old
    num_nodes: int  # global welded node count
    dev_of_node: np.ndarray  # (N,) owner device of each global (new-order) node


def _wing_arrays(res: WingMeshResolution, span, chord, sweep, t, element: str):
    """Global welded arrays for either element type, plus layer/station maps."""
    topo = wing_topology(res)
    mesh = structured_wing_mesh(span, chord, sweep, t, res)
    bs = build_boundary_sets(mesh)
    NJ = res.n_span + 1
    st4 = topo.station_id.astype(np.int64)
    i4, j4 = st4 // NJ, st4 % NJ

    if element == "tet4":
        nodes = mesh.nodes
        elems = topo.tets.astype(np.int64)
        faces = mesh.surf_faces[bs.surf_upper_faces].astype(np.int64)
        layer = j4
        n_layers = NJ
        chord_i = i4
        slot = topo.slot.astype(np.int64)
        K = topo.slots_per_station
        NI = res.n_chord + 1
        W = 2
        free = np.ones((topo.num_nodes, 3), np.float32)
        free[bs.nroot_nodes] = 0.0
    elif element == "tet10":
        from tpufem.fem.tet10 import tet10_from_tet4, tet10_root_nodes, tet10_upper_t6

        t10 = tet10_from_tet4(mesh)
        nodes = t10.nodes10(mesh.nodes)
        elems = t10.tet10.astype(np.int64)
        faces = tet10_upper_t6(t10, bs.surf_upper_faces).astype(np.int64)
        NJ2 = 2 * NJ - 1
        st2 = t10.station_id.astype(np.int64)
        chord_i = st2 // NJ2
        layer = st2 % NJ2
        n_layers = NJ2
        slot = t10.slot.astype(np.int64)
        K = t10.slots_per_station
        NI = int(chord_i.max()) + 1
        W = 3
        free = np.ones((t10.num_nodes, 3), np.float32)
        free[tet10_root_nodes(t10)] = 0.0
    else:
        raise ValueError(element)
    return nodes, elems, faces, layer, n_layers, chord_i, slot, K, NI, W, free


def build_halo_partition(
    res: WingMeshResolution,
    n_devices: int,
    span_m: float,
    chord_m: float,
    sweep_deg: float,
    thickness_ratio: float,
    dtype=np.float32,
    element: str = "tet4",
    rbm_group=(4, 4),
) -> HaloPartition:
    nodes, elems, faces, layer, n_layers, chord_i, slot, K, NI, W, free = _wing_arrays(
        res, span_m, chord_m, sweep_deg, thickness_ratio, element
    )
    D = n_devices
    N = len(nodes)
    if n_layers < D * W:
        raise ValueError(f"{n_layers} layers cannot be split over {D} devices (need >= {D * W})")

    # span-major node order: (layer, chord station, slot)
    key = (layer * NI + chord_i) * K + slot
    perm = np.argsort(key, kind="stable")  # new -> old
    inv = np.empty_like(perm)
    inv[perm] = np.arange(N)

    layer_n, chord_n, slot_n = layer[perm], chord_i[perm], slot[perm]
    nodes_n = nodes[perm]
    free_n = free[perm]
    elems_n = inv[elems]
    faces_n = inv[faces]

    # uneven slab split of layers
    layer_sets = np.array_split(np.arange(n_layers), D)
    first_layer = np.array([ls[0] for ls in layer_sets])
    dev_of_layer = np.zeros(n_layers, np.int64)
    for d, ls in enumerate(layer_sets):
        dev_of_layer[ls] = d
    dev_of_node = dev_of_layer[layer_n]
    node_start = np.searchsorted(dev_of_node, np.arange(D))
    node_end = np.append(node_start[1:], N)
    n_loc = node_end - node_start
    n_max = int(n_loc.max())

    # ghosts: next device's first nodes covering (W-1) layers
    g_cnt = np.zeros(D, np.int64)
    for d in range(D - 1):
        nxt = d + 1
        gl = layer_sets[nxt][: W - 1]
        sel = np.isin(layer_n[node_start[nxt] : node_end[nxt]], gl)
        g_cnt[d] = int(sel.sum())
        assert sel[: g_cnt[d]].all(), "ghost nodes must be a prefix of the next slab"
    g_max = int(g_cnt.max()) if D > 1 else 0

    def local_id(global_new, d):
        """Map global new-order node ids to device-d local slots."""
        own = (global_new >= node_start[d]) & (global_new < node_end[d])
        nxt_start = node_end[d]
        out = np.where(own, global_new - node_start[d], n_max + (global_new - nxt_start))
        bad = ~own & ((global_new < nxt_start) | (global_new >= nxt_start + max(g_max, 1)))
        if bad.any():
            raise AssertionError("element references a node outside slab+ghost")
        return out

    # elements / faces by owner = device of min layer
    e_dev = dev_of_layer[layer_n[elems_n].min(axis=1)]
    f_dev = dev_of_layer[layer_n[faces_n].min(axis=1)]
    T_max = int(np.bincount(e_dev, minlength=D).max())
    F_max = max(int(np.bincount(f_dev, minlength=D).max()), 1)
    V = elems.shape[1]
    Vf = faces.shape[1]

    max_layers = max(len(ls) for ls in layer_sets)
    s_max = NI * max_layers
    s_ghost = NI * (W - 1)

    def station_of(global_new, d):
        """Local station id: owned layers first (layer-major), ghosts after."""
        lay = layer_n[global_new]
        loc_lay = lay - first_layer[d]
        own_lay = len(layer_sets[d])
        ghost = loc_lay >= own_lay
        return np.where(
            ghost,
            s_max + (loc_lay - own_lay) * NI + chord_n[global_new],
            loc_lay * NI + chord_n[global_new],
        )

    elems_l = np.zeros((D, T_max, V), np.int32)
    elem_mask = np.zeros((D, T_max), dtype)
    elem_station = np.zeros((D, T_max, V), np.int32)
    elem_slot = np.zeros((D, T_max, V), np.int32)
    faces_l = np.zeros((D, F_max, Vf), np.int32)
    face_mask = np.zeros((D, F_max), dtype)
    nodes_p = np.zeros((D, n_max, 3), dtype)
    node_mask = np.zeros((D, n_max), dtype)
    free_p = np.zeros((D, n_max, 3), dtype)
    node_station = np.zeros((D, n_max), np.int32)
    node_slot = np.zeros((D, n_max), np.int32)
    station_nodes = np.zeros((D, s_max, K), np.int32)
    slot_valid = np.zeros((D, s_max, K), np.float32)

    for d in range(D):
        sl_own = slice(node_start[d], node_end[d])
        n_d = n_loc[d]
        nodes_p[d, :n_d] = nodes_n[sl_own]
        node_mask[d, :n_d] = 1.0
        free_p[d, :n_d] = free_n[sl_own]
        gids = np.arange(node_start[d], node_end[d])
        st_l = station_of(gids, d)
        node_station[d, :n_d] = st_l
        node_slot[d, :n_d] = slot_n[sl_own]
        station_nodes[d][st_l, slot_n[sl_own]] = np.arange(n_d, dtype=np.int32)
        slot_valid[d][st_l, slot_n[sl_own]] = 1.0

        sel = np.nonzero(e_dev == d)[0]
        ge = elems_n[sel]
        elems_l[d, : len(sel)] = local_id(ge, d)
        elem_mask[d, : len(sel)] = 1.0
        elem_station[d, : len(sel)] = station_of(ge, d)
        elem_slot[d, : len(sel)] = slot_n[ge]

        fsel = np.nonzero(f_dev == d)[0]
        if len(fsel):
            faces_l[d, : len(fsel)] = local_id(faces_n[fsel], d)
            face_mask[d, : len(fsel)] = 1.0

    # RBM groups: (chord-group x layer-group) aggregates of GLOBAL stations
    gi, gl = rbm_group
    ngi = (NI + gi - 1) // gi
    ngl = (n_layers + gl - 1) // gl
    node_group_glob = ((chord_n // gi) * ngl + (layer_n // gl)).astype(np.int32)
    node_group = np.zeros((D, n_max), np.int32)
    for d in range(D):
        node_group[d, : n_loc[d]] = node_group_glob[node_start[d] : node_end[d]]

    return HaloPartition(
        n_devices=D,
        element=element,
        V=V,
        W=W,
        n_max=n_max,
        g_max=g_max,
        NI=NI,
        K=K,
        s_max=s_max,
        s_ghost=s_ghost,
        nodes=nodes_p,
        node_mask=node_mask,
        elems=elems_l,
        elem_mask=elem_mask,
        faces=faces_l,
        face_mask=face_mask,
        free=free_p,
        node_station=node_station,
        node_slot=node_slot,
        elem_station=elem_station,
        elem_slot=elem_slot,
        station_nodes=station_nodes,
        slot_valid=slot_valid,
        node_group=node_group,
        n_groups=int(ngi * ngl),
        perm=perm,
        num_nodes=N,
        dev_of_node=dev_of_node,
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
    two_level: bool = True,
    chunk_iters: int | None = None,
):
    """Run the halo-exchange two-level-preconditioned PCG over `mesh` (jax
    device mesh). Returns (u (num_nodes, 3) in ORIGINAL node order, iters,
    rel_residual).

    chunk_iters bounds the iterations per device dispatch (None = one
    dispatch): long dispatches kill tunneled TPU workers (~1 min). The
    Krylov state (x, r, p, z, rz) is carried across dispatches, so the
    chunked solve is mathematically identical to the single-dispatch one;
    the chunk length and warm flag are traced scalars, so every chunk reuses
    ONE compiled program."""
    lam, mu = lame_params(material)
    lam = jnp.asarray(lam, dtype)
    mu = jnp.asarray(mu, dtype)
    press = jnp.asarray(pressure, dtype)
    D = part.n_devices
    n_max, g_max = part.n_max, part.g_max
    K = part.K
    Dd = 3 * K
    s_max, s_ghost = part.s_max, part.s_ghost
    V = part.V
    n_ext = n_max + max(g_max, 1)
    G = part.n_groups
    nc = 6 * G
    tet10 = part.element == "tet10"
    if tet10:
        from tpufem.fem.tet10 import DNDXI, GAUSS_WEIGHT

        dndxi = jnp.asarray(DNDXI, dtype)  # (Q,10,3)

    fwd = [(d, d + 1) for d in range(D - 1)]
    bwd = [(d + 1, d) for d in range(D - 1)]

    def pperm(x, perm):
        if not perm:
            return jnp.zeros_like(x)
        return jax.lax.ppermute(x, axis, perm)

    def body(nodes_l, nmask, elems, emask, faces, fmask, free_l,
             node_st, node_sl, el_st, el_sl, st_nodes, sl_valid, ngroup,
             cg_x, cg_r, cg_p, cg_z, cg_rz, warm, n_iters):
        (nodes_l, nmask, elems, emask, faces, fmask, free_l, node_st, node_sl,
         el_st, el_sl, st_nodes, sl_valid, ngroup) = (
            a[0] for a in (nodes_l, nmask, elems, emask, faces, fmask, free_l,
                           node_st, node_sl, el_st, el_sl, st_nodes, sl_valid, ngroup)
        )
        cg_x, cg_r, cg_p, cg_z = (a[0] for a in (cg_x, cg_r, cg_p, cg_z))

        def extend(u):
            """(n_max, ...) -> (n_ext, ...) with ghosts from the next device."""
            ghost = pperm(u[:g_max] if g_max else u[:1] * 0, bwd)
            if not g_max:
                ghost = jnp.zeros((1,) + u.shape[1:], u.dtype)
            return jnp.concatenate([u, ghost], axis=0)

        def foldback(y_ext):
            """Ship ghost contributions forward; returns (n_max, ...)."""
            if not g_max:
                return y_ext[:n_max]
            add = pperm(y_ext[n_max:], fwd)
            return y_ext[:n_max].at[:g_max].add(add)

        nodes_ext = extend(nodes_l)

        # ---- element geometry
        if tet10:
            from tpufem.fem.tet10 import tet10_setup

            Jinv, vols = tet10_setup(nodes_ext, elems, emask)
            gq = (dndxi[None, :, :, None, :] * Jinv[:, None, None, :, :]).sum(axis=-1)

            def elem_force(u_ext):
                ue = u_ext[elems]  # (T,10,3)
                H = (gq[:, :, :, :, None] * ue[:, None, :, None, :]).sum(axis=2)
                eps = 0.5 * (H + jnp.swapaxes(H, 2, 3))
                tr = eps[..., 0, 0] + eps[..., 1, 1] + eps[..., 2, 2]
                sig = 2.0 * mu * eps
                idx = jnp.arange(3)
                sig = sig.at[..., idx, idx].add(lam * tr[..., None])
                w = (GAUSS_WEIGHT * vols)[:, None]
                sw = sig * w[..., None, None]
                fe = (sw[:, :, None, :, :] * gq[:, :, :, None, :]).sum(axis=(1, 4))
                return jax.ops.segment_sum(fe.reshape(-1, 3), elems.reshape(-1), num_segments=n_ext)

            # pair-block values for the line assembly (per (a,b) corner pair)
            def pair_block(a, b):
                ga = gq[:, :, a]  # (T,Q,3)
                gb = gq[:, :, b]
                w = GAUSS_WEIGHT * vols
                outer_ab = (ga[:, :, :, None] * gb[:, :, None, :]).sum(axis=1)
                outer_ba = jnp.swapaxes(outer_ab, 1, 2)
                dot = (ga * gb).sum(axis=(1, 2))
                eye = jnp.eye(3, dtype=dtype)
                return w[:, None, None] * (lam * outer_ab + mu * outer_ba) + (
                    w * mu * dot
                )[:, None, None] * eye

            def loads():
                v = nodes_ext[faces[:, :3]]
                area = 0.5 * jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
                fm = (-press / 3.0) * area * fmask[:, None]
                f6 = jnp.broadcast_to(fm[:, None, :], (faces.shape[0], 3, 3))
                return jax.ops.segment_sum(
                    f6.reshape(-1, 3), faces[:, 3:].reshape(-1), num_segments=n_ext
                )
        else:
            from tpufem.fem.elements import tet4_setup

            grads, vols = tet4_setup(nodes_ext, elems, emask)

            def elem_force(u_ext):
                ue = u_ext[elems]
                H = (grads[:, :, :, None] * ue[:, :, None, :]).sum(axis=1)
                eps = 0.5 * (H + jnp.swapaxes(H, 1, 2))
                tr = eps[:, 0, 0] + eps[:, 1, 1] + eps[:, 2, 2]
                sig = 2.0 * mu * eps
                idx = jnp.arange(3)
                sig = sig.at[:, idx, idx].add(lam * tr[:, None])
                fe = vols[:, None, None] * (sig[:, None, :, :] * grads[:, :, None, :]).sum(axis=3)
                return jax.ops.segment_sum(fe.reshape(-1, 3), elems.reshape(-1), num_segments=n_ext)

            def pair_block(a, b):
                ga = grads[:, a]
                gb = grads[:, b]
                eye = jnp.eye(3, dtype=dtype)
                return vols[:, None, None] * (
                    lam * ga[:, :, None] * gb[:, None, :]
                    + mu * gb[:, :, None] * ga[:, None, :]
                    + mu * (ga * gb).sum(axis=1)[:, None, None] * eye
                )

            def loads():
                v = nodes_ext[faces]
                area = 0.5 * jnp.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
                fv = (-press / 3.0) * area * fmask[:, None]
                f3 = jnp.broadcast_to(fv[:, None, :], (faces.shape[0], 3, 3))
                return jax.ops.segment_sum(
                    f3.reshape(-1, 3), faces.reshape(-1), num_segments=n_ext
                )

        free3 = free_l * nmask[:, None]
        b = foldback(loads()) * free3

        def A(x):
            u = x * free3
            y = foldback(elem_force(extend(u)))
            return y * free3 + x * (1.0 - free3)

        # ---- line blocks: scatter same-station pair blocks, ship ghost bands
        flat = jnp.zeros(((s_max + s_ghost) * Dd * Dd,), dtype)
        offs = jnp.arange(3)
        for a in range(V):
            for c in range(V):
                same = (el_st[:, a] == el_st[:, c]).astype(dtype) * emask
                kab = pair_block(a, c) * same[:, None, None]
                base = (
                    el_st[:, a].astype(jnp.int64) * (Dd * Dd)
                    + (3 * el_sl[:, a]) * Dd
                    + 3 * el_sl[:, c]
                )
                idx = (base[:, None, None] + offs[None, :, None] * Dd + offs[None, None, :]).reshape(-1)
                flat = flat + jax.ops.segment_sum(
                    kab.reshape(-1), idx, num_segments=(s_max + s_ghost) * Dd * Dd
                )
        B_all = flat.reshape(s_max + s_ghost, Dd, Dd)
        ghost_blocks = pperm(B_all[s_max:], fwd)
        Bm = B_all[:s_max].at[:s_ghost].add(ghost_blocks)
        fm = free3[st_nodes] * sl_valid[:, :, None]
        mvec = fm.reshape(s_max, Dd)
        Bm = Bm * mvec[:, :, None] * mvec[:, None, :]
        Bm = Bm + jnp.eye(Dd, dtype=dtype)[None] * (1.0 - mvec)[:, :, None]
        Binv = spd_block_inverse(Bm)

        def M_line(r):
            rs = r[st_nodes].reshape(s_max, Dd)
            zs = (Binv * rs[:, None, :]).sum(axis=2)
            zs = zs.reshape(s_max, K, 3)
            return zs[node_st, node_sl] * nmask[:, None] * free3

        # ---- RBM coarse correction (global dense system, psum-reduced)
        if two_level:
            ones = nmask
            cnt = jax.lax.psum(
                jax.ops.segment_sum(ones, ngroup, num_segments=G), axis
            )
            xg = jax.lax.psum(
                jax.ops.segment_sum(nodes_l * nmask[:, None], ngroup, num_segments=G),
                axis,
            ) / jnp.maximum(cnt, 1.0)[:, None]
            dvec = (nodes_l - xg[ngroup]) * nmask[:, None]

            def rbm(dn):  # (M,3) -> (M,3,6)
                z = jnp.zeros_like(dn[:, 0])
                dx, dy, dz = dn[:, 0], dn[:, 1], dn[:, 2]
                rx = jnp.stack([z, -dz, dy], axis=1)
                ry = jnp.stack([dz, z, -dx], axis=1)
                rz = jnp.stack([-dy, dx, z], axis=1)
                ident = jnp.broadcast_to(jnp.eye(3, dtype=dtype)[None], (dn.shape[0], 3, 3))
                rot = jnp.stack([rx, ry, rz], axis=2)
                return jnp.concatenate([ident, rot], axis=2)

            # Ac = P^T A P columns via the halo operator applied to the 6G
            # RBM basis vectors is too expensive; assemble from owned elements
            # like tpufem.fem.precond.rbm_coarse_inverse, with ghost dvec.
            dvec_ext = extend(dvec)
            free_ext = extend(free3)
            group_ext = extend(ngroup[:, None])[:, 0]
            Ac_flat = jnp.zeros((nc * nc,), dtype)
            offs6 = jnp.arange(6)
            for a in range(V):
                Pa = rbm(dvec_ext[elems[:, a]])
                fa = free_ext[elems[:, a]]
                for c in range(V):
                    kab = pair_block(a, c) * emask[:, None, None]
                    fb = free_ext[elems[:, c]]
                    kab = kab * fa[:, :, None] * fb[:, None, :]
                    Pb = rbm(dvec_ext[elems[:, c]])
                    tmp = (Pa[:, :, :, None] * kab[:, :, None, :]).sum(axis=1)
                    blk = (tmp[:, :, :, None] * Pb[:, None, :, :]).sum(axis=2)
                    base = (
                        group_ext[elems[:, a]].astype(jnp.int64) * 6 * nc
                        + group_ext[elems[:, c]].astype(jnp.int64) * 6
                    )
                    idx = (
                        base[:, None, None] + offs6[None, :, None] * nc + offs6[None, None, :]
                    ).reshape(-1)
                    Ac_flat = Ac_flat + jax.ops.segment_sum(
                        blk.reshape(-1), idx, num_segments=nc * nc
                    )
            Ac = jax.lax.psum(Ac_flat, axis).reshape(nc, nc)
            dg = jnp.diagonal(Ac)
            act = (dg > 1e-8 * dg.max()).astype(dtype)
            Ac = Ac * act[:, None] * act[None, :] + jnp.eye(nc, dtype=dtype) * (1.0 - act)
            Ac_inv = spd_block_inverse(Ac[None], ns_iters=40, ridge=3e-4)[0]

            def M(r_in):
                z1 = M_line(r_in)
                rm = r_in * free3
                rot = jnp.cross(dvec, rm)
                rc_t = jax.ops.segment_sum(rm, ngroup, num_segments=G)
                rc_r = jax.ops.segment_sum(rot, ngroup, num_segments=G)
                rc = jax.lax.psum(
                    jnp.concatenate([rc_t, rc_r], axis=1).reshape(-1), axis
                )
                zc = (Ac_inv * rc[None, :]).sum(axis=1).reshape(G, 6)
                zt = zc[:, :3][ngroup]
                zw = zc[:, 3:][ngroup]
                z2 = (zt + jnp.cross(zw, dvec)) * free3 * nmask[:, None]
                return z1 + z2
        else:
            M = M_line

        def dot(u_, v_):
            return jax.lax.psum(jnp.vdot(u_, v_), axis)

        # fresh Krylov init from b, blended with the warm state carried
        # across dispatches (warm is a traced 0/1 scalar so ONE compiled
        # program serves the first and all subsequent chunks; the wasted
        # fresh init costs one preconditioner apply per chunk). Carrying
        # (r, p, z, rz) keeps chunk-bounded PCG mathematically identical to
        # one uninterrupted solve — a per-chunk restart discards the Krylov
        # direction (measured at the 2.5M-DOF flagship: contraction collapses
        # 0.3x -> 0.95x per 8 iterations). Chunk bounding exists because very
        # long single dispatches kill tunneled TPU workers (~1 min).
        z0 = M(b)
        x = warm * cg_x
        r = jnp.where(warm > 0, cg_r, b)
        z = jnp.where(warm > 0, cg_z, z0)
        p = jnp.where(warm > 0, cg_p, z0)
        rz = jnp.where(warm > 0, cg_rz, dot(b, z0))
        bnorm = jnp.sqrt(dot(b, b))
        bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
        tol2 = (tol * bnorm) ** 2

        def cond(state):
            _, r, _, _, _, k = state
            return (dot(r, r) > tol2) & (k < n_iters)

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
        return (x * free3)[None], r[None], p[None], z[None], rz, k, rel

    spec3 = P(axis, None, None)
    spec2 = P(axis, None)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec3, spec2, spec3, spec2, spec3, spec2, spec3,
                  spec2, spec2, spec3, spec3, spec3, spec3, spec2,
                  spec3, spec3, spec3, spec3, P(), P(), P()),
        out_specs=(spec3, spec3, spec3, spec3, P(), P(), P()),
        check_vma=False,
    )
    fn = jax.jit(fn)

    put = lambda a, spec: jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))  # noqa: E731
    fixed = (
        put(np.asarray(part.nodes, dtype), spec3),
        put(np.asarray(part.node_mask, dtype), spec2),
        put(part.elems, spec3),
        put(np.asarray(part.elem_mask, dtype), spec2),
        put(part.faces, spec3),
        put(np.asarray(part.face_mask, dtype), spec2),
        put(np.asarray(part.free, dtype), spec3),
        put(part.node_station, spec2),
        put(part.node_slot, spec2),
        put(part.elem_station, spec3),
        put(part.elem_slot, spec3),
        put(part.station_nodes, spec3),
        put(np.asarray(part.slot_valid, dtype), spec3),
        put(part.node_group, spec2),
    )
    zero3 = put(np.zeros((part.n_devices, n_max, 3), np.dtype(dtype)), spec3)
    sx, sr, sp, sz = zero3, zero3, zero3, zero3
    srz = jnp.asarray(0.0, dtype)
    warm = jnp.asarray(0.0, dtype)
    chunk = maxiter if chunk_iters is None else chunk_iters
    total = 0
    while True:
        step_n = min(chunk, maxiter - total)
        sx, sr, sp, sz, srz, k, rel = fn(
            *fixed, sx, sr, sp, sz, srz, warm, jnp.asarray(step_n, jnp.int32)
        )
        total += int(k)
        warm = jnp.asarray(1.0, dtype)
        if float(rel) <= tol or total >= maxiter or int(k) < step_n:
            break
    u_shards, iters = sx, total
    # unpad: concatenate each device's owned prefix, undo the span-major perm
    u_dev = np.asarray(u_shards)  # (D, n_max, 3)
    mask = np.asarray(part.node_mask) > 0
    u_new = np.concatenate([u_dev[d][mask[d]] for d in range(part.n_devices)], axis=0)
    u = np.empty_like(u_new)
    u[part.perm] = u_new
    return u, int(iters), float(rel)

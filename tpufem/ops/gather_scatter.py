"""Pallas TPU kernel: segmented sum over sorted segment ids.

XLA:TPU lowers scatter-add with duplicate indices poorly (measured in the FEM
SpMV study: scatter ~1.5x slower than gather formulations and serialization-
prone). This kernel exploits sortedness: within an edge tile the distinct
segment ids are first compressed to dense within-tile slots with a one-hot
matmul on the MXU (vectorized along the channel axis), then at most
`TILE // min_degree` accumulation stores hit the output — instead of one
read-modify-write per edge.

Used for GraphSAGE mean aggregation (tpufem.models.sage, aggregate_impl=
"pallas"); the same kernel shape serves any sorted segment reduction.
Falls back to interpret mode off-TPU so tests run on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _seg_sum_kernel(seg_ref, msgs_ref, out_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    seg = seg_ref[:, 0]  # (TILE,) int32, sorted; padded rows carry the dump id
    msgs = msgs_ref[:]  # (TILE, C)

    # within-tile compression: slot[i] = #segment boundaries before row i
    prev = jnp.concatenate([seg[:1] - 1, seg[:-1]])
    is_start = (seg != prev).astype(jnp.int32)
    slot = jnp.cumsum(is_start) - 1  # (TILE,) 0-based slot per row
    n_slots = jnp.sum(is_start)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    member = slot[rows] == cols  # row i belongs to slot j
    onehot = member.astype(msgs.dtype)
    # per-slot partial sums, contraction on the MXU
    partial_sums = jax.lax.dot_general(
        onehot,
        msgs,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(msgs.dtype)  # (TILE slots, C)

    # output row of each slot = segment id at any member row
    big = jnp.int32(2**30)
    slot_seg = jnp.min(jnp.where(member, seg[rows], big), axis=0)  # (TILE,)

    def body(k, _):
        @pl.when(k < n_slots)
        def _():
            s = jax.lax.dynamic_index_in_dim(slot_seg, k, keepdims=False)
            cur = out_ref[pl.ds(s, 1), :]
            add = jax.lax.dynamic_slice_in_dim(partial_sums, k, 1, axis=0)
            out_ref[pl.ds(s, 1), :] = cur + add

        return 0

    jax.lax.fori_loop(0, TILE, body, 0)


@partial(jax.jit, static_argnames=("num_segments", "interpret"))
def sorted_segment_sum_pallas(msgs, seg_sorted, num_segments: int, interpret: bool = False):
    """Segment sum of msgs (E, C) with SORTED int32 seg ids into (num_segments, C).

    Padding convention: rows with seg == num_segments land in a dump row that is
    dropped before returning.
    """
    E, C = msgs.shape
    Ep = ((E + TILE - 1) // TILE) * TILE
    pad = Ep - E
    if pad:
        msgs = jnp.pad(msgs, ((0, pad), (0, 0)))
        seg_sorted = jnp.pad(seg_sorted, (0, pad), constant_values=num_segments)
    seg2d = seg_sorted.reshape(-1, 1).astype(jnp.int32)

    out = pl.pallas_call(
        _seg_sum_kernel,
        grid=(Ep // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_segments + 1, C), lambda t: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_segments + 1, C), msgs.dtype),
        interpret=interpret,
    )(seg2d, msgs)
    return out[:num_segments]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # noqa: BLE001
        return False


def gather_mean_aggregate(h, edge_index, edge_mask, num_nodes: int):
    """Mean neighbor aggregation with the Pallas sorted-segment-sum kernel.

    Semantics identical to tpufem.models.sage.segment_mean_aggregate; edges are
    sorted by destination inside jit (one argsort per call; fixed-topology
    callers can pre-sort and call sorted_segment_sum_pallas directly).
    """
    src, dst = edge_index[0], edge_index[1]
    # masked-out (padded) edges sort to the dump segment
    dst_eff = jnp.where(edge_mask > 0, dst.astype(jnp.int32), num_nodes)
    order = jnp.argsort(dst_eff)
    w = edge_mask[order][:, None]
    msgs = h[src[order]] * w
    seg = dst_eff[order]
    interpret = not _on_tpu()
    sums = sorted_segment_sum_pallas(msgs, seg, num_nodes, interpret=interpret)
    deg = sorted_segment_sum_pallas(
        jnp.broadcast_to(w, (w.shape[0], 1)), seg, num_nodes, interpret=interpret
    )
    return sums / jnp.maximum(deg, 1.0)

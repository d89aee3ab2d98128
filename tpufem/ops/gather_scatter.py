"""Pallas TPU kernel: segmented sum over sorted segment ids.

XLA:TPU lowers scatter-add with duplicate indices poorly (measured in the FEM
SpMV study: scatter ~1.5x slower than gather formulations and serialization-
prone). This kernel exploits sortedness: within an edge tile the distinct
segment ids are first compressed to dense within-tile slots with a one-hot
matmul on the MXU (vectorized along the channel axis), then at most
`n_slots` accumulation stores hit the output — instead of one
read-modify-write per edge.

TPU-lowering notes (verified on a v5e; the first version of this kernel only
ran in interpret mode):
- `jnp.cumsum` has no Pallas TPU lowering — the slot index is computed with a
  lower-triangular one-matrix matmul on the MXU instead.
- segment starts are detected with a (TILE, TILE) comparison matrix rather
  than a shifted concatenate (1-D concatenate lowering is fragile).
- the accumulator output must stay VMEM-resident across all edge tiles, and
  VMEM lane padding makes its footprint (rows x 128 lanes x 4 B) independent
  of C<=128 — so the kernel is capped at MAX_SEGMENTS (~24.5k) output rows
  and larger graphs fall back to XLA segment_sum (gather_mean_aggregate).
- `dynamic_slice` of VALUES has no TPU lowering; per-slot rows are staged
  through VMEM/SMEM scratch refs and read back with pl.ds / scalar indexing.

Used for GraphSAGE mean aggregation (tpufem.models.sage, aggregate_impl=
"pallas"); the same kernel shape serves any sorted segment reduction.
Falls back to interpret mode off-TPU so tests run on CPU. Differentiable via
custom_vjp: d/dmsgs of a segment sum is a row gather of the cotangent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256
# The whole (num_segments+1, C) output must stay resident in VMEM across all
# grid steps (every edge tile accumulates into it). VMEM tiles are (8, 128):
# a C<=128 f32 buffer still occupies 128 lanes, so channel chunking CANNOT
# shrink it — the only budget knob is the number of output rows. ~12 MiB of
# the 16 MiB scoped-vmem limit leaves room for the double-buffered edge
# blocks and scratch (measured: a 36865-row output OOMs at 18.6M scoped).
MAX_SEGMENTS = 12 * 2**20 // (128 * 4) - 1  # 24575 rows for f32


def _seg_sum_kernel(seg_ref, seg_smem_ref, msgs_ref, out_ref, ps_ref, ss_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    seg = seg_ref[:, 0]  # (TILE,) int32, sorted; padded rows carry the dump id
    msgs = msgs_ref[:]  # (TILE, C)

    rows = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)

    # within-tile compression. is_start[i] = no j<i shares seg[i] (sortedness
    # makes equality-anywhere-before equivalent to adjacency). Broadcasts, not
    # 1-D-by-2-D gathers: Pallas TPU only lowers 2-D gathers.
    eq = seg[:, None] == seg[None, :]
    strictly_before = cols < rows
    n_before = jnp.sum((eq & strictly_before).astype(jnp.float32), axis=1)
    is_start = (n_before == 0.0).astype(jnp.float32)  # (TILE,)
    # slot[i] = inclusive_cumsum(is_start)[i] - 1, cumsum as a triangular
    # matmul on the MXU (no cumsum primitive in Pallas TPU lowering)
    tril = (cols <= rows).astype(jnp.float32)
    csum = jax.lax.dot_general(
        tril,
        is_start[:, None],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, 0]
    slot = csum.astype(jnp.int32) - 1  # (TILE,) 0-based slot per row

    member = slot[:, None] == cols  # row i belongs to slot j
    onehot = member.astype(msgs.dtype)
    # per-slot partial sums, contraction on the MXU; staged to VMEM scratch
    # because dynamic slicing is only lowerable on refs, not values
    # precision=HIGHEST: the MXU's default bf16 input rounding would cost
    # ~3e-3 relative error on the aggregated values (the 0/1 onehot is exact
    # either way; msgs is not) — measured end-to-end on a v5e GraphSAGE
    ps_ref[:] = jax.lax.dot_general(
        onehot,
        msgs,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(msgs.dtype)  # (TILE slots, C)

    # scalar walk over the SMEM copy of the tile's seg ids: record each slot's
    # output row in SMEM scratch (the vector slot ids cannot be read as
    # scalars; dynamic_slice on values has no TPU lowering)
    def walk(i, k):
        sid = seg_smem_ref[i, 0]
        prev = seg_smem_ref[jnp.maximum(i - 1, 0), 0]
        start = jnp.logical_or(i == 0, sid != prev)

        @pl.when(start)
        def _record():
            ss_ref[k] = sid

        return k + start.astype(jnp.int32)

    n_slots = jax.lax.fori_loop(0, TILE, walk, jnp.int32(0))

    # at most n_slots (~TILE/mean_degree) read-modify-writes hit the output
    def body(k, _):
        s = ss_ref[k]
        out_ref[pl.ds(s, 1), :] = out_ref[pl.ds(s, 1), :] + ps_ref[pl.ds(k, 1), :]
        return 0

    jax.lax.fori_loop(0, n_slots, body, 0)


def _seg_sum_call(msgs, seg2d, num_segments: int, interpret: bool):
    Ep, C = msgs.shape
    out = pl.pallas_call(
        _seg_sum_kernel,
        grid=(Ep // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda t: (t, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, C), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_segments + 1, C), lambda t: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_segments + 1, C), msgs.dtype),
        scratch_shapes=[
            pltpu.VMEM((TILE, C), msgs.dtype),
            pltpu.SMEM((TILE,), jnp.int32),
        ],
        interpret=interpret,
    )(seg2d, seg2d, msgs)
    return out[:num_segments]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sorted_segment_sum_pallas(msgs, seg_sorted, num_segments: int, interpret: bool = False):
    """Segment sum of msgs (E, C) with SORTED int32 seg ids into (num_segments, C).

    Padding convention: rows with seg == num_segments land in a dump row that is
    dropped before returning. num_segments is capped at MAX_SEGMENTS (the
    output buffer must fit VMEM, see above); larger reductions belong to XLA
    segment_sum — gather_mean_aggregate falls back automatically.
    """
    if num_segments > MAX_SEGMENTS and not interpret:
        raise ValueError(
            f"sorted_segment_sum_pallas: num_segments={num_segments} exceeds "
            f"the VMEM-resident output cap ({MAX_SEGMENTS}); use XLA "
            "segment_sum for larger reductions"
        )
    E, C = msgs.shape
    Ep = ((E + TILE - 1) // TILE) * TILE
    pad = Ep - E
    if pad:
        msgs = jnp.pad(msgs, ((0, pad), (0, 0)))
        seg_sorted = jnp.pad(seg_sorted, (0, pad), constant_values=num_segments)
    seg2d = seg_sorted.reshape(-1, 1).astype(jnp.int32)
    return _seg_sum_call(msgs, seg2d, num_segments, interpret)


def _seg_sum_fwd(msgs, seg_sorted, num_segments: int, interpret: bool = False):
    out = sorted_segment_sum_pallas(msgs, seg_sorted, num_segments, interpret)
    return out, seg_sorted


def _seg_sum_bwd(num_segments: int, interpret: bool, seg_sorted, g):
    # vjp of a segment sum: every edge row receives its segment's cotangent;
    # dump rows (seg == num_segments) receive zero via the appended row
    g_pad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    return (g_pad[jnp.clip(seg_sorted, 0, num_segments)], None)


sorted_segment_sum_pallas.defvjp(_seg_sum_fwd, _seg_sum_bwd)


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
    if num_nodes > MAX_SEGMENTS and _on_tpu():
        # output cannot stay VMEM-resident at this node count: XLA segment
        # path (tpufem.models.sage.segment_mean_aggregate) is the right tool
        from tpufem.models.sage import segment_mean_aggregate

        return segment_mean_aggregate(h, edge_index, edge_mask, num_nodes)
    src, dst = edge_index[0], edge_index[1]
    # masked-out (padded) edges sort to the dump segment
    dst_eff = jnp.where(edge_mask > 0, dst.astype(jnp.int32), num_nodes)
    order = jnp.argsort(dst_eff)
    w = edge_mask[order][:, None]
    msgs = h[src[order]] * w
    seg = dst_eff[order]
    interpret = not _on_tpu()
    sums = sorted_segment_sum_pallas(msgs, seg, num_nodes, interpret)
    deg = sorted_segment_sum_pallas(
        jnp.broadcast_to(w, (w.shape[0], 1)), seg, num_nodes, interpret
    )
    return sums / jnp.maximum(deg, 1.0)

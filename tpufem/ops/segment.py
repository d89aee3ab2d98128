"""Segment-reduction formulations with measured TPU guidance.

Three ways to accumulate per-element contributions into per-node sums, all
semantically identical to jax.ops.segment_sum:

  segment_sum_plain    — XLA scatter-add; fine on CPU, serialization-prone on
                         TPU with duplicate indices
  segment_sum_sorted   — scatter with indices_are_sorted=True over a host-
                         precomputed permutation (marginal TPU gain)
  incidence_gather_sum — scatter-free: per-node padded incidence gather
                         (tpufem.fem.assembly.build_incidence); fastest
                         measured on TPU and the default for fixed topologies

plus the Pallas kernel in tpufem.ops.gather_scatter for sorted ids.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpufem.fem.assembly import build_incidence, gather_accumulate  # noqa: F401


def segment_sum_plain(values, seg_ids, num_segments: int):
    return jax.ops.segment_sum(values, seg_ids, num_segments=num_segments)


def make_sorted_plan(seg_ids: np.ndarray):
    """(perm, sorted_ids) for segment_sum_sorted, computed once per topology."""
    perm = np.argsort(np.asarray(seg_ids), kind="stable")
    return perm.astype(np.int32), np.asarray(seg_ids)[perm].astype(np.int32)


def segment_sum_sorted(values, perm, sorted_ids, num_segments: int):
    return jax.ops.segment_sum(
        values[perm], sorted_ids, num_segments=num_segments, indices_are_sorted=True
    )


def incidence_gather_sum(values, incidence, inc_mask):
    """values (M, C) accumulated by the precomputed (N, V) incidence plan."""
    return gather_accumulate(values, jnp.asarray(incidence), jnp.asarray(inc_mask))

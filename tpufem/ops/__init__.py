"""Core numeric ops: segment reductions and Pallas kernels.

The reference's hot message-passing op is PyG's SAGEConv gather/scatter
(gnn/model.py:62-95, CUDA kernels under torch). tpufem provides:
  - tpufem.ops.segment: XLA formulations (segment_sum, incidence gather)
  - tpufem.ops.gather_scatter: a Pallas TPU kernel for sorted segment-sum
    (one-hot MXU compression per edge tile + accumulation stores), used by the
    SAGE layer via SAGEConfig(aggregate_impl="pallas")
"""

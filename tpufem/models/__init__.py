"""Surrogate model layer: graph building, GraphSAGE in JAX, training, metrics.

Replaces the reference's PyTorch-Geometric stack (src/deep_fem_uav_wing/gnn/
dataset.py, model.py; scripts/train_gnn.py, inference_gnn.py) with a JAX/optax
implementation whose message passing is a segment-sum mean aggregation (with a
Pallas gather/scatter kernel variant in tpufem.ops).
"""

from tpufem.models.graph import build_graph, GraphData, pad_graph  # noqa: F401
from tpufem.models.sage import GraphSAGE, SAGEConfig  # noqa: F401
from tpufem.models.metrics import compute_metrics, masked_mse  # noqa: F401

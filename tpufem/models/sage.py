"""GraphSAGE stress-field model in flax — mirrors reference gnn/model.py:24-112.

Architecture parity:
  encoder MLP 10 -> 64 -> 128                          (model.py:52-57)
  4 x [SAGEConv(128,128) -> LayerNorm -> ReLU -> dropout(0.1) -> residual add]
                                                       (model.py:62-95)
  decoder MLP 128 -> 64 -> 1                           (model.py:67-72)

SAGEConv semantics match PyG's default: h' = W_l h_i + b + W_r mean_{j in N(i)} h_j.
The mean aggregation is a gather + edge-mask-weighted segment_sum (exactly zero
contribution from padded edges), with an optional Pallas gather/scatter kernel
(tpufem.ops.gather_scatter) selected via `aggregate_impl`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import flax.linen as nn
import jax
import jax.numpy as jnp


def segment_mean_aggregate(h, edge_index, edge_mask, num_nodes):
    """mean_{j in N(i)} h_j over directed edges (src -> dst).

    h: (N,C); edge_index: (2,E) int32 rows (src, dst); edge_mask: (E,).
    Isolated / fully-padded nodes aggregate to zero.
    """
    src, dst = edge_index[0], edge_index[1]
    msgs = h[src] * edge_mask[:, None]
    num = jax.ops.segment_sum(msgs, dst, num_segments=num_nodes)
    deg = jax.ops.segment_sum(edge_mask, dst, num_segments=num_nodes)
    return num / jnp.maximum(deg, 1.0)[:, None]


@dataclass(frozen=True)
class SAGEConfig:
    in_dim: int = 10
    hidden: int = 128
    encoder_hidden: int = 64
    decoder_hidden: int = 64
    num_layers: int = 4
    dropout: float = 0.1
    aggregate_impl: str = "segment"  # "segment" | "pallas"

    def to_json_dict(self) -> dict:
        return {
            "in_dim": self.in_dim,
            "hidden": self.hidden,
            "encoder_hidden": self.encoder_hidden,
            "decoder_hidden": self.decoder_hidden,
            "num_layers": self.num_layers,
            "dropout": self.dropout,
            "aggregate_impl": self.aggregate_impl,
        }

    @classmethod
    def from_json_dict(cls, d: dict) -> "SAGEConfig":
        return cls(**d)


class SAGEConv(nn.Module):
    """PyG-equivalent SAGEConv with mean aggregation."""

    features: int
    aggregate_impl: str = "segment"

    @nn.compact
    def __call__(self, h, edge_index, edge_mask):
        n = h.shape[0]
        if self.aggregate_impl == "pallas":
            from tpufem.ops.gather_scatter import gather_mean_aggregate

            agg = gather_mean_aggregate(h, edge_index, edge_mask, n)
        else:
            agg = segment_mean_aggregate(h, edge_index, edge_mask, n)
        return nn.Dense(self.features, name="lin_self")(h) + nn.Dense(
            self.features, use_bias=False, name="lin_neigh"
        )(agg)


class GraphSAGE(nn.Module):
    config: SAGEConfig = field(default_factory=SAGEConfig)

    @nn.compact
    def __call__(self, x, edge_index, edge_mask, *, deterministic: bool = True):
        cfg = self.config
        h = nn.Dense(cfg.encoder_hidden, name="enc1")(x)
        h = nn.relu(h)
        h = nn.Dense(cfg.hidden, name="enc2")(h)
        h = nn.relu(h)

        for i in range(cfg.num_layers):
            res = h
            h = SAGEConv(cfg.hidden, cfg.aggregate_impl, name=f"sage{i}")(
                h, edge_index, edge_mask
            )
            h = nn.LayerNorm(name=f"ln{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(cfg.dropout, deterministic=deterministic)(h)
            h = h + res  # residual (reference model.py:86-95)

        h = nn.Dense(cfg.decoder_hidden, name="dec1")(h)
        h = nn.relu(h)
        out = nn.Dense(1, name="dec2")(h)
        return out[:, 0]  # (N,) log1p-stress prediction

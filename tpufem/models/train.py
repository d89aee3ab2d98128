"""Surrogate training loop — optax AdamW + plateau LR + early stop + checkpoints.

Parity with reference scripts/train_gnn.py:44-288:
  AdamW(lr 1e-3, weight_decay 1e-4)            (train_gnn.py:166-168)
  ReduceLROnPlateau(patience 10, factor 0.5)   (train_gnn.py:166-168)
  batch_size 4 whole graphs, early stop patience 20, max 100 epochs
  best_model checkpoint on val loss (epoch/params/opt state/val metrics)
  training_log.json with per-epoch records

TPU-first differences: graphs are padded to a shared fixed shape and stacked, so
a "batch" is one (B, N, ...) tensor and the train step is a single jitted
function — optionally pjit-sharded over the batch axis (tpufem.parallel).
Checkpoints are flax msgpack + a self-describing model_config JSON (mirroring
final_model.pt's embedded config, train_gnn.py:271-284).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import flax.serialization
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpufem.models.graph import GraphData
from tpufem.models.metrics import compute_metrics, masked_mse
from tpufem.models.sage import GraphSAGE, SAGEConfig


@dataclass
class TrainConfig:
    lr: float = 1e-3
    weight_decay: float = 1e-4
    batch_size: int = 4
    max_epochs: int = 100
    early_stop_patience: int = 20
    plateau_patience: int = 10
    plateau_factor: float = 0.5
    min_lr: float = 1e-6
    seed: int = 42
    # global-norm gradient clipping (0 = off): at reference-scale graphs the
    # masked MSE occasionally spikes on extreme-stress validation wings and
    # unclipped AdamW steps destabilize the val curve (measured on the
    # 1260-case dataset: val oscillating 0.027<->0.27)
    clip_norm: float = 0.0
    # exponential moving average of params for eval/checkpointing (0 = off):
    # clipping alone left the val curve oscillating 10x between epochs on the
    # 1260-case dataset; evaluating the EMA iterate decouples model selection
    # from single-step noise (Polyak averaging)
    ema_decay: float = 0.0
    # wall-clock budget for fit() (0 = unbounded): a bounded run finishes the
    # current epoch, then stops and finalizes exactly like an early stop —
    # best/final checkpoints and the log stay complete and honest (the summary
    # records stopped_reason="time_budget")
    max_seconds: float = 0.0
    model: SAGEConfig = field(default_factory=SAGEConfig)


@flax.struct.dataclass
class GraphBatchArrays:
    """Stacked padded graphs: one device tensor per field (jit-safe pytree)."""

    x: jnp.ndarray  # (B, N, 10)
    edge_index: jnp.ndarray  # (B, 2, E)
    edge_mask: jnp.ndarray  # (B, E)
    y: jnp.ndarray  # (B, N)
    loss_mask: jnp.ndarray  # (B, N)
    node_mask: jnp.ndarray  # (B, N)


def stack_graphs(graphs: list[GraphData]) -> GraphBatchArrays:
    return GraphBatchArrays(
        x=jnp.asarray(np.stack([g.x for g in graphs])),
        edge_index=jnp.asarray(np.stack([g.edge_index for g in graphs])),
        edge_mask=jnp.asarray(np.stack([g.edge_mask for g in graphs])),
        y=jnp.asarray(np.stack([g.y for g in graphs])),
        loss_mask=jnp.asarray(np.stack([g.loss_mask * g.node_mask for g in graphs])),
        node_mask=jnp.asarray(np.stack([g.node_mask for g in graphs])),
    )


class Trainer:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        self.model = GraphSAGE(cfg.model)
        # plateau scheduling is driven from the host via this mutable scale
        self._lr_scale = 1.0
        def _make_tx(learning_rate, weight_decay):
            tx = optax.adamw(learning_rate, weight_decay=weight_decay)
            if cfg.clip_norm > 0:
                tx = optax.chain(optax.clip_by_global_norm(cfg.clip_norm), tx)
            return tx

        opt = optax.inject_hyperparams(_make_tx)(
            learning_rate=cfg.lr, weight_decay=cfg.weight_decay
        )
        self.opt = opt
        self._jit_train_step = jax.jit(self._train_step)
        self._jit_eval_batch = jax.jit(self._eval_batch)

    # ------------------------------------------------------------- core steps
    def init(self, sample: GraphData):
        rng = jax.random.PRNGKey(self.cfg.seed)
        params = self.model.init(
            rng,
            jnp.asarray(sample.x),
            jnp.asarray(sample.edge_index),
            jnp.asarray(sample.edge_mask),
            deterministic=True,
        )
        opt_state = self.opt.init(params)
        return params, opt_state

    def _loss_fn(self, params, batch: GraphBatchArrays, dropout_rng):
        def per_graph(x, ei, em, y, lm, rng):
            pred = self.model.apply(
                x=x,
                edge_index=ei,
                edge_mask=em,
                variables=params,
                deterministic=False,
                rngs={"dropout": rng},
            )
            return masked_mse(pred, y, lm)

        B = batch.x.shape[0]
        rngs = jax.random.split(dropout_rng, B)
        losses = jax.vmap(per_graph)(
            batch.x, batch.edge_index, batch.edge_mask, batch.y, batch.loss_mask, rngs
        )
        return losses.mean()

    def _train_step(self, params, opt_state, ema, batch: GraphBatchArrays, dropout_rng, lr_scale):
        loss, grads = jax.value_and_grad(self._loss_fn)(params, batch, dropout_rng)
        opt_state.hyperparams["learning_rate"] = self.cfg.lr * lr_scale
        updates, opt_state = self.opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if self.cfg.ema_decay > 0:
            d = self.cfg.ema_decay
            ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p, ema, params)
        return params, opt_state, ema, loss

    def _eval_batch(self, params, batch: GraphBatchArrays):
        def per_graph(x, ei, em, y, lm):
            pred = self.model.apply(
                x=x, edge_index=ei, edge_mask=em, variables=params, deterministic=True
            )
            return pred, masked_mse(pred, y, lm)

        preds, losses = jax.vmap(per_graph)(
            batch.x, batch.edge_index, batch.edge_mask, batch.y, batch.loss_mask
        )
        return preds, losses

    # ---------------------------------------------------------------- fitting
    def fit(
        self,
        train_graphs: list[GraphData],
        val_graphs: list[GraphData],
        out_dir: Path | str,
        verbose: bool = True,
    ) -> dict:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        cfg = self.cfg
        params, opt_state = self.init(train_graphs[0])
        # EMA state starts at the init point; evaluated/checkpointed in place
        # of the raw iterate when ema_decay > 0
        ema = params if cfg.ema_decay > 0 else None
        rng = jax.random.PRNGKey(cfg.seed + 1)

        train_batch_all = stack_graphs(train_graphs)
        val_batch = stack_graphs(val_graphs)
        n_train = len(train_graphs)

        best_val = np.inf
        best_epoch = -1
        epochs_no_improve = 0
        plateau_no_improve = 0
        log: list[dict] = []
        stopped_reason = None
        t_start = time.time()

        for epoch in range(1, cfg.max_epochs + 1):
            t0 = time.time()
            rng, shuffle_rng = jax.random.split(rng)
            order = np.asarray(jax.random.permutation(shuffle_rng, n_train))
            epoch_losses = []
            for i in range(0, n_train, cfg.batch_size):
                idx = order[i : i + cfg.batch_size]
                batch = _index_batch(train_batch_all, idx)
                rng, drop_rng = jax.random.split(rng)
                params, opt_state, ema, loss = self._jit_train_step(
                    params, opt_state, ema, batch, drop_rng, self._lr_scale
                )
                epoch_losses.append(float(loss))

            eval_params = ema if ema is not None else params
            _, val_losses = self._jit_eval_batch(eval_params, val_batch)
            val_loss = float(val_losses.mean())
            train_loss = float(np.mean(epoch_losses))
            epoch_time = time.time() - t0
            lr_now = cfg.lr * self._lr_scale

            improved = val_loss < best_val - 1e-12
            if improved:
                best_val = val_loss
                best_epoch = epoch
                epochs_no_improve = 0
                plateau_no_improve = 0
                self.save_checkpoint(
                    out_dir / "best_model.msgpack", eval_params, epoch, val_loss
                )
            else:
                epochs_no_improve += 1
                plateau_no_improve += 1
                if plateau_no_improve > cfg.plateau_patience:
                    self._lr_scale = max(
                        self._lr_scale * cfg.plateau_factor, cfg.min_lr / cfg.lr
                    )
                    plateau_no_improve = 0

            log.append(
                {
                    "epoch": epoch,
                    "train_loss": train_loss,
                    "val_loss": val_loss,
                    "lr": lr_now,
                    "epoch_time_s": epoch_time,
                }
            )
            if verbose:
                print(
                    f"epoch {epoch:3d}  train {train_loss:.5f}  val {val_loss:.5f}"
                    f"  lr {lr_now:.2e}  {epoch_time:.2f}s",
                    flush=True,
                )
            if epochs_no_improve >= cfg.early_stop_patience:
                stopped_reason = "early_stop"
                break
            if cfg.max_seconds > 0 and time.time() - t_start > cfg.max_seconds:
                stopped_reason = "time_budget"
                break

        total = time.time() - t_start
        self.save_checkpoint(
            out_dir / "final_model.msgpack",
            ema if ema is not None else params,
            epoch,
            val_loss,
        )
        summary = {
            "best_epoch": best_epoch,
            "best_val_loss": best_val,
            "epochs_run": len(log),
            "total_time_s": total,
            "stopped_reason": stopped_reason or "max_epochs",
            "log": log,
            "model_config": cfg.model.to_json_dict(),
        }
        (out_dir / "training_log.json").write_text(json.dumps(summary, indent=2))
        return summary

    # ------------------------------------------------------------ persistence
    def save_checkpoint(self, path: Path, params, epoch: int, val_loss: float) -> None:
        path = Path(path)
        path.write_bytes(flax.serialization.to_bytes(params))
        meta = {
            "epoch": epoch,
            "val_loss": val_loss,
            "model_config": self.cfg.model.to_json_dict(),
        }
        path.with_suffix(".json").write_text(json.dumps(meta, indent=2))

    @staticmethod
    def load_checkpoint(path: Path | str, sample: GraphData) -> tuple[Any, SAGEConfig]:
        """Reconstruct params from msgpack + sidecar config (mirrors the
        reference's self-describing final_model.pt, inference_gnn.py:44-59)."""
        path = Path(path)
        meta = json.loads(path.with_suffix(".json").read_text())
        cfg = SAGEConfig.from_json_dict(meta["model_config"])
        model = GraphSAGE(cfg)
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(sample.x),
            jnp.asarray(sample.edge_index),
            jnp.asarray(sample.edge_mask),
        )
        params = flax.serialization.from_bytes(template, path.read_bytes())
        return params, cfg

    def predict(self, params, graph: GraphData) -> np.ndarray:
        pred = self.model.apply(
            x=jnp.asarray(graph.x),
            edge_index=jnp.asarray(graph.edge_index),
            edge_mask=jnp.asarray(graph.edge_mask),
            variables=params,
            deterministic=True,
        )
        return np.asarray(pred)

    def evaluate(self, params, graphs: list[GraphData]) -> dict:
        batch = stack_graphs(graphs)
        preds, losses = self._jit_eval_batch(params, batch)
        metrics = []
        for i, g in enumerate(graphs):
            metrics.append(
                compute_metrics(np.asarray(preds[i]), g.stress_vm, g.loss_mask, g.node_mask)
            )
        agg = {
            "loss": float(losses.mean()),
            "mae_pa_masked": float(
                np.mean([m["masked_nodes"]["mae_pa"] for m in metrics])
            ),
            "mae_pa_all": float(np.mean([m["all_nodes"]["mae_pa"] for m in metrics])),
            "rel_mae_masked": float(
                np.mean([m["masked_nodes"]["rel_mae"] for m in metrics])
            ),
            "per_case": metrics,
        }
        return agg


def _index_batch(all_b: GraphBatchArrays, idx: np.ndarray) -> GraphBatchArrays:
    return GraphBatchArrays(
        x=all_b.x[idx],
        edge_index=all_b.edge_index[idx],
        edge_mask=all_b.edge_mask[idx],
        y=all_b.y[idx],
        loss_mask=all_b.loss_mask[idx],
        node_mask=all_b.node_mask[idx],
    )

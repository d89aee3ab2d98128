#!/usr/bin/env python
"""Surrogate training CLI — parity with reference scripts/train_gnn.py:112-284.

Flags mirror the reference hparams (lr 1e-3, wd 1e-4, batch 4, epochs 100,
early-stop 20, plateau 10/x0.5, seed 42). Outputs under data/models/:
best_model.msgpack(+json), final_model.msgpack(+json), training_log.json,
and a test-set evaluation with Pa-scale all/masked metrics.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tpufem.models.dataset import WingStressDataset  # noqa: E402
from tpufem.models.sage import SAGEConfig  # noqa: E402
from tpufem.models.train import TrainConfig, Trainer  # noqa: E402
from tpufem.pipeline.config import get_paths  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--early_stop", type=int, default=20)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--num_layers", type=int, default=4)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--aggregate_impl", default="segment", choices=["segment", "pallas"])
    ap.add_argument("--clip_norm", type=float, default=1.0,
                    help="global-norm gradient clip (0 = off); stabilizes the "
                         "val curve at reference-scale graphs")
    ap.add_argument("--max_seconds", type=float, default=0.0,
                    help="wall-clock budget for the fit loop (0 = unbounded); "
                         "finishes the current epoch then finalizes like an "
                         "early stop, recording stopped_reason")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="EMA decay for eval/checkpoint params (0 = off); "
                         "0.999 flattens the val curve at reference scale")
    args = ap.parse_args(argv)

    paths = get_paths(args.data_root)
    ds = WingStressDataset(paths, seed=args.seed)
    train_g = ds.graphs("train")
    val_g = ds.graphs("val")
    test_g = ds.graphs("test")
    print(f"dataset: {len(train_g)} train / {len(val_g)} val / {len(test_g)} test")

    cfg = TrainConfig(
        lr=args.lr,
        weight_decay=args.weight_decay,
        batch_size=args.batch_size,
        max_epochs=args.epochs,
        early_stop_patience=args.early_stop,
        seed=args.seed,
        clip_norm=args.clip_norm,
        ema_decay=args.ema,
        max_seconds=args.max_seconds,
        model=SAGEConfig(
            hidden=args.hidden,
            num_layers=args.num_layers,
            dropout=args.dropout,
            aggregate_impl=args.aggregate_impl,
        ),
    )
    trainer = Trainer(cfg)
    out_dir = paths.models
    summary = trainer.fit(train_g, val_g, out_dir)

    params, _ = Trainer.load_checkpoint(out_dir / "best_model.msgpack", train_g[0])
    test_metrics = trainer.evaluate(params, test_g)
    print(
        f"test: loss {test_metrics['loss']:.5f}  "
        f"MAE(masked) {test_metrics['mae_pa_masked']/1e6:.3f} MPa  "
        f"rel {100*test_metrics['rel_mae_masked']:.2f}%"
    )
    summary["test"] = {k: v for k, v in test_metrics.items() if k != "per_case"}
    (out_dir / "training_log.json").write_text(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

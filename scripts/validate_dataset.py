#!/usr/bin/env python
"""Dataset validation CLI — parity with reference validate_dataset.py:611-680:
runs the full checklist and exits nonzero if any item fails.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tpufem.pipeline.config import get_paths  # noqa: E402
from tpufem.pipeline.validate import ValidationThresholds, run_validation  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--min_solved", type=int, default=200)
    args = ap.parse_args(argv)

    paths = get_paths(args.data_root)
    thr = ValidationThresholds(min_solved_cases=args.min_solved)
    report = run_validation(paths, thr)
    print(f"cases: {report['num_cases']}  ok: {report['num_ok']}")
    for item, passed in report["checklist"].items():
        print(f"  [{'PASS' if passed else 'FAIL'}] {item}")
    print("validation_report.json written to", paths.data / "validation_report.json")
    return 0 if report["all_passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

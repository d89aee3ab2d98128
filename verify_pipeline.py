#!/usr/bin/env python
"""Root-level E2E verification shim — parity with reference verify_pipeline.py.

Runs the spec validation cases through geometry -> mesh -> FEM and applies the
physics judgments. Implementation: tpufem.pipeline.verify.
"""

from tpufem.pipeline.verify import main

if __name__ == "__main__":
    raise SystemExit(main())

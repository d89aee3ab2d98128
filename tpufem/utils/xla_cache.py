"""Persistent XLA compilation cache for every tpufem entry point.

The heavy solvers here (stencil MG at 100k+ DOF, the f64-emulated outer CG,
the tet10 doubled-grid engine) cost minutes of single-core XLA compile time
per process, while the compiled executables are identical across runs of the
same CLI. JAX's persistent compilation cache serializes compiled executables
to disk keyed by (HLO, compile options, backend fingerprint), so a repeat
invocation — e.g. the driver's `python bench.py`, a dataset-generation resume,
or a re-run of a demo script — skips compilation entirely.

Enabled automatically on `import tpufem` (see tpufem/__init__.py); opt out
with TPUFEM_NO_XLA_CACHE=1, point elsewhere with TPUFEM_XLA_CACHE_DIR.

The reference pipeline has no analog: its solver is a CalculiX subprocess
(reference src/deep_fem_uav_wing/fem.py:524-533) with no compile stage at all,
so this is pure rebuild-side wall-clock engineering.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable() -> bool:
    """Idempotently turn on the persistent compilation cache. Returns True
    if the cache is (already) active."""
    global _ENABLED
    if _ENABLED:
        return True
    if os.environ.get("TPUFEM_NO_XLA_CACHE"):
        return False
    try:
        import jax

        cache_dir = os.environ.get("TPUFEM_XLA_CACHE_DIR")
        if not cache_dir:
            # key the default dir by a HOST fingerprint: XLA:CPU serializes
            # AOT code for the exact compile-machine feature set, and the
            # loader only WARNS (then may SIGILL) when a cache written on a
            # different host is replayed — observed after a VM migration
            # ("Target machine feature +prefer-no-scatter is not supported
            # on the host machine"). A per-host dir makes migration safe.
            import hashlib
            import platform

            probe = platform.machine() + platform.processor() + jax.__version__
            try:
                # both the ISA flags AND the model name: XLA:CPU folds
                # model-keyed tuning flags (+prefer-no-scatter/-gather) into
                # the serialized AOT target, so two hosts with identical
                # `flags` lines but different models still produce
                # incompatible caches (observed: loader E-warnings after a
                # VM migration that preserved the flags line)
                want = ("flags", "Features", "model name")
                got = set()
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        key = line.split(":", 1)[0].strip()
                        if line.startswith(want) and key not in got:
                            got.add(key)
                            probe += line
                        if len(got) == len(want):
                            break
            except OSError:
                pass
            fp = hashlib.sha256(probe.encode()).hexdigest()[:12]
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "tpufem_xla", fp
            )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that takes >=1 s to compile, regardless of size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        return False
    _ENABLED = True
    return True

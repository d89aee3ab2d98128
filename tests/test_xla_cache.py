"""Persistent-XLA-cache key stability (tpufem/utils/xla_cache.py).

The cache dir is keyed by a host fingerprint (ISA flags + CPU model + jax
version). Round 4 changed that key (folding in the CPU model name), which
silently invalidated every existing cache — these tests pin the probe so a
key change is always a deliberate, test-visible act:

- the fingerprint must be IDENTICAL across two fresh Python processes on the
  same host (a flaky probe would mean a cold recompile on every invocation);
- enable() must actually point jax at that dir and be idempotent.

No reference counterpart: the reference's solver is a CalculiX subprocess
with no compile stage (reference src/deep_fem_uav_wing/fem.py:524-533).
"""

import os
import subprocess
import sys

_PROBE_SNIPPET = (
    "import jax; jax.config.update('jax_platforms','cpu'); "
    "from tpufem.utils import xla_cache; "
    "assert xla_cache.enable(); "
    "print(jax.config.jax_compilation_cache_dir)"
)


def _probe_in_subprocess(env):
    out = subprocess.run(
        [sys.executable, "-c", _PROBE_SNIPPET],
        capture_output=True, text=True, timeout=300, env=env, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout.strip().splitlines()[-1]


def test_cache_key_stable_across_processes():
    env = {k: v for k, v in os.environ.items() if k != "TPUFEM_NO_XLA_CACHE"}
    d1 = _probe_in_subprocess(env)
    d2 = _probe_in_subprocess(env)
    assert d1 == d2, f"host fingerprint unstable across processes: {d1} != {d2}"
    assert os.path.isdir(d1)
    # the key layout of record: ~/.cache/tpufem_xla/<12-hex-host-fp>
    base = os.path.basename(d1)
    assert len(base) == 12 and all(c in "0123456789abcdef" for c in base)


def test_enable_idempotent_and_env_overrides(tmp_path):
    from tpufem.utils import xla_cache

    # TPUFEM_XLA_CACHE_DIR must win over the fingerprint dir (subprocess so
    # the module-level _ENABLED latch of THIS process doesn't short-circuit)
    env = dict(os.environ)
    env["TPUFEM_XLA_CACHE_DIR"] = str(tmp_path / "xc")
    d = _probe_in_subprocess(env)
    assert d == str(tmp_path / "xc") and os.path.isdir(d)

    # in-process: enable() is idempotent
    assert xla_cache.enable() == xla_cache.enable()

"""Driver-contract test: __graft_entry__ must be hermetic on the CPU fallback.

The driver may execute ``entry()`` + ``dryrun_multichip(8)`` in a process
whose *default* jax platform is a TPU tunnel that initializes fine but fails
the moment an executable is built for it (round-1 failure: libtpu
client/terminal version mismatch).  This test reproduces that environment by
poisoning ``backend_compile_and_load`` for every non-CPU backend, then runs
the full driver sequence in a subprocess — any eager op or jit that touches
the default backend fails the test.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DRIVER_SCRIPT = r"""
import jax
from jax._src import compiler as _compiler

_real = _compiler.backend_compile_and_load

def _poisoned(backend, *a, **k):
    if getattr(backend, "platform", "cpu") != "cpu":
        raise RuntimeError(
            "poisoned default backend (emulated libtpu mismatch)")
    return _real(backend, *a, **k)

_compiler.backend_compile_and_load = _poisoned

import __graft_entry__ as ge

fn, args = ge.entry()
leaf = jax.tree_util.tree_leaves(args[0])[0]
assert not hasattr(leaf, "devices"), (
    "entry() example args must be uncommitted (numpy), got %r" % type(leaf))

ge.dryrun_multichip(8)

noncpu = [a for a in jax.live_arrays()
          if any(d.platform != "cpu" for d in a.devices())]
assert not noncpu, "arrays leaked onto the default backend: %d" % len(noncpu)
print("HERMETIC_OK")
"""


def test_dryrun_multichip_hermetic_on_broken_default_backend():
    env = dict(os.environ)
    # Restore the driver-like environment: no platform pin, no pre-set
    # device-count flag (the entry module must reserve devices itself).
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_SCRIPT],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1150)
    assert proc.returncode == 0, (
        f"hermetic dryrun failed\n--- stdout ---\n{proc.stdout[-3000:]}"
        f"\n--- stderr ---\n{proc.stderr[-3000:]}")
    assert "HERMETIC_OK" in proc.stdout
    assert "dryrun_multichip(8): OK" in proc.stdout

"""Import hygiene: the package must not initialize a JAX backend at import.

Regression guard for the round-4 MULTICHIP failure: a module-level
``jnp.log(1e-9)`` constant in likelihoods/bernoulli.py initialized the JAX
backend on the ambient (pinned-TPU) platform at ``import hetmogp_tpu`` time,
before ``force_virtual_cpu`` (parallel/sharding.py) could set
``JAX_PLATFORMS=cpu`` — crashing the driver's ``dryrun_multichip`` path
(``__graft_entry__.py``).  Any module-level ``jnp.*`` computation re-breaks
it, so this asserts the invariant in a clean subprocess.
"""

import os
import subprocess
import sys

import pytest

_CHECK = r"""
import sys

import hetmogp_tpu  # noqa: F401  (must not touch a backend)

from jax._src import xla_bridge

backends = getattr(xla_bridge, "_backends", None)
if backends:
    print("BACKENDS-INITIALIZED:", sorted(backends))
    sys.exit(1)
# belt and braces: jax.config-level default backend must also be unset
print("CLEAN")
"""


@pytest.mark.fast
def test_import_initializes_no_jax_backend():
    env = dict(os.environ)
    # run with the ambient environment EXCEPT our test conftest's CPU
    # forcing, so the check reproduces the driver's entry conditions
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _CHECK],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=300,
    )
    assert proc.returncode == 0, (
        "importing hetmogp_tpu initialized a JAX backend (module-level "
        "jnp.* computation somewhere in the package):\n"
        + proc.stdout + proc.stderr
    )
    assert "CLEAN" in proc.stdout


@pytest.mark.fast
def test_dryrun_multichip_entry_path():
    """The exact driver invocation: fresh interpreter, ambient env, n=8."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=600,
    )
    assert proc.returncode == 0, (
        "dryrun_multichip(8) failed via the driver path:\n"
        + proc.stdout + proc.stderr
    )

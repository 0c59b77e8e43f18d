"""One-command oracle-parity demonstration.

Builds a random heterogeneous model over all 8 reference likelihoods,
evaluates the ELBO with hetmogp_tpu (float64, both parameterizations) and
with the independent reference-equation NumPy oracle, and prints the
errors against the 1e-6 north-star tolerance (BASELINE.json).

    python tools/check_parity.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax


def main():
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from hetmogp_tpu.models import elbo as elbo_mod
    from tests import oracle_numpy as oracle
    from tests.test_elbo_oracle import _mixed_problem

    worst = 0.0
    for seed in range(5):
        cfg, params, data, scales, oa = _mixed_problem(seed=seed)
        got, _ = elbo_mod.elbo_fn(params, data, jnp.asarray(scales), cfg)
        expect = oracle.elbo(**oa)
        rel = abs(float(got) - expect) / max(1.0, abs(expect))
        cfg_w = dataclasses.replace(cfg, whiten=True)
        params_w = elbo_mod.whiten_params(params, cfg)
        got_w, _ = elbo_mod.elbo_fn(params_w, data, jnp.asarray(scales), cfg_w)
        rel_w = abs(float(got_w) - expect) / max(1.0, abs(expect))
        print(f"seed {seed}: oracle={expect:+.9e}  "
              f"unwhitened rel err={rel:.2e}  whitened rel err={rel_w:.2e}")
        worst = max(worst, rel, rel_w)

    status = "PASS" if worst < 1e-6 else "FAIL"
    print(f"\nworst relative error: {worst:.2e}  "
          f"(north-star tolerance 1e-6) -> {status}")
    return 0 if status == "PASS" else 1


if __name__ == "__main__":
    raise SystemExit(main())

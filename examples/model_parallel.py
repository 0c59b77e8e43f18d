"""Model-parallel (latent-axis) + data-parallel training over a 2-D mesh.

Demonstrates the two parallelism axes (docs/DESIGN.md §7c):

* data   — minibatch rows sharded across chips (ELBO is a sum over data)
* latent — the Q-leading state (q_mu, q_sqrt, Z, hypers, cached Luu/iLuu)
  sharded across latent GPs: per-q Cholesky/solves/grams land on different
  chips and the LMC mixing contraction becomes an ICI psum

Runs on ANY host: with fewer than 8 real devices it forces 8 virtual CPU
devices, so the sharding/collective path is exercised without a pod.  On a
real multi-chip TPU slice, drop the virtual-device block and the same code
scales over the slice.

Run:  python examples/model_parallel.py [--steps 100] [--latent 4]
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--latent", type=int, default=4,
                    help="latent-axis size (must divide device count and Q)")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--real", action="store_true",
                    help="use the ambient (TPU) devices instead of forcing "
                         "a virtual CPU mesh — needs a multi-chip slice")
    args = ap.parse_args()

    if not args.real:
        # must run before jax initializes a backend (checking
        # jax.device_count() first would itself initialize it)
        from hetmogp_tpu.parallel.sharding import force_virtual_cpu

        force_virtual_cpu(args.devices)
    import jax

    import time

    import jax.numpy as jnp
    import numpy as np

    from hetmogp_tpu import (Bernoulli, Gamma, HetGaussian, ModelConfig,
                             TrainConfig)
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.data import full_batch
    from hetmogp_tpu.models.params import init_params
    from hetmogp_tpu.parallel import sharding

    devices = jax.devices()[:args.devices]
    Q, M, n_per, B = max(args.latent, 2), 64, 4096, 256
    liks = (HetGaussian(), Bernoulli(), Gamma())
    cfg = ModelConfig(likelihoods=liks, num_latent=Q, num_inducing=M,
                      input_dim=1, dtype="float32")
    rng = np.random.RandomState(0)
    X_list = [rng.rand(n_per, 1).astype(np.float32) for _ in liks]
    Y_list = [rng.randn(n_per, 1), (rng.rand(n_per, 1) > 0.5).astype(float),
              rng.gamma(2.0, 1.0, (n_per, 1)) + 1e-3]
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, M)[:, None], lengthscale=0.2,
                         variance=0.5, q_mu_scale=0.1)
    tc = TrainConfig(optimizer="adam", step_rate=0.01)
    opt = train_mod.make_optimizer(tc)

    # 2-D mesh: devices/latent on the data axis x latent on the model axis
    mesh = sharding.model_mesh(devices, latent=args.latent)
    print(f"mesh: {dict(mesh.shape)} over {len(devices)} "
          f"{jax.default_backend()} devices")

    dataset, _ = full_batch(X_list, Y_list, dtype=cfg.np_dtype)
    dataset = sharding.shard_batch(mesh, dataset)
    run = train_mod.make_scan_trainer(
        cfg, tc, tuple(n_per for _ in liks), tuple(B for _ in liks),
        vem=True, steps_per_call=args.steps, mesh=mesh)
    state = sharding.shard_state(
        mesh, train_mod.init_train_state(params, cfg, opt, cache_luu=True))
    if args.latent > 1:
        assert not state.params.q_sqrt.sharding.is_fully_replicated

    state, elbos0 = run(state, dataset, jax.random.PRNGKey(1))  # compile+run
    jax.block_until_ready(elbos0)  # async dispatch: don't time the warmup
    t0 = time.perf_counter()
    state, elbos = run(state, dataset, jax.random.PRNGKey(2))
    jax.block_until_ready(elbos)
    dt = time.perf_counter() - t0
    print(f"{args.steps} steps in {dt:.2f}s = {args.steps / dt:.1f} steps/s")
    # full trajectory: the warmup call does most of the improving; the
    # timed call's window alone is dominated by per-minibatch ELBO noise
    print(f"ELBO: {float(elbos0[0]):.1f} -> {float(elbos[-1]):.1f} "
          f"over {2 * args.steps} steps")
    print("q_mu final sharding:", state.params.q_mu.sharding.spec)


if __name__ == "__main__":
    main()

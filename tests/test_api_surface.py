"""The documented public API surface: importable from the package root,
and checkpointing works on device-placed (sharded) training state."""

import jax
import jax.numpy as jnp
import numpy as np

import hetmogp_tpu


def test_all_exports_resolve():
    for name in hetmogp_tpu.__all__:
        assert getattr(hetmogp_tpu, name, None) is not None, name


def test_readme_symbols_available():
    # every symbol the README quick-start and parallel docs reference
    from hetmogp_tpu import (Bernoulli, HetGaussian, HetLikelihood,  # noqa
                             ModelConfig, SVMOGP, TrainConfig)
    from hetmogp_tpu.parallel.sharding import (data_mesh, model_mesh,  # noqa
                                               shard_batch, shard_state,
                                               force_virtual_cpu)
    from hetmogp_tpu.train import svi_fit_on_device  # noqa
    from hetmogp_tpu.data import init_z_kmeans, true_u_functions  # noqa
    assert callable(model_mesh)


def test_checkpoint_of_sharded_state(tmp_path):
    """A latent-sharded TrainState round-trips through the npz checkpoint
    (np.asarray gathers sharded arrays on save)."""
    from hetmogp_tpu import likelihoods as L
    from hetmogp_tpu import train as train_mod
    from hetmogp_tpu.checkpoint import load_checkpoint, save_checkpoint
    from hetmogp_tpu.config import ModelConfig, TrainConfig
    from hetmogp_tpu.models.params import init_params
    from hetmogp_tpu.parallel import sharding

    cfg = ModelConfig(likelihoods=(L.Gaussian(),), num_latent=4,
                      num_inducing=8, input_dim=1, dtype="float64")
    params = init_params(jax.random.PRNGKey(0), cfg,
                         np.linspace(0, 1, 8)[:, None], lengthscale=0.3)
    opt = train_mod.make_optimizer(TrainConfig(optimizer="adam"))
    mesh = sharding.model_mesh(jax.devices()[:8], latent=4)
    state = sharding.shard_state(
        mesh, train_mod.TrainState(params, opt.init(params), jnp.asarray(3)))
    assert not state.params.q_sqrt.sharding.is_fully_replicated

    p = tmp_path / "sharded.npz"
    save_checkpoint(p, state.params, state.opt_state, step=3)
    params2, opt2, step, _ = load_checkpoint(p, params, state.opt_state)
    assert step == 3
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

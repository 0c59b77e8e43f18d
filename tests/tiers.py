"""Two-tier test classification (VERDICT r4 #3).

The full suite is compile-bound: 297 tests, ~21 min cold on a 1-core CI
host (measured round 5, fresh XLA compile cache).  Tiers keep "the suite
is green" verifiable in bounded time:

  -m fast          smoke tier, ~1.5 min cold: oracle ELBO + gradients,
                   one host-loop train run, one on-device scan-trainer
                   run, one sharded-step match, the full likelihood
                   var_exp sweep, import hygiene
  -m "not slow"    everything but the compile-heavy long-runners,
                   ~7.5 min cold
  (default)        all 297 tests, ~21 min cold / ~4 min warm cache

Keys are "<file basename>::<test name>" (parameterized variants inherit
the base name's tier); applied by conftest.pytest_collection_modifyitems.
A renamed test silently drops back to the default tier — harmless, it
just runs in "not slow" until re-listed.  SLOW membership = measured
>= 5 s cold (tests/full-suite durations, round 5); FAST wins on overlap.
"""

FAST = frozenset({
    # oracle ELBO values + gradients (SURVEY §7 hard part)
    "test_elbo_oracle.py::test_kl_matches_oracle",
    "test_elbo_oracle.py::test_elbo_matches_oracle_unwhitened",
    "test_elbo_oracle.py::test_elbo_invariant_under_whitening",
    "test_elbo_oracle.py::test_elbo_gradients_match_oracle_fd",
    "test_elbo_oracle.py::test_chol_dtype_island_matches_same_dtype",
    # one train run each: host loop + on-device scan trainer
    "test_train.py::test_svi_fit_improves_elbo",
    "test_train.py::test_scan_trainer_on_device",
    # one sharded-vs-unsharded match on the 8-device virtual mesh
    "test_sharding.py::test_sharded_train_step_matches_unsharded",
    # full likelihood sweep: var_exp values + derivative identities
    "test_likelihoods.py::test_var_exp_matches_oracle",
    "test_likelihoods.py::test_var_exp_derivatives_match_reference_form",
    # closed-form var_exp defaults (DESIGN §7o): engine agreement + the two
    # f32 production-failure regressions (overflow clip, v=0 gradients)
    "test_analytic_var_exp.py::test_analytic_matches_engine_values",
    "test_analytic_var_exp.py::test_analytic_finite_at_extreme_f32_moments",
    "test_analytic_var_exp.py::test_analytic_gradients_finite_at_v_zero",
    # the driver-path guard: import must not initialize a backend
    "test_import_hygiene.py::test_import_initializes_no_backend",
})

SLOW = frozenset({
    "test_aux.py::test_metrics_logger_as_fit_callback",
    "test_aux.py::test_plotting_smoke",
    "test_bench.py::test_bench_final_failure_still_emits_parseable_json",
    "test_bench.py::test_bench_retries_past_injected_failures",
    "test_bench.py::test_serve_mode_runs_and_reports_rows_per_sec",
    "test_bench.py::test_workload_flop_accounting_is_branch_weighted",
    "test_data.py::test_load_spatial_table_csv_sample",
    "test_demo_integration.py::test_demo_workload_end_to_end",
    "test_demo_integration.py::test_stochastic_vem_flipflop_matches_reference_counter",
    "test_elbo_oracle.py::test_fused_task_rows_matches_per_task",
    "test_elbo_oracle.py::test_qf_moments_match_oracle",
    "test_import_hygiene.py::test_dryrun_multichip_entry_path",
    "test_lik_theta.py::test_learned_thresholds_move_and_improve",
    "test_lik_theta.py::test_svmogp_model_level_learned_thresholds",
    "test_lik_theta.py::test_theta_gradient_matches_finite_differences",
    "test_lik_theta.py::test_trainable_gaussian_sigma_improves_heldout_nlpd",
    "test_lik_theta.py::test_trainable_student_df_trains_and_predicts",
    "test_likelihoods.py::test_bernoulli_var_exp_finite_in_float32_at_large_means",
    "test_linalg.py::test_elbo_cache_grad_matches_plain_hyper_gradients",
    "test_more_likelihoods.py::test_mixed_new_likelihoods_in_model",
    "test_natgrad.py::test_cholesky_retraction_converges_nonconjugate",
    "test_natgrad.py::test_cholesky_retraction_on_device_trainer",
    "test_natgrad.py::test_natgrad_adam_beats_adam_nonconjugate_e2e",
    "test_natgrad.py::test_natgrad_carried_s_inv_matches_cold_start",
    "test_natgrad.py::test_natgrad_fused_rows_matches_per_task",
    "test_natgrad.py::test_natgrad_vem_scan_trainer_on_device",
    "test_new_likelihoods.py::test_negbinomial_learn_r_end_to_end",
    "test_new_likelihoods.py::test_student_in_model",
    "test_pallas_kernels.py::test_pallas_vjp_matches_xla_vjp",
    "test_predict.py::test_full_cov_diag_matches_marginal_var",
    "test_predict.py::test_model_class_end_to_end_api",
    "test_predict.py::test_projected_prediction_whiten_consistency",
    "test_predict_oracle.py::test_predict_f_stochastic_minibatch_anchor_matches_oracle",
    "test_predict_oracle.py::test_projected_prediction_matches_woodbury_oracle",
    "test_property_sweep.py::test_random_config_elbo_grads_predictions_finite",
    "test_quadrature_adaptive.py::test_beta_var_exp_vs_hermgauss",
    "test_quadrature_adaptive.py::test_categorical_var_exp_vs_hermgauss",
    "test_quadrature_adaptive.py::test_dblquad_spot_checks_2d",
    "test_quadrature_adaptive.py::test_dirichlet_var_exp_vs_hermgauss",
    "test_quadrature_adaptive.py::test_gamma_var_exp_vs_hermgauss",
    "test_quadrature_adaptive.py::test_hetgaussian_analytic_var_exp_vs_hermgauss",
    "test_quadrature_adaptive.py::test_ordinal_var_exp_vs_adaptive",
    "test_quadrature_adaptive.py::test_poisson_var_exp_vs_adaptive",
    "test_quadrature_adaptive.py::test_studentt_var_exp_vs_hermgauss",
    "test_sharding.py::test_fused_rows_on_2d_mesh_matches_unsharded",
    "test_sharding.py::test_model_parallel_2d_mesh_matches_unsharded",
    "test_sharding.py::test_model_parallel_rank2_coregionalization",
    "test_sharding.py::test_model_parallel_scan_trainer",
    "test_sharding.py::test_latent_axis_splits_m_cubed_work",
    "test_sharding.py::test_scan_body_collective_structure",
    "test_sharding.py::test_sharded_checkpoint_resume_on_2d_mesh",
    "test_sharding.py::test_sharded_natgrad_scan_trainer_matches_unsharded",
    "test_sharding.py::test_sharded_predictive_matches_unsharded",
    "test_sharding.py::test_sharded_scan_trainer_matches_unsharded",
    "test_sharding.py::test_sharded_scan_trainer_slice_mode",
    "test_sharding.py::test_state_shardings_nondivisible_latent_replicates",
    "test_sharding.py::test_svmogp_predictive_mesh_entry",
    "test_train.py::test_adadelta_lookahead_masked_under_vem",
    "test_train.py::test_checkpoint_resume_equivalence",
    "test_train.py::test_clip_grad_norm_bounds_updates",
    "test_train.py::test_fast_projection_matches_solve_path",
    "test_train.py::test_lr_schedule_in_scan_trainer_and_resume",
    "test_train.py::test_luu_cache_matches_uncached_steps",
    "test_train.py::test_model_fit_svi_on_device",
    "test_train.py::test_periodic_checkpoint_and_crash_resume",
    "test_train.py::test_skip_nonfinite_steps_guards_state",
    "test_train.py::test_svi_fit_on_device_prebuilt_dataset_equivalence",
    "test_train.py::test_svi_on_device_with_mesh",
    "test_train.py::test_ve_fwd_precision_high_plumbs_and_matches",
    "test_train.py::test_vem_batch_lbfgs_improves_elbo",
    "test_train.py::test_vm_batch_fraction_unbiased_and_runs",
})

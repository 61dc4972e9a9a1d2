"""Shared experiment configs for the host-pod tests (mp_hostpod_worker.py
and the single-process emulation arm in test_multiprocess.py). GPU-stack
schema (gpu_implementation/configurations/*_toy equivalents), sized for
seconds-per-generation on the CPU backend."""

EXP_ES = {
    "game": "toy",
    "model": "Model",
    "population_size": 8,
    "episode_cutoff_mode": 30,
    "mutation_power": 0.05,
    "optimizer": {"type": "adam", "args": {"stepsize": 0.05}},
    "env_kwargs": {"batch_size": 4, "pipeline_groups": 1, "num_threads": 1},
}

EXP_GA = {
    "game": "toy",
    "model": "Model",
    "population_size": 6,
    "selection_threshold": 3,
    "validation_threshold": 2,
    "num_validation_episodes": 2,
    "num_test_episodes": 2,
    "episode_cutoff_mode": 30,
    "mutation_power": 0.05,
    "env_kwargs": {"batch_size": 4, "pipeline_groups": 1, "num_threads": 1},
}

# RS: the GA degenerate case (rs.py:210-217) — same GPU-schema knobs; the
# CLI's --algo rs picks RSTrainer → HostPodRSTrainer (the GAxRS diamond)
EXP_RS = dict(EXP_GA)

# NS-ES (CPU schema, nses.py): meta-population 2, final-RAM BC. batch_size 6
# with npairs_local = ceil(4/2) = 2 leaves 2 padded slots per sub-round —
# exercising the under-filled-round padding path across real processes
EXP_NSES = {
    "env_id": "toy",
    "algo": "nses",
    "algo_type": "ns",
    "policy": {"type": "SmallDQN"},
    "config": {"noise_stdev": 0.02, "episodes_per_batch": 8,
               "episode_cutoff_mode": 20},
    "novelty_search": {"k": 3, "population_size": 2, "num_rollouts": 1,
                       "selection_method": "round_robin", "bc_mode": "final"},
    "optimizer": {"type": "adam", "args": {"stepsize": 0.01}},
    "env_kwargs": {"batch_size": 6, "pipeline_groups": 1, "num_threads": 1},
}

# Quota-mode ES (CPU schema, es.py:230-265 dual quota) whose quota does NOT
# divide the global round size: 2 procs x batch 4 = 8 episodes/global round,
# quota 10 -> round 2 tops up past the quota (reference overshoot semantics)
EXP_ES_QUOTA = {
    "env_id": "toy",
    "policy": {"type": "SmallDQN"},
    "config": {"noise_stdev": 0.05, "episodes_per_batch": 10,
               "timesteps_per_batch": 1, "episode_cutoff_mode": 20},
    "optimizer": {"type": "adam", "args": {"stepsize": 0.05}},
    "env_kwargs": {"batch_size": 4, "pipeline_groups": 1, "num_threads": 1},
}

OVERRIDES = {"noise_size": 2_000_000, "num_eval_episodes": 2}

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

OVERRIDES = {"noise_size": 2_000_000, "num_eval_episodes": 2}

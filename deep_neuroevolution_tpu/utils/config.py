"""Experiment configuration: loads BOTH reference JSON schemas.

* CPU-stack schema (es_distributed, §5.6): {"config": {...Config fields,
  es.py:12-16}, "env_id", "policy": {"type", "args"}, "optimizer":
  {"type", "args"}, GA extras "population_size"/"num_elites"
  (ga.py:66-67), NS extras "algo_type"/"novelty_search" (nses.py:63-71)}.
  Algo is chosen by the reference CLI flag --algo (main.py:29-40); here it
  may ride in the JSON as "algo" or be passed explicitly.
* GPU-stack schema (gpu_implementation/configurations/*.json): flat kwargs —
  "game", "model", "population_size", "timesteps", "episode_cutoff_mode",
  "mutation_power", GA ladder fields, optional "optimizer" (ES).

`load_experiment` normalizes either into (env, model, trainer), resolving
env ids: 'FooNoFrameskip-v4'/'<game>' → Atari host engine (ALE or toy),
'CartPole-*' → device cartpole, 'maze' → device Hard Maze; MuJoCo ids raise
a clear gating error (MuJoCo is not bundled; see README).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, Optional, Tuple

from .. import envs, models
from ..envs.core import Continuous, Discrete
from ..ops import optim


def _camel_to_snake(name: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()


def _atari_defaults(kwargs):
    """Engine-slot default for Atari experiments: B=256 is the measured
    device-throughput optimum (600k vs 407k frames/s at B=64,
    results/bench_conv_r03.json + the r4 B-sweep artifact) and matches the
    reference's effective per-GPU concurrency (4 workers × 64 slots,
    concurrent_worker.py:129-142). Explicit env_kwargs still win."""
    kwargs.setdefault("batch_size", 256)
    return kwargs


def resolve_env(env_id: str, **kwargs):
    """Map reference env ids onto our env registry."""
    m = re.fullmatch(r"([A-Za-z0-9]+)NoFrameskip-v\d+", env_id)
    if m:  # Atari, CPU-stack naming (ga.py:14: endswith('NoFrameskip-v4'))
        game = _camel_to_snake(m.group(1))
        # the CPU stack wraps training envs with wrap_deepmind, whose
        # EpisodicLifeEnv defaults ON (atari_wrappers.py:204-222); the GPU
        # stack's 'game' names never had it, so only this id form enables it
        kwargs.setdefault("episodic_life", True)
        return envs.make(game if _atari_available() else "toy", **_atari_defaults(kwargs))
    if env_id.startswith("gym."):
        return envs.make(env_id, **kwargs)
    if env_id in ("maze", "toy"):
        return envs.make(env_id, **kwargs)
    if env_id.split("-")[0] in ("CartPole",):
        return envs.make("gym." + env_id, **kwargs)
    from ..envs import mujoco

    if env_id.split("-")[0] in mujoco.MUJOCO_FAMILIES:
        if not mujoco.is_available():
            raise RuntimeError(
                f"{env_id} needs MuJoCo/gymnasium, which this environment lacks. "
                "The MujocoPolicy/MLP stack is fully implemented; plug in any "
                "continuous-control env implementing the Env protocol."
            )
        if env_id.split("-")[0] == "HumanoidTrap":  # NS-ES deceptive world
            xml = mujoco.deceptive_humanoid_xml()
            return mujoco.MujocoHostEnv(
                mujoco.resolve_env_id("Humanoid-v5"), xml_file=xml, **kwargs
            )
        return mujoco.MujocoHostEnv(mujoco.resolve_env_id(env_id), **kwargs)
    # fall back to the atari game-name registry ('frostbite' etc., the GPU
    # schema's 'game' field)
    return envs.make(env_id, **_atari_defaults(kwargs))


def _atari_available() -> bool:
    from ..envs import atari

    return atari.is_available()


def build_model(policy_type: str, args: Dict[str, Any], env) -> models.Model:
    """Instantiate a model for an env from reference policy/model names."""
    cls = models.get_model(policy_type)
    # init_from is a warm-start directive (es.py:165-167), not a ctor kwarg
    args = {k: v for k, v in args.items() if k != "init_from"}
    if cls is models.MujocoMLP:
        space = env.action_space
        assert isinstance(space, Continuous)
        return models.MujocoMLP(
            obs_dim=env.obs_shape[0],
            ac_dim=space.dim,
            ac_low=tuple(space.low) if space.low else tuple([-1.0] * space.dim),
            ac_high=tuple(space.high) if space.high else tuple([1.0] * space.dim),
            **{
                k: (tuple(v) if k == "hidden_dims" else v)
                for k, v in args.items()
                if k != "init_from"
            },
        )
    if cls is models.ContinuousMLP:
        space = env.action_space
        assert isinstance(space, Continuous)
        return models.ContinuousMLP(obs_dim=env.obs_shape[0], ac_dim=space.dim, **args)
    num_actions = (
        env.action_space.n if isinstance(getattr(env, "action_space", None), Discrete) else env.num_actions
    )
    kwargs = {}
    if "nonlin_type" in args:
        kwargs["nonlin_type"] = args["nonlin_type"]
    if "ac_init_std" in args:  # GAAtariPolicy (policies.py:436)
        kwargs["out_std"] = args["ac_init_std"]
    if hasattr(cls, "__dataclass_fields__") and "obs_dim" in cls.__dataclass_fields__:
        import numpy as np

        return cls(obs_dim=int(np.prod(env.obs_shape)), num_actions=num_actions, **kwargs)
    return cls(num_actions=num_actions, **kwargs)


def load_experiment(
    exp: Dict[str, Any],
    algo: Optional[str] = None,
    seed: int = 0,
    overrides: Optional[Dict[str, Any]] = None,
):
    """exp dict (either schema) → ready trainer. `overrides` patches engine
    knobs (eval_batch, num_eval_episodes, batch_size, noise table size...)."""
    import jax

    from ..algos.es import ESConfig, ESTrainer
    from ..algos.ga import GAConfig, GATrainer, RSTrainer
    from ..algos.nses import NSESConfig, NSESTrainer
    from ..ops.noise import NoiseTable

    overrides = overrides or {}

    def pick_trainer(single_ctor, env):
        """Scale-out dispatch (the replacement for the reference's
        master/worker fleet, es_distributed/main.py:74-86):
        * device envs + >1 visible device → mesh-aware pod trainers driving
          SPMD generation kernels (parallel/trainers.py); override with the
          `{"pod": true|false}` engine knob.
        * host-engine envs (ALE/MuJoCo pools) + >1 process → host-pod
          trainers: one engine pool per process, fitness columns
          allgathered, replicated update (parallel/host_pod.py — the
          per-machine simulator-fleet model of main.py:74-86 /
          concurrent_worker.py:129-142). `{"host_pod": N}` forces the
          single-process N-sub-round emulation (tests/dryrun)."""
        is_host = getattr(env, "is_host_env", False)
        if is_host:
            emulate = overrides.get("host_pod")
            if not emulate and jax.process_count() <= 1:
                return single_ctor
            import functools

            from ..parallel import host_pod

            ctor = {
                ESTrainer: host_pod.HostPodESTrainer,
                GATrainer: host_pod.HostPodGATrainer,
                RSTrainer: host_pod.HostPodRSTrainer,
                NSESTrainer: host_pod.HostPodNSESTrainer,
            }[single_ctor]
            if emulate:
                ctor = functools.partial(ctor, emulate_procs=int(emulate))
            return ctor
        pod = overrides.get("pod", "auto")
        if pod == "auto" and overrides.get("noise") == "virtual":
            pod = False  # VirtualNoise is wired for the single-device trainer
        want = pod is True or (pod == "auto" and jax.device_count() > 1)
        if not want:
            return single_ctor
        from ..parallel import trainers as pod_trainers

        return {
            ESTrainer: pod_trainers.PodESTrainer,
            GATrainer: pod_trainers.PodGATrainer,
            RSTrainer: pod_trainers.PodRSTrainer,
            NSESTrainer: pod_trainers.PodNSESTrainer,
        }[single_ctor]
    # env construction knobs: experiment-level block (e.g. bc_mode for the
    # MuJoCo BC choice) patched by run-time overrides (batch_size etc.)
    env_kwargs = {**exp.get("env_kwargs", {}), **overrides.get("env_kwargs", {})}
    noise_table = None
    if overrides.get("noise") == "virtual":
        # counter-based noise source: no HBM table at all, rows regenerate
        # on the VPU (ops/noise.py VirtualNoise; trades the gradient's table
        # bandwidth for compute — documented divergence from the reference's
        # materialized RandomState(123) stream)
        from ..ops.noise import VirtualNoise

        noise_table = VirtualNoise.from_seed(count=overrides.get("noise_size", 250_000_000))
    elif overrides.get("noise") == "device":
        # generate the table ON DEVICE (NoiseTable.from_key): host→HBM
        # transfer of the default 1 GB table takes >20 min through a relay
        # tunnel (and minutes over PCIe); device threefry generates it in
        # ~ms. Not RandomState(123)-bit-compatible — use for training runs,
        # not reference-parity studies.
        noise_table = NoiseTable.from_key(
            jax.random.PRNGKey(overrides.get("noise_seed", 123)),
            count=overrides.get("noise_size", 250_000_000),
        )
    elif "noise_size" in overrides:
        noise_table = NoiseTable.from_seed(count=overrides["noise_size"])

    if "game" in exp:  # ---------------- GPU schema
        env = resolve_env(exp["game"], **env_kwargs)
        model = build_model(exp["model"], {}, env)
        algo = algo or ("ga" if "selection_threshold" in exp else "es")
        if algo == "es":
            opt_cfg = exp.get("optimizer", {"type": "adam", "args": {"stepsize": 0.01}})
            cfg = ESConfig(
                l2coeff=exp.get("l2coeff", 0.005),
                noise_stdev=exp.get("mutation_power", 0.02),
                population_size=int(exp["population_size"]),
                return_proc_mode=exp.get("return_proc_mode", "centered_rank"),
                episode_cutoff_mode=exp.get("episode_cutoff_mode", "env_default"),
                mirror_crn=bool(overrides.get("mirror_crn", exp.get("mirror_crn", False))),
                **{k: overrides[k] for k in ("eval_batch", "num_eval_episodes", "grad_chunk", "theta_hbm_budget") if k in overrides},
            )
            tr = pick_trainer(ESTrainer, env)(
                env,
                model,
                cfg,
                optimizer=optim.make_optimizer(opt_cfg["type"], **opt_cfg["args"]),
                noise_table=noise_table,
                seed=seed,
            )
            if "load_from" in exp:
                # GA-seeded ES: initial θ from a pickled seed chain
                # (gpu es.py:164-171 seeds.pkl import hook)
                import pickle

                import jax.numpy as jnp

                from .checkpoint import theta_from_seed_chain

                with open(exp["load_from"].format(**exp), "rb") as f:
                    seeds = pickle.load(f)
                theta0 = theta_from_seed_chain(model, tr.noise, seeds)
                tr.state = tr.state._replace(theta=jnp.asarray(theta0))
            return tr
        cfg = GAConfig(
            population_size=int(exp["population_size"]),
            selection_threshold=int(exp.get("selection_threshold", 0)),
            validation_threshold=int(exp.get("validation_threshold", 10)),
            num_validation_episodes=int(exp.get("num_validation_episodes", 30)),
            num_test_episodes=int(exp.get("num_test_episodes", 200)),
            mutation_power=exp.get("mutation_power", 0.002),
            episode_cutoff_mode=exp.get("episode_cutoff_mode", "env_default"),
            timesteps=float(exp.get("timesteps", 1e9)),
            **{k: overrides[k] for k in ("eval_batch", "theta_hbm_budget") if k in overrides},
        )
        ctor = pick_trainer(RSTrainer if algo == "rs" else GATrainer, env)
        tr = ctor(env, model, cfg, noise_table=noise_table, seed=seed)
        if "load_population" in exp:  # gpu ga.py:161-162
            tr.copy_population(exp["load_population"])
        return tr

    # -------------------------------------- CPU schema
    c = exp["config"]
    env = resolve_env(exp["env_id"], **env_kwargs)
    model = build_model(exp["policy"]["type"], exp["policy"].get("args", {}), env)
    algo = algo or exp.get("algo") or ("nses" if "novelty_search" in exp else "es")
    opt_cfg = exp.get("optimizer", {"type": "adam", "args": {"stepsize": 0.01}})

    if algo in ("es",):
        # eval_prob → deterministic eval budget: the reference's workers run
        # noiseless evals with prob eval_prob (es.py:388-405); here the same
        # expected episode count is scheduled explicitly per generation
        eval_prob = c.get("eval_prob", 0.0)
        epb = int(c.get("episodes_per_batch", 0))
        default_evals = max(1, int(eval_prob * epb)) if eval_prob > 0 and epb else 8
        if "num_eval_episodes" not in overrides:
            overrides = {**overrides, "num_eval_episodes": default_evals}
        cfg = ESConfig(
            l2coeff=c.get("l2coeff", 0.005),
            noise_stdev=c.get("noise_stdev", 0.02),
            episodes_per_batch=int(overrides.get("episodes_per_batch", c.get("episodes_per_batch", 0))),
            timesteps_per_batch=int(overrides.get("timesteps_per_batch", c.get("timesteps_per_batch", 0))),
            population_size=int(overrides.get("population_size", exp.get("population_size", 0))),
            calc_obstat_prob=c.get("calc_obstat_prob", 0.0),
            eval_prob=eval_prob,
            snapshot_freq=int(c.get("snapshot_freq", 0)),
            return_proc_mode=c.get("return_proc_mode", "centered_rank"),
            episode_cutoff_mode=c.get("episode_cutoff_mode", "env_default"),
            mirror_crn=bool(overrides.get("mirror_crn", c.get("mirror_crn", False))),
            **{k: overrides[k] for k in ("eval_batch", "num_eval_episodes", "grad_chunk", "theta_hbm_budget") if k in overrides},
        )
        tr = pick_trainer(ESTrainer, env)(
            env,
            model,
            cfg,
            optimizer=optim.make_optimizer(opt_cfg["type"], **opt_cfg["args"]),
            noise_table=noise_table,
            seed=seed,
        )
        init_from = exp["policy"].get("args", {}).get("init_from")
        if init_from:
            # warm-start surgery: smaller policy's tensors into this model's
            # prefix slices (es.py:165-167 → policies.py:219-249)
            import jax.numpy as jnp

            from .checkpoint import initialize_from

            tr.state = tr.state._replace(
                theta=jnp.asarray(initialize_from(init_from, model))
            )
        return tr
    if algo in ("ga", "rs"):
        cfg = GAConfig(
            population_size=int(exp.get("population_size", 1000)),
            num_elites=int(exp.get("num_elites", 1)),
            selection_threshold=int(exp.get("selection_threshold", 20)),
            mutation_power=c.get("noise_stdev", 0.002),
            noise_stdev=c.get("noise_stdev", 0.002),
            genome_style="cpu",
            episode_cutoff_mode=c.get("episode_cutoff_mode", "env_default"),
            validation_threshold=int(exp.get("validation_threshold", 0)),
            num_validation_episodes=int(exp.get("num_validation_episodes", 0)),
            num_test_episodes=int(exp.get("num_test_episodes", 0)),
            **{k: overrides[k] for k in ("eval_batch", "theta_hbm_budget") if k in overrides},
        )
        ctor = pick_trainer(RSTrainer if algo == "rs" else GATrainer, env)
        return ctor(env, model, cfg, noise_table=noise_table, seed=seed)
    if algo in ("nses", "ns", "nsr", "nses_nsr"):
        ns = exp.get("novelty_search", {})
        # Atari NS-ES characterizes behavior by the per-step RAM trajectory
        # (policies.py:410-418); device/vector envs by the final-state BC
        default_bc = (
            "traj"
            if getattr(env, "is_host_env", False)
            and getattr(env, "host_obs", "image") == "image"
            else "final"
        )
        cfg = NSESConfig(
            l2coeff=c.get("l2coeff", 0.005),
            noise_stdev=c.get("noise_stdev", 0.02),
            population_size=int(c.get("episodes_per_batch", 128)),
            return_proc_mode=c.get("return_proc_mode", "centered_sign_rank"),
            episode_cutoff_mode=c.get("episode_cutoff_mode", "env_default"),
            algo_type=exp.get("algo_type", "ns"),
            k=int(ns.get("k", 10)),
            meta_population_size=int(ns.get("population_size", 3)),
            num_rollouts=int(ns.get("num_rollouts", 1)),
            selection_method=ns.get("selection_method", "novelty_prob"),
            bc_mode=overrides.get("bc_mode", ns.get("bc_mode", default_bc)),
        )
        return pick_trainer(NSESTrainer, env)(
            env,
            model,
            cfg,
            optimizer=optim.make_optimizer(opt_cfg["type"], **opt_cfg["args"]),
            noise_table=noise_table,
            seed=seed,
        )
    raise ValueError(f"unknown algo {algo!r}")


def load_experiment_file(path: str, **kw):
    with open(path) as f:
        return load_experiment(json.load(f), **kw)

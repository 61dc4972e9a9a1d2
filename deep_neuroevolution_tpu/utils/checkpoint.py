"""Checkpoint / resume — full-state and policy snapshots.

Reference mechanisms reproduced (§5.4 of SURVEY.md):
1. Policy snapshots — h5 files holding every variable + pickled constructor
   args (policies.py:49-67 save/Load), written per `snapshot_freq` with the
   reward in the filename (es.py:345-353). Here: `.npz` with θ, the model
   class name + kwargs, and optional ob-stat / ref-batch — everything needed
   to rebuild and replay the policy.
2. Warm-start surgery — `initialize_from` loading a smaller policy into a
   larger one (policies.py:219-249) via ops.flat.partial_load.
3. Full training-state pickles — the GPU stack's TrainingState snapshot.pkl
   every generation (gpu es.py:278-283, ga.py:134-155). Here: pickle of the
   numpy-ified state (θ, optimizer moments, RNG key, obs stats, counters,
   GA population chains, NS archive) with deterministic resume.
"""

from __future__ import annotations

import dataclasses
import pickle
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, jax.device_get(tree))


# ---------------------------------------------------------------- snapshots


def save_policy_snapshot(
    path: str,
    model,
    theta,
    ob_stat=None,
    ref_batch=None,
    extra: Optional[Dict[str, Any]] = None,
):
    """Self-contained policy file (the h5 snapshot analog, policies.py:49-59)."""
    payload = {
        "theta": np.asarray(theta),
        "model_class": type(model).__name__,
        "model_kwargs": dataclasses.asdict(model) if dataclasses.is_dataclass(model) else {},
        "ob_stat": _to_host(ob_stat) if ob_stat is not None else None,
        "ref_batch": np.asarray(ref_batch) if ref_batch is not None else None,
        "extra": extra or {},
    }
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_policy_snapshot(path: str) -> Tuple[Any, np.ndarray, Dict[str, Any]]:
    """→ (model, theta, payload). Rebuilds the model by registry name
    (policies.py:61-67 Load reconstructs from pickled args)."""
    from .. import models

    with open(path, "rb") as f:
        payload = pickle.load(f)
    cls = getattr(models, payload["model_class"], None) or models.get_model(payload["model_class"])
    model = cls(**payload["model_kwargs"])
    return model, payload["theta"], payload


def theta_from_seed_chain(
    model, noise_table, seeds, genome_style: str = "gpu", noise_stdev: float = 0.002
):
    """Flat θ from a seed-chain genome, either encoding (SURVEY §3.4).

    GPU-style (base.py:139-145): [init_seed, (idx, power), ...] with
    per-model init scaling. CPU-style (es_distributed/ga.py:250-264): bare
    indices, normalized-column reinit of the first slice, global stdev."""
    import jax.numpy as jnp

    from ..ops import genome

    dim = model.num_params
    assert noise_table.size > dim, "noise table smaller than num_params"
    if genome_style == "gpu":
        idxs = jnp.asarray(
            [s[0] if isinstance(s, (tuple, list)) else s for s in seeds], jnp.int32
        )
        powers = jnp.asarray(
            [s[1] if isinstance(s, (tuple, list)) else 0.0 for s in seeds], jnp.float32
        )
        scale_by = model.scale_by(getattr(model, "scale_style", "fan_in"))
        return genome.reconstruct_gpu_style(noise_table.noise, idxs, powers, dim, scale_by)
    if genome_style == "cpu":
        theta = model.reinit_theta(noise_table.get(jnp.int32(seeds[0]), dim))
        for s in seeds[1:]:
            theta = theta + noise_stdev * noise_table.get(jnp.int32(s), dim)
        return theta
    raise ValueError(f"unknown genome_style {genome_style!r} (gpu|cpu)")


def initialize_from(small_snapshot_path: str, big_model) -> np.ndarray:
    """Warm-start surgery: load a smaller policy's tensors into a larger
    model's prefix slices (policies.py:219-249)."""
    from ..ops import flat

    small_model, small_theta, _ = load_policy_snapshot(small_snapshot_path)
    small_parts = flat.unflatten(np.asarray(small_theta), small_model.specs)
    import jax.random as jr

    big_theta = big_model.init_theta(jr.PRNGKey(0))
    return np.asarray(flat.partial_load(big_theta, big_model.specs, jax.device_get(small_parts)))


def save_policy_snapshot_auto(log_dir: str, trainer, iteration: int, rew=None):
    """Periodic reference-style policy snapshot
    `snapshot_iterNNNNN_rewR` (es.py:345-353; GA/RS write unconditionally,
    ga.py:197-206). Extracts the current flagship policy from any trainer:
    ES → θ, NS-ES → current parent, GA/RS → elite (reconstructed from its
    seed chain). Returns the written path, or None if nothing to save yet."""
    import numpy as _np

    from ..algos.es import ESTrainer
    from ..algos.ga import GATrainer
    from ..algos.nses import NSESTrainer

    theta = ob_stat = ref_batch = None
    if isinstance(trainer, ESTrainer):
        theta = trainer.state.theta
        ob_stat = trainer.state.ob_stat if trainer.model.needs_ob_stat else None
        ref_batch = trainer.ref_batch
    elif isinstance(trainer, NSESTrainer):
        p = trainer.parents[trainer.curr_parent]
        theta = p.theta
        ob_stat = p.ob_stat if trainer.model.needs_ob_stat else None
        ref_batch = trainer.ref_batch
    elif isinstance(trainer, GATrainer):
        elite = trainer.state.elite
        if elite is None:
            return None
        theta = trainer._reconstruct(elite.seeds)
        ref_batch = getattr(trainer, "ref_batch", None)
        if rew is None:
            rew = elite.fitness
    else:
        raise TypeError(type(trainer))

    rew_str = "NaN" if rew is None or not _np.isfinite(rew) else str(int(_np.round(rew)))
    path = str(Path(log_dir) / f"snapshot_iter{iteration:05d}_rew{rew_str}.pkl")
    save_policy_snapshot(
        path,
        trainer.model,
        theta,
        ob_stat=ob_stat,
        ref_batch=ref_batch,
        extra={"env_id": getattr(trainer.env, "env_id", None), "iteration": iteration},
    )
    return path


# ------------------------------------------------------------ trainer state


def save_trainer(path: str, trainer) -> None:
    """Full training-state pickle (gpu es.py:278-283 / ga.py:134-155)."""
    from ..algos.es import ESTrainer
    from ..algos.ga import GATrainer
    from ..algos.nses import NSESTrainer

    state: Dict[str, Any] = {"type": type(trainer).__name__}
    if isinstance(trainer, ESTrainer):
        state["es_state"] = _to_host(trainer.state)._asdict()
        state["cutoff"] = trainer.cutoff._asdict()
        state["ref_batch"] = _to_host(trainer.ref_batch) if trainer.ref_batch is not None else None
    elif isinstance(trainer, GATrainer):
        st = trainer.state
        state["ga"] = {
            "it": st.it,
            "timesteps_so_far": st.timesteps_so_far,
            "validation_timesteps_so_far": st.validation_timesteps_so_far,
            "num_frames": st.num_frames,
            "time_elapsed": st.time_elapsed,
            "population": st.population,
            "elite": st.elite,
            "curr_solution": st.curr_solution,
            "curr_solution_val": st.curr_solution_val,
            "curr_solution_test": st.curr_solution_test,
        }
        state["cutoff"] = trainer.cutoff._asdict()
        state["cached_parent_seeds"] = trainer.cached_parent_seeds
        state["cached_parent_thetas"] = (
            _to_host(trainer.cached_parent_thetas)
            if trainer.cached_parent_thetas is not None
            else None
        )
        state["key"] = _to_host(trainer.key)
    elif isinstance(trainer, NSESTrainer):
        state["parents"] = [_to_host(p)._asdict() for p in trainer.parents]
        state["archive"] = _to_host(trainer.archive)._asdict()
        state["curr_parent"] = trainer.curr_parent
        state["iteration"] = trainer.iteration
        state["episodes_so_far"] = trainer.episodes_so_far
        state["timesteps_so_far"] = trainer.timesteps_so_far
        state["cutoff"] = trainer.cutoff._asdict()
        state["key"] = _to_host(trainer.key)
    else:
        raise TypeError(type(trainer))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(state, f)


def load_trainer(path: str, trainer) -> None:
    """Restore a freshly-constructed trainer in place (deterministic resume)."""
    import jax.numpy as jnp

    from ..algos.es import CutoffState, ESState, ESTrainer
    from ..algos.ga import GATrainer, GAState
    from ..algos.nses import NSESTrainer, Parent
    from ..ops import novelty, obstat

    with open(path, "rb") as f:
        state = pickle.load(f)
    # family match, not exact class: a single-device snapshot resumes into a
    # pod (device-mesh) or host-pod (per-process engine pools) trainer and
    # vice versa (scale-out restart = recreate + resume, SURVEY §5.3) —
    # Pod*/HostPod* subclass the single-device trainers
    def family(name: str) -> str:
        for prefix in ("HostPod", "Pod"):
            if name.startswith(prefix):
                return name[len(prefix):]
        return name

    assert family(state["type"]) == family(type(trainer).__name__), (
        state["type"], type(trainer).__name__,
    )

    if isinstance(trainer, ESTrainer):
        d = state["es_state"]
        d["ob_stat"] = obstat.RunningStat(*[jnp.asarray(v) for v in d["ob_stat"]])
        from ..ops.optim import AdamState, SGDState

        opt = d["opt_state"]
        opt_cls = AdamState if len(opt) == 3 else SGDState
        d["opt_state"] = opt_cls(*[jnp.asarray(v) for v in opt])
        d["theta"] = jnp.asarray(d["theta"])
        d["key"] = jnp.asarray(d["key"])
        trainer.state = ESState(**d)
        trainer.cutoff = CutoffState(**state["cutoff"])
        if state.get("ref_batch") is not None:
            trainer.ref_batch = jnp.asarray(state["ref_batch"])
    elif isinstance(trainer, GATrainer):
        g = state["ga"]
        st = GAState()
        for k, v in g.items():
            setattr(st, k, v)
        trainer.state = st
        from ..algos.es import CutoffState as CS

        trainer.cutoff = CS(**state["cutoff"])
        trainer.cached_parent_seeds = state["cached_parent_seeds"]
        trainer.cached_parent_thetas = (
            jnp.asarray(state["cached_parent_thetas"])
            if state["cached_parent_thetas"] is not None
            else None
        )
        trainer.key = jnp.asarray(state["key"])
    elif isinstance(trainer, NSESTrainer):
        from ..ops.optim import AdamState, SGDState

        parents = []
        for p in state["parents"]:
            opt = p["opt_state"]
            opt_cls = AdamState if len(opt) == 3 else SGDState
            parents.append(
                Parent(
                    jnp.asarray(p["theta"]),
                    opt_cls(*[jnp.asarray(v) for v in opt]),
                    obstat.RunningStat(*[jnp.asarray(v) for v in p["ob_stat"]]),
                )
            )
        trainer.parents = parents
        a = state["archive"]
        trainer.archive = novelty.Archive(jnp.asarray(a["points"]), jnp.asarray(a["count"]))
        trainer.curr_parent = state["curr_parent"]
        trainer.iteration = state["iteration"]
        trainer.episodes_so_far = state["episodes_so_far"]
        trainer.timesteps_so_far = state["timesteps_so_far"]
        from ..algos.es import CutoffState as CS

        trainer.cutoff = CS(**state["cutoff"])
        trainer.key = jnp.asarray(state["key"])

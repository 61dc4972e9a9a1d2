"""NS-ES / NSR-ES — novelty-seeking ES over a meta-population of parents.

Reference: es_distributed/nses.py. Semantics preserved:
* M independent parents, each with its own θ, optimizer state, and ob-stat
  (nses.py:95-117 theta_dict/optimizer_dict/obstat_dict).
* Archive seeded with every parent's mean BC over `num_rollouts` noiseless
  rollouts (nses.py:34-39 get_mean_bc, nses.py:113-114), grown by the
  updated parent's mean BC every iteration (nses.py:246-247).
* Per iteration the CURRENT parent is perturbed antithetically; each
  perturbed rollout's BC is scored as k-NN novelty vs the archive and rides
  the signreturns slot (nses.py:381-387); with
  return_proc_mode='centered_sign_rank' the gradient ranks novelty
  (frostbite_nses.json); algo_type='nsr' averages novelty ranks with reward
  ranks (nses.py:226-228).
* Parent selection: 'novelty_prob' — every parent's CURRENT mean BC is
  re-rolled and its novelty normalized into selection probabilities
  (nses.py:293-306) — or 'round_robin' (nses.py:300-302).

TPU-native: the Redis archive list becomes a device Archive array; worker
novelty loops become one vmapped pairwise-distance top-k; the per-parent
dicts become a host list of small device pytrees (M is ~3-5 in every
shipped config).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.core import Env
from ..models.core import Model
from ..ops import fitness, novelty, obstat, optim
from ..ops.noise import NoiseTable, VirtualNoise
from ..utils import tabular as tlogger
from .es import ESConfig, parse_cutoff, update_cutoff
from .rollout import rollout_batch


@dataclasses.dataclass
class NSESConfig(ESConfig):
    algo_type: str = "ns"  # 'ns' | 'nsr' (nses.py:63, exp['algo_type'])
    k: int = 10  # k-NN size (novelty_search.k)
    meta_population_size: int = 3  # novelty_search.population_size
    num_rollouts: int = 1  # BC-averaging rollouts (novelty_search.num_rollouts)
    selection_method: str = "novelty_prob"  # | 'round_robin'
    archive_capacity: int = 10_000  # initial; the archive doubles when full
    return_proc_mode: str = "centered_sign_rank"  # frostbite_nses.json
    bc_mode: str = "final"  # 'traj' = the Atari per-step RAM trajectory BC
    #   (ESAtariPolicy.rollout appends the 128-byte RAM at EVERY step,
    #   policies.py:410-418) scored with the length-tolerant euclidean
    #   (nses.py:12-20); host image engines only. 'final' keeps the
    #   device-array final-state BC (maze x-y, MuJoCo mass center).


class Parent(NamedTuple):
    theta: jax.Array
    opt_state: Any
    ob_stat: obstat.RunningStat


# --------------------------------------------------------------------- jits


@partial(jax.jit, static_argnums=(0, 1, 6, 7, 12))
def _perturbed_eval_with_bc(
    env: Env,
    model: Model,
    theta: jax.Array,
    table: jax.Array,
    key: jax.Array,
    tslimit: jax.Array,
    npairs: int,
    k: int,
    sigma: jax.Array,
    archive: novelty.Archive,
    ctx=None,
    ref_batch=None,
    collect_obstat: bool = False,
):
    """Antithetic eval where each rollout also yields (BC, novelty).

    `table` is the raw [N] table buffer or a VirtualNoise source — rows come
    through the same dispatch the ES kernels use (es.py:171-174)."""
    from ..ops.noise import noise_rows, sample_source_idxs

    dim = theta.shape[0]
    kidx, kroll = jax.random.split(key)
    idxs = sample_source_idxs(table, kidx, dim, npairs, False)
    eps = noise_rows(table, idxs, dim)
    thetas = jnp.concatenate([theta[None] + sigma * eps, theta[None] - sigma * eps])
    if model.needs_ref_batch:
        stats = model.batch_ref_stats(thetas, ref_batch)
        params = (thetas, stats)
    else:
        params = (thetas, ctx)
    keys = jax.random.split(kroll, npairs)
    res = rollout_batch(
        env, model.make_batch_act(), params, jnp.concatenate([keys, keys]), tslimit,
        collect_obstat=collect_obstat,
    )
    nov = novelty.novelty_vs_archive(archive, res.bc, k)  # [2n]
    pair = lambda x: jnp.stack([x[:npairs], x[npairs:]], axis=1)
    return (
        idxs, pair(res.returns), pair(nov), pair(res.lengths),
        res.ob_sum, res.ob_sumsq, res.ob_count,
    )


@partial(jax.jit, static_argnums=(0, 1, 5))
def _mean_bc(
    env: Env,
    model: Model,
    theta: jax.Array,
    key: jax.Array,
    tslimit: jax.Array,
    num_rollouts: int,
    ctx=None,
    ref_batch=None,
):
    """Mean BC over noiseless rollouts (nses.py:34-39 get_mean_bc)."""
    thetas = jnp.broadcast_to(theta, (num_rollouts,) + theta.shape)
    if model.needs_ref_batch:
        stats = model.batch_ref_stats(thetas[:1], ref_batch)
        stats = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (num_rollouts,) + x.shape[1:]), stats
        )
        params = (thetas, stats)
    else:
        params = (thetas, ctx)
    res = rollout_batch(env, model.make_batch_act(), params, jax.random.split(key, num_rollouts), tslimit)
    return jnp.mean(res.bc, axis=0)


@partial(jax.jit, static_argnums=(0, 1, 5))
def _mean_bc_parents(
    env: Env,
    model: Model,
    thetas_m: jax.Array,  # [M, D] — the whole meta-population at once
    key: jax.Array,
    tslimit: jax.Array,
    num_rollouts: int,
    ctx=None,
    ref_batch=None,
):
    """Mean BC of every parent in ONE device dispatch — the per-iteration
    parent re-roll of nses.py:293-306 without M separate launches (each
    launch costs a host round-trip; see CLAUDE.md on tunnel RTTs). For M=1
    this computes exactly what `_mean_bc` computes with the same key."""
    M = thetas_m.shape[0]
    thetas = jnp.repeat(thetas_m, num_rollouts, axis=0)  # [M·R, D]
    if model.needs_ref_batch:
        stats = model.batch_ref_stats(thetas, ref_batch)
        params = (thetas, stats)
    else:
        params = (thetas, ctx)
    res = rollout_batch(
        env, model.make_batch_act(), params, jax.random.split(key, thetas.shape[0]), tslimit
    )
    return res.bc.reshape(M, num_rollouts, -1).mean(axis=1)


# ------------------------------------------------------------------ trainer


class NSESTrainer:
    def __init__(
        self,
        env: Env,
        model: Model,
        config: NSESConfig,
        optimizer: Optional[optim.Adam] = None,
        noise_table: Optional[NoiseTable] = None,
        seed: int = 0,
    ):
        assert env.bc_dim > 0, "NS-ES needs an env with a behavior characterization"
        if config.algo_type == "ns" and config.return_proc_mode == "centered_rank":
            # reference-faithful but almost never intended: novelty rides the
            # signreturns slot (nses.py:381-387), and 'centered_rank' ranks
            # REWARD (nses.py:217-218) — pure-NS with it is just ES
            tlogger.warn(
                "NSES: algo_type='ns' with return_proc_mode='centered_rank' "
                "optimizes reward, not novelty — use 'centered_sign_rank' "
                "(maze_nses.json/frostbite_nses.json default)"
            )
        self.is_host_env = getattr(env, "is_host_env", False)
        self.env = env
        self.model = model
        self.config = config
        self.optimizer = optimizer or optim.Adam(stepsize=0.01)
        self.noise = noise_table or NoiseTable.from_seed()
        assert self.noise.size > model.num_params, (
            f"noise table ({self.noise.size}) must exceed num_params ({model.num_params})"
        )
        self.key = jax.random.PRNGKey(seed)
        self.cutoff = parse_cutoff(config.episode_cutoff_mode, env.default_timestep_cutoff)
        self.archive = novelty.archive_init(config.archive_capacity, env.bc_dim)
        self.traj_bc = config.bc_mode == "traj"
        if self.traj_bc:
            assert self.is_host_env and getattr(env, "host_obs", "image") == "image", (
                "bc_mode='traj' is the Atari RAM-per-step BC (policies.py:410-418) "
                "— host image engines only"
            )
            # ragged trajectories live in a host list, the direct analog of
            # the Redis archive list (dist.py:92-98)
            self.host_archive: List[np.ndarray] = []
        self.ref_batch = None
        if model.needs_ref_batch:
            if self.is_host_env:
                from .rollout_host import collect_ref_batch_host

                self.ref_batch = collect_ref_batch_host(env, self._next_key(), batch_size=128)
            else:
                from .rollout import collect_ref_batch

                self.ref_batch = collect_ref_batch(env, self._next_key(), batch_size=128)

        # meta-population init: fresh θ per parent, archive seeded with each
        # parent's mean BC (nses.py:95-117)
        self.parents: List[Parent] = []
        for p in range(config.meta_population_size):
            theta = model.init_theta(self._next_key())
            parent = Parent(
                theta, self.optimizer.init(model.num_params), obstat.init(env.obs_shape, 1e-2)
            )
            self.parents.append(parent)
            bc = self._mean_bc_dispatch(theta, self._next_key(), self._ctx(parent))
            self._archive_add(bc)

        self.curr_parent = 0
        self.iteration = 0
        self.episodes_so_far = 0
        self.timesteps_so_far = 0
        self._tstart = time.time()

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    @property
    def _table_arg(self):
        """What the kernels receive: the raw [N] buffer for a materialized
        NoiseTable, or the VirtualNoise pytree itself — the ES dispatch
        (es.py noise_rows/sample_source_idxs/gradient_from_noise) regenerates
        rows counter-based for the latter, so NS-ES runs table-free too."""
        return self.noise if isinstance(self.noise, VirtualNoise) else self.noise.noise

    # ------------------------------------------------- archive abstraction
    # device Archive array (final-state BCs) vs host list (ragged RAM
    # trajectories) — one insertion + one kNN surface for both

    def _archive_add(self, bc) -> None:
        if self.traj_bc:
            self.host_archive.append(np.asarray(bc))
        else:
            self.archive = novelty.archive_add(self.archive, bc)

    def _archive_size(self) -> int:
        return len(self.host_archive) if self.traj_bc else int(self.archive.count)

    def _archive_novelty(self, bcs) -> np.ndarray:
        """k-NN novelty of each BC vs the archive. Ragged trajectories go
        through the length-tolerant euclidean (nses.py:12-32); device BCs
        through the fused pairwise top-k."""
        if self.traj_bc:
            return np.array(
                [
                    novelty.compute_novelty_vs_archive(self.host_archive, b, self.config.k)
                    for b in bcs
                ],
                np.float32,
            )
        if isinstance(bcs, (list, tuple)):
            bcs = jnp.stack(list(bcs))
        return np.asarray(novelty.novelty_vs_archive(self.archive, bcs, self.config.k))

    def _ctx(self, parent: Parent, noisy: bool = False):
        """`noisy=True` for perturbed training rollouts (nses.py:374-380
        pass rs → action noise); mean-BC and eval rollouts are noiseless
        (nses.py:37, 349)."""
        if self.model.needs_ob_stat:
            from ..models.mlp import MLPContext

            return MLPContext(
                obstat.mean(parent.ob_stat),
                obstat.std(parent.ob_stat),
                jnp.asarray(1.0 if noisy else 0.0),
            )
        return None

    # ------------------------------------------------------- host-env paths

    def _host_perturbed_eval(self, theta, key, npairs, ctx):
        """Host-engine analog of _perturbed_eval_with_bc. BC mode:
        * 'traj' — per-step RAM trajectory (policies.py:410-418) scored with
          the length-tolerant euclidean kNN (nses.py:12-32), the reference's
          Atari NS-ES characterization;
        * 'final' — final RAM state (tf_atari.cpp:114-119)."""
        from .es import _make_antithetic
        from .rollout_host import rollout_host

        cfg = self.config
        npairs = min(npairs, self.env.batch_size // 2)
        idxs, thetas = _make_antithetic(
            theta, self._table_arg, key, npairs, jnp.asarray(cfg.noise_stdev, jnp.float32)
        )
        # under-filled rounds (e.g. a host-pod sub-round whose population
        # share is below the slot count) pad to the engine's B slots with the
        # last member; every consumer below trims back to [: 2*npairs]
        B = self.env.batch_size
        obstat_valid = None
        if thetas.shape[0] < B:
            pad = jnp.broadcast_to(thetas[-1:], (B - thetas.shape[0],) + thetas.shape[1:])
            thetas = jnp.concatenate([thetas, pad])
            # padded duplicate rollouts must not feed the obs moments
            # (reference accumulates per real rollout, es.py:356-363)
            obstat_valid = np.arange(B) < 2 * npairs
        if self.model.needs_ref_batch:
            stats = self.model.batch_ref_stats(thetas, self.ref_batch)
            params = (thetas, stats)
        else:
            params = (thetas, ctx)
        res = rollout_host(
            self.env, self.model.make_batch_act(), params, key, int(self.cutoff.tslimit),
            collect_obstat=self.model.needs_ob_stat and cfg.calc_obstat_prob > 0,
            collect_bc_traj=self.traj_bc,
            obstat_prob=cfg.calc_obstat_prob if 0.0 < cfg.calc_obstat_prob < 1.0 else None,
            obstat_valid=obstat_valid,
        )
        if self.traj_bc:
            nov = jnp.asarray(self._archive_novelty(res.bc_traj[: 2 * npairs]))
        else:
            nov = novelty.novelty_vs_archive(self.archive, res.bc[: 2 * npairs], cfg.k)
        pair = lambda x: jnp.stack([x[:npairs], x[npairs : 2 * npairs]], axis=1)
        return (
            idxs, pair(res.returns), pair(nov), pair(res.lengths),
            res.ob_sum, res.ob_sumsq, res.ob_count,
        )

    def _host_mean_bc(self, theta, key, ctx):
        from .rollout_host import rollout_host

        # only n slots run (n_slots, see rollout_host): the parent mean-BC
        # pass needs num_rollouts episodes, not the whole engine batch
        n = min(self.config.num_rollouts, self.env.batch_size)
        thetas = jnp.broadcast_to(theta, (n,) + theta.shape)
        if self.model.needs_ref_batch:
            stats = self.model.batch_ref_stats(thetas[:1], self.ref_batch)
            stats = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n,) + x.shape[1:]), stats
            )
            params = (thetas, stats)
        else:
            params = (thetas, ctx)
        res = rollout_host(
            self.env, self.model.make_batch_act(), params, key,
            int(self.cutoff.tslimit_max), collect_bc_traj=self.traj_bc,
            n_slots=n,
        )
        if self.traj_bc:
            # get_mean_bc (nses.py:34-39): np.mean over rollouts — ragged
            # trajectories are truncated to the common prefix first (the
            # reference's np.mean requires equal lengths; the prefix mean is
            # its defined-everywhere extension)
            trs = res.bc_traj[:n]
            L = min(t.shape[0] for t in trs)
            return np.mean([t[:L] for t in trs], axis=0)
        return jnp.mean(res.bc[:n], axis=0)

    def _mean_bc_dispatch(self, theta, key, ctx):
        if self.is_host_env:
            return self._host_mean_bc(theta, key, ctx)
        return _mean_bc(
            self.env, self.model, theta, key,
            jnp.asarray(self.cutoff.tslimit_max, jnp.int32),
            self.config.num_rollouts, ctx, self.ref_batch,
        )

    # ------------------------------------------------------------ iteration

    def train_step(self):
        cfg = self.config
        p = self.curr_parent
        parent = self.parents[p]
        step_tstart = time.time()
        npairs = max((cfg.population_size or 128) // 2, 1)

        if self.is_host_env:
            idxs, returns_n2, novelty_n2, lengths_n2, ob_sum, ob_sumsq, ob_count = (
                self._host_perturbed_eval(
                    parent.theta, self._next_key(), npairs, self._ctx(parent, noisy=True)
                )
            )
        else:
            idxs, returns_n2, novelty_n2, lengths_n2, ob_sum, ob_sumsq, ob_count = (
                _perturbed_eval_with_bc(
                    self.env,
                    self.model,
                    parent.theta,
                    self._table_arg,
                    self._next_key(),
                    jnp.asarray(self.cutoff.tslimit, jnp.int32),
                    npairs,
                    cfg.k,
                    jnp.asarray(cfg.noise_stdev, jnp.float32),
                    self.archive,
                    self._ctx(parent, noisy=True),
                    self.ref_batch,
                    self.model.needs_ob_stat and cfg.calc_obstat_prob > 0,
                )
            )

        # gradient: novelty in the signreturns slot (nses.py:381-387);
        # NSR averages reward ranks in (nses.py:226-228)
        proc = fitness.process_returns(returns_n2, novelty_n2, cfg.return_proc_mode)
        if cfg.algo_type == "nsr":
            rew_ranks = fitness.compute_centered_ranks(returns_n2)
            proc = (rew_ranks + proc) / 2.0
        w = proc[:, 0] - proc[:, 1]
        g = fitness.gradient_from_noise(
            self._table_arg, idxs, w, self.model.num_params, cfg.grad_chunk
        )
        g = g / returns_n2.size
        opt_state, theta, ratio = self.optimizer.update(
            parent.opt_state, parent.theta, -g + cfg.l2coeff * parent.theta
        )
        return self._post_update(
            p, theta, opt_state, float(np.square(np.asarray(g)).sum()), ratio,
            returns_n2, novelty_n2, lengths_n2, ob_sum, ob_sumsq, ob_count,
            step_tstart,
        )

    def _post_update(
        self, p, theta, opt_state, gnorm, ratio, returns_n2, novelty_n2,
        lengths_n2, ob_sum, ob_sumsq, ob_count, step_tstart,
    ):
        """Shared tail: obstat write-back, archive insertion, parent
        selection, diagnostics (nses.py:241-306 + the tabular block). The pod
        trainer reuses this with its gathered global results."""
        cfg = self.config
        # fold this batch's obs stats into the CURRENT parent's RunningStat
        # (nses.py:197-198 increment, nses.py:291 write-back)
        ob_stat = self.parents[p].ob_stat
        ob_count_f = float(ob_count)
        if self.model.needs_ob_stat and cfg.calc_obstat_prob > 0 and ob_count_f > 0:
            ob_stat = obstat.increment(
                ob_stat, jnp.asarray(ob_sum), jnp.asarray(ob_sumsq), ob_count_f
            )
        self.parents[p] = Parent(theta, opt_state, ob_stat)

        # archive insertion of updated parent's mean BC (nses.py:246-247).
        # Device envs without per-parent obs-stats batch ALL parents' mean
        # BCs into one dispatch and reuse them for selection below (same
        # estimator as the reference's per-parent re-rolls, one launch).
        bcs_m = None
        fast_bc = not self.is_host_env and not self.model.needs_ob_stat
        if fast_bc:
            thetas_m = jnp.stack([par.theta for par in self.parents])
            bcs_m = _mean_bc_parents(
                self.env, self.model, thetas_m, self._next_key(),
                jnp.asarray(self.cutoff.tslimit_max, jnp.int32),
                cfg.num_rollouts, None, self.ref_batch,
            )
            new_bc = bcs_m[p]
        else:
            new_bc = self._mean_bc_dispatch(theta, self._next_key(), self._ctx(self.parents[p]))
        self._archive_add(new_bc)

        lengths_np = np.asarray(lengths_n2)
        returns_np = np.asarray(returns_n2)
        self.cutoff = update_cutoff(self.cutoff, lengths_np)
        self.iteration += 1
        self.episodes_so_far += lengths_np.size
        self.timesteps_so_far += int(lengths_np.sum())

        # parent selection (nses.py:293-306)
        if cfg.selection_method == "novelty_prob":
            if bcs_m is not None:
                bcs = bcs_m
            else:
                bcs = [
                    self._mean_bc_dispatch(par.theta, self._next_key(), self._ctx(par))
                    for par in self.parents
                ]
            novs = self._archive_novelty(bcs)
            probs = novs / novs.sum()
            self.curr_parent = int(
                np.random.default_rng(int(jax.random.randint(self._next_key(), (), 0, 2**31 - 1))).choice(
                    len(self.parents), p=probs
                )
            )
        elif cfg.selection_method == "round_robin":
            self.curr_parent = (p + 1) % len(self.parents)
        else:
            raise NotImplementedError(cfg.selection_method)

        step_tend = time.time()
        result = dict(
            parent=p,
            returns=returns_np,
            lengths=lengths_np,
            novelty=np.asarray(novelty_n2),
            update_ratio=float(ratio),
            # the archive point inserted this iteration (nses.py:246-247) —
            # the per-generation BC progress marker studies plot
            new_bc=np.asarray(new_bc),
        )
        if not getattr(self, "_log_enabled", True):
            return result
        tlogger.record_tabular("ParentId", p)
        tlogger.record_tabular("EpRewMean", returns_np.mean())
        tlogger.record_tabular("EpRewStd", returns_np.std())
        tlogger.record_tabular("EpLenMean", lengths_np.mean())
        tlogger.record_tabular("EpNovMean", float(np.asarray(novelty_n2).mean()))
        tlogger.record_tabular("Norm", float(np.square(np.asarray(theta)).sum()))
        tlogger.record_tabular("GradNorm", float(gnorm))
        tlogger.record_tabular("UpdateRatio", float(ratio))
        tlogger.record_tabular("EpisodesThisIter", lengths_np.size)
        tlogger.record_tabular("EpisodesSoFar", self.episodes_so_far)
        tlogger.record_tabular("TimestepsThisIter", int(lengths_np.sum()))
        tlogger.record_tabular("TimestepsSoFar", self.timesteps_so_far)
        tlogger.record_tabular("ObCount", ob_count_f)  # nses.py:281
        tlogger.record_tabular("ArchiveSize", self._archive_size())
        tlogger.record_tabular("TimeElapsedThisIter", step_tend - step_tstart)
        tlogger.record_tabular("TimeElapsed", step_tend - self._tstart)
        tlogger.dump_tabular()

        return result

    def train(self, iterations: int):
        for _ in range(iterations):
            self.train_step()

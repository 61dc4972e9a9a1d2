"""Mesh-aware trainers: the multi-chip scale-out path of `main.py train`.

What this replaces (SURVEY §2.3, VERDICT r1 missing #1): the reference's
fleet orchestration — the master process consuming Redis results until quota
(es_distributed/es.py:230-265), the relay aggregation tree (dist.py:124-138)
and per-machine worker forking (main.py:74-86). Here ONE SPMD program runs on
every host of the slice; the population shards over the `pop` mesh axis, the
fitness columns ride `all_gather`, the gradient and obs-stats ride `psum`,
and every process derives the identical replicated update — so there is no
parameter broadcast at all (the reference already proved seeds-not-weights
suffices, es.py:430).

The pod trainers subclass the single-device trainers and override only the
device-dispatch layer; quota accounting, adaptive cutoff, the GA
validation/test ladder, NS archive insertion + parent selection, snapshots
and the reference-named diagnostics are inherited. Logging/VINE writes are
gated to host 0 (`parallel.distributed.is_coordinator`), like the reference's
single master (es.py:141-353).

Launch model: run the SAME `main.py train` on every host (pod_run.sh /
jax.distributed auto-detection on Cloud TPU); `utils/config.py` picks these
trainers whenever more than one device is visible (override with the
`{"pod": false}` engine knob).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..algos.es import ESTrainer, GenStats
from ..algos.ga import GATrainer, RSTrainer
from ..algos.nses import NSESTrainer
from ..ops import optim
from ..ops.noise import NoiseTable
from . import distributed
from .mesh import make_pop_mesh, pop_sharded


class _PodMixin:
    """Mesh plumbing shared by the pod trainers."""

    def _init_pod(self, mesh):
        if getattr(self.env, "is_host_env", False):
            raise NotImplementedError(
                "pod trainers drive device-side envs; host-engine envs (ALE) "
                "scale by per-host engine pools — run one engine per process "
                "(see README scale-out notes)"
            )
        from ..ops.noise import VirtualNoise

        assert not isinstance(self.noise, VirtualNoise), (
            "VirtualNoise is wired for the single-device ESTrainer only; "
            "run with overrides {'pod': false} (pod kernels read the shared table buffer)"
        )
        self.mesh = mesh if mesh is not None else make_pop_mesh()
        self._n_dev = int(self.mesh.devices.size)
        self._log_enabled = distributed.is_coordinator()
        self._steps = {}

    def _device_keys(self, key) -> jax.Array:
        """[n_dev, 2] PRNG keys, one per device, sharded over `pop`. Built
        from host-identical randomness so every process lays out the same
        global array (the multi-process contract of mp_pod_worker.py)."""
        kh = np.asarray(jax.random.split(key, self._n_dev))
        return jax.make_array_from_callback(
            kh.shape, pop_sharded(self.mesh), lambda idx: kh[idx]
        )

    def _shard_rows(self, x: np.ndarray) -> jax.Array:
        """Host numpy → pop-sharded global array (row-contiguous)."""
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, pop_sharded(self.mesh), lambda idx: x[idx]
        )

    def _fetch_sharded(self, xs):
        """Pop-sharded device arrays → host numpy (global rows). Replicated
        arrays are fully addressable and fetch with plain np.asarray."""
        if jax.process_count() == 1:
            return tuple(np.asarray(x) for x in xs)
        from jax.experimental import multihost_utils

        return tuple(
            np.asarray(multihost_utils.process_allgather(x, tiled=True)) for x in xs
        )


class PodESTrainer(_PodMixin, ESTrainer):
    """ES sharded over the pop mesh. Fixed-population generations are ONE
    fused dispatch (rounds scan + all_gather ranks + psum gradient + eval
    episodes — parallel/es_pod.py); quota mode accumulates scanned round
    dispatches until both quotas hold (es.py:230), then one fused
    update+eval dispatch."""

    def __init__(
        self,
        env,
        model,
        config,
        optimizer: Optional[optim.Adam] = None,
        noise_table: Optional[NoiseTable] = None,
        seed: int = 0,
        mesh=None,
    ):
        super().__init__(
            env, model, config, optimizer=optimizer, noise_table=noise_table, seed=seed
        )
        self._init_pod(mesh)

    # ---------------------------------------------------------- step cache

    def _get_fused(self, npairs_pd: int, n_rounds: int, num_eval_pd: int):
        k = ("fused", npairs_pd, n_rounds, num_eval_pd)
        if k not in self._steps:
            from .es_pod import make_pod_es_step

            self._steps[k] = make_pod_es_step(
                self.env, self.model, self.optimizer, self.mesh, npairs_pd,
                return_proc_mode=self.config.return_proc_mode,
                l2coeff=self.config.l2coeff,
                grad_chunk=self.config.grad_chunk,
                has_ref_batch=self.model.needs_ref_batch,
                use_pallas_grad=self.config.use_pallas_grad,
                n_rounds=n_rounds,
                num_eval_per_device=num_eval_pd,
                obstat_prob=self._obstat_prob(),
            )
        return self._steps[k]

    def _get_rounds(self, npairs_pd: int, n_rounds: int):
        k = ("rounds", npairs_pd, n_rounds)
        if k not in self._steps:
            from .es_pod import make_pod_eval_rounds

            self._steps[k] = make_pod_eval_rounds(
                self.env, self.model, self.mesh, npairs_pd, n_rounds,
                has_ref_batch=self.model.needs_ref_batch,
                use_pallas_grad=self.config.use_pallas_grad,
                obstat_prob=self._obstat_prob(),
            )
        return self._steps[k]

    def _obstat_prob(self):
        """Per-rollout Bernoulli obs-stat sampling prob (es.py:356-363)
        when 0 < calc_obstat_prob < 1; None accumulates every rollout."""
        p = self.config.calc_obstat_prob
        return p if self.model.needs_ob_stat and 0.0 < p < 1.0 else None

    def _get_update(self, num_eval_pd: int):
        k = ("update", num_eval_pd)
        if k not in self._steps:
            from .es_pod import make_pod_update_eval

            self._steps[k] = make_pod_update_eval(
                self.env, self.model, self.optimizer, self.mesh,
                return_proc_mode=self.config.return_proc_mode,
                l2coeff=self.config.l2coeff,
                grad_chunk=self.config.grad_chunk,
                num_eval_per_device=num_eval_pd,
                has_ref_batch=self.model.needs_ref_batch,
                use_pallas_grad=self.config.use_pallas_grad,
            )
        return self._steps[k]

    # ------------------------------------------------------------ training

    def train_step(self) -> GenStats:
        cfg = self.config
        s = self.state
        quota_mode = cfg.episodes_per_batch > 0 or cfg.timesteps_per_batch > 0
        cap = max(1, int(cfg.theta_hbm_budget) // (2 * self.model.num_params * 4))
        pop = cfg.population_size
        if cfg.eval_batch:  # per-device pairs per round on pod meshes
            npd = min(cfg.eval_batch, cap)
        elif pop:
            npd = min(max(pop // (2 * self._n_dev), 1), cap)
        else:
            npd = min(64, cap)

        ctx = self._model_ctx(noisy=True)
        ctx_eval = self._model_ctx(noisy=False)
        key = s.key
        key, keval = jax.random.split(key)
        num_eval_pd = (
            -(-cfg.num_eval_episodes // self._n_dev) if cfg.num_eval_episodes > 0 else 0
        )
        tslimit_dev = jnp.asarray(self.cutoff.tslimit, jnp.int32)
        sigma_dev = jnp.asarray(cfg.noise_stdev, jnp.float32)
        step_tstart = time.time()

        if not quota_mode:
            pairs_pd_total = -(-max(pop // 2, 1) // self._n_dev) if pop else npd
            npd = min(npd, pairs_pd_total)
            n_rounds = -(-pairs_pd_total // npd)
            step = self._get_fused(npd, n_rounds, num_eval_pd)
            key, kround = jax.random.split(key)
            res = step(
                s.theta, s.opt_state, self.noise.noise, self._device_keys(kround),
                tslimit_dev, sigma_dev, ctx, self.ref_batch, ctx_eval, keval,
            )
            idxs, rets, srets, lens, bcs, eseeds, ev_r, ev_l, ev_b = self._fetch_sharded(
                (res.noise_idxs, res.returns_n2, res.signreturns_n2, res.lengths_n2,
                 res.bcs_n2, res.ep_seeds, res.eval_returns, res.eval_lengths,
                 res.eval_bc)
            )
            ob_sum = np.asarray(res.ob_sum)
            ob_sumsq = np.asarray(res.ob_sumsq)
            ob_count = float(np.asarray(res.ob_count))
            ratio = np.asarray(res.update_ratio)
            gnorm = np.asarray(res.grad_sq_sum)
            theta, opt_state = res.theta, res.opt_state
        else:
            all_idxs, all_rets, all_srets, all_lens, all_bcs, all_seeds = (
                [], [], [], [], [], [],
            )
            ob_sum = np.zeros(self.env.obs_shape, np.float32)
            ob_sumsq = np.zeros(self.env.obs_shape, np.float32)
            ob_count = 0.0
            episodes = timesteps = 0
            eps_per_round = 2 * npd * self._n_dev
            while True:
                remaining_ep = max(cfg.episodes_per_batch - episodes, 0)
                remaining_ts = max(cfg.timesteps_per_batch - timesteps, 0)
                r_ep = -(-remaining_ep // eps_per_round) if remaining_ep else 0
                r_ts = (
                    -(-remaining_ts // int(eps_per_round * max(self._mean_len_est, 1.0)))
                    if remaining_ts
                    else 0
                )
                n_rounds = max(r_ep, r_ts, 1 if episodes == 0 else 0)
                if n_rounds == 0:
                    break
                key, kround = jax.random.split(key)
                out = self._get_rounds(npd, n_rounds)(
                    s.theta, self.noise.noise, self._device_keys(kround),
                    tslimit_dev, sigma_dev, ctx, self.ref_batch,
                )
                idxs, rets, srets, lens, bcs, eseeds = self._fetch_sharded(
                    (out.noise_idxs, out.returns_n2, out.signreturns_n2,
                     out.lengths_n2, out.bcs_n2, out.ep_seeds)
                )
                all_idxs.append(idxs)
                all_rets.append(rets)
                all_srets.append(srets)
                all_lens.append(lens)
                all_bcs.append(bcs)
                all_seeds.append(eseeds)
                ob_sum += np.asarray(out.ob_sum)
                ob_sumsq += np.asarray(out.ob_sumsq)
                ob_count += float(np.asarray(out.ob_count))
                episodes += lens.size
                timesteps += int(lens.sum())
                self._mean_len_est = max(float(lens.mean()), 1.0)
                if episodes >= cfg.episodes_per_batch and timesteps >= cfg.timesteps_per_batch:
                    break
            idxs = np.concatenate(all_idxs)
            rets = np.concatenate(all_rets)
            srets = np.concatenate(all_srets)
            lens = np.concatenate(all_lens)
            bcs = np.concatenate(all_bcs)
            eseeds = np.concatenate(all_seeds)
            upd = self._get_update(num_eval_pd)(
                s.theta, s.opt_state, self.noise.noise, self._shard_rows(idxs),
                rets, srets, keval, tslimit_dev, ctx_eval, self.ref_batch,
            )
            ev_r, ev_l, ev_b = self._fetch_sharded(
                (upd.eval_returns, upd.eval_lengths, upd.eval_bc)
            )
            ratio = np.asarray(upd.update_ratio)
            gnorm = np.asarray(upd.grad_sq_sum)
            theta, opt_state = upd.theta, upd.opt_state

        episodes = int(lens.size)
        timesteps = int(lens.sum())
        ne = cfg.num_eval_episodes
        return self._finalize_generation(
            key, opt_state, theta, ratio, gnorm, idxs, rets, lens, bcs, eseeds,
            ev_r[:ne], ev_l[:ne], ev_b[:ne], ob_sum, ob_sumsq, ob_count,
            episodes, timesteps, step_tstart,
        )


class PodGATrainer(_PodMixin, GATrainer):
    """GA with the fitness pass sharded over the pop mesh (offspring
    synthesis + one-episode eval per device shard, parallel/ga_pod.py); the
    host-side truncation selection, validation ladder, elite test and parent
    cache are inherited from GATrainer and run identically on every process
    (deterministic from the shared seed). Seed-chains stay host ints, exactly
    the data the reference broadcasts (gpu ga.py:123-129)."""

    def __init__(self, env, model, config, noise_table=None, seed: int = 0, mesh=None):
        super().__init__(env, model, config, noise_table=noise_table, seed=seed)
        self._init_pod(mesh)

    def _get_step(self, n_per_device: int, n_rounds: int):
        k = (n_per_device, n_rounds)
        if k not in self._steps:
            from .ga_pod import make_pod_ga_step

            self._steps[k] = make_pod_ga_step(
                self.env, self.model, self.mesh, n_per_device,
                has_ref_batch=self.model.needs_ref_batch,
                n_rounds=n_rounds,
                cpu_init=self.config.genome_style == "cpu",
            )
        return self._steps[k]

    def _fitness_pass(self, n: int, power: float, randomize: bool):
        cfg = self.config
        dim = self.model.num_params
        cap = max(1, int(cfg.theta_hbm_budget) // (dim * 4))
        total_pd = -(-n // self._n_dev)
        npd = min(cfg.eval_batch or total_pd, cap, total_pd)
        n_rounds = -(-total_pd // npd)
        step = self._get_step(npd, n_rounds)
        res = step(
            None if randomize else self.cached_parent_thetas,
            self.noise.noise,
            self._device_keys(self._next_key()),
            jnp.asarray(self.cutoff.tslimit, jnp.int32),
            jnp.asarray(power, jnp.float32),
            self.scale_by,
            self.ref_batch,
        )
        pidx, midx, rets, lens, bcs = self._fetch_sharded(
            (res.parent_idx, res.mutation_idx, res.returns, res.lengths, res.bc)
        )
        return pidx, midx, rets, lens, bcs


class PodRSTrainer(PodGATrainer, RSTrainer):
    """Random search on the pod mesh (rs.py semantics via RSTrainer)."""


class PodNSESTrainer(_PodMixin, NSESTrainer):
    """NS-ES/NSR-ES with the antithetic eval + novelty + update fused over
    the pop mesh (parallel/nses_pod.py); archive insertion, mean-BC re-rolls
    and parent selection are inherited (host-side, O(M) per generation)."""

    def __init__(
        self, env, model, config, optimizer=None, noise_table=None, seed: int = 0,
        mesh=None,
    ):
        super().__init__(
            env, model, config, optimizer=optimizer, noise_table=noise_table, seed=seed
        )
        self._init_pod(mesh)

    def _get_step(self, npairs_pd: int, n_rounds: int):
        k = (npairs_pd, n_rounds)
        if k not in self._steps:
            from .nses_pod import make_pod_nses_step

            self._steps[k] = make_pod_nses_step(
                self.env, self.model, self.optimizer, self.mesh, npairs_pd,
                k=self.config.k,
                algo_type="nsr" if self.config.algo_type == "nsr" else "ns",
                l2coeff=self.config.l2coeff,
                grad_chunk=self.config.grad_chunk,
                has_ref_batch=self.model.needs_ref_batch,
                n_rounds=n_rounds,
                return_proc_mode=self.config.return_proc_mode,
            )
        return self._steps[k]

    def train_step(self):
        cfg = self.config
        p = self.curr_parent
        parent = self.parents[p]
        step_tstart = time.time()
        cap = max(1, int(cfg.theta_hbm_budget) // (2 * self.model.num_params * 4))
        pairs_total = max((cfg.population_size or 128) // 2, 1)
        total_pd = -(-pairs_total // self._n_dev)
        npd = min(cfg.eval_batch or total_pd, cap, total_pd)
        n_rounds = -(-total_pd // npd)

        res = self._get_step(npd, n_rounds)(
            parent.theta,
            parent.opt_state,
            self.noise.noise,
            self._device_keys(self._next_key()),
            jnp.asarray(self.cutoff.tslimit, jnp.int32),
            jnp.asarray(cfg.noise_stdev, jnp.float32),
            self.archive,
            self._ctx(parent, noisy=True),
            self.ref_batch,
        )
        returns_n2, novelty_n2, lengths_n2 = self._fetch_sharded(
            (res.returns_n2, res.novelty_n2, res.lengths_n2)
        )
        return self._post_update(
            p, res.theta, res.opt_state, float(np.asarray(res.grad_sq_sum)),
            np.asarray(res.update_ratio), returns_n2, novelty_n2, lengths_n2,
            np.asarray(res.ob_sum), np.asarray(res.ob_sumsq),
            float(np.asarray(res.ob_count)), step_tstart,
        )

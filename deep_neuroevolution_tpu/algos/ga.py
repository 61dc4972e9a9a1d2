"""Deep GA — truncation-selection genetic algorithm over seed-chain genomes.

Reference semantics:
* GPU driver (gpu_implementation/ga.py:104-280): per generation, offspring =
  mutate a uniformly-random cached parent (ga.py:122-129); fitness = one
  episode; population sorted by fitness (ga.py:180); the top
  `validation_threshold` (with the previous elite force-included,
  ga.py:190-193) are re-evaluated `num_validation_episodes` times; the
  validation argmax becomes the elite and gets `num_test_episodes` test
  episodes (ga.py:201-204); parents for the next generation are the top
  `selection_threshold` of the *fitness* ranking with the elite
  force-included if absent (ga.py:260-271); parent θs are cached so each
  offspring reconstruction is one mutation step (base.py:127-138).
* Genome encodings (SURVEY §3.4): GPU chains are (idx, power) tuples after
  the init seed (base.py:143-145); CPU chains are bare indices with global
  noise_stdev and a normalized-column reinit of the raw init slice
  (es_distributed/ga.py:250-264). Both reconstructions provided; GPU is the
  default.
* CPU master extras (es_distributed/ga.py:33-158): `num_elites` carried into
  the next generation's candidate pool with their previous scores
  (ga.py:139-141) — supported via `num_elites`.
* Mutation power may be a schedule evaluated on frames elapsed
  (helper.py:46-88, ga_atari_config.json "mutation_power").

TPU-native design: one generation = jitted offspring synthesis (gather
parent rows + one noise slice each — never materializing chains), lockstep
population rollout (chunked by eval_batch), device top-k selection;
host keeps the seed-chain bookkeeping (tiny ints) for snapshot/replay/VINE
parity. Elite seed-chains remain exportable/importable.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.core import Env
from ..models.core import Model
from ..ops import optim, schedules
from ..ops.noise import NoiseTable, VirtualNoise, noise_rows, noise_source_size
from ..utils import tabular as tlogger
from .es import CutoffState, parse_cutoff, update_cutoff
from .rollout import rollout_batch


@dataclasses.dataclass
class GAConfig:
    population_size: int = 1000  # ga_atari_config.json
    selection_threshold: int = 20  # parents kept per generation
    validation_threshold: int = 10  # candidates re-evaluated for elite choice
    num_validation_episodes: int = 30
    num_test_episodes: int = 200
    num_elites: int = 1  # CPU-stack elite carry-over (es_distributed/ga.py:66-67)
    mutation_power: Any = 0.002  # scalar or schedule dict (helper.py:46-88)
    episode_cutoff_mode: Any = "env_default"
    timesteps: float = 1.5e9  # training budget (ga_atari_config.json)
    eval_batch: int = 0  # rollout chunk; 0 → population_size
    theta_hbm_budget: int = 2**31  # bytes allowed for a live offspring-θ chunk;
    #   synthesis+eval stream in rounds so pop 1000 × 4M-param nets never
    #   materialize [P, D] (SURVEY §7 hard parts 3-4)
    genome_style: str = "gpu"  # 'gpu' (idx,power) | 'cpu' (reinit + global stdev)
    noise_stdev: float = 0.002  # CPU-style chain mutation stdev (frostbite_ga.json)
    vine_snapshot_dir: str = ""  # per-generation BC cloud dumps (ga_modified.py:22-64)


class Offspring(NamedTuple):
    """Host-side genome record (gpu ga.py:83-99 Offspring)."""

    seeds: Tuple  # (init_idx, (idx, power), ...) — gpu encoding
    fitness: float
    training_steps: int


class GAState:
    """Checkpointable training state (gpu ga.py:33-82 TrainingState)."""

    def __init__(self):
        self.it = 0
        self.timesteps_so_far = 0
        self.validation_timesteps_so_far = 0
        self.num_frames = 0
        self.time_elapsed = 0.0
        self.population: List[Offspring] = []
        self.elite: Optional[Offspring] = None
        self.curr_solution: Optional[Tuple] = None
        self.curr_solution_val = float("-inf")
        self.curr_solution_test = float("-inf")


# --------------------------------------------------------------------------
# jitted kernels
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(2, 3))
def _randomize_thetas(table, key: jax.Array, n: int, dim: int, scale_by: jax.Array):
    """n fresh genomes: θ = ε(idx)·scale_by (base.py:121-125 randomize +
    compute_weights_from_seeds init). `table` is the raw [N] buffer or a
    VirtualNoise source (genomes then index counter-based streams — no HBM
    table at all; same documented divergence as the ES wiring)."""
    idxs = jax.random.randint(key, (n,), 0, noise_source_size(table) - dim + 1, dtype=jnp.int32)
    eps = noise_rows(table, idxs, dim)
    return idxs, eps * scale_by[None, :]


@partial(jax.jit, static_argnums=(3, 4))
def _mutate_thetas(
    parent_thetas: jax.Array,  # [T, D]
    table,
    key: jax.Array,
    n: int,
    dim: int,
    power: jax.Array,
):
    """n offspring: θ = parents[pidx] + power·ε(midx) (base.py:148-156)."""
    kp, km = jax.random.split(key)
    pidx = jax.random.randint(kp, (n,), 0, parent_thetas.shape[0], dtype=jnp.int32)
    midx = jax.random.randint(km, (n,), 0, noise_source_size(table) - dim + 1, dtype=jnp.int32)
    eps = noise_rows(table, midx, dim)
    thetas = parent_thetas[pidx] + power * eps
    return pidx, midx, thetas


@partial(jax.jit, static_argnums=(0, 1, 4, 5, 6, 7))
def _ga_gen_rounds(
    env: Env,
    model: Model,
    parent_thetas: jax.Array,  # [T, D]; ignored when randomize
    table,
    chunk: int,
    n_rounds: int,
    randomize: bool,
    cpu_init: bool,
    key: jax.Array,
    tslimit: jax.Array,
    power: jax.Array,
    scale_by: jax.Array,
    ctx=None,
    ref_batch: Optional[jax.Array] = None,
):
    """Offspring synthesis FUSED with fitness evaluation, streamed in
    `n_rounds` scanned rounds of `chunk` offspring each — the whole GA
    fitness pass (gpu ga.py:122-129 make_offspring + ga.py:166-168 one
    episode each) is ONE dispatch, and only [chunk, D] offspring parameters
    are ever live. Returns (pidx, midx, returns, lengths, bcs) flattened to
    [n_rounds·chunk, ...]."""
    dim = model.num_params
    act_fn = model.make_batch_act()
    keys = jax.random.split(key, n_rounds)

    def body(carry, rkey):
        kp, km, kroll = jax.random.split(rkey, 3)
        midx = jax.random.randint(km, (chunk,), 0, noise_source_size(table) - dim + 1, dtype=jnp.int32)
        eps = noise_rows(table, midx, dim)
        if randomize:
            pidx = jnp.zeros((chunk,), jnp.int32)
            if cpu_init:  # normalized-column reinit (es ga.py:256-260)
                thetas = jax.vmap(model.reinit_theta)(eps)
            else:
                thetas = eps * scale_by[None, :]  # base.py:121-125 randomize
        else:
            pidx = jax.random.randint(kp, (chunk,), 0, parent_thetas.shape[0], dtype=jnp.int32)
            thetas = parent_thetas[pidx] + power * eps  # base.py:148-156 mutate
        if model.needs_ref_batch:
            stats = model.batch_ref_stats(thetas, ref_batch)
            params = (thetas, stats)
        else:
            params = (thetas, ctx)
        res = rollout_batch(env, act_fn, params, jax.random.split(kroll, chunk), tslimit)
        return carry, (pidx, midx, res.returns, res.lengths, res.bc)

    _, outs = jax.lax.scan(body, None, keys)
    return jax.tree_util.tree_map(lambda x: x.reshape((-1,) + x.shape[2:]), outs)


@partial(jax.jit, static_argnums=())
def _tail_reconstruct(parent_rows: jax.Array, table, midx: jax.Array, powers: jax.Array):
    """θ = parent + power·ε(midx) for a batch of chains whose prefix hit the
    parent cache (base.py:127-138 cache shortcut, vectorized)."""
    dim = parent_rows.shape[1]
    eps = noise_rows(table, midx, dim)
    return parent_rows + powers[:, None] * eps


@partial(jax.jit, static_argnums=(0, 1))
def _eval_thetas(
    env: Env,
    model: Model,
    thetas: jax.Array,  # [B, D]
    keys: jax.Array,  # [B]
    tslimit: jax.Array,
    ctx=None,
    ref_batch: Optional[jax.Array] = None,
):
    if model.needs_ref_batch:
        stats = model.batch_ref_stats(thetas, ref_batch)
        params = (thetas, stats)
    else:
        params = (thetas, ctx)
    res = rollout_batch(env, model.make_batch_act(), params, keys, tslimit)
    return res.returns, res.lengths, res.bc


# --------------------------------------------------------------------------
# trainer
# --------------------------------------------------------------------------


class GATrainer:
    def __init__(
        self,
        env: Env,
        model: Model,
        config: GAConfig,
        noise_table: Optional[NoiseTable] = None,
        seed: int = 0,
    ):
        self.env = env
        self.model = model
        self.config = config
        self.noise = noise_table or NoiseTable.from_seed()
        assert self.noise.size > model.num_params, (
            f"noise table ({self.noise.size}) must exceed num_params ({model.num_params})"
        )
        self.key = jax.random.PRNGKey(seed)
        self.cutoff = parse_cutoff(config.episode_cutoff_mode, env.default_timestep_cutoff)
        self.state = GAState()
        self.mutation_power = schedules.make_schedule(config.mutation_power)
        self.scale_by = model.scale_by(getattr(model, "scale_style", "fan_in"))
        self.cached_parent_thetas: Optional[jax.Array] = None  # [T, D]
        self.cached_parent_seeds: List[Tuple] = []
        self.ref_batch = None
        if model.needs_ref_batch:
            from .rollout import collect_ref_batch

            self.key, kref = jax.random.split(self.key)
            self.ref_batch = collect_ref_batch(env, kref, batch_size=128)
        self._tstart = time.time()

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    @property
    def _table_arg(self):
        """What the jitted kernels receive: the raw [N] buffer of a
        materialized NoiseTable, or the VirtualNoise pytree itself — GA
        genomes are the *natural* VirtualNoise consumer (seed chains already
        are noise indices; counter-based regeneration deletes the 1 GB table
        from synthesis entirely)."""
        return self.noise if isinstance(self.noise, VirtualNoise) else self.noise.noise

    def copy_population(self, filename: str) -> None:
        """Import a population from another run (gpu ga.py:75-82
        TrainingState.copy_population + the exp['load_population'] hook,
        gpu ga.py:161-162): accepts a full trainer-state pickle or a raw
        pickled list of seed chains. Back-compat: bare-int mutation entries
        of gpu-style chains are migrated to (idx, 0.005) tuples, exactly as
        the reference does."""
        import pickle

        with open(filename, "rb") as f:
            payload = pickle.load(f)
        if isinstance(payload, dict):
            pop = payload["ga"]["population"] if "ga" in payload else payload["population"]
        else:
            pop = payload

        def migrate(seeds):
            seeds = tuple(tuple(s) if isinstance(s, list) else s for s in seeds)
            if self.config.genome_style != "gpu":
                return seeds
            return (seeds[0],) + tuple(
                s if isinstance(s, tuple) else (s, 0.005) for s in seeds[1:]
            )

        imported = []
        for o in pop:
            if hasattr(o, "seeds"):
                imported.append(
                    Offspring(migrate(o.seeds), getattr(o, "fitness", float("-inf")),
                              getattr(o, "training_steps", 0))
                )
            else:  # raw chain
                imported.append(Offspring(migrate(o), float("-inf"), 0))
        self.state.population = imported
        # imported chains invalidate the parent-θ cache
        self.cached_parent_thetas = None
        self.cached_parent_seeds = []

    def _reconstruct(self, seeds: Tuple) -> jax.Array:
        """θ from a full seed chain (cache-miss path, base.py:139-145)."""
        from ..ops import genome

        dim = self.model.num_params
        if self.config.genome_style == "gpu":
            idxs = jnp.asarray([s[0] if isinstance(s, tuple) else s for s in seeds], jnp.int32)
            powers = jnp.asarray(
                [s[1] if isinstance(s, tuple) else 0.0 for s in seeds], jnp.float32
            )
            return genome.reconstruct_gpu_style(self._table_arg, idxs, powers, dim, self.scale_by)
        # cpu style: raw slice → reinit → += stdev·ε (es_distributed/ga.py:250-264)
        theta = self.model.reinit_theta(self.noise.get(jnp.int32(seeds[0]), dim))
        for s in seeds[1:]:
            theta = theta + self.config.noise_stdev * self.noise.get(jnp.int32(s), dim)
        return theta

    def _eval_chunked(self, thetas, tslimit, episodes_per=1):
        """Evaluate [N, D] thetas, `episodes_per` episodes each, chunked by
        eval_batch (device envs) or the engine slot count (host envs).
        Repeats are indexed per chunk, never materialized [N·episodes, D].
        Returns returns [N, episodes_per], lengths likewise."""
        cfg = self.config
        N = thetas.shape[0]
        total = N * episodes_per
        idx_map = np.repeat(np.arange(N), episodes_per)
        is_host = getattr(self.env, "is_host_env", False)
        cap = max(1, int(cfg.theta_hbm_budget) // (self.model.num_params * 4))
        chunk = self.env.batch_size if is_host else min(cfg.eval_batch or total, cap, total)
        rets, lens, bcs = [], [], []
        for s in range(0, total, chunk):
            part = jnp.take(thetas, jnp.asarray(idx_map[s : s + chunk]), axis=0)
            if is_host:
                r, l, bc = self._eval_host(part, tslimit)
            else:
                keys = jax.random.split(self._next_key(), part.shape[0])
                r, l, bc = _eval_thetas(
                    self.env, self.model, part, keys, jnp.asarray(tslimit, jnp.int32), None, self.ref_batch
                )
            rets.append(np.asarray(r))
            lens.append(np.asarray(l))
            bcs.append(np.asarray(bc))
        rets = np.concatenate(rets).reshape(N, episodes_per)
        lens = np.concatenate(lens).reshape(N, episodes_per)
        bcs = np.concatenate(bcs).reshape((N, episodes_per) + bcs[0].shape[1:])
        return rets, lens, bcs

    def _eval_host(self, thetas, tslimit, key=None):
        """One host-engine round: pad the theta chunk to the slot count,
        rollout, drop the padding. `key` overrides the trainer RNG draw (the
        host-pod trainers pass explicit sub-round keys so the emulated and
        real multi-process runs are bit-identical)."""
        from .rollout_host import rollout_host

        if key is None:
            key = self._next_key()
        n = thetas.shape[0]
        B = self.env.batch_size
        # pad up to a power-of-two slot bucket, not the full slot count:
        # the validation/test ladder evaluates handfuls of elites
        # (gpu ga.py:186-204) and stepping all 256 engine slots for them —
        # plus their frame batches over the device link — dominated ladder
        # cost. Buckets keep the compiled shape set small (≤ log2(B)).
        nb = 1
        while nb < n:
            nb *= 2
        nb = min(nb, B)
        if n < nb:
            pad = jnp.broadcast_to(thetas[-1:], (nb - n,) + thetas.shape[1:])
            thetas = jnp.concatenate([thetas, pad])
        if self.model.needs_ref_batch:
            stats = self.model.batch_ref_stats(thetas, self.ref_batch)
            params = (thetas, stats)
        else:
            params = (thetas, None)
        res = rollout_host(
            self.env,
            self.model.make_batch_act(),
            params,
            key,
            int(tslimit),
            n_slots=nb if nb < B else None,
        )
        return res.returns[:n], res.lengths[:n], res.bc[:n]

    # ------------------------------------------------------------ generation

    def train_step(self):
        cfg = self.config
        st = self.state
        tstart_iter = time.time()
        dim = self.model.num_params
        power = float(
            np.asarray(self.mutation_power.value(iteration=st.it, frames=st.timesteps_so_far))
        )
        if cfg.genome_style == "cpu":
            # CPU chains mutate with the global noise_stdev and store bare
            # indices (es_distributed/ga.py:262-263); keep synthesis and
            # reconstruction bit-consistent
            power = cfg.noise_stdev

        # ---- offspring synthesis FUSED with fitness (gpu ga.py:122-129
        # make_offspring + ga.py:166-168 one episode each), streamed in
        # rounds so only [chunk, D] offspring θs are ever live
        n = cfg.population_size
        randomize = not self.cached_parent_seeds
        pidx, midx, rewards, lengths, bcs0 = self._fitness_pass(n, power, randomize)
        # exact population size (rounds may overshoot by chunk alignment)
        pidx, midx = pidx[:n], midx[:n]
        rewards, lengths, bcs0 = rewards[:n], lengths[:n], bcs0[:n]
        if randomize:
            chains = [(int(midx[i]),) for i in range(n)]
        elif cfg.genome_style == "gpu":
            chains = [
                self.cached_parent_seeds[pidx[i]] + ((int(midx[i]), power),) for i in range(n)
            ]
        else:  # cpu chains: bare indices, global noise_stdev (ga.py:250-264)
            chains = [self.cached_parent_seeds[pidx[i]] + (int(midx[i]),) for i in range(n)]
        return self._selection_and_ladder(
            chains, rewards, lengths, bcs0, power, tstart_iter
        )

    def _fitness_pass(self, n: int, power: float, randomize: bool):
        """Synthesize + evaluate n offspring, one episode each; returns host
        numpy (pidx, midx, rewards, lengths, bcs). Overridden by the pod
        trainer to shard the population over the mesh."""
        cfg = self.config
        dim = self.model.num_params
        is_host = getattr(self.env, "is_host_env", False)
        cap = max(1, int(cfg.theta_hbm_budget) // (dim * 4))
        # host path honors the HBM budget too: synthesis + the fused-forward
        # weight prep keep ~3x the [chunk, D] f32 stack live, and LargeDQN at
        # 256 engine slots exceeds the chip's free HBM (_eval_host pads each
        # sub-chunk to a power-of-two slot bucket, so partial rounds are fine)
        chunk = min(self.env.batch_size, cap, n) if is_host else min(cfg.eval_batch or n, cap, n)
        n_rounds = -(-n // chunk)
        if is_host:
            pidx_l, midx_l, rets_l, lens_l, bcs_l = [], [], [], [], []
            for _ in range(n_rounds):
                if randomize:
                    midx_r, thetas_r = _randomize_thetas(
                        self._table_arg, self._next_key(), chunk, dim, self.scale_by
                    )
                    if cfg.genome_style == "cpu":
                        raw = noise_rows(self._table_arg, midx_r, dim)
                        thetas_r = jax.vmap(self.model.reinit_theta)(raw)
                    pidx_r = jnp.zeros((chunk,), jnp.int32)
                else:
                    pidx_r, midx_r, thetas_r = _mutate_thetas(
                        self.cached_parent_thetas,
                        self._table_arg,
                        self._next_key(),
                        chunk,
                        dim,
                        jnp.asarray(power, jnp.float32),
                    )
                r, l, bc = self._eval_host(thetas_r, self.cutoff.tslimit)
                pidx_l.append(np.asarray(pidx_r))
                midx_l.append(np.asarray(midx_r))
                rets_l.append(np.asarray(r))
                lens_l.append(np.asarray(l))
                bcs_l.append(np.asarray(bc))
            pidx, midx = np.concatenate(pidx_l), np.concatenate(midx_l)
            rewards, lengths, bcs0 = (
                np.concatenate(rets_l), np.concatenate(lens_l), np.concatenate(bcs_l),
            )
        else:
            out = _ga_gen_rounds(
                self.env,
                self.model,
                jnp.zeros((1, dim), jnp.float32) if randomize else self.cached_parent_thetas,
                self._table_arg,
                chunk,
                n_rounds,
                randomize,
                cfg.genome_style == "cpu",
                self._next_key(),
                jnp.asarray(self.cutoff.tslimit, jnp.int32),
                jnp.asarray(power, jnp.float32),
                self.scale_by,
                None,
                self.ref_batch,
            )
            pidx, midx, rewards, lengths, bcs0 = (np.asarray(x) for x in jax.device_get(out))
        return pidx, midx, rewards, lengths, bcs0

    def _selection_and_ladder(self, chains, rewards, lengths, bcs0, power, tstart_iter):
        """Truncation selection, validation ladder, elite test, parent cache
        rebuild, counters and diagnostics (gpu ga.py:180-271)."""
        cfg = self.config
        st = self.state
        n = len(chains)
        population_timesteps = int(lengths.sum())

        results = [Offspring(chains[i], float(rewards[i]), int(lengths[i])) for i in range(n)]

        # CPU-stack elite carry-over: prepend previous top num_elites with
        # their recorded scores (es_distributed/ga.py:139-141)
        if cfg.num_elites > 0 and st.population:
            results = st.population[: cfg.num_elites] + results
            rewards = np.concatenate(
                [[o.fitness for o in st.population[: cfg.num_elites]], rewards]
            )

        order = np.argsort([-o.fitness for o in results], kind="stable")
        st.population = [results[i] for i in order][: max(cfg.population_size, 1)]

        # ---- validation ladder (gpu ga.py:189-204)
        validation_population = st.population[: cfg.validation_threshold]
        if st.elite is not None and cfg.validation_threshold > 0:
            if st.elite.seeds not in [o.seeds for o in validation_population]:
                validation_population = [st.elite] + validation_population[:-1]

        val_timesteps = 0
        if cfg.validation_threshold > 0 and cfg.num_validation_episodes > 0:
            vthetas = jnp.stack([self._lookup_theta(o.seeds) for o in validation_population])
            vrets, vlens, _ = self._eval_chunked(
                vthetas, self.cutoff.tslimit, cfg.num_validation_episodes
            )
            population_validation = vrets.mean(axis=1)
            val_timesteps = int(vlens.sum())
            elite_idx = int(np.argmax(population_validation))
            st.elite = validation_population[elite_idx]
            # ---- elite test episodes
            etheta = self._lookup_theta(st.elite.seeds)[None]
            trets, tlens, tbcs = self._eval_chunked(
                etheta, self.env.default_timestep_cutoff, cfg.num_test_episodes
            )
            elite_test_mean = float(trets.mean())
            if float(population_validation[elite_idx]) > st.curr_solution_val:
                st.curr_solution = st.elite.seeds
                st.curr_solution_val = float(population_validation[elite_idx])
                st.curr_solution_test = elite_test_mean
        else:
            population_validation = np.array([])
            elite_idx = 0
            elite_test_mean = float("nan")
            st.elite = st.population[0]
            trets = np.zeros((0, 0))

        # ---- next-generation parent cache (gpu ga.py:260-271)
        if cfg.selection_threshold > 0:
            parents = st.population[: cfg.selection_threshold]
            if st.elite is not None and st.elite.seeds not in [o.seeds for o in parents]:
                parents = [st.elite] + parents[: cfg.selection_threshold - 1]
            new_seeds = [o.seeds for o in parents]
            # resolve against the OLD cache before replacing it — every new
            # parent is either an old parent or old-parent + one mutation
            new_thetas = jnp.stack([self._lookup_theta(s) for s in new_seeds])
            self.cached_parent_seeds = new_seeds
            self.cached_parent_thetas = new_thetas
        else:
            self.cached_parent_seeds = []
            self.cached_parent_thetas = None

        # ---- counters / cutoff / logging
        st.it += 1
        timesteps_this_iter = population_timesteps + val_timesteps
        st.timesteps_so_far += timesteps_this_iter
        st.validation_timesteps_so_far += val_timesteps
        self.cutoff = update_cutoff(self.cutoff, lengths)
        dt = time.time() - tstart_iter
        st.time_elapsed += dt

        if not getattr(self, "_log_enabled", True):
            return st

        tlogger.record_tabular("Iteration", st.it)
        tlogger.record_tabular("MutationPower", power)
        # reference name gpu_implementation/es.py:208 (ga.py logs the same
        # state); surfaces the adaptive cutoff DSL's bumps per generation
        tlogger.record_tabular("TimestepLimitPerEpisode", int(self.cutoff.tslimit))
        tlogger.record_tabular("PopulationEpRewMax", float(rewards.max()))
        tlogger.record_tabular("PopulationEpRewMean", float(rewards.mean()))
        tlogger.record_tabular("PopulationEpCount", int(rewards.size))
        tlogger.record_tabular("PopulationTimesteps", population_timesteps)
        tlogger.record_tabular("NumSelectedIndividuals", cfg.selection_threshold)
        if population_validation.size:
            tlogger.record_tabular(
                "TruncatedPopulationRewMean",
                float(np.mean([o.fitness for o in validation_population])),
            )
            tlogger.record_tabular(
                "TruncatedPopulationValidationRewMean", float(np.mean(population_validation))
            )
            tlogger.record_tabular(
                "TruncatedPopulationEliteValidationRewMean", float(np.max(population_validation))
            )
            tlogger.record_tabular("TruncatedPopulationEliteIndex", elite_idx)
            tlogger.record_tabular("TruncatedPopulationEliteTestRewMean", elite_test_mean)
            tlogger.record_tabular("TruncatedPopulationEliteTestEpCount", int(trets.size))
        tlogger.record_tabular("ValidationTimestepsThisIter", val_timesteps)
        tlogger.record_tabular("ValidationTimestepsSoFar", st.validation_timesteps_so_far)
        tlogger.record_tabular("TimestepsThisIter", timesteps_this_iter)
        tlogger.record_tabular("TimestepsPerSecondThisIter", timesteps_this_iter / max(dt, 1e-9))
        tlogger.record_tabular("TimestepsSoFar", st.timesteps_so_far)
        tlogger.record_tabular("TimeElapsedThisIter", dt)
        tlogger.record_tabular("TimeElapsed", st.time_elapsed)
        tlogger.dump_tabular()

        if cfg.vine_snapshot_dir:
            # ga_modified.py:22-64 master_extract_cloud_ga analog: one row per
            # offspring (sign column fixed at 1; GA has no antithetic pairs)
            from ..utils import vine

            midx = np.array(
                [c[-1][0] if len(c) > 1 and isinstance(c[-1], tuple) else c[0] for c in chains]
            )
            off_rewards = rewards[-len(chains):]  # skip any elite carry-over rows
            vine.master_extract_cloud(
                cfg.vine_snapshot_dir,
                st.it,
                np.stack([bcs0, bcs0], axis=1),  # duplicated column: GA has no antithetic pairs
                np.stack([off_rewards, off_rewards], axis=1),
                np.stack([lengths, lengths], axis=1),
                midx,
                np.zeros(len(chains), np.int64),
            )
            if population_validation.size:
                vine.master_extract_parent(
                    cfg.vine_snapshot_dir,
                    st.it,
                    tbcs[0],
                    trets[0],
                    tlens[0],
                    float(power),
                    model=self.model,
                    theta=np.asarray(self._lookup_theta(st.elite.seeds)),
                    ref_batch=self.ref_batch,
                )

        return st

    def _lookup_theta(self, seeds: Tuple):
        """θ for a chain: parent-cache hit, cached-prefix + one mutation
        (the cache-hit hierarchy of base.py:127-138 — offspring θs are never
        kept around, they're re-derived from the cached parent in one fused
        gather+axpy), else full chain reconstruction."""
        if seeds in self.cached_parent_seeds:
            return self.cached_parent_thetas[self.cached_parent_seeds.index(seeds)]
        if len(seeds) > 1 and seeds[:-1] in self.cached_parent_seeds:
            parent = self.cached_parent_thetas[self.cached_parent_seeds.index(seeds[:-1])]
            tail = seeds[-1]
            m, p = tail if isinstance(tail, tuple) else (tail, self.config.noise_stdev)
            return _tail_reconstruct(
                parent[None], self._table_arg,
                jnp.asarray([m], jnp.int32), jnp.asarray([p], jnp.float32),
            )[0]
        if len(seeds) == 1 and self.config.genome_style == "gpu":
            # fresh genome: ε(idx)·scale_by (base.py:121-125); cpu style
            # instead reinits normalized columns — handled by _reconstruct
            idx = seeds[0][0] if isinstance(seeds[0], tuple) else seeds[0]
            return self.noise.get(jnp.int32(idx), self.model.num_params) * self.scale_by
        return self._reconstruct(seeds)

    def train(self, max_iterations: int = 10**9):
        while self.state.it < max_iterations and self.state.timesteps_so_far < self.config.timesteps:
            self.train_step()
        return self.state


class RSTrainer(GATrainer):
    """Random search (es_distributed/rs.py): every candidate is a fresh
    single-seed network (rs.py:210-217 — GA with no parents); the master
    adopts the best-ever candidate (rs.py:111-116). Implemented as GA with
    selection_threshold=0 + best-ever tracking."""

    def __init__(self, env, model, config: GAConfig, **kw):
        config = dataclasses.replace(
            config, selection_threshold=0, num_elites=0
        )
        super().__init__(env, model, config, **kw)
        self.best_score = float("-inf")
        self.best_seeds: Optional[Tuple] = None

    def train_step(self):
        st = super().train_step()
        top = st.population[0]
        if top.fitness > self.best_score:
            self.best_score = top.fitness
            self.best_seeds = top.seeds
        return st

"""Evolution Strategies — synchronous on-device population engine.

Reference semantics (es_distributed/es.py run_master/run_worker and the GPU
driver gpu_implementation/es.py):
* Antithetic perturbation pairs θ ± σ·ε with ε = noise-table slices addressed
  by sampled indices (es.py:411-426; gpu es.py:174-185 with a reconstruction
  consistency assert).
* Generation quota: collect episodes until BOTH episodes_per_batch and
  timesteps_per_batch are met (es.py:230), OR a fixed population size per
  generation (gpu es.py: population_size) — both supported; fixed size is
  the TPU-preferred mode (single compiled shape).
* Return processing centered_rank | sign | centered_sign_rank
  (es.py:281-288); gradient g = Σ(w⁺−w⁻)ᵢ·εᵢ / (2n) (es.py:291-297);
  update = optimizer.update(−g + l2coeff·θ) (es.py:298-299).
* Eval episodes: unperturbed θ evaluated with prob eval_prob (es.py:388-405)
  → here a fixed noiseless eval batch per generation (same statistics,
  deterministic cost).
* Obs stats: workers accumulate ob sums with prob calc_obstat_prob
  (es.py:356-363) → here accumulated on-device from perturbed rollouts and
  merged into the RunningStat each generation.
* Adaptive episode cutoff DSL int | 'adaptive:start,thresh,ratio,max' |
  'env_default' (es.py:169-186), bump when the fraction of rollouts hitting
  the limit ≥ threshold (es.py:308-311).
* Virtual batch norm: ref batch collected once by a random policy
  (es.py:159-162), per-member stats recomputed for every perturbed θ (the
  analog of ref-forward on load, batchnorm.py:119-123).
* Tabular metric names preserved exactly (es.py:314-343).

What disappears on TPU: the Redis task/result channels, relay batching,
stale-result skipping and worker identity accounting (dist.py) — the whole
generation is one synchronous device computation, so ResultsSkippedFrac is
identically 0 and UniqueWorkers is the device count.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.core import Env
from ..models.core import Model
from ..ops import fitness, obstat, optim
from ..ops.noise import NoiseTable, VirtualNoise, noise_rows, sample_source_idxs
from ..utils import tabular as tlogger
from .rollout import collect_ref_batch, rollout_batch


@dataclasses.dataclass
class ESConfig:
    """Reference Config namedtuple fields (es.py:12-16) + engine knobs."""

    l2coeff: float = 0.005
    noise_stdev: float = 0.02
    episodes_per_batch: int = 0  # 0 → fixed-population mode
    timesteps_per_batch: int = 0
    calc_obstat_prob: float = 0.0
    eval_prob: float = 0.0
    snapshot_freq: int = 0
    return_proc_mode: str = "centered_rank"
    episode_cutoff_mode: Any = "env_default"

    # engine knobs (TPU-native)
    population_size: int = 0  # offspring (episodes) per generation when quotas unset
    #   — counts episodes like the GPU stack's population_size (gpu es.py:197)
    eval_batch: int = 0  # antithetic pairs evaluated per device round
    # mirrored sampling with common random numbers (host engines, opt-in):
    # θ+σε and θ−σε share the episode's env stream (noops + engine seed +
    # rollout key), so the pair difference isolates the perturbation effect
    # instead of episode luck. An extension beyond the reference — its
    # pop-5000 fleets average luck out (es.py:230-265); essential for small
    # populations on stochastic engines (1-episode fitness noise swamps the
    # σ-effect otherwise).
    mirror_crn: bool = False
    num_eval_episodes: int = 8  # noiseless eval episodes per generation
    grad_chunk: int = 256  # streaming chunk for the gradient gather-matmul
    theta_hbm_budget: int = 2**31  # bytes allowed for the [2·npairs, D] θ±σε
    #   batch; rounds are auto-chunked so pop 5000 × 4M-param nets never
    #   materialize [P, D] (SURVEY §7 hard parts 3-4)
    vine_snapshot_dir: str = ""  # per-generation BC cloud dumps (es_modified.py)
    use_pallas_grad: bool = False  # Pallas streamed gradient + 1024-aligned
    #   noise indices (ops/pallas_kernels.py; ~30x the XLA gather path on TPU)


class CutoffState(NamedTuple):
    """Adaptive episode-length curriculum (es.py:169-186)."""

    tslimit: int
    incr_threshold: float
    incr_ratio: float
    tslimit_max: int
    adaptive: bool


def parse_cutoff(mode: Any, env_default: int) -> CutoffState:
    if isinstance(mode, int):
        return CutoffState(mode, 0.0, 1.0, mode, False)
    if isinstance(mode, str) and mode.startswith("adaptive:"):
        args = mode.split(":")[1].split(",")
        return CutoffState(int(args[0]), float(args[1]), float(args[2]), int(float(args[3])), True)
    if mode == "env_default":
        return CutoffState(env_default, 0.0, 1.0, env_default, False)
    raise NotImplementedError(f"episode_cutoff_mode {mode!r}")


def update_cutoff(c: CutoffState, lengths: np.ndarray) -> CutoffState:
    """es.py:308-311: raise limit when ≥ threshold of rollouts hit it."""
    if c.adaptive and (lengths == c.tslimit).mean() >= c.incr_threshold:
        new = min(int(c.incr_ratio * c.tslimit), c.tslimit_max)
        tlogger.log(f"Increased timestep limit from {c.tslimit} to {new}")
        return c._replace(tslimit=new)
    return c


class ESState(NamedTuple):
    """Full training state — checkpointable pytree (the analog of the GPU
    stack's TrainingState pickle, gpu es.py:41-82)."""

    theta: jax.Array  # [D]
    opt_state: Any
    ob_stat: obstat.RunningStat
    key: jax.Array
    iteration: int
    episodes_so_far: int
    timesteps_so_far: int
    tslimit: int


class GenStats(NamedTuple):
    returns: np.ndarray  # [n, 2]
    lengths: np.ndarray  # [n, 2]
    eval_returns: np.ndarray
    eval_lengths: np.ndarray
    grad_norm: float
    update_ratio: float


# --------------------------------------------------------------------------
# jitted kernels
# --------------------------------------------------------------------------


def _perturbed_round_body(
    env: Env,
    model: Model,
    theta: jax.Array,
    table_noise: jax.Array,
    key: jax.Array,
    tslimit: jax.Array,
    sigma: jax.Array,
    npairs: int,
    ctx=None,
    ref_batch: Optional[jax.Array] = None,
    aligned: bool = False,
    obstat_prob: Optional[jax.Array] = None,
):
    """One device round: sample npairs indices, evaluate θ±σε in one lockstep
    batch of 2·npairs slots. Returns per-pair [n,2] stats (pos, neg columns,
    matching Result.returns_n2, es.py:423-426). Plain traced function so it
    can live inside a `lax.scan` over rounds (see `_eval_rounds`) — only
    [2·npairs, D] perturbed θs are ever live (SURVEY §7 hard part 3).
    `obstat_prob` enables the reference's per-rollout Bernoulli obs-stat
    sampling (es.py:356-363 calc_obstat_prob)."""
    dim = theta.shape[0]
    kidx, kroll = jax.random.split(key)
    # `table_noise` is the raw [N] table buffer or a VirtualNoise source
    # (counter-based regeneration — ops/noise.py source dispatch)
    idxs = sample_source_idxs(table_noise, kidx, dim, npairs, aligned)
    eps = noise_rows(table_noise, idxs, dim)
    thetas = jnp.concatenate([theta[None] + sigma * eps, theta[None] - sigma * eps])  # [2n, D]

    if model.needs_ref_batch:
        stats = model.batch_ref_stats(thetas, ref_batch)
        params = (thetas, stats)
    else:
        params = (thetas, ctx)
    act_fn = model.make_batch_act()

    # per-rollout integer policy seeds → reconstructible episode keys; the
    # deterministic-replay hook of the VINE-instrumented variants
    # (es_modified.py policy_seed recorded per rollout)
    ep_seeds = jax.random.randint(kroll, (npairs,), 0, 2**31 - 1, dtype=jnp.int32)
    keys = jax.vmap(lambda s: jax.random.PRNGKey(s.astype(jnp.uint32)))(ep_seeds)
    keys2 = jnp.concatenate([keys, keys])  # pos/neg share episode randomness
    mask = None
    if obstat_prob is not None:
        # each rollout joins the obs-stat accumulators with prob
        # calc_obstat_prob (es.py:356-363); ± rollouts decide independently
        kmask = jax.random.fold_in(kidx, 1)
        mask = (jax.random.uniform(kmask, (2 * npairs,)) < obstat_prob).astype(jnp.float32)
    res = rollout_batch(env, act_fn, params, keys2, tslimit, True, mask)

    pair = lambda x: jnp.stack([x[:npairs], x[npairs:]], axis=1)
    return (
        idxs,
        pair(res.returns),
        pair(res.sign_returns),
        pair(res.lengths),
        res.ob_sum,
        res.ob_sumsq,
        res.ob_count,
        pair(res.bc),  # [n, 2, bc_dim]
        ep_seeds,
    )


@partial(jax.jit, static_argnums=(0, 1, 7, 10))
def _eval_perturbed_round(
    env: Env,
    model: Model,
    theta: jax.Array,
    table_noise: jax.Array,
    key: jax.Array,
    tslimit: jax.Array,
    sigma: jax.Array,
    npairs: int,
    ctx=None,
    ref_batch: Optional[jax.Array] = None,
    aligned: bool = False,
    obstat_prob: Optional[jax.Array] = None,
):
    """Jitted single-round wrapper (kept for direct use and tests)."""
    return _perturbed_round_body(
        env, model, theta, table_noise, key, tslimit, sigma, npairs, ctx, ref_batch,
        aligned, obstat_prob,
    )


@partial(jax.jit, static_argnums=(0, 1, 7, 8, 11))
def _eval_rounds(
    env: Env,
    model: Model,
    theta: jax.Array,
    table_noise: jax.Array,
    key: jax.Array,
    tslimit: jax.Array,
    sigma: jax.Array,
    npairs: int,
    n_rounds: int,
    ctx=None,
    ref_batch: Optional[jax.Array] = None,
    aligned: bool = False,
    obstat_prob: Optional[jax.Array] = None,
):
    """n_rounds antithetic rounds in ONE dispatch via `lax.scan` — the device
    analog of the reference master draining worker results until quota
    (es.py:230-265) without one host sync per round. Peak HBM stays at
    O(npairs × D); obs-stat sums ride the scan carry. Outputs are flattened
    to [n_rounds·npairs, ...]."""
    keys = jax.random.split(key, n_rounds)

    def body(carry, rkey):
        idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds = _perturbed_round_body(
            env, model, theta, table_noise, rkey, tslimit, sigma, npairs, ctx, ref_batch,
            aligned, obstat_prob,
        )
        osum_a, osumsq_a, ocount_a = carry
        return (osum_a + osum, osumsq_a + osumsq, ocount_a + ocount), (
            idxs, rets, srets, lens, bcs, eseeds,
        )

    carry0 = (
        jnp.zeros(env.obs_shape, jnp.float32),
        jnp.zeros(env.obs_shape, jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    (ob_sum, ob_sumsq, ob_count), outs = jax.lax.scan(body, carry0, keys)
    idxs, rets, srets, lens, bcs, eseeds = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), outs
    )
    return idxs, rets, srets, lens, ob_sum, ob_sumsq, ob_count, bcs, eseeds


def _eval_theta_body(
    env: Env,
    model: Model,
    theta: jax.Array,
    key: jax.Array,
    tslimit: jax.Array,
    nepisodes: int,
    ctx=None,
    ref_batch: Optional[jax.Array] = None,
):
    """Noiseless eval episodes of the current θ (es.py:388-405 eval path)."""
    thetas = jnp.broadcast_to(theta, (nepisodes,) + theta.shape)
    if model.needs_ref_batch:
        stats = model.batch_ref_stats(thetas[:1], ref_batch)
        stats = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (nepisodes,) + x.shape[1:]), stats)
        params = (thetas, stats)
    else:
        params = (thetas, ctx)
    res = rollout_batch(env, model.make_batch_act(), params, jax.random.split(key, nepisodes), tslimit)
    return res.returns, res.lengths, res.bc


@partial(jax.jit, static_argnums=(0, 1, 5))
def _eval_theta(
    env: Env,
    model: Model,
    theta: jax.Array,
    key: jax.Array,
    tslimit: jax.Array,
    nepisodes: int,
    ctx=None,
    ref_batch: Optional[jax.Array] = None,
):
    """Jitted wrapper of `_eval_theta_body`."""
    return _eval_theta_body(env, model, theta, key, tslimit, nepisodes, ctx, ref_batch)


@partial(jax.jit, static_argnums=(4, 6, 7, 8, 9))
def _compute_update(
    theta: jax.Array,
    opt_state,
    table_noise: jax.Array,
    noise_idxs: jax.Array,  # [n]
    return_proc_mode: str,
    proc_input: Tuple[jax.Array, jax.Array],  # (returns_n2, signreturns_n2)
    optimizer: optim.Adam,
    l2coeff: float,
    grad_chunk: int = 256,
    use_pallas: bool = False,
):
    """Rank transform → streamed gradient → L2 → optimizer step
    (es.py:281-301). Hashable statics: mode string, optimizer, chunk."""
    returns_n2, signreturns_n2 = proc_input
    proc = fitness.process_returns(returns_n2, signreturns_n2, return_proc_mode)
    w = proc[:, 0] - proc[:, 1]
    dim = theta.shape[0]
    if use_pallas and not isinstance(table_noise, VirtualNoise):
        from ..ops.pallas_kernels import gradient_from_noise_pallas

        g = gradient_from_noise_pallas(table_noise, noise_idxs, w, dim)
    else:
        g = fitness.gradient_from_noise(table_noise, noise_idxs, w, dim, grad_chunk)
    g = g / (returns_n2.size)  # es.py:296 g /= returns_n2.size
    opt_state, new_theta, ratio = optimizer.update(opt_state, theta, -g + l2coeff * theta)
    return opt_state, new_theta, ratio, jnp.sum(jnp.square(g))


@partial(jax.jit, static_argnums=(0, 1, 7, 8, 9, 11, 12, 13, 16, 19))
def _fused_generation(
    env: Env,
    model: Model,
    theta: jax.Array,
    opt_state,
    table: jax.Array,
    key: jax.Array,
    tslimit: jax.Array,
    npairs: int,
    n_rounds: int,
    num_eval: int,
    sigma: jax.Array,
    return_proc_mode: str,
    optimizer: optim.Adam,
    l2coeff: float,
    ctx_train=None,
    ctx_eval=None,
    use_pallas: bool = False,
    ref_batch: Optional[jax.Array] = None,
    eval_key: Optional[jax.Array] = None,
    grad_chunk: int = 256,
    obstat_prob: Optional[jax.Array] = None,
):
    """Whole fixed-population generation — n_rounds scanned eval rounds +
    rank transform + streamed gradient + optimizer step + the noiseless eval
    episodes of the (pre-update) θ — as ONE compiled computation with ONE
    batched device_get of diagnostics. This is the single-device twin of
    parallel/es_pod.py's gen_step. Peak HBM for perturbed parameters is
    O(npairs × D) regardless of population size (the TPU analog of the
    reference's 500-vector streaming, es.py:291-296)."""
    out = _eval_rounds(
        env, model, theta, table, key, tslimit, sigma, npairs, n_rounds, ctx_train,
        ref_batch, use_pallas, obstat_prob,
    )
    idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds = out
    opt_state2, theta2, ratio, gnorm = _compute_update(
        theta,
        opt_state,
        table,
        idxs,
        return_proc_mode,
        (rets, srets),
        optimizer,
        l2coeff,
        grad_chunk,
        use_pallas,
    )
    if num_eval > 0:
        ev_rets, ev_lens, ev_bc = _eval_theta_body(
            env, model, theta, eval_key, tslimit, num_eval, ctx_eval, ref_batch
        )
    else:
        ev_rets = jnp.zeros((0,), jnp.float32)
        ev_lens = jnp.zeros((0,), jnp.int32)
        ev_bc = jnp.zeros((0, env.bc_dim), jnp.float32)
    return (
        idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds,
        opt_state2, theta2, ratio, gnorm, ev_rets, ev_lens, ev_bc,
    )


@partial(jax.jit, static_argnums=(0, 1, 7, 8, 9, 12, 15, 16))
def _update_and_eval(
    env: Env,
    model: Model,
    theta: jax.Array,
    opt_state,
    table: jax.Array,
    noise_idxs: jax.Array,
    proc_input: Tuple[jax.Array, jax.Array],
    return_proc_mode: str,
    optimizer: optim.Adam,
    l2coeff: float,
    eval_key: jax.Array,
    tslimit: jax.Array,
    num_eval: int,
    ctx_eval=None,
    ref_batch: Optional[jax.Array] = None,
    use_pallas: bool = False,
    grad_chunk: int = 256,
):
    """Quota-mode tail: rank/gradient/optimizer step + eval episodes in one
    dispatch, so a quota generation costs exactly TWO host transfers —
    one for the scanned eval rounds, one for this (the repo's fused-call
    rule; replaces es.py:281-301 + 388-405 master/worker phases)."""
    opt_state2, theta2, ratio, gnorm = _compute_update(
        theta, opt_state, table, noise_idxs, return_proc_mode, proc_input,
        optimizer, l2coeff, grad_chunk, use_pallas,
    )
    if num_eval > 0:
        ev_rets, ev_lens, ev_bc = _eval_theta_body(
            env, model, theta, eval_key, tslimit, num_eval, ctx_eval, ref_batch
        )
    else:
        ev_rets = jnp.zeros((0,), jnp.float32)
        ev_lens = jnp.zeros((0,), jnp.int32)
        ev_bc = jnp.zeros((0, env.bc_dim), jnp.float32)
    return opt_state2, theta2, ratio, gnorm, ev_rets, ev_lens, ev_bc


@partial(jax.jit, static_argnums=(3,))
def _make_antithetic(theta: jax.Array, table: jax.Array, key: jax.Array, npairs: int, sigma):
    """Sample indices and build the ±σε theta batch (worker loop es.py:411-421).
    `table` is the raw table buffer or a VirtualNoise source."""
    dim = theta.shape[0]
    idxs = sample_source_idxs(table, key, dim, npairs)
    eps = noise_rows(table, idxs, dim)
    thetas = jnp.concatenate([theta[None] + sigma * eps, theta[None] - sigma * eps])
    return idxs, thetas


# --------------------------------------------------------------------------
# trainer
# --------------------------------------------------------------------------


class ESTrainer:
    """Host-side orchestration of the jitted generation kernels.

    Single-device by default; `parallel.es_pod` wraps the same kernels in
    shard_map for multi-chip meshes."""

    def __init__(
        self,
        env: Env,
        model: Model,
        config: ESConfig,
        optimizer: Optional[optim.Adam] = None,
        noise_table: Optional[NoiseTable] = None,
        seed: int = 0,
    ):
        self.env = env
        self.model = model
        self.config = config
        self.optimizer = optimizer or optim.Adam(stepsize=0.01)
        self.is_host_env = getattr(env, "is_host_env", False)
        key = jax.random.PRNGKey(seed)
        kinit, kref, krun = jax.random.split(key, 3)

        self.noise = noise_table or NoiseTable.from_seed()
        assert self.noise.size > model.num_params, (
            f"noise table ({self.noise.size}) must exceed num_params ({model.num_params})"
        )
        if isinstance(self.noise, VirtualNoise) and config.use_pallas_grad:
            # the Pallas streamed gradient reads a materialized table; the
            # virtual source regenerates rows on the VPU instead
            self.config = config = dataclasses.replace(config, use_pallas_grad=False)
        theta = model.init_theta(kinit)
        self.cutoff = parse_cutoff(config.episode_cutoff_mode, env.default_timestep_cutoff)

        self.ref_batch = None
        if model.needs_ref_batch:  # es.py:160-162
            if self.is_host_env:
                from .rollout_host import collect_ref_batch_host

                self.ref_batch = collect_ref_batch_host(env, kref, batch_size=128)
            else:
                self.ref_batch = collect_ref_batch(env, kref, batch_size=128)

        self.state = ESState(
            theta=theta,
            opt_state=self.optimizer.init(model.num_params),
            ob_stat=obstat.init(env.obs_shape, eps=1e-2),  # es.py:155-158
            key=krun,
            iteration=0,
            episodes_so_far=0,
            timesteps_so_far=0,
            tslimit=self.cutoff.tslimit,
        )
        # episode-length estimate driving the quota-mode round-count guess
        self._mean_len_est = float(self.cutoff.tslimit)
        self._tstart = time.time()

    @property
    def _table_arg(self):
        """What the jitted kernels receive: the raw [N] buffer for a
        materialized NoiseTable, or the VirtualNoise pytree itself."""
        return self.noise if isinstance(self.noise, VirtualNoise) else self.noise.noise

    # ------------------------------------------------------------------ ctx

    def _model_ctx(self, noisy: bool = False):
        """Model context for rollouts. `noisy=True` enables ac_noise_std —
        the reference's training rollouts act with a random_stream
        (es.py:415-421 pass rs → policies.py:202-206 adds noise) while eval
        rollouts don't (es.py:393)."""
        if self.model.needs_ob_stat:
            from ..models.mlp import MLPContext

            return MLPContext(
                obstat.mean(self.state.ob_stat),
                obstat.std(self.state.ob_stat),
                jnp.asarray(1.0 if noisy else 0.0),
            )
        return None

    # ------------------------------------------------------- host-env rounds

    def _host_round(self, theta, key, npairs, ctx):
        """Antithetic round on a host engine (toy/ALE): theta batch built on
        device, rollout via rollout_host_batch. The engine's slot count caps
        the round size (one slot per offspring, like the GPU stack's
        batch_size=64 slots, gpu es.py:148)."""
        from .rollout_host import rollout_host

        cfg = self.config
        npairs = min(npairs, self.env.batch_size // 2)
        idxs, thetas = _make_antithetic(
            theta, self._table_arg, key, npairs, jnp.asarray(cfg.noise_stdev, jnp.float32)
        )
        if self.model.needs_ref_batch:
            stats = self.model.batch_ref_stats(thetas, self.ref_batch)
            params = (thetas, stats)
        else:
            params = (thetas, ctx)
        res = rollout_host(
            self.env,
            self.model.make_batch_act(),
            params,
            key,
            int(self.cutoff.tslimit),
            mirror_pairs=cfg.mirror_crn,
            collect_obstat=self.model.needs_ob_stat and cfg.calc_obstat_prob > 0,
            # reference-faithful per-rollout Bernoulli sampling when 0<p<1
            # (es.py:356-363); p >= 1 accumulates every rollout
            obstat_prob=cfg.calc_obstat_prob if 0.0 < cfg.calc_obstat_prob < 1.0 else None,
        )
        pair = lambda x: jnp.stack([x[:npairs], x[npairs : 2 * npairs]], axis=1)
        ep_seeds = jax.random.randint(key, (npairs,), 0, 2**31 - 1, dtype=jnp.int32)
        return (
            idxs,
            pair(res.returns),
            pair(res.sign_returns),
            pair(res.lengths),
            res.ob_sum,
            res.ob_sumsq,
            res.ob_count,
            pair(res.bc),
            ep_seeds,
        )

    def _host_eval(self, theta, key, ctx):
        from .rollout_host import rollout_host

        # only n slots run (n_slots): stepping all 256 engine slots — and
        # staging their full frame batches through the device link — to
        # harvest 8 noiseless episodes measurably doubled generation cost
        n = min(self.config.num_eval_episodes, self.env.batch_size)
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
            self.env,
            self.model.make_batch_act(),
            params,
            key,
            int(self.cutoff.tslimit),
            n_slots=n,
        )
        return res.returns[:n], res.lengths[:n], res.bc[:n]

    # ----------------------------------------------------------- generation

    def _npairs_round(self, cap: int) -> int:
        """Antithetic pairs evaluated per round: explicit eval_batch wins;
        otherwise the whole population, clipped to the HBM auto-chunk cap and
        (host engines) the slot count."""
        cfg = self.config
        if cfg.eval_batch:
            npairs = cfg.eval_batch
        elif cfg.population_size:
            npairs = min(max(cfg.population_size // 2, 1), cap)
        else:
            npairs = min(64, cap)
        if self.is_host_env:
            npairs = min(npairs, self.env.batch_size // 2)
        return max(npairs, 1)

    def train_step(self) -> GenStats:
        cfg = self.config
        s = self.state
        quota_mode = cfg.episodes_per_batch > 0 or cfg.timesteps_per_batch > 0
        # HBM auto-chunk: keep the θ±σε batch under theta_hbm_budget bytes so
        # pop 5000 × multi-M-param nets stream in rounds instead of
        # materializing [P, D] (SURVEY §7 hard parts 3-4; es.py:291-296)
        cap = max(1, int(cfg.theta_hbm_budget) // (2 * self.model.num_params * 4))
        npairs_round = self._npairs_round(cap)

        key = s.key
        ctx = self._model_ctx(noisy=True)  # training rollouts: action noise on
        ctx_eval = self._model_ctx(noisy=False)  # eval: noiseless (es.py:393)
        all_idxs, all_rets, all_srets, all_lens = [], [], [], []
        all_bcs, all_seeds = [], []
        ob_sum = np.zeros(self.env.obs_shape, np.float32)
        ob_sumsq = np.zeros(self.env.obs_shape, np.float32)
        ob_count = 0.0
        episodes = 0
        timesteps = 0
        step_tstart = time.time()
        tslimit_dev = jnp.asarray(self.cutoff.tslimit, jnp.int32)
        sigma_dev = jnp.asarray(cfg.noise_stdev, jnp.float32)
        # reference-faithful per-rollout obs-stat sampling when 0 < p < 1
        # (es.py:356-363); p >= 1 accumulates every rollout
        obstat_prob = (
            jnp.asarray(cfg.calc_obstat_prob, jnp.float32)
            if self.model.needs_ob_stat and 0.0 < cfg.calc_obstat_prob < 1.0
            else None
        )
        key, keval = jax.random.split(key)

        # device fixed-population generations fuse rounds+update+eval into one
        # compiled call (ONE device dispatch + ONE device_get per generation)
        fused = not quota_mode and not self.is_host_env
        fused_update = None
        eval_rets = eval_lens = np.zeros((0,), np.float32)
        eval_bc = np.zeros((0, getattr(self.env, "bc_dim", 0)), np.float32)
        eval_done = False
        if fused:
            total_pairs = max((cfg.population_size or 2 * npairs_round) // 2, 1)
            npairs_round = min(npairs_round, total_pairs)
            n_rounds = -(-total_pairs // npairs_round)
            key, kround = jax.random.split(key)
            (
                idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds,
                opt_state_new, theta_new, ratio_f, gnorm_f, ev_r, ev_l, ev_b,
            ) = _fused_generation(
                self.env,
                self.model,
                s.theta,
                s.opt_state,
                self._table_arg,
                kround,
                tslimit_dev,
                npairs_round,
                n_rounds,
                cfg.num_eval_episodes,
                sigma_dev,
                cfg.return_proc_mode,
                self.optimizer,
                cfg.l2coeff,
                ctx,
                ctx_eval,
                cfg.use_pallas_grad,
                self.ref_batch,
                keval,
                cfg.grad_chunk,
                obstat_prob,
            )
            # one batched host transfer for all per-gen diagnostics
            (
                idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds,
                ratio_f, gnorm_f, eval_rets, eval_lens, eval_bc,
            ) = jax.device_get(
                (idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds,
                 ratio_f, gnorm_f, ev_r, ev_l, ev_b)
            )
            all_idxs.append(idxs)
            all_rets.append(rets)
            all_srets.append(srets)
            all_lens.append(lens)
            all_bcs.append(bcs)
            all_seeds.append(eseeds)
            ob_sum += osum
            ob_sumsq += osumsq
            ob_count += float(ocount)
            episodes += 2 * npairs_round * n_rounds
            timesteps += int(lens.sum())
            fused_update = (opt_state_new, theta_new, ratio_f, gnorm_f)
            eval_done = True
        elif quota_mode and not self.is_host_env:
            # quota mode on a device env: estimate the round count for BOTH
            # quotas (es.py:230 dual condition), scan them in one dispatch,
            # top up only if episode lengths came in under the estimate —
            # ≤2 host transfers per generation in the common case
            while True:
                remaining_ep = max(cfg.episodes_per_batch - episodes, 0)
                remaining_ts = max(cfg.timesteps_per_batch - timesteps, 0)
                r_ep = -(-remaining_ep // (2 * npairs_round)) if remaining_ep else 0
                r_ts = (
                    -(-remaining_ts // int(2 * npairs_round * max(self._mean_len_est, 1.0)))
                    if remaining_ts
                    else 0
                )
                n_rounds = max(r_ep, r_ts, 1 if episodes == 0 else 0)
                if n_rounds == 0:
                    break
                key, kround = jax.random.split(key)
                idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds = _eval_rounds(
                    self.env,
                    self.model,
                    s.theta,
                    self._table_arg,
                    kround,
                    tslimit_dev,
                    sigma_dev,
                    npairs_round,
                    n_rounds,
                    ctx,
                    self.ref_batch,
                    cfg.use_pallas_grad,
                    obstat_prob,
                )
                (idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds) = jax.device_get(
                    (idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds)
                )
                all_idxs.append(idxs)
                all_rets.append(rets)
                all_srets.append(srets)
                all_lens.append(lens)
                all_bcs.append(bcs)
                all_seeds.append(eseeds)
                ob_sum += osum
                ob_sumsq += osumsq
                ob_count += float(ocount)
                episodes += 2 * npairs_round * n_rounds
                timesteps += int(lens.sum())
                self._mean_len_est = max(float(np.mean(lens)), 1.0)
                if episodes >= cfg.episodes_per_batch and timesteps >= cfg.timesteps_per_batch:
                    break
        else:
            while True:
                key, kround = jax.random.split(key)
                idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds = self._host_round(
                    s.theta, kround, npairs_round, ctx
                )
                all_idxs.append(np.asarray(idxs))
                all_rets.append(np.asarray(rets))
                all_srets.append(np.asarray(srets))
                all_lens.append(np.asarray(lens))
                all_bcs.append(np.asarray(bcs))
                all_seeds.append(np.asarray(eseeds))
                ob_sum += np.asarray(osum)
                ob_sumsq += np.asarray(osumsq)
                ob_count += float(ocount)
                # count from the returned columns: the host-pod trainer's
                # _host_round returns the GLOBAL round (nproc·2·npairs rows)
                episodes += int(np.asarray(lens).size)
                timesteps += int(np.asarray(lens).sum())
                if quota_mode:
                    if episodes >= cfg.episodes_per_batch and timesteps >= cfg.timesteps_per_batch:
                        break
                else:
                    if episodes >= (cfg.population_size or 2 * npairs_round):
                        break

        noise_idxs = np.concatenate(all_idxs)
        returns_n2 = np.concatenate(all_rets)
        signreturns_n2 = np.concatenate(all_srets)
        lengths_n2 = np.concatenate(all_lens)
        bcs_n2 = np.concatenate(all_bcs)
        ep_seeds_n = np.concatenate(all_seeds)

        # gradient + optimizer step + eval episodes (folded into the fused
        # dispatch on the fixed-pop path; one fused tail dispatch otherwise)
        if fused_update is not None:
            opt_state, theta, ratio, gnorm = fused_update
        elif not self.is_host_env:
            opt_state, theta, ratio, gnorm, eval_rets, eval_lens, eval_bc = _update_and_eval(
                self.env,
                self.model,
                s.theta,
                s.opt_state,
                self._table_arg,
                jnp.asarray(noise_idxs),
                (jnp.asarray(returns_n2), jnp.asarray(signreturns_n2)),
                cfg.return_proc_mode,
                self.optimizer,
                cfg.l2coeff,
                keval,
                tslimit_dev,
                cfg.num_eval_episodes,
                ctx_eval,
                self.ref_batch,
                cfg.use_pallas_grad,
                cfg.grad_chunk,
            )
            eval_rets, eval_lens, eval_bc = jax.device_get((eval_rets, eval_lens, eval_bc))
            eval_rets, eval_lens = np.asarray(eval_rets), np.asarray(eval_lens)
            eval_bc = np.asarray(eval_bc)
            eval_done = True
        else:
            opt_state, theta, ratio, gnorm = _compute_update(
                s.theta,
                s.opt_state,
                self._table_arg,
                jnp.asarray(noise_idxs),
                cfg.return_proc_mode,
                (jnp.asarray(returns_n2), jnp.asarray(signreturns_n2)),
                self.optimizer,
                cfg.l2coeff,
                cfg.grad_chunk,
                cfg.use_pallas_grad,
            )

        if not eval_done and cfg.num_eval_episodes > 0:
            eval_rets, eval_lens, eval_bc = self._host_eval(s.theta, keval, ctx_eval)
            eval_rets, eval_lens = np.asarray(eval_rets), np.asarray(eval_lens)
            eval_bc = np.asarray(eval_bc)

        return self._finalize_generation(
            key, opt_state, theta, ratio, gnorm, noise_idxs, returns_n2,
            lengths_n2, bcs_n2, ep_seeds_n, eval_rets, eval_lens, eval_bc,
            ob_sum, ob_sumsq, ob_count, episodes, timesteps, step_tstart,
        )

    def _finalize_generation(
        self, key, opt_state, theta, ratio, gnorm, noise_idxs, returns_n2,
        lengths_n2, bcs_n2, ep_seeds_n, eval_rets, eval_lens, eval_bc,
        ob_sum, ob_sumsq, ob_count, episodes, timesteps, step_tstart,
    ) -> GenStats:
        """Shared post-update tail: obstat merge, cutoff curriculum, state
        swap, reference-named diagnostics (es.py:314-343), VINE dumps.
        parallel/trainers.py's pod trainers reuse this with their gathered
        global results."""
        cfg = self.config
        s = self.state
        # per-generation BC cloud kept for studies (the reference exposes it
        # through the VINE dumps, es_modified.py; this is the in-memory hook)
        self._last_bcs = np.asarray(bcs_n2)
        # obs stats (es.py:246-248 increment path)
        ob_stat = s.ob_stat
        if self.model.needs_ob_stat and ob_count > 0 and cfg.calc_obstat_prob > 0:
            ob_stat = obstat.increment(
                ob_stat, jnp.asarray(ob_sum), jnp.asarray(ob_sumsq), ob_count
            )

        self.cutoff = update_cutoff(self.cutoff, lengths_n2)

        self.state = ESState(
            theta=theta,
            opt_state=opt_state,
            ob_stat=ob_stat,
            key=key,
            iteration=s.iteration + 1,
            episodes_so_far=s.episodes_so_far + episodes,
            timesteps_so_far=s.timesteps_so_far + timesteps,
            tslimit=self.cutoff.tslimit,
        )

        # ----------------------------------------------------- diagnostics
        step_tend = time.time()
        if not getattr(self, "_log_enabled", True):
            return GenStats(
                returns_n2, lengths_n2, eval_rets, eval_lens, float(gnorm), float(ratio)
            )
        tlogger.record_tabular("EpRewMean", returns_n2.mean())
        tlogger.record_tabular("EpRewStd", returns_n2.std())
        tlogger.record_tabular("EpLenMean", lengths_n2.mean())
        # reference name gpu_implementation/es.py:208 — makes the adaptive
        # cutoff DSL's bumps visible in the per-generation metric stream
        tlogger.record_tabular("TimestepLimitPerEpisode", int(self.cutoff.tslimit))
        tlogger.record_tabular("EvalEpRewMean", np.nan if eval_rets.size == 0 else eval_rets.mean())
        tlogger.record_tabular("EvalEpRewMedian", np.nan if eval_rets.size == 0 else np.median(eval_rets))
        tlogger.record_tabular("EvalEpRewStd", np.nan if eval_rets.size == 0 else eval_rets.std())
        tlogger.record_tabular("EvalEpLenMean", np.nan if eval_rets.size == 0 else eval_lens.mean())
        tlogger.record_tabular(
            "EvalPopRank",
            np.nan
            if eval_rets.size == 0
            else np.searchsorted(np.sort(returns_n2.ravel()), eval_rets).mean() / returns_n2.size,
        )
        tlogger.record_tabular("EvalEpCount", int(eval_rets.size))
        tlogger.record_tabular("Norm", float(np.square(np.asarray(theta)).sum()))
        tlogger.record_tabular("GradNorm", float(gnorm))
        tlogger.record_tabular("UpdateRatio", float(ratio))
        tlogger.record_tabular("EpisodesThisIter", int(lengths_n2.size))
        tlogger.record_tabular("EpisodesSoFar", self.state.episodes_so_far)
        tlogger.record_tabular("TimestepsThisIter", int(lengths_n2.sum()))
        tlogger.record_tabular("TimestepsSoFar", self.state.timesteps_so_far)
        tlogger.record_tabular("UniqueWorkers", jax.device_count())
        tlogger.record_tabular("UniqueWorkersFrac", 1.0)
        tlogger.record_tabular("ResultsSkippedFrac", 0.0)  # no stale results in sync SPMD
        tlogger.record_tabular("ObCount", ob_count)
        tlogger.record_tabular("TimeElapsedThisIter", step_tend - step_tstart)
        tlogger.record_tabular("TimeElapsed", step_tend - self._tstart)
        tlogger.record_tabular(
            "TimestepsPerSecondThisIter", timesteps / max(step_tend - step_tstart, 1e-9)
        )
        tlogger.dump_tabular()

        if cfg.vine_snapshot_dir:
            from ..utils import vine

            vine.master_extract_cloud(
                cfg.vine_snapshot_dir,
                self.state.iteration,
                bcs_n2,
                returns_n2,
                lengths_n2,
                noise_idxs,
                ep_seeds_n,
            )
            vine.master_extract_parent(
                cfg.vine_snapshot_dir,
                self.state.iteration,
                eval_bc,
                eval_rets,
                eval_lens,
                cfg.noise_stdev,
                model=self.model,
                theta=theta,
                ref_batch=self.ref_batch,
            )

        return GenStats(
            returns_n2, lengths_n2, eval_rets, eval_lens, float(gnorm), float(ratio)
        )

    def train(self, iterations: int):
        for _ in range(iterations):
            self.train_step()
        return self.state

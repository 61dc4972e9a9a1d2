"""Lockstep population rollout engine — the TPU-native evaluation layer.

What it replaces (SURVEY §3):
* CPU stack: per-worker python rollout loops with one sess.run per frame
  (es_distributed/policies.py:83-93, es.py:411-426) fanned out over forked
  processes and Redis.
* GPU stack: `RLEvalutionWorker._loop` threads running a fused
  env-step+forward TF graph over the currently-running subset of batch slots
  with dynamic slot recycling (neuroevolution/concurrent_worker.py:72-102),
  fed by WorkerHub queues (distributed_helpers.py:17-98).

TPU-native design: ONE `lax.while_loop` steps all B env slots and all B
per-member policies in lockstep; finished slots are frozen by a done mask
(SURVEY §7 hard part 2). The whole loop — env physics, observation, vmapped
policy forward with per-member weights, reward/length/BC accounting — is a
single XLA computation: no threads, no queues, no host round-trips, and the
asynchrony machinery of distributed_helpers.py has nothing left to do.

The early-exit `while_loop` condition (`t < limit AND any slot alive`) gives
back the wall-clock that pure masking would waste once all episodes end.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..envs.core import Env


class RolloutResult(NamedTuple):
    returns: jax.Array  # [B] f32 — undiscounted episode return
    sign_returns: jax.Array  # [B] f32 — Σ sign(r_t): the Atari 'sign' fitness (es.py:283-287, worker es.py:424-426)
    lengths: jax.Array  # [B] i32 — steps taken (incl. terminal step)
    bc: jax.Array  # [B, bc_dim] f32 — final-state behavior characterization
    ob_sum: jax.Array  # obs-stat accumulators over alive steps ([obs_shape])
    ob_sumsq: jax.Array
    ob_count: jax.Array  # scalar f32
    bc_traj: Optional[tuple] = None  # host rollouts only: per-slot ragged
    #   per-step BC trajectories (the Atari RAM-per-step BC of
    #   policies.py:410-418), each [T_b·bc_dim] f32


def _mask_tree(done, old, new):
    """Freeze pytree leaves of finished slots: leaf[i] stays at `old` where
    done[i]. done is [B]; leaves are [B, ...]."""

    def sel(o, n):
        d = done.reshape(done.shape + (1,) * (o.ndim - 1))
        return jnp.where(d, o, n)

    return jax.tree_util.tree_map(sel, old, new)


@partial(jax.jit, static_argnums=(0, 1, 5))
def rollout_batch(
    env: Env,
    act_fn: Callable,  # (params, obs[B, ...], key) -> actions [B, ...]
    params,  # pytree, leaves stacked [B, ...] (per-member weights)
    keys: jax.Array,  # [B, 2] per-slot PRNG keys (reset + step streams)
    timestep_limit: jax.Array,  # scalar i32, dynamic (adaptive cutoff, es.py:169-186)
    collect_obstat: bool = False,
    obstat_mask: Optional[jax.Array] = None,  # [B] 0/1 per-ROLLOUT obs-stat
    # participation — the reference workers accumulate a rollout's obs with
    # prob calc_obstat_prob (es.py:356-363); None = every rollout
) -> RolloutResult:
    """Evaluate B policies on B env slots for one episode each."""
    B = keys.shape[0]
    prep = getattr(act_fn, "prepare", None)
    if prep is not None:
        params = prep(params)  # hoist unflatten/casts out of the step loop
    state = jax.vmap(env.reset)(keys)
    obs_shape = env.obs_shape

    def cond(c):
        t, _, done, *_ = c
        return (t < timestep_limit) & jnp.logical_not(jnp.all(done))

    def body(c):
        t, state, done, ret, sret, length, ob_sum, ob_sumsq, ob_count = c
        obs = jax.vmap(env.observe)(state)  # [B, obs]
        tkey = jax.vmap(lambda k: jax.random.fold_in(k, t))(keys)
        actions = act_fn(params, obs, tkey)
        nstate, r, d = jax.vmap(env.step)(state, actions, tkey)

        alive = jnp.logical_not(done).astype(jnp.float32)
        ret = ret + r * alive
        sret = sret + jnp.sign(r) * alive
        length = length + alive.astype(jnp.int32)
        if collect_obstat:
            sel = alive if obstat_mask is None else alive * obstat_mask
            m = sel.reshape((B,) + (1,) * (obs.ndim - 1))
            ob_sum = ob_sum + jnp.sum(obs * m, axis=0)
            ob_sumsq = ob_sumsq + jnp.sum(jnp.square(obs) * m, axis=0)
            ob_count = ob_count + jnp.sum(sel)
        ndone = done | d
        nstate = _mask_tree(done, state, nstate)
        return t + 1, nstate, ndone, ret, sret, length, ob_sum, ob_sumsq, ob_count

    init = (
        jnp.zeros((), jnp.int32),
        state,
        jnp.zeros((B,), jnp.bool_),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.zeros(obs_shape, jnp.float32),
        jnp.zeros(obs_shape, jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    t, state, done, ret, sret, length, ob_sum, ob_sumsq, ob_count = jax.lax.while_loop(
        cond, body, init
    )

    bc = jax.vmap(env.behavior)(state) if env.bc_dim else jnp.zeros((B, 0), jnp.float32)
    return RolloutResult(ret, sret, length, bc, ob_sum, ob_sumsq, ob_count)


@partial(jax.jit, static_argnums=(0, 1, 4))
def rollout_batch_scan(
    env: Env,
    act_fn: Callable,
    params,
    keys: jax.Array,
    timestep_limit: int,  # STATIC here — scan needs a fixed trip count
    collect_obstat: bool = False,
    save_obs: bool = False,
):
    """Scan variant with per-step trajectory capture (BC trajectories,
    `save_obs` for VINE/ref-batch tooling — policies.py:252-302 rollout's
    save_obs / x-y trajectory options). Prefer `rollout_batch` on hot paths."""
    B = keys.shape[0]
    prep = getattr(act_fn, "prepare", None)
    if prep is not None:
        params = prep(params)
    state0 = jax.vmap(env.reset)(keys)

    def step(carry, t):
        state, done, ret, sret, length = carry
        obs = jax.vmap(env.observe)(state)
        tkey = jax.vmap(lambda k: jax.random.fold_in(k, t))(keys)
        actions = act_fn(params, obs, tkey)
        nstate, r, d = jax.vmap(env.step)(state, actions, tkey)
        alive = jnp.logical_not(done).astype(jnp.float32)
        ret = ret + r * alive
        sret = sret + jnp.sign(r) * alive
        length = length + alive.astype(jnp.int32)
        ndone = done | d
        nstate = _mask_tree(done, state, nstate)
        bc_t = jax.vmap(env.behavior)(nstate) if env.bc_dim else jnp.zeros((B, 0))
        out = (obs, bc_t, alive) if save_obs else (bc_t, alive)
        return (nstate, ndone, ret, sret, length), out

    init = (
        state0,
        jnp.zeros((B,), jnp.bool_),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.float32),
        jnp.zeros((B,), jnp.int32),
    )
    (state, done, ret, sret, length), traj = jax.lax.scan(step, init, jnp.arange(timestep_limit))
    bc = jax.vmap(env.behavior)(state) if env.bc_dim else jnp.zeros((B, 0), jnp.float32)
    result = RolloutResult(
        ret,
        sret,
        length,
        bc,
        jnp.zeros(env.obs_shape, jnp.float32),
        jnp.zeros(env.obs_shape, jnp.float32),
        jnp.zeros((), jnp.float32),
    )
    return result, traj


def collect_ref_batch(env: Env, key: jax.Array, batch_size: int = 128, slots: int = 8):
    """Random-policy observation collection for virtual batch norm
    (gym_tensorflow/__init__.py:17-37 get_ref_batch; es_distributed/es.py:106-113).

    Steps `slots` env instances with uniform random actions for
    ceil(batch_size/slots) steps, auto-resetting on done, and returns
    [batch_size, *obs_shape] observations."""
    from .rollout import _mask_tree  # self-import for clarity

    steps = -(-batch_size // slots)
    kreset, kact = jax.random.split(key)
    state0 = jax.vmap(env.reset)(jax.random.split(kreset, slots))

    def step(carry, t):
        state = carry
        tkey = jax.random.fold_in(kact, t)
        if env.discrete_action:
            actions = jax.random.randint(tkey, (slots,), 0, env.action_space.n)
        else:
            actions = jax.random.uniform(tkey, (slots, env.action_space.dim), minval=-0.5, maxval=0.5)
        skeys = jax.random.split(tkey, slots)
        nstate, _, d = jax.vmap(env.step)(state, actions, skeys)
        # auto-reset finished slots so frames keep flowing
        rstate = jax.vmap(env.reset)(skeys)
        nstate = _mask_tree(d, rstate, nstate)
        obs = jax.vmap(env.observe)(nstate)
        return nstate, obs

    _, obs = jax.lax.scan(step, state0, jnp.arange(steps))  # [steps, slots, ...]
    obs = obs.reshape((steps * slots,) + obs.shape[2:])
    return obs[:batch_size]

"""Pod-scale ES: the full generation step as one shard_map'd SPMD program.

Communication mapping (replaces the reference's Redis data plane, SURVEY §2.3):
* task broadcast (dist.py:72-82)      → nothing: θ is replicated and every
                                        device computes the identical update
* result RPUSH/BLPOP + relay batching → `all_gather` of the per-device
  (dist.py:84-87,124-138)               fitness columns over the `pop` axis
* master gradient accumulation        → per-device partial Σwᵢεᵢ over its
  (es.py:291-296)                       local shard, `psum` over `pop`
* obs-stat shipping (es.py:436-438)   → `psum` of sum/sumsq/count

The rank transform needs the GLOBAL return vector (es.py:281-288), so the
[n_local, 2] return columns are all-gathered — a few KB per generation —
while the heavy [n, D] noise matrix never exists anywhere.

Three entry points:
* `make_pod_es_step`    — fused fixed-population generation: n_rounds scanned
  antithetic rounds per device + rank/gradient/update + the noiseless eval
  episodes, ONE dispatch (the pod twin of algos/es.py `_fused_generation`).
* `make_pod_eval_rounds` — rounds only, no update: quota mode accumulates
  across dispatches until the episode+timestep quotas hold (es.py:230-265).
* `make_pod_update_eval` — rank/gradient/update + eval from accumulated
  results (the quota-mode tail; es.py:281-301 + 388-405).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..algos.es import _eval_theta_body, _perturbed_round_body
from ..envs.core import Env
from ..models.core import Model
from ..ops import fitness, optim
from .mesh import POP_AXIS


class PodGenResult(NamedTuple):
    theta: jax.Array
    opt_state: Any
    returns_n2: jax.Array  # [n_global, 2]
    signreturns_n2: jax.Array
    lengths_n2: jax.Array
    noise_idxs: jax.Array  # [n_global]
    update_ratio: jax.Array
    grad_sq_sum: jax.Array
    ob_sum: jax.Array
    ob_sumsq: jax.Array
    ob_count: jax.Array
    # appended fields (VINE parity + fused eval episodes)
    bcs_n2: jax.Array  # [n_global, 2, bc_dim]
    ep_seeds: jax.Array  # [n_global]
    eval_returns: jax.Array  # [n_dev · num_eval_per_device]
    eval_lengths: jax.Array
    eval_bc: jax.Array


class PodRoundsResult(NamedTuple):
    noise_idxs: jax.Array  # [n_global]
    returns_n2: jax.Array
    signreturns_n2: jax.Array
    lengths_n2: jax.Array
    bcs_n2: jax.Array
    ep_seeds: jax.Array
    ob_sum: jax.Array  # psum'd over the pop axis (replicated)
    ob_sumsq: jax.Array
    ob_count: jax.Array


def _local_rounds(env, model, theta, table, key, tslimit, sigma, npairs, n_rounds,
                  ctx, ref_batch, aligned, obstat_prob=None):
    """Per-device: n_rounds scanned antithetic rounds (the device twin of the
    reference worker loop, es.py:411-426). Flattened [n_rounds·npairs, ...]."""
    keys = jax.random.split(key, n_rounds)

    def body(carry, rkey):
        idxs, rets, srets, lens, osum, osumsq, ocount, bcs, eseeds = _perturbed_round_body(
            env, model, theta, table, rkey, tslimit, sigma, npairs, ctx, ref_batch,
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
    (osum, osumsq, ocount), outs = jax.lax.scan(body, carry0, keys)
    idxs, rets, srets, lens, bcs, eseeds = jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), outs
    )
    return idxs, rets, srets, lens, bcs, eseeds, osum, osumsq, ocount


def _placeholder(x):
    return jnp.zeros((0,), jnp.float32) if x is None else x


def _local_eval_theta(env, model, theta, eval_key, tslimit, num_eval, ctx_eval, ref_batch):
    """Per-device noiseless eval shard: fold the device index into the key so
    the pod's eval episodes are i.i.d. across devices (es.py:388-405)."""
    if num_eval <= 0:
        return (
            jnp.zeros((0,), jnp.float32),
            jnp.zeros((0,), jnp.int32),
            jnp.zeros((0, env.bc_dim), jnp.float32),
        )
    my = jax.lax.axis_index(POP_AXIS)
    ekey = jax.random.fold_in(eval_key, my)
    return _eval_theta_body(env, model, theta, ekey, tslimit, num_eval, ctx_eval, ref_batch)


def make_pod_eval_rounds(
    env: Env,
    model: Model,
    mesh,
    npairs_per_device: int,
    n_rounds: int = 1,
    has_ref_batch: bool = False,
    use_pallas_grad: bool = False,
    obstat_prob=None,
):
    """Quota-mode rounds: every device evaluates npairs_per_device·n_rounds
    antithetic pairs; results come back pop-sharded, obs-stat sums psum'd.
    No update — the trainer accumulates dispatches until both quotas hold
    (es.py:230 dual condition)."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(POP_AXIS), P(), P(), P(), P()),
        out_specs=(
            P(POP_AXIS), P(POP_AXIS), P(POP_AXIS), P(POP_AXIS), P(POP_AXIS),
            P(POP_AXIS), P(), P(), P(),
        ),
        check_vma=False,
    )
    def rounds(theta, table, keys, tslimit, sigma, ctx, ref_batch):
        idxs, rets, srets, lens, bcs, eseeds, osum, osumsq, ocount = _local_rounds(
            env, model, theta, table, keys[0], tslimit, sigma,
            npairs_per_device, n_rounds, ctx, ref_batch, use_pallas_grad,
            None if obstat_prob is None else jnp.float32(obstat_prob),
        )
        osum = jax.lax.psum(osum, POP_AXIS)
        osumsq = jax.lax.psum(osumsq, POP_AXIS)
        ocount = jax.lax.psum(ocount, POP_AXIS)
        return idxs, rets, srets, lens, bcs, eseeds, osum, osumsq, ocount

    @jax.jit
    def step(theta, table, keys, tslimit, sigma, ctx=None, ref_batch=None):
        out = rounds(theta, table, keys, tslimit, sigma,
                     _placeholder(ctx), _placeholder(ref_batch))
        return PodRoundsResult(*out)

    return step


class PodUpdateResult(NamedTuple):
    theta: jax.Array
    opt_state: Any
    update_ratio: jax.Array
    grad_sq_sum: jax.Array
    eval_returns: jax.Array
    eval_lengths: jax.Array
    eval_bc: jax.Array


def make_pod_update_eval(
    env: Env,
    model: Model,
    optimizer: optim.Adam,
    mesh,
    return_proc_mode: str = "centered_rank",
    l2coeff: float = 0.005,
    grad_chunk: int = 128,
    num_eval_per_device: int = 0,
    has_ref_batch: bool = False,
    use_pallas_grad: bool = False,
):
    """Quota-mode tail: rank transform on the GLOBAL accumulated returns,
    per-device partial gradient over the pop-sharded noise indices, psum,
    identical replicated optimizer update, plus the sharded eval episodes —
    one dispatch (es.py:281-301 + 388-405). `noise_idxs` must be row-aligned
    with `returns`/`signreturns` and divisible by the device count (it is,
    coming from `make_pod_eval_rounds` dispatches)."""
    dim = model.num_params

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(POP_AXIS), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P(), P(POP_AXIS), P(POP_AXIS), P(POP_AXIS)),
        check_vma=False,
    )
    def upd(theta, opt_state, table, idxs, returns_n2, signreturns_n2,
            eval_key, tslimit, ctx_eval, ref_batch):
        proc = fitness.process_returns(returns_n2, signreturns_n2, return_proc_mode)
        w_all = proc[:, 0] - proc[:, 1]  # [n_global]
        n_local = idxs.shape[0]
        my = jax.lax.axis_index(POP_AXIS)
        w_local = jax.lax.dynamic_slice_in_dim(w_all, my * n_local, n_local)
        if use_pallas_grad:
            from ..ops.pallas_kernels import gradient_from_noise_pallas

            g_local = gradient_from_noise_pallas(table, idxs, w_local, dim)
        else:
            g_local = fitness.gradient_from_noise(table, idxs, w_local, dim, grad_chunk)
        g = jax.lax.psum(g_local, POP_AXIS) / returns_n2.size  # es.py:296
        opt_state2, theta2, ratio = optimizer.update(opt_state, theta, -g + l2coeff * theta)
        ev_r, ev_l, ev_b = _local_eval_theta(
            env, model, theta, eval_key, tslimit, num_eval_per_device, ctx_eval, ref_batch
        )
        return theta2, opt_state2, ratio, jnp.sum(jnp.square(g)), ev_r, ev_l, ev_b

    @jax.jit
    def step(theta, opt_state, table, noise_idxs, returns_n2, signreturns_n2,
             eval_key, tslimit, ctx_eval=None, ref_batch=None):
        out = upd(theta, opt_state, table, noise_idxs, returns_n2, signreturns_n2,
                  eval_key, tslimit, _placeholder(ctx_eval), _placeholder(ref_batch))
        return PodUpdateResult(*out)

    return step


def make_pod_es_step(
    env: Env,
    model: Model,
    optimizer: optim.Adam,
    mesh,
    npairs_per_device: int,
    return_proc_mode: str = "centered_rank",
    l2coeff: float = 0.005,
    grad_chunk: int = 128,
    has_ref_batch: bool = False,
    use_pallas_grad: bool = False,
    n_rounds: int = 1,
    num_eval_per_device: int = 0,
    obstat_prob=None,
):
    """Build the jitted multi-chip generation step (fixed-population mode).

    Signature of the returned fn:
      step(theta [D], opt_state, table [count], keys [n_dev], tslimit, sigma,
           ctx, ref_batch, eval_key) -> PodGenResult
    `keys` is sharded over `pop` (one per device); everything else replicated.
    Each device scans `n_rounds` rounds of `npairs_per_device` antithetic
    pairs (peak HBM O(npairs × D)), then runs `num_eval_per_device` noiseless
    eval episodes of the pre-update θ — the whole generation is ONE dispatch.
    """
    dim = model.num_params
    n_dev = mesh.devices.size
    npairs_global = npairs_per_device * n_rounds * n_dev

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(POP_AXIS), P(), P(), P(), P(), P(), P()),
        out_specs=(
            P(),  # theta (replicated: identical on every device)
            P(),  # opt_state
            P(POP_AXIS),  # returns
            P(POP_AXIS),
            P(POP_AXIS),
            P(POP_AXIS),  # noise idxs
            P(),
            P(),
            P(),
            P(),
            P(),
            P(POP_AXIS),  # bcs
            P(POP_AXIS),  # ep seeds
            P(POP_AXIS),  # eval returns
            P(POP_AXIS),
            P(POP_AXIS),
        ),
        check_vma=False,
    )
    def gen_step(theta, opt_state, table, keys, tslimit, sigma, ctx, ref_batch,
                 ctx_eval, eval_key):
        key = keys[0]  # this device's key (leading dim sharded to 1)
        idxs, rets, srets, lens, bcs, eseeds, osum, osumsq, ocount = _local_rounds(
            env, model, theta, table, key, tslimit, sigma,
            npairs_per_device, n_rounds, ctx, ref_batch, use_pallas_grad,
            None if obstat_prob is None else jnp.float32(obstat_prob),
        )

        # global fitness for the rank transform (tiny: [n_global, 2])
        all_rets = jax.lax.all_gather(rets, POP_AXIS, tiled=True)
        all_srets = jax.lax.all_gather(srets, POP_AXIS, tiled=True)
        proc = fitness.process_returns(all_rets, all_srets, return_proc_mode)
        w_all = proc[:, 0] - proc[:, 1]  # [n_global]
        n_local = npairs_per_device * n_rounds
        my = jax.lax.axis_index(POP_AXIS)
        w_local = jax.lax.dynamic_slice_in_dim(w_all, my * n_local, n_local)

        if use_pallas_grad:
            from ..ops.pallas_kernels import gradient_from_noise_pallas

            g_local = gradient_from_noise_pallas(table, idxs, w_local, dim)
        else:
            g_local = fitness.gradient_from_noise(table, idxs, w_local, dim, grad_chunk)
        g = jax.lax.psum(g_local, POP_AXIS) / (npairs_global * 2)  # es.py:296

        opt_state2, theta2, ratio = optimizer.update(opt_state, theta, -g + l2coeff * theta)

        ob_sum = jax.lax.psum(osum, POP_AXIS)
        ob_sumsq = jax.lax.psum(osumsq, POP_AXIS)
        ob_count = jax.lax.psum(ocount, POP_AXIS)

        ev_r, ev_l, ev_b = _local_eval_theta(
            env, model, theta, eval_key, tslimit, num_eval_per_device, ctx_eval, ref_batch
        )

        return (
            theta2,
            opt_state2,
            rets,
            srets,
            lens,
            idxs,
            ratio,
            jnp.sum(jnp.square(g)),
            ob_sum,
            ob_sumsq,
            ob_count,
            bcs,
            eseeds,
            ev_r,
            ev_l,
            ev_b,
        )

    @jax.jit
    def step(theta, opt_state, table, keys, tslimit, sigma, ctx=None, ref_batch=None,
             ctx_eval=None, eval_key=None):
        if eval_key is None:
            eval_key = jax.random.PRNGKey(0)
        if ctx_eval is None:
            ctx_eval = ctx
        out = gen_step(theta, opt_state, table, keys, tslimit, sigma,
                       _placeholder(ctx), _placeholder(ref_batch),
                       _placeholder(ctx_eval), eval_key)
        return PodGenResult(*out)

    return step

"""Pod-scale NS-ES / NSR-ES: the novelty-search generation step as one
shard_map'd SPMD program.

Single-device twin: algos/nses.py `_perturbed_eval_with_bc` + the master's
rank/gradient update (reference es_distributed/nses.py:165-240). The pod
mapping follows es_pod.py:

* the current parent θ and the novelty archive are REPLICATED — the archive
  replaces the Redis list every worker re-reads per task (dist.py:92-98,
  nses.py:342-344), and stays a device array so k-NN novelty is one fused
  pairwise-distance + top-k per shard;
* each device evaluates its antithetic shard and computes novelty of its
  own BCs against the replicated archive (the per-worker novelty of
  nses.py:381-387, batched);
* novelty (and, for NSR, reward) columns are all_gather'd for the GLOBAL
  rank transform (nses.py:217-228);
* the gradient is the per-device partial Σwᵢεᵢ psum'd over `pop`
  (nses.py:231-240 master accumulation).

Parent selection / archive insertion stay host-side in NSESTrainer — they
are O(M) per generation, not per-rollout.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..algos.rollout import rollout_batch
from ..envs.core import Env
from ..models.core import Model
from ..ops import fitness, novelty, optim
from .mesh import POP_AXIS


class PodNSGenResult(NamedTuple):
    theta: jax.Array
    opt_state: Any
    returns_n2: jax.Array  # [n_global, 2]
    novelty_n2: jax.Array  # [n_global, 2]
    lengths_n2: jax.Array
    noise_idxs: jax.Array  # [n_global]
    bcs_n2: jax.Array  # [n_global, 2, bc_dim] pair-aligned with returns
    update_ratio: jax.Array
    grad_sq_sum: jax.Array
    ob_sum: jax.Array  # psum'd obs-stat accumulators (replicated)
    ob_sumsq: jax.Array
    ob_count: jax.Array


def make_pod_nses_step(
    env: Env,
    model: Model,
    optimizer: optim.Adam,
    mesh,
    npairs_per_device: int,
    k: int,
    algo_type: str = "ns",
    l2coeff: float = 0.005,
    grad_chunk: int = 128,
    has_ref_batch: bool = False,
    n_rounds: int = 1,
    return_proc_mode: str = "centered_sign_rank",
):
    """Build the jitted multi-chip NS-ES generation step.

    Returned fn:
      step(theta [D], opt_state, table, keys [n_dev], tslimit, sigma,
           archive, ctx, ref_batch) -> PodNSGenResult
    `algo_type`: 'ns' ranks novelty alone; 'nsr' averages novelty ranks with
    reward ranks (nses.py:226-228). Each device scans `n_rounds` rounds of
    `npairs_per_device` antithetic pairs. The novelty of every rollout's BC
    against the replicated archive is one fused pairwise-distance/top-k per
    device (the per-worker loop of nses.py:381-387, batched); novelty rides
    the signreturns slot exactly as the reference wires it, so
    `return_proc_mode` reproduces es.py:281-288 dispatch ('centered_rank'
    would rank reward — ES behavior)."""
    assert algo_type in ("ns", "nsr"), algo_type
    dim = model.num_params
    n_dev = mesh.devices.size
    npairs_global = npairs_per_device * n_rounds * n_dev

    from .es_pod import _local_rounds, _placeholder

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(POP_AXIS), P(), P(), P(), P(), P()),
        out_specs=(
            P(),  # theta
            P(),  # opt_state
            P(POP_AXIS),  # returns
            P(POP_AXIS),  # novelty
            P(POP_AXIS),  # lengths
            P(POP_AXIS),  # noise idxs
            P(POP_AXIS),  # bcs
            P(),
            P(),
            P(),
            P(),
            P(),
        ),
        check_vma=False,
    )
    def gen_step(theta, opt_state, table, keys, tslimit, sigma, archive, ctx, ref_batch):
        key = keys[0]
        idxs, rets, srets, lens, bcs, eseeds, osum, osumsq, ocount = _local_rounds(
            env, model, theta, table, key, tslimit, sigma,
            npairs_per_device, n_rounds, ctx, ref_batch, False,
        )
        # novelty of every rollout BC vs the replicated archive; bcs is
        # [n_local, 2, bc_dim] pair-aligned
        n_local = npairs_per_device * n_rounds
        nov_flat = novelty.novelty_vs_archive(
            archive, bcs.reshape(2 * n_local, -1), k
        )
        novs = nov_flat.reshape(n_local, 2)

        # global rank transform over novelty (nses.py:217-224, via the
        # signreturns slot, es.py:281-288); NSR averages with reward ranks
        # (nses.py:226-228)
        all_novs = jax.lax.all_gather(novs, POP_AXIS, tiled=True)
        all_rets = jax.lax.all_gather(rets, POP_AXIS, tiled=True)
        proc = fitness.process_returns(all_rets, all_novs, return_proc_mode)
        if algo_type == "nsr":
            proc = (proc + fitness.compute_centered_ranks(all_rets)) / 2.0
        w_all = proc[:, 0] - proc[:, 1]
        my = jax.lax.axis_index(POP_AXIS)
        w_local = jax.lax.dynamic_slice_in_dim(w_all, my * n_local, n_local)

        g_local = fitness.gradient_from_noise(table, idxs, w_local, dim, grad_chunk)
        g = jax.lax.psum(g_local, POP_AXIS) / (npairs_global * 2)

        opt_state2, theta2, ratio = optimizer.update(
            opt_state, theta, -g + l2coeff * theta
        )

        return (
            theta2,
            opt_state2,
            rets,
            novs,
            lens,
            idxs,
            bcs,
            ratio,
            jnp.sum(jnp.square(g)),
            jax.lax.psum(osum, POP_AXIS),
            jax.lax.psum(osumsq, POP_AXIS),
            jax.lax.psum(ocount, POP_AXIS),
        )

    @jax.jit
    def step(theta, opt_state, table, keys, tslimit, sigma, archive, ctx=None, ref_batch=None):
        out = gen_step(
            theta, opt_state, table, keys, tslimit, sigma, archive,
            _placeholder(ctx), _placeholder(ref_batch),
        )
        return PodNSGenResult(*out)

    return step

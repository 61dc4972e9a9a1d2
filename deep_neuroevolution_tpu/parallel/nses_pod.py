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
    bcs_2n: jax.Array  # [2·n_local per device, bc_dim], pop-sharded
    update_ratio: jax.Array
    grad_sq_sum: jax.Array


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
):
    """Build the jitted multi-chip NS-ES generation step.

    Returned fn:
      step(theta [D], opt_state, table, keys [n_dev], tslimit, sigma,
           archive, ctx, ref_batch) -> PodNSGenResult
    `algo_type`: 'ns' ranks novelty alone; 'nsr' averages novelty ranks with
    reward ranks (nses.py:226-228).
    """
    assert algo_type in ("ns", "nsr"), algo_type
    dim = model.num_params
    act_fn = model.make_batch_act()
    n_dev = mesh.devices.size
    npairs_global = npairs_per_device * n_dev

    def local_eval(theta, table, key, tslimit, sigma, archive, ctx, ref_batch):
        kidx, kroll = jax.random.split(key)
        idxs = jax.random.randint(
            kidx, (npairs_per_device,), 0, table.shape[0] - dim + 1, dtype=jnp.int32
        )
        eps = jax.vmap(lambda i: jax.lax.dynamic_slice(table, (i,), (dim,)))(idxs)
        thetas = jnp.concatenate([theta[None] + sigma * eps, theta[None] - sigma * eps])
        if has_ref_batch:
            stats = model.batch_ref_stats(thetas, ref_batch)
            params = (thetas, stats)
        else:
            params = (thetas, ctx)
        keys = jax.random.split(kroll, npairs_per_device)
        res = rollout_batch(env, act_fn, params, jnp.concatenate([keys, keys]), tslimit)
        nov = novelty.novelty_vs_archive(archive, res.bc, k)  # [2n_local]
        pair = lambda x: jnp.stack(
            [x[:npairs_per_device], x[npairs_per_device:]], axis=1
        )
        return idxs, pair(res.returns), pair(nov), pair(res.lengths), res.bc

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
        ),
        check_vma=False,
    )
    def gen_step(theta, opt_state, table, keys, tslimit, sigma, archive, ctx, ref_batch):
        key = keys[0]
        idxs, rets, novs, lens, bcs = local_eval(
            theta, table, key, tslimit, sigma, archive, ctx, ref_batch
        )

        # global rank transform over novelty (nses.py:217-224); NSR averages
        # with reward ranks (nses.py:226-228)
        all_novs = jax.lax.all_gather(novs, POP_AXIS, tiled=True)
        proc = fitness.compute_centered_ranks(all_novs)
        if algo_type == "nsr":
            all_rets = jax.lax.all_gather(rets, POP_AXIS, tiled=True)
            proc = (proc + fitness.compute_centered_ranks(all_rets)) / 2.0
        w_all = proc[:, 0] - proc[:, 1]
        my = jax.lax.axis_index(POP_AXIS)
        w_local = jax.lax.dynamic_slice_in_dim(
            w_all, my * npairs_per_device, npairs_per_device
        )

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
        )

    @jax.jit
    def step(theta, opt_state, table, keys, tslimit, sigma, archive, ctx=None, ref_batch=None):
        if ctx is None:
            ctx = jnp.zeros((0,), jnp.float32)
        if ref_batch is None:
            ref_batch = jnp.zeros((0,), jnp.float32)
        out = gen_step(
            theta, opt_state, table, keys, tslimit, sigma, archive, ctx, ref_batch
        )
        return PodNSGenResult(*out)

    return step

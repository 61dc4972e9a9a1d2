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
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..envs.core import Env
from ..models.core import Model
from ..ops import fitness, optim
from .mesh import POP_AXIS
from ..algos.rollout import rollout_batch


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
):
    """Build the jitted multi-chip generation step.

    Signature of the returned fn:
      step(theta [D], opt_state, table [count], keys [n_dev], tslimit, sigma,
           ctx, ref_batch) -> PodGenResult
    `keys` is sharded over `pop` (one per device); everything else replicated.
    """
    dim = model.num_params
    act_fn = model.make_batch_act()
    n_dev = mesh.devices.size
    npairs_global = npairs_per_device * n_dev

    def local_eval(theta, table, key, tslimit, sigma, ctx, ref_batch):
        kidx, kroll = jax.random.split(key)
        if use_pallas_grad:
            from ..ops.pallas_kernels import sample_aligned_indices

            idxs = sample_aligned_indices(kidx, table.shape[0], dim, npairs_per_device)
        else:
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
        pair = lambda x: jnp.stack([x[:npairs_per_device], x[npairs_per_device:]], axis=1)
        return idxs, pair(res.returns), pair(res.sign_returns), pair(res.lengths), res

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(POP_AXIS), P(), P(), P(), P()),
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
        ),
        check_vma=False,
    )
    def gen_step(theta, opt_state, table, keys, tslimit, sigma, ctx, ref_batch):
        key = keys[0]  # this device's key (leading dim sharded to 1)
        idxs, rets, srets, lens, res = local_eval(
            theta, table, key, tslimit, sigma, ctx, ref_batch
        )

        # global fitness for the rank transform (tiny: [n_global, 2])
        all_rets = jax.lax.all_gather(rets, POP_AXIS, tiled=True)
        all_srets = jax.lax.all_gather(srets, POP_AXIS, tiled=True)
        proc = fitness.process_returns(all_rets, all_srets, return_proc_mode)
        w_all = proc[:, 0] - proc[:, 1]  # [n_global]
        my = jax.lax.axis_index(POP_AXIS)
        w_local = jax.lax.dynamic_slice_in_dim(w_all, my * npairs_per_device, npairs_per_device)

        if use_pallas_grad:
            from ..ops.pallas_kernels import gradient_from_noise_pallas

            g_local = gradient_from_noise_pallas(table, idxs, w_local, dim)
        else:
            g_local = fitness.gradient_from_noise(table, idxs, w_local, dim, grad_chunk)
        g = jax.lax.psum(g_local, POP_AXIS) / (npairs_global * 2)  # es.py:296

        opt_state2, theta2, ratio = optimizer.update(opt_state, theta, -g + l2coeff * theta)

        ob_sum = jax.lax.psum(res.ob_sum, POP_AXIS)
        ob_sumsq = jax.lax.psum(res.ob_sumsq, POP_AXIS)
        ob_count = jax.lax.psum(res.ob_count, POP_AXIS)

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
        )

    @jax.jit
    def step(theta, opt_state, table, keys, tslimit, sigma, ctx=None, ref_batch=None):
        if ctx is None:
            ctx = jnp.zeros((0,), jnp.float32)  # placeholder pytree
        if ref_batch is None:
            ref_batch = jnp.zeros((0,), jnp.float32)
        out = gen_step(theta, opt_state, table, keys, tslimit, sigma, ctx, ref_batch)
        return PodGenResult(*out)

    return step

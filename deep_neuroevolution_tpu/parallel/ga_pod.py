"""Pod-scale GA: offspring synthesis + evaluation sharded over the pop mesh.

The GA data plane is even lighter than ES's (SURVEY §2.3 parameter-broadcast
row): parents are communicated as θ rows (or, equivalently, seed chains —
ints, as the reference broadcasts, es_distributed/ga.py:252 / gpu
ga.py:123-129); each device mutates and evaluates its population shard and
only the fitness column is all-gathered for the host-side truncation
selection + validation ladder (gpu ga.py:180-204, which stays in
algos/ga.py's GATrainer)."""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..algos.rollout import rollout_batch
from ..envs.core import Env
from ..models.core import Model
from .mesh import POP_AXIS


class PodGAResult(NamedTuple):
    parent_idx: jax.Array  # [n_global] int32 — which cached parent was mutated
    mutation_idx: jax.Array  # [n_global] int32 — noise index of the mutation
    returns: jax.Array  # [n_global]
    lengths: jax.Array  # [n_global]
    bc: jax.Array  # [n_global, bc_dim]


def make_pod_ga_step(
    env: Env,
    model: Model,
    mesh,
    n_per_device: int,
    has_ref_batch: bool = False,
    n_rounds: int = 1,
    cpu_init: bool = False,
):
    """Returns step(parent_thetas [T, D] | None-row for randomize, table,
    keys [n_dev], tslimit, power, scale_by, randomize: pass parent_thetas
    with T=0 rows → fresh genomes) -> PodGAResult.

    Each device scans `n_rounds` rounds of `n_per_device` offspring — only
    [n_per_device, D] offspring θs are ever live per device (SURVEY §7 hard
    parts 3-4). `cpu_init` switches generation-0 genomes to the CPU stack's
    normalized-column reinit (es_distributed/ga.py:256-260) instead of the
    GPU stack's ε·scale_by (base.py:121-125).

    Two compiled variants are produced lazily keyed on whether parents
    exist (generation 0 randomizes: gpu ga.py:122-125)."""
    dim = model.num_params
    act_fn = model.make_batch_act()

    def build(randomize: bool):
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(POP_AXIS), P(), P(), P(), P()),
            out_specs=(P(POP_AXIS),) * 5,
            check_vma=False,
        )
        def gen_step(parent_thetas, table, keys, tslimit, power, scale_by, ref_batch):
            rkeys = jax.random.split(keys[0], n_rounds)

            def body(carry, key):
                kp, km, kroll = jax.random.split(key, 3)
                midx = jax.random.randint(
                    km, (n_per_device,), 0, table.shape[0] - dim + 1, dtype=jnp.int32
                )
                eps = jax.vmap(lambda i: jax.lax.dynamic_slice(table, (i,), (dim,)))(midx)
                if randomize:
                    pidx = jnp.zeros((n_per_device,), jnp.int32)
                    if cpu_init:
                        thetas = jax.vmap(model.reinit_theta)(eps)
                    else:
                        thetas = eps * scale_by[None, :]
                else:
                    pidx = jax.random.randint(
                        kp, (n_per_device,), 0, parent_thetas.shape[0], dtype=jnp.int32
                    )
                    thetas = parent_thetas[pidx] + power * eps
                if has_ref_batch:
                    stats = model.batch_ref_stats(thetas, ref_batch)
                    params = (thetas, stats)
                else:
                    params = (thetas, None)
                res = rollout_batch(
                    env, act_fn, params, jax.random.split(kroll, n_per_device), tslimit
                )
                return carry, (pidx, midx, res.returns, res.lengths, res.bc)

            _, outs = jax.lax.scan(body, None, rkeys)
            return jax.tree_util.tree_map(lambda x: x.reshape((-1,) + x.shape[2:]), outs)

        @jax.jit
        def step(parent_thetas, table, keys, tslimit, power, scale_by, ref_batch=None):
            if ref_batch is None:
                ref_batch = jnp.zeros((0,), jnp.float32)
            return PodGAResult(
                *gen_step(parent_thetas, table, keys, tslimit, power, scale_by, ref_batch)
            )

        return step

    steps = {True: build(True), False: build(False)}

    def dispatch(parent_thetas, table, keys, tslimit, power, scale_by, ref_batch=None):
        randomize = parent_thetas is None or parent_thetas.shape[0] == 0
        if randomize:
            parent_thetas = jnp.zeros((1, dim), jnp.float32)
        return steps[randomize](parent_thetas, table, keys, tslimit, power, scale_by, ref_batch)

    return dispatch

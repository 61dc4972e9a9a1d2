"""Rollout loop for host-engine envs (Atari/ALE): C++ simulators on the
host, policy forward + preprocessing on the device.

This is the TPU analog of the reference GPU stack's fused step graph
(neuroevolution/concurrent_worker.py:58-67: C++ obs → palette/max/resize →
indexed-matmul forward → argmax → C++ step, driven by per-worker threads).
Here the device half (preprocess → stack → vmapped per-member forward →
argmax) is one jitted function; the host half is the thread-pooled batched
C++ engine. JAX's async dispatch overlaps the device computation of step t
with the host simulators finishing step t; observations transfer as uint8
(tf_atari.py:88-90 does the same; ~67KB/slot/step) and all image math runs
on device.

Episode accounting (returns/sign-returns/lengths/done-masking/BC) matches
the device rollout engine (rollout.py) so both env families feed the same
algorithm layer.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..envs.preprocess import (
    preprocess_frames, preprocess_gray_frames, scale_preproc_frames,
    stack_reset, stack_step,
)
from .rollout import RolloutResult


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _device_step(
    act_fn: Callable,
    params,
    stack: jax.Array,  # [B, h, w, 4] f32
    keys: jax.Array,  # [B] per-EPISODE keys; folded with t in-kernel
    out_h: int,
    out_w: int,
    mode: str,
    frames: jax.Array,  # [B, 2, H, W] uint8 raw / [B, h, w] engine-preprocessed
    t: jax.Array,  # scalar int32 step index
):
    """Preprocess new frames into the stack, then select actions. `mode`
    is the env's obs_mode: 'indexed' (device palette gather), 'gray'
    (engine LUT, device max+resize), 'preproc' (engine does everything,
    device only scales — ~10× fewer bytes on the host→device link, which
    measured ~40 MB/s through a relay tunnel and dominated the step). The
    per-step key fold happens HERE (not in a separate host-side vmap jit):
    on a tunnel/relay chip every extra dispatch costs a full RTT per step."""
    if mode == "preproc":
        obs = scale_preproc_frames(frames)
    else:
        pre = preprocess_gray_frames if mode == "gray" else preprocess_frames
        obs = pre(frames, out_h, out_w)
    new_stack = stack_step(stack, obs)
    tkeys = jax.vmap(lambda k: jax.random.fold_in(k, t))(keys)
    actions = act_fn(params, new_stack, tkeys)
    return new_stack, actions


@partial(jax.jit, static_argnums=(1, 2, 3))
def _device_reset(frames: jax.Array, out_h: int, out_w: int, mode: str = "indexed"):
    if mode == "preproc":
        return stack_reset(scale_preproc_frames(frames))
    pre = preprocess_gray_frames if mode == "gray" else preprocess_frames
    return stack_reset(pre(frames, out_h, out_w))


def _slice_group_params(params, sl: slice, B: int):
    """Per-group view of (thetas [B, D], ctx). ctx is sliced only when EVERY
    leaf is stacked per member (VBN stats, [B, ...]); shared ctx pytrees
    (obs-norm MLPContext with a scalar flag leaf) pass through whole.
    Bare params (None, or anything but a (thetas, ctx) pair — e.g. a fixed
    policy closure ignoring its params, concurrent_worker.py:93-102's
    callback-driven tasks carry arbitrary payloads) pass through unsliced."""
    if params is None or not (isinstance(params, tuple) and len(params) == 2):
        return params
    thetas, ctx = params
    if ctx is not None:
        leaves = jax.tree_util.tree_leaves(ctx)
        if leaves and all(
            hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == B for leaf in leaves
        ):
            ctx = jax.tree_util.tree_map(lambda leaf: leaf[sl], ctx)
    return thetas[sl], ctx


def rollout_host_batch(
    henv,
    act_fn: Callable,
    params,
    key: jax.Array,
    timestep_limit: int,
    out_hw: int = 84,
    noops: Optional[np.ndarray] = None,
    collect_obstat: bool = False,
    pipeline_groups: Optional[int] = None,
    collect_bc_traj: bool = False,
    obstat_prob: Optional[float] = None,
    obstat_valid: Optional[np.ndarray] = None,
    n_slots: Optional[int] = None,
    mirror_pairs: bool = False,
) -> RolloutResult:
    """Evaluate B policies on the B host-engine slots, one episode each.

    `mirror_pairs` (opt-in): rows i and i+B/2 share the environment's
    random stream — same noop count, same engine episode seed, same
    rollout key. With the antithetic [θ+σε block; θ−σε block] layout this
    is mirrored sampling with common random numbers: the pair's fitness
    DIFFERENCE isolates the perturbation effect instead of episode luck.
    An extension beyond the reference (its pop-5000 fleets average luck
    out, es.py:230-265); OFF by default — the default path is
    bit-identical to r4.

    `n_slots` runs only slots [0, n): eval passes harvest a handful of
    noiseless episodes (es.py:388-405) and stepping all 256 engine slots —
    plus shipping their full frame batches over the device link — for 8
    results was measured to double the generation cost on a relay chip.

    `timestep_limit` counts engine steps (= frameskip·4 emulator frames,
    matching the reference's max_frames = tslimit·4 margin handling at the
    caller, gpu es.py:197).

    Host/device overlap: slots are split into `pipeline_groups` interleaved
    groups (default: the env's `pipeline_groups` attr). While the device
    computes group g's next actions (dispatched async), the host pool steps
    group g+1's simulators — the SPMD analog of the reference's 4 worker
    objects per GPU (concurrent_worker.py:129-142, whose point was exactly
    this CPU/GPU overlap, gpu_implementation/README.md:3). Per-slot RNG keys
    are group-independent, so results are bit-identical for any G."""
    B = henv.batch_size
    sub = None
    if n_slots is not None and n_slots < B:
        B = max(int(n_slots), 1)
        sub = np.arange(B, dtype=np.int32)
    G = pipeline_groups if pipeline_groups is not None else getattr(henv, "pipeline_groups", 1)
    if G < 1 or B % G != 0:
        G = 1
    Bg = B // G
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    ep_seeds = None
    if mirror_pairs:
        assert B % 2 == 0, "mirror_pairs needs an even slot count"
        half = B // 2
        if noops is None:
            noops = np.tile(rng.integers(1, 31, size=half), 2)
        ep_seeds = np.tile(rng.integers(1, 2**31 - 1, size=half, dtype=np.int64), 2).astype(np.int32)
    elif noops is None:
        noops = rng.integers(1, 31, size=B)  # tf_atari.py:65
    # per-ROLLOUT Bernoulli obs-stat sampling (es.py:356-363: the worker
    # draws rs.rand() < obstat_prob once per rollout)
    obstat_mask = (
        rng.random(B) < obstat_prob if (collect_obstat and obstat_prob is not None)
        else np.ones(B, bool)
    )
    if ep_seeds is None and getattr(getattr(henv, "_env", None), "_lib", None) is not None and \
            getattr(henv._env._lib, "nevo_has_seeded", False):
        # fresh per-episode engine seeds every call (drawn at the END of the
        # host rng stream so noop/obstat draws stay identical to the r4
        # path): without them, backends whose episode randomness is consumed
        # only at discrete events replay near-identical episodes for equal
        # noop counts — eval curves then quantize to a fixed episode set
        ep_seeds = rng.integers(1, 2**31 - 1, size=B, dtype=np.int64).astype(np.int32)
    if obstat_valid is not None:
        # padded duplicate slots (under-filled host-pod sub-rounds) must not
        # bias the obs moments toward the repeated member — the reference
        # accumulates per REAL rollout only (es.py:356-363). ANDed after the
        # Bernoulli draw so the RNG stream (and thus bit-identity across
        # emulated vs real pod runs) is unchanged.
        obstat_mask &= np.asarray(obstat_valid, bool)
    if ep_seeds is not None:
        henv.reset(indices=sub, noops=noops, max_frames=timestep_limit * 4,
                   seeds=ep_seeds)
    else:
        henv.reset(indices=sub, noops=noops, max_frames=timestep_limit * 4)
    mode = getattr(henv, "obs_mode", "indexed")

    frames0 = henv.observe(indices=sub) if sub is not None else henv.observe()
    if mirror_pairs:
        half_keys = jax.random.split(key, B // 2)
        keys = jnp.concatenate([half_keys, half_keys], axis=0)
    else:
        keys = jax.random.split(key, B)
    sls = [slice(g * Bg, (g + 1) * Bg) for g in range(G)]
    gidx = [np.arange(g * Bg, (g + 1) * Bg, dtype=np.int32) for g in range(G)]
    prep = getattr(act_fn, "prepare", None)
    params_g = [_slice_group_params(params, s, B) for s in sls]
    if prep is not None:
        # hoist per-member unflatten/casts out of the per-step dispatches
        params_g = [prep(p) for p in params_g]
    keys_g = [keys[s] for s in sls]
    stacks = [_device_reset(jnp.asarray(frames0[s]), out_hw, out_hw, mode) for s in sls]
    actions_dev = [
        act_fn(params_g[g], stacks[g], jax.vmap(lambda k: jax.random.fold_in(k, 0))(keys_g[g]))
        for g in range(G)
    ]

    done = np.zeros(B, bool)
    ret = np.zeros(B, np.float32)
    sret = np.zeros(B, np.float32)
    length = np.zeros(B, np.int32)
    ob_sum = np.zeros((out_hw, out_hw, 4), np.float32)
    ob_sumsq = np.zeros((out_hw, out_hw, 4), np.float32)
    ob_count = 0.0

    trajs = [[] for _ in range(B)] if collect_bc_traj else None
    for t in range(timestep_limit):
        if done.all():
            break
        alive_t = ~done  # slots taking step t
        for g in range(G):
            galive = ~done[sls[g]]
            if not galive.any():
                continue
            acts = np.asarray(actions_dev[g])  # sync THIS group only
            # host: step only the still-running simulators — the lockstep
            # analog of dynamic slot recycling (concurrent_worker.py:93-102)
            alive_idx = gidx[g][galive]
            r_sub, d_sub = henv.step(acts[galive], indices=alive_idx)
            frames_g = henv.observe(indices=gidx[g])
            if collect_obstat:
                s_np = np.asarray(stacks[g])
                gmask = galive & obstat_mask[sls[g]]
                ob_sum += s_np[gmask].sum(axis=0)
                ob_sumsq += np.square(s_np[gmask]).sum(axis=0)
                ob_count += float(gmask.sum())
            # device: fold new frames into the stack and pick next actions —
            # dispatched async, overlapping the NEXT group's host step (the
            # key fold rides inside the same dispatch)
            stacks[g], actions_dev[g] = _device_step(
                act_fn, params_g[g], stacks[g], keys_g[g], out_hw, out_hw, mode,
                jnp.asarray(frames_g), jnp.int32(t + 1),
            )
            ret[alive_idx] += r_sub
            sret[alive_idx] += np.sign(r_sub)
            length[alive_idx] += 1
            done[alive_idx] |= d_sub
        if collect_bc_traj:
            # per-step BC: the RAM vector appended at EVERY policy step a
            # slot is alive (ESAtariPolicy.rollout, policies.py:410-418) —
            # ragged across slots, compared with the length-tolerant
            # euclidean (nses.py:12-20)
            ram_t = henv.final_state()
            for b in np.nonzero(alive_t)[0]:
                trajs[b].append(ram_t[b])

    bc = henv.final_state()[:B]  # RAM bytes (tf_atari.cpp:114-119) as the BC
    return RolloutResult(
        jnp.asarray(ret),
        jnp.asarray(sret),
        jnp.asarray(length),
        jnp.asarray(bc),
        jnp.asarray(ob_sum),
        jnp.asarray(ob_sumsq),
        jnp.asarray(ob_count, jnp.float32),
        tuple(np.concatenate(tr) if tr else np.zeros(0, np.float32) for tr in trajs)
        if collect_bc_traj
        else None,
    )


@partial(jax.jit, static_argnums=(0,))
def _device_act(act_fn: Callable, params, obs: jax.Array, keys: jax.Array):
    return act_fn(params, obs, keys)


def rollout_host_vec(
    henv,
    act_fn: Callable,
    params,
    key: jax.Array,
    timestep_limit: int,
    collect_obstat: bool = False,
    obstat_prob: Optional[float] = None,
    obstat_valid: Optional[np.ndarray] = None,
    n_slots: Optional[int] = None,
) -> RolloutResult:
    """Vector-observation host rollout (MuJoCo family): raw [B, obs_dim]
    observations go straight to the vmapped device forward — no image
    preprocessing, no frame stack. Episode semantics mirror the reference's
    MujocoPolicy.rollout (policies.py:258-302): per-step obs → act → step,
    clamp to min(timestep_limit, env episode cap), obs-stat accumulation
    over *raw* observations (policies.py:279-281 save_obs collects
    pre-normalization obs), BC from the env's mass-center tracking."""
    B = henv.batch_size
    sub = None
    if n_slots is not None and n_slots < B:
        B = max(int(n_slots), 1)
        sub = np.arange(B, dtype=np.int32)
    prep = getattr(act_fn, "prepare", None)
    if prep is not None:
        params = prep(params)
    tslimit = min(int(timestep_limit), getattr(henv, "max_episode_steps", timestep_limit))
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    # per-rollout Bernoulli obs-stat sampling (es.py:356-363; save_obs is
    # gated per worker rollout on the CPU stack, policies.py:279-281)
    obstat_mask = (
        rng.random(B) < obstat_prob if (collect_obstat and obstat_prob is not None)
        else np.ones(B, bool)
    )
    if obstat_valid is not None:
        # see rollout_host_batch: padded slots excluded, RNG stream unchanged
        obstat_mask &= np.asarray(obstat_valid, bool)
    henv.reset(indices=sub, seeds=rng.integers(0, 2**31 - 1, size=B))

    done = np.zeros(B, bool)
    ret = np.zeros(B, np.float32)
    sret = np.zeros(B, np.float32)
    length = np.zeros(B, np.int32)
    ob_sum = np.zeros(henv.obs_shape, np.float32)
    ob_sumsq = np.zeros(henv.obs_shape, np.float32)
    ob_count = 0.0

    keys = jax.random.split(key, B)
    obs = henv.observe()[:B]
    t = 0
    while not done.all() and t < tslimit:
        tkeys = jax.vmap(lambda k: jax.random.fold_in(k, t))(keys)
        actions = np.asarray(_device_act(act_fn, params, jnp.asarray(obs), tkeys))
        alive_idx = np.nonzero(~done)[0].astype(np.int32)
        if collect_obstat:
            oidx = np.nonzero(~done & obstat_mask)[0]
            ob_sum += obs[oidx].sum(axis=0)
            ob_sumsq += np.square(obs[oidx]).sum(axis=0)
            ob_count += float(oidx.size)
        r_sub, d_sub = henv.step(actions[alive_idx], indices=alive_idx)
        alive = ~done
        ret[alive_idx] += r_sub
        sret[alive_idx] += np.sign(r_sub)
        length[alive] += 1
        done[alive_idx] |= d_sub
        obs = henv.observe()[:B]
        t += 1

    bc = henv.final_state()[:B]
    return RolloutResult(
        jnp.asarray(ret),
        jnp.asarray(sret),
        jnp.asarray(length),
        jnp.asarray(bc),
        jnp.asarray(ob_sum),
        jnp.asarray(ob_sumsq),
        jnp.asarray(ob_count, jnp.float32),
    )


def rollout_host(
    henv,
    act_fn: Callable,
    params,
    key: jax.Array,
    timestep_limit: int,
    collect_obstat: bool = False,
    collect_bc_traj: bool = False,
    obstat_prob: Optional[float] = None,
    obstat_valid: Optional[np.ndarray] = None,
    n_slots: Optional[int] = None,
    mirror_pairs: bool = False,
) -> RolloutResult:
    """Dispatch on the host env's observation kind: 'image' engines
    (Atari/ALE, preprocess+stack on device) vs 'vector' engines (MuJoCo)."""
    if getattr(henv, "host_obs", "image") == "vector":
        return rollout_host_vec(
            henv, act_fn, params, key, timestep_limit,
            collect_obstat=collect_obstat, obstat_prob=obstat_prob,
            obstat_valid=obstat_valid, n_slots=n_slots,
        )
    return rollout_host_batch(
        henv,
        act_fn,
        params,
        key,
        timestep_limit,
        out_hw=henv.warp_size,
        collect_obstat=collect_obstat,
        collect_bc_traj=collect_bc_traj,
        obstat_prob=obstat_prob,
        obstat_valid=obstat_valid,
        n_slots=n_slots,
        mirror_pairs=mirror_pairs,
    )


def collect_ref_batch_host(henv, key: jax.Array, batch_size: int = 128, out_hw: int = 84):
    """Random-policy stacked-obs collection for VBN on a host env
    (gym_tensorflow/__init__.py:17-37 get_ref_batch)."""
    B = henv.batch_size
    seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    henv.reset(noops=rng.integers(1, 31, size=B))
    mode = getattr(henv, "obs_mode", "indexed")
    stack = _device_reset(jnp.asarray(henv.observe()), out_hw, out_hw, mode)
    collected = []
    while sum(x.shape[0] for x in collected) < batch_size:
        acts = rng.integers(0, henv.num_actions, size=B).astype(np.int32)
        _, d = henv.step(acts)
        frames = henv.observe()
        if mode == "preproc":
            obs = scale_preproc_frames(jnp.asarray(frames))
        else:
            pre = preprocess_gray_frames if mode == "gray" else preprocess_frames
            obs = pre(jnp.asarray(frames), out_hw, out_hw)
        stack = stack_step(stack, obs)
        collected.append(np.asarray(stack))
        # restart any finished slots so frames keep flowing
        if d.any():
            idx = np.nonzero(d)[0].astype(np.int32)
            henv.reset(indices=idx, noops=rng.integers(1, 31, size=idx.size))
    out = np.concatenate(collected, axis=0)[:batch_size]
    return jnp.asarray(out)

"""Benchmark: on-device ES generation throughput (env frames/s).

Workload: full ES generations on the device-side Hard Maze (the reference's
C++ host env, here running entirely on the TPU) with the ContinuousMLP
policy at population 5000 — the population scale of the headline Frostbite
ES config (configurations/frostbite_es.json: 5000 episodes/gen). Until the
native batched-ALE host engine lands, this measures the full population
engine: per-member perturbation gather, vmapped policy forward, lockstep env
stepping, rank transform, streamed gradient, Adam — everything the
generation loop does, fused on device.

Baseline denominator: the reference's CPU cluster ran ES with ~720 cores
(README lineage, arXiv:1703.03864); at the commonly-measured ~500
env-steps/s/core for feedforward-policy rollout loops that is ~360k
frames/s for the whole cluster. vs_baseline = our frames/s on ONE chip
divided by that cluster estimate.

Prints exactly one JSON line on stdout.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_CPU_CLUSTER_FPS = 360_000.0  # 720 cores × ~500 steps/s (documented estimate)

POP = 5000  # episodes per generation (frostbite_es.json scale)
GENS_WARMUP = 4  # first invocations pay compile + runtime warm-up
GENS_MEASURED = 10


def main():
    from deep_neuroevolution_tpu.envs import MazeEnv
    from deep_neuroevolution_tpu.models import ContinuousMLP
    from deep_neuroevolution_tpu.ops import Adam, NoiseTable
    from deep_neuroevolution_tpu.parallel.es_pod import make_pod_es_step
    from deep_neuroevolution_tpu.parallel.mesh import make_pop_mesh

    mesh = make_pop_mesh()
    n_dev = mesh.devices.size
    npairs_per_device = POP // (2 * n_dev)

    env = MazeEnv()
    model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=16)
    opt = Adam(stepsize=0.05)
    use_pallas = jax.devices()[0].platform in ("tpu", "axon")
    step = make_pod_es_step(
        env, model, opt, mesh, npairs_per_device=npairs_per_device, use_pallas_grad=use_pallas
    )

    table = NoiseTable.from_seed(count=5_000_000)
    theta = model.init_theta(jax.random.PRNGKey(0))
    opt_state = opt.init(model.num_params)
    tslimit = jnp.int32(env.default_timestep_cutoff)
    sigma = jnp.float32(0.05)

    def one_gen(theta, opt_state, i):
        keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(7), i), n_dev)
        res = step(theta, opt_state, table.noise, keys, tslimit, sigma)
        return res

    # warmup: compile + runtime warm-up
    res = one_gen(theta, opt_state, 0)
    res.theta.block_until_ready()
    for i in range(1, GENS_WARMUP):
        res = one_gen(res.theta, res.opt_state, i)
        res.theta.block_until_ready()

    t0 = time.time()
    frames = 0
    for i in range(GENS_WARMUP, GENS_WARMUP + GENS_MEASURED):
        res = one_gen(res.theta, res.opt_state, i)
        frames += int(np.asarray(res.lengths_n2).sum())
    res.theta.block_until_ready()
    dt = time.time() - t0

    fps = frames / dt
    print(
        json.dumps(
            {
                "metric": f"maze_es_frames_per_s_pop{POP}",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / REF_CPU_CLUSTER_FPS, 3),
            }
        )
    )
    print(
        f"devices={n_dev} pairs/dev={npairs_per_device} frames={frames} "
        f"wall={dt:.2f}s gen_wall={dt / GENS_MEASURED:.2f}s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

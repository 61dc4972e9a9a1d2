"""MuJoCo host-engine path: golden episode accounting vs plain gymnasium,
mass-center BC semantics (policies.py:252-302), and ES end-to-end.

Uses InvertedPendulum-v5 (cheapest MuJoCo model) for the engine tests and a
brief Humanoid instantiation for the headline-workload wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("mujoco")
gym = pytest.importorskip("gymnasium")

from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
from deep_neuroevolution_tpu.algos.rollout_host import rollout_host, rollout_host_vec
from deep_neuroevolution_tpu.envs.mujoco import (
    MujocoHostEnv,
    _mass_center_xy,
    deceptive_humanoid_xml,
    resolve_env_id,
)
from deep_neuroevolution_tpu.models import MujocoMLP
from deep_neuroevolution_tpu.ops import optim
from deep_neuroevolution_tpu.ops.noise import NoiseTable


def _make_model(env, hidden=(16, 16), ac_noise_std=0.0):
    return MujocoMLP(
        obs_dim=env.obs_shape[0],
        ac_dim=env.action_space.dim,
        ac_low=env.action_space.low,
        ac_high=env.action_space.high,
        hidden_dims=hidden,
        ac_noise_std=ac_noise_std,
    )


class TestEnvIdResolution:
    def test_reference_era_ids_map_to_registered_versions(self):
        # the reference's humanoid.json names Humanoid-v1
        rid = resolve_env_id("Humanoid-v1")
        assert rid.startswith("Humanoid-v")
        assert rid in gym.registry

    def test_registered_id_kept(self):
        assert resolve_env_id("InvertedPendulum-v5") == "InvertedPendulum-v5"


class TestMassCenter:
    def test_matches_gymnasium_mass_center(self):
        """Our Σmᵢ·xiposᵢ/Σm (policies.py:252-257) must agree with
        gymnasium's independent mass_center implementation (the reward's
        forward-progress measure)."""
        from gymnasium.envs.mujoco.humanoid_v5 import mass_center

        env = gym.make("Humanoid-v5")
        env.reset(seed=3)
        for _ in range(5):
            env.step(env.action_space.sample())
        x, y = _mass_center_xy(env)
        gx, gy = mass_center(env.unwrapped.model, env.unwrapped.data)
        assert abs(x - gx) < 1e-12
        assert abs(y - gy) < 1e-12
        env.close()


class TestEngineGolden:
    def test_episode_accounting_matches_plain_gym(self):
        """Zero policy (θ=0 MLP ⇒ action 0), identical per-slot seeds: the
        batched engine must report exactly the returns/lengths of a plain
        gymnasium loop."""
        B, T = 4, 60
        henv = MujocoHostEnv("InvertedPendulum-v5", batch_size=B)
        model = _make_model(henv)
        theta = jnp.zeros((model.num_params,), jnp.float32)
        thetas = jnp.broadcast_to(theta, (B,) + theta.shape)
        key = jax.random.PRNGKey(0)
        res = rollout_host_vec(
            henv, model.make_batch_act(), (thetas, None), key, T
        )

        # replicate seed derivation (rollout_host_vec)
        seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
        seeds = np.random.default_rng(seed).integers(0, 2**31 - 1, size=B)
        for i in range(B):
            e = gym.make("InvertedPendulum-v5")
            e.reset(seed=int(seeds[i]))
            ret, t, done = 0.0, 0, False
            while not done and t < T:
                _, r, term, trunc, _ = e.step(np.zeros(1))
                ret += r
                t += 1
                done = term or trunc
            assert abs(float(res.returns[i]) - ret) < 1e-5, i
            assert int(res.lengths[i]) == t, i
            e.close()
        henv.close()

    def test_bc_final_pos_and_traj_padding(self):
        """'traj' BC: positions past episode end hold the final mass center
        (policies.py:295-297); layout is (x_0..x_T, y_0..y_T)."""
        B, T = 2, 10
        henv = MujocoHostEnv(
            "InvertedPendulum-v5", batch_size=B, bc_mode="traj", traj_len=T
        )
        assert henv.bc_dim == 2 * T
        model = _make_model(henv)
        thetas = jnp.zeros((B, model.num_params), jnp.float32)
        res = rollout_host_vec(
            henv, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(1), T
        )
        bc = np.asarray(res.bc)
        for i in range(B):
            t = int(res.lengths[i])
            xs, ys = bc[i, :T], bc[i, T:]
            if t < T:  # padded tail is constant at the last position
                assert np.all(xs[t:] == xs[t - 1])
                assert np.all(ys[t:] == ys[t - 1])
        henv.close()

    def test_obstat_collection_is_raw_obs(self):
        B, T = 2, 5
        henv = MujocoHostEnv("InvertedPendulum-v5", batch_size=B)
        model = _make_model(henv)
        thetas = jnp.zeros((B, model.num_params), jnp.float32)
        res = rollout_host_vec(
            henv,
            model.make_batch_act(),
            (thetas, None),
            jax.random.PRNGKey(2),
            T,
            collect_obstat=True,
        )
        assert res.ob_sum.shape == henv.obs_shape
        assert float(res.ob_count) == float(np.asarray(res.lengths).sum())
        henv.close()


class TestESOnMujoco:
    def test_es_trains_inverted_pendulum(self):
        """Two ES generations on the vector host path produce finite stats
        and consistent episode accounting."""
        henv = MujocoHostEnv("InvertedPendulum-v5", batch_size=8)
        model = _make_model(henv, ac_noise_std=0.01)
        cfg = ESConfig(
            population_size=8,
            noise_stdev=0.05,
            episode_cutoff_mode=50,
            calc_obstat_prob=1.0,
            num_eval_episodes=2,
        )
        tr = ESTrainer(
            henv,
            model,
            cfg,
            optimizer=optim.Adam(stepsize=0.05),
            noise_table=NoiseTable.from_seed(count=100_000),
            seed=0,
        )
        for _ in range(2):
            tr.train_step()
        s = tr.state
        assert s.episodes_so_far == 16
        assert np.isfinite(np.asarray(s.theta)).all()
        assert float(jnp.abs(s.theta).sum()) > 0  # an update happened
        assert float(s.ob_stat.count) > 1  # obstat flowed in
        henv.close()


class TestHumanoidWorkload:
    def test_humanoid_config_wires_up(self):
        """configurations/humanoid.json (the reference headline MuJoCo
        workload) must resolve to a real Humanoid host env + 256×256 MLP."""
        import json

        from deep_neuroevolution_tpu.utils.config import load_experiment

        with open("configurations/humanoid.json") as f:
            exp = json.load(f)
        tr = load_experiment(
            exp, seed=0, overrides={"env_kwargs": {"batch_size": 2}, "noise_size": 400_000}
        )
        assert tr.env.env_id.startswith("Humanoid-v")
        assert tr.model.hidden_dims == (256, 256)
        assert tr.model.needs_ob_stat
        assert tr.env.obs_shape[0] >= 300
        tr.env.close()

    def test_dispatcher_routes_vector_envs(self):
        henv = MujocoHostEnv("InvertedPendulum-v5", batch_size=2)
        model = _make_model(henv)
        thetas = jnp.zeros((2, model.num_params), jnp.float32)
        res = rollout_host(
            henv, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(0), 5
        )
        assert res.returns.shape == (2,)
        henv.close()

    def test_nses_trap_config_trains_one_step(self):
        """configurations/humanoid_nses.json — the deceptive-humanoid NS-ES
        experiment (reference extra/humanoid_maze.xml + README.md:82-84):
        trap world resolves, NSESTrainer runs a full step, archive grows."""
        import json

        from deep_neuroevolution_tpu.algos.nses import NSESTrainer
        from deep_neuroevolution_tpu.utils.config import load_experiment

        with open("configurations/humanoid_nses.json") as f:
            exp = json.load(f)
        tr = load_experiment(
            exp,
            seed=0,
            overrides={
                "env_kwargs": {"batch_size": 4},
                "episodes_per_batch": 4,
                "timesteps_per_batch": 1,
                "noise_size": 400_000,
                "episode_cutoff_mode": 30,
            },
        )
        assert isinstance(tr, NSESTrainer)
        assert tr.env.bc_dim == 2  # final mass-center (x, y)
        import mujoco as mj

        names = [
            mj.mj_id2name(tr.env._envs[0].unwrapped.model, mj.mjtObj.mjOBJ_GEOM, g)
            for g in range(tr.env._envs[0].unwrapped.model.ngeom)
        ]
        assert "trap_front" in names
        n0 = int(tr.archive.count)
        tr.train_step()
        assert int(tr.archive.count) == n0 + 1  # parent mean-BC inserted
        tr.env.close()

    def test_deceptive_world_builds(self):
        """NS-ES deceptive-humanoid world (reference extra/humanoid_maze.xml
        analog): trap geoms injected, model compiles, env steps."""
        import mujoco as mj

        path = deceptive_humanoid_xml()
        m = mj.MjModel.from_xml_path(path)
        names = [mj.mj_id2name(m, mj.mjtObj.mjOBJ_GEOM, g) for g in range(m.ngeom)]
        assert {"trap_front", "trap_left", "trap_right"} <= set(names)
        env = gym.make("Humanoid-v5", xml_file=path)
        env.reset(seed=0)
        env.step(env.action_space.sample())
        env.close()

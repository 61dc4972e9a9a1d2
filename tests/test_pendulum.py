"""Pendulum env: physics golden-parity with gym's formulas + MujocoMLP ES smoke."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_neuroevolution_tpu.envs import PendulumEnv, make
from deep_neuroevolution_tpu.envs.pendulum import DT, EPISODE_STEPS, G, L, M


def gym_step(th, thdot, u):
    """gym pendulum.py update, hand-computed."""
    u = np.clip(u, -2.0, 2.0)
    angle_norm = ((th + np.pi) % (2 * np.pi)) - np.pi
    cost = angle_norm**2 + 0.1 * thdot**2 + 0.001 * u**2
    newthdot = thdot + (3 * G / (2 * L) * np.sin(th) + 3.0 / (M * L**2) * u) * DT
    newthdot = np.clip(newthdot, -8.0, 8.0)
    newth = th + newthdot * DT
    return newth, newthdot, -cost


class TestPendulumPhysics:
    def test_matches_gym_formula_trajectory(self):
        env = PendulumEnv()
        s = env.reset(jax.random.PRNGKey(0))
        th, thdot = float(s.theta), float(s.theta_dot)
        rs = np.random.RandomState(0)
        for t in range(50):
            u = float(rs.uniform(-2, 2))
            s, r, d = env.step(s, jnp.asarray([u]), None)
            th, thdot, expect_r = gym_step(th, thdot, u)
            np.testing.assert_allclose(float(s.theta), th, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(float(s.theta_dot), thdot, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(float(r), expect_r, rtol=1e-4, atol=1e-5)
        assert not bool(d)

    def test_episode_length_and_obs(self):
        env = PendulumEnv()
        s = env.reset(jax.random.PRNGKey(1))
        obs = np.asarray(env.observe(s))
        np.testing.assert_allclose(obs[0] ** 2 + obs[1] ** 2, 1.0, rtol=1e-5)
        d = False
        steps = 0
        while not d:
            s, _, d = env.step(s, jnp.zeros(1), None)
            steps += 1
        assert steps == EPISODE_STEPS

    def test_registry(self):
        assert isinstance(make("gym.Pendulum-v1"), PendulumEnv)


class TestPendulumES:
    def test_mujoco_mlp_es_runs(self):
        from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
        from deep_neuroevolution_tpu.models import MujocoMLP
        from deep_neuroevolution_tpu.ops import Adam, NoiseTable
        from deep_neuroevolution_tpu.utils import tabular

        tabular.dump_tabular = lambda: tabular._logger._kvs.clear()
        env = PendulumEnv()
        model = MujocoMLP(
            obs_dim=3, ac_dim=1, ac_low=(-2.0,), ac_high=(2.0,),
            ac_bins="continuous:", hidden_dims=(16,), ac_noise_std=0.01,
        )
        cfg = ESConfig(
            noise_stdev=0.1, population_size=64, num_eval_episodes=4, calc_obstat_prob=1.0
        )
        tr = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.05),
                       noise_table=NoiseTable.from_seed(count=200_000), seed=0)
        st = tr.train_step()
        assert np.isfinite(st.returns).all()
        assert np.all(st.returns < 0)  # pendulum rewards are negative costs
        # ob stats accumulated (calc_obstat_prob=1, needs_ob_stat policy)
        assert float(tr.state.ob_stat.count) > 1.0
        st2 = tr.train_step()
        assert tr.state.iteration == 2

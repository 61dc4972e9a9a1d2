"""Env semantics tests: maze parity with maze.h, cartpole physics, rollout
engine invariants."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_neuroevolution_tpu.envs import CartPoleEnv, MazeEnv, make
from deep_neuroevolution_tpu.envs.maze import (
    EPISODE_STEPS,
    HARD_MAZE_TXT,
    parse_maze,
    _point_angle,
)
from deep_neuroevolution_tpu.algos import collect_ref_batch, rollout_batch, rollout_batch_scan


class TestMazeParity:
    def test_parse(self):
        cfg = parse_maze(HARD_MAZE_TXT)
        assert cfg["start"] == (36.0, 184.0)
        assert cfg["end"] == (31.0, 20.0)
        assert cfg["segs"].shape == (13, 4)
        assert cfg["steps"] == 400

    def test_reference_file_identical(self):
        """Embedded maze must match the reference's hard_maze.txt when present."""
        import pathlib

        p = pathlib.Path("/root/reference/gpu_implementation/gym_tensorflow/maze/hard_maze.txt")
        if p.exists():
            ours = parse_maze(HARD_MAZE_TXT)
            theirs = parse_maze(p.read_text())
            np.testing.assert_array_equal(ours["segs"], theirs["segs"])
            assert ours["start"] == theirs["start"] and ours["end"] == theirs["end"]

    def test_point_angle_quadrants(self):
        # maze.h:144-160 semantics
        assert float(_point_angle(jnp.float32(0.0), jnp.float32(5.0))) == 90.0
        assert float(_point_angle(jnp.float32(0.0), jnp.float32(-5.0))) == 270.0
        np.testing.assert_allclose(float(_point_angle(jnp.float32(1.0), jnp.float32(1.0))), 45.0, rtol=1e-4)
        np.testing.assert_allclose(float(_point_angle(jnp.float32(-1.0), jnp.float32(1.0))), 135.0, rtol=1e-4)
        np.testing.assert_allclose(float(_point_angle(jnp.float32(-1.0), jnp.float32(-1.0))), 225.0, rtol=1e-4)
        # x>0, y<0 → negative angle (reference returns raw atan)
        np.testing.assert_allclose(float(_point_angle(jnp.float32(1.0), jnp.float32(-1.0))), -45.0, rtol=1e-4)

    def test_initial_observation(self):
        env = MazeEnv()
        s = env.reset(jax.random.PRNGKey(0))
        obs = np.asarray(env.observe(s))
        assert obs.shape == (11,)
        assert obs[0] == 1.0  # bias (maze.h:557)
        assert np.all(obs[1:7] >= 0) and np.all(obs[1:7] <= 1.0)  # rangefinders/100
        # start (36,184) heading 0 (+x): goal (31,20) is at relative angle
        # ~268° → radar quadrant [225,315)
        np.testing.assert_array_equal(obs[7:], [0, 0, 0, 1])

    def test_zero_action_stays_put(self):
        env = MazeEnv()
        s = env.reset(jax.random.PRNGKey(0))
        for _ in range(5):
            s, r, d = env.step(s, jnp.zeros(2), None)
        assert float(s.x) == 36.0 and float(s.y) == 184.0
        assert float(r) == 0.0 and not bool(d)

    def test_episode_end_reward_is_neg_distance(self):
        env = MazeEnv()
        s = env.reset(jax.random.PRNGKey(0))
        r = d = None
        for _ in range(EPISODE_STEPS):
            s, r, d = env.step(s, jnp.zeros(2), None)
        assert bool(d)
        np.testing.assert_allclose(float(r), -float(env.distance_to_target(s)), rtol=1e-5)
        # stayed at start → distance start→goal
        np.testing.assert_allclose(-float(r), np.hypot(36 - 31, 184 - 20), rtol=1e-5)

    def test_wall_collision_blocks(self):
        env = MazeEnv()
        s = env.reset(jax.random.PRNGKey(0))
        # drive straight +x at max speed; wall segment x=56 (56 54 56 157)
        # spans y 54..157, start y=184 → not blocking; outer wall at x≈195
        # (7 202 195 198 and 195 198 186 8) must stop the agent
        a = jnp.asarray([0.0, 0.5])
        for _ in range(100):
            s, _, _ = env.step(s, a, None)
        assert float(s.x) < 195.0  # blocked by outer wall w/ radius 8

    def test_speed_and_turn_limits(self):
        env = MazeEnv()
        s = env.reset(jax.random.PRNGKey(0))
        a = jnp.asarray([0.5, 0.5])  # hard turn + accelerate
        for _ in range(50):
            s, _, _ = env.step(s, a, None)
        assert abs(float(s.speed)) <= 3.0 and abs(float(s.ang_vel)) <= 3.0
        assert 0.0 <= float(s.heading) <= 360.0

    def test_behavior_is_position(self):
        env = MazeEnv()
        s = env.reset(jax.random.PRNGKey(0))
        bc = np.asarray(env.behavior(s))
        np.testing.assert_array_equal(bc, [36.0, 184.0])


class TestCartPole:
    def test_balances_briefly_with_bangbang(self):
        env = CartPoleEnv()
        s = env.reset(jax.random.PRNGKey(1))
        steps = 0
        d = False
        while not d and steps < 500:
            # bang-bang on pole angle keeps it up for a while
            a = jnp.asarray(1 if float(s.theta) + 0.2 * float(s.theta_dot) > 0 else 0)
            s, r, d = env.step(s, a, None)
            steps += 1
        assert steps > 50  # feedback control survives longer than random (~20)

    def test_random_falls_fast(self):
        env = CartPoleEnv()
        s = env.reset(jax.random.PRNGKey(2))
        key = jax.random.PRNGKey(3)
        steps = 0
        d = False
        while not d and steps < 500:
            key, k = jax.random.split(key)
            s, r, d = env.step(s, jax.random.randint(k, (), 0, 2), k)
            steps += 1
        assert steps < 200

    def test_registry(self):
        assert isinstance(make("gym.CartPole-v1"), CartPoleEnv)
        assert make("gym.CartPole-v0").default_timestep_cutoff == 200
        assert isinstance(make("maze"), MazeEnv)


class TestRolloutEngine:
    def _zero_act(self, params, obs, keys):
        return jnp.zeros((obs.shape[0], 2))

    def test_maze_batch_rollout(self):
        env = MazeEnv()
        B = 4
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        res = rollout_batch(env, self._zero_act, None, keys, jnp.int32(EPISODE_STEPS))
        assert res.returns.shape == (B,)
        np.testing.assert_array_equal(np.asarray(res.lengths), EPISODE_STEPS)
        np.testing.assert_allclose(
            np.asarray(res.returns), -np.hypot(5, 164) * np.ones(B), rtol=1e-5
        )
        np.testing.assert_allclose(np.asarray(res.bc), np.tile([36.0, 184.0], (B, 1)), rtol=1e-6)

    def test_timestep_limit_truncates(self):
        env = MazeEnv()
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        res = rollout_batch(env, self._zero_act, None, keys, jnp.int32(10))
        np.testing.assert_array_equal(np.asarray(res.lengths), 10)
        np.testing.assert_array_equal(np.asarray(res.returns), 0.0)  # no terminal reward

    def test_done_slots_freeze(self):
        """CartPole slots that die early stop accumulating reward/length."""
        env = CartPoleEnv()
        B = 8

        def act(params, obs, keys):
            # push always-left: falls quickly, at slot-dependent-ish times
            return jnp.zeros((obs.shape[0],), jnp.int32)

        keys = jax.random.split(jax.random.PRNGKey(4), B)
        res = rollout_batch(env, act, None, keys, jnp.int32(500))
        lengths = np.asarray(res.lengths)
        returns = np.asarray(res.returns)
        assert np.all(lengths < 500)
        np.testing.assert_allclose(returns, lengths.astype(np.float32))  # reward 1/step

    def test_obstat_collection(self):
        env = CartPoleEnv()
        B = 4
        keys = jax.random.split(jax.random.PRNGKey(5), B)
        res = rollout_batch(
            env,
            lambda p, o, k: jnp.zeros((o.shape[0],), jnp.int32),
            None,
            keys,
            jnp.int32(100),
            True,
        )
        assert float(res.ob_count) == np.asarray(res.lengths).sum()
        assert res.ob_sum.shape == (4,)
        assert np.all(np.asarray(res.ob_sumsq) >= 0)

    def test_scan_variant_matches_whileloop(self):
        env = MazeEnv()
        keys = jax.random.split(jax.random.PRNGKey(6), 3)
        r1 = rollout_batch(env, self._zero_act, None, keys, jnp.int32(EPISODE_STEPS))
        r2, traj = rollout_batch_scan(env, self._zero_act, None, keys, EPISODE_STEPS)
        np.testing.assert_allclose(np.asarray(r1.returns), np.asarray(r2.returns), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(r1.lengths), np.asarray(r2.lengths))
        bc_traj, alive = traj
        assert bc_traj.shape == (EPISODE_STEPS, 3, 2)

    def test_ref_batch_collection(self):
        env = CartPoleEnv()
        obs = collect_ref_batch(env, jax.random.PRNGKey(7), batch_size=32, slots=4)
        assert obs.shape == (32, 4)
        assert np.asarray(obs).std() > 0

"""Native host engine + preprocessing + host rollout tests (toy backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_neuroevolution_tpu.envs import preprocess
from deep_neuroevolution_tpu.native.bridge import HostBatchEnv


class TestPreprocess:
    def test_palette_matches_reference_formula(self):
        """grayscale = rgb/255 · [0.299, 0.587, 0.114] (tf_atari.py:143-150)."""
        rgb = preprocess.RGB_PALETTE_UINT8
        assert rgb.shape == (256, 3)
        assert rgb[0].tolist() == [0, 0, 0]
        # even indices hold colors (odd are zero-padding): 14 = 0xececec
        assert rgb[14].tolist() == [0xEC, 0xEC, 0xEC]
        assert rgb[15].tolist() == [0, 0, 0]
        expect = rgb.astype(np.float32) / 255.0 @ np.array([0.299, 0.587, 0.114], np.float32)
        np.testing.assert_allclose(preprocess.GRAYSCALE_PALETTE, expect, rtol=1e-6)

    def test_interp_matrix_align_corners(self):
        m = preprocess._interp_matrix(5, 3)
        # align_corners: out 0 → in 0, out 2 → in 4, out 1 → in 2
        np.testing.assert_allclose(m @ np.arange(5.0), [0.0, 2.0, 4.0], atol=1e-6)
        np.testing.assert_allclose(m.sum(axis=1), np.ones(3), atol=1e-6)

    def test_preprocess_shapes_and_range(self):
        frames = np.random.randint(0, 256, (3, 2, 210, 160), np.uint8)
        out = preprocess.preprocess_frames(jnp.asarray(frames))
        assert out.shape == (3, 84, 84, 1)
        out = np.asarray(out)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_two_frame_max(self):
        """A pixel lit in either frame survives preprocessing (flicker
        removal, tf_atari.py:92)."""
        a = np.zeros((1, 2, 210, 160), np.uint8)
        a[0, 0, :, :] = 14  # bright color in frame 0 only
        b = np.zeros((1, 2, 210, 160), np.uint8)
        b[0, 1, :, :] = 14  # same color in frame 1 only
        oa = np.asarray(preprocess.preprocess_frames(jnp.asarray(a)))
        ob = np.asarray(preprocess.preprocess_frames(jnp.asarray(b)))
        np.testing.assert_allclose(oa, ob, atol=1e-6)
        assert oa.max() > 0.5

    def test_stacking_semantics(self):
        f1 = jnp.ones((2, 4, 4, 1)) * 0.1
        f2 = jnp.ones((2, 4, 4, 1)) * 0.2
        s = preprocess.stack_reset(f1)
        assert s.shape == (2, 4, 4, 4)
        np.testing.assert_allclose(np.asarray(s[..., :3]), 0.0)
        np.testing.assert_allclose(np.asarray(s[..., 3]), 0.1)
        s2 = preprocess.stack_step(s, f2)
        np.testing.assert_allclose(np.asarray(s2[..., 2]), 0.1)
        np.testing.assert_allclose(np.asarray(s2[..., 3]), 0.2)


class TestHostEngine:
    def test_create_observe_step(self):
        env = HostBatchEnv("toy", batch_size=4, num_threads=2)
        assert (env.frames_per_obs, env.height, env.width) == (2, 210, 160)
        assert env.num_actions == 4
        env.reset(noops=np.array([1, 5, 10, 30]))
        obs = env.observe()
        assert obs.shape == (4, 2, 210, 160)
        assert (obs > 0).any()  # walls + paddle rendered
        r, d = env.step(np.zeros(4, np.int32))
        assert r.shape == (4,) and d.shape == (4,)
        env.close()

    def test_max_frames_cutoff(self):
        env = HostBatchEnv("toy", batch_size=2, num_threads=1)
        env.reset(noops=np.array([1, 1]), max_frames=40)  # 40 emulator frames = 10 steps
        done = np.zeros(2, bool)
        for t in range(20):
            _, d = env.step(np.zeros(2, np.int32))
            done |= d
            if done.all():
                break
        assert done.all() and t <= 11
        env.close()

    def test_deterministic_given_noops(self):
        e1 = HostBatchEnv("toy", batch_size=1, num_threads=1)
        e2 = HostBatchEnv("toy", batch_size=1, num_threads=1)
        for e in (e1, e2):
            e.reset(noops=np.array([7]))
        acts = np.array([1], np.int32)
        for t in range(50):
            r1, _ = e1.step(acts)
            r2, _ = e2.step(acts)
            assert r1[0] == r2[0]
        np.testing.assert_array_equal(e1.observe(), e2.observe())
        e1.close()
        e2.close()

    def test_final_state_ram(self):
        env = HostBatchEnv("toy", batch_size=2, num_threads=1)
        env.reset(noops=np.array([1, 1]))
        fs = env.final_state()
        assert fs.shape == (2, 128)
        assert fs[0, 3] == 3.0  # lives
        env.close()

    def test_ale_backend_gated(self):
        with pytest.raises(RuntimeError, match="unavailable"):
            HostBatchEnv("ale", "frostbite.bin", 1)


class TestHostRollout:
    def test_rollout_with_conv_policy(self):
        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host_batch
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        henv = AtariEnv("toy", batch_size=4, num_threads=2)
        model = SmallDQN(num_actions=henv.num_actions)
        thetas = jax.vmap(model.init_theta)(jax.random.split(jax.random.PRNGKey(0), 4))
        act_fn = model.make_batch_act()
        res = rollout_host_batch(
            henv, act_fn, (thetas, None), jax.random.PRNGKey(1), timestep_limit=40
        )
        assert res.returns.shape == (4,)
        assert res.bc.shape == (4, 128)
        lengths = np.asarray(res.lengths)
        assert np.all(lengths > 0) and np.all(lengths <= 40)
        henv.close()

    def test_fire_policy_scores_eventually(self):
        """A policy that always FIREs catches some balls by luck across a
        batch — validates reward plumbing end to end."""
        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host_batch
        from deep_neuroevolution_tpu.envs.atari import AtariEnv

        henv = AtariEnv("toy", batch_size=16, num_threads=2)

        def fire_act(params, obs, keys):
            return jnp.ones((obs.shape[0],), jnp.int32)

        res = rollout_host_batch(
            henv, fire_act, None, jax.random.PRNGKey(2), timestep_limit=200
        )
        # paddle sits center; some random serves land on it
        assert float(np.asarray(res.returns).sum()) > 0
        henv.close()


class TestNativeConcurrency:
    def test_tsan_stress(self):
        """Build + run the engine concurrency stress binary under
        ThreadSanitizer (SURVEY §5.2: the host engine must be TSAN-clean —
        the reference had no sanitizer coverage)."""
        import subprocess
        import sys

        p = subprocess.run(
            [sys.executable, "-m", "deep_neuroevolution_tpu.native.build", "--stress"],
            capture_output=True,
            text=True,
            cwd="/root/repo",
            timeout=240,
        )
        assert p.returncode == 0, p.stderr[-2000:] + p.stdout[-500:]
        assert "stress ok" in p.stdout
        assert "WARNING: ThreadSanitizer" not in p.stderr


class TestPipelinedRollout:
    """Group-interleaved host/device pipelining (rollout_host_batch
    pipeline_groups): per-slot keys are group-independent, so any G must
    reproduce the sequential (G=1) result exactly."""

    def test_group_counts_equivalent(self):
        import jax

        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host_batch
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        env = AtariEnv(game="toy", batch_size=8, warp_size=84)
        model = SmallDQN(num_actions=env.num_actions)
        thetas = jax.vmap(model.init_theta)(
            jax.random.split(jax.random.PRNGKey(0), env.batch_size)
        )
        key = jax.random.PRNGKey(7)
        results = {}
        for G in (1, 2, 4):
            res = rollout_host_batch(
                env, model.make_batch_act(), (thetas, None), key, 40,
                pipeline_groups=G,
            )
            results[G] = res
        env.close()
        import numpy as np

        for G in (2, 4):
            np.testing.assert_array_equal(
                np.asarray(results[1].lengths), np.asarray(results[G].lengths)
            )
            np.testing.assert_allclose(
                np.asarray(results[1].returns), np.asarray(results[G].returns),
                rtol=1e-6,
            )
            np.testing.assert_allclose(
                np.asarray(results[1].bc), np.asarray(results[G].bc), rtol=1e-6
            )

    def test_non_divisible_falls_back_sequential(self):
        import jax

        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host_batch
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        env = AtariEnv(game="toy", batch_size=6, warp_size=84)
        model = SmallDQN(num_actions=env.num_actions)
        thetas = jax.vmap(model.init_theta)(
            jax.random.split(jax.random.PRNGKey(0), env.batch_size)
        )
        res = rollout_host_batch(
            env, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(1), 10,
            pipeline_groups=4,  # 6 % 4 != 0 → G=1
        )
        env.close()
        assert res.returns.shape == (6,)


class TestTrajectoryBC:
    """Atari NS-ES behavior characterization parity (VERDICT r1 missing #2):
    the BC is the RAM vector appended at EVERY step (policies.py:410-418),
    scored with the length-tolerant euclidean kNN (nses.py:12-32) — not just
    the final RAM state."""

    def test_rollout_collects_per_step_ram(self):
        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host_batch
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        henv = AtariEnv("toy", batch_size=4, num_threads=2)
        model = SmallDQN(num_actions=henv.num_actions)
        thetas = jax.vmap(model.init_theta)(jax.random.split(jax.random.PRNGKey(0), 4))
        res = rollout_host_batch(
            henv, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(1),
            timestep_limit=30, collect_bc_traj=True,
        )
        lengths = np.asarray(res.lengths)
        assert res.bc_traj is not None and len(res.bc_traj) == 4
        for b in range(4):
            # one 128-byte RAM per step taken
            assert res.bc_traj[b].shape == (lengths[b] * 128,)
            # the trajectory's last RAM == the final-state BC
            np.testing.assert_allclose(
                res.bc_traj[b][-128:], np.asarray(res.bc)[b], rtol=1e-6
            )
        henv.close()

    def test_nses_trajectory_novelty_golden_and_differs_from_final(self):
        """NSESTrainer with bc_mode='traj' on the toy engine: per-rollout
        novelty equals the host recomputation via euclidean_distance
        (nses.py:12-20 restated in ops/novelty.py), and differs measurably
        from final-RAM novelty over the same archive tails."""
        from deep_neuroevolution_tpu.algos.nses import NSESConfig, NSESTrainer
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN
        from deep_neuroevolution_tpu.ops import Adam, NoiseTable, novelty
        from deep_neuroevolution_tpu.utils import tabular

        tabular._logger._kvs.clear()
        tabular.dump_tabular = lambda: tabular._logger._kvs.clear()

        henv = AtariEnv("toy", batch_size=8, num_threads=2)
        model = SmallDQN(num_actions=henv.num_actions)
        cfg = NSESConfig(
            noise_stdev=0.05, population_size=8, k=2, meta_population_size=2,
            num_rollouts=2, episode_cutoff_mode=20, bc_mode="traj",
        )
        tr = NSESTrainer(henv, model, cfg, optimizer=Adam(stepsize=0.01),
                         noise_table=NoiseTable.from_seed(count=3_000_000), seed=0)
        # archive seeded with one ragged trajectory-BC per parent
        assert len(tr.host_archive) == 2
        assert all(a.ndim == 1 and a.size % 128 == 0 for a in tr.host_archive)

        r = tr.train_step()
        assert len(tr.host_archive) == 3
        novs = r["novelty"].ravel()
        assert np.all(novs >= 0) and novs.std() > 0

        # golden: recompute one trajectory's novelty through the reference
        # formula (length-tolerant euclidean, k nearest)
        traj = tr.host_archive[-1]
        arch = tr.host_archive[:-1]
        expect = np.sort(
            [novelty.euclidean_distance(a, traj) for a in arch]
        )[: cfg.k].mean()
        got = novelty.compute_novelty_vs_archive(arch, traj, cfg.k)
        np.testing.assert_allclose(got, expect, rtol=1e-6)

        # trajectory novelty must NOT equal final-RAM novelty: compare the
        # same points under both characterizations
        finals = [a[-128:] for a in tr.host_archive]
        d_traj = novelty.euclidean_distance(tr.host_archive[0], tr.host_archive[-1])
        d_final = float(np.linalg.norm(finals[0] - finals[-1]))
        assert abs(d_traj - d_final) > 1e-3, (d_traj, d_final)
        henv.close()


class TestEpisodicLife:
    """EpisodicLifeEnv parity (atari_wrappers.py:50-84; VERDICT r1 missing
    #4): losing a life ends the training episode; the game truly restarts
    only on game over — a reset at a lost-life boundary continues play."""

    def test_done_on_life_loss_and_reset_continues(self):
        from deep_neuroevolution_tpu.native.bridge import HostBatchEnv

        env = HostBatchEnv("toy", batch_size=8, num_threads=2, episodic_life=True)
        env.reset(noops=np.full(8, 5, np.int32), max_frames=100_000)
        done = np.zeros(8, bool)
        steps = 0
        while not done.any() and steps < 500:
            acts = np.zeros(int((~done).sum()), np.int32)  # NOOP: miss balls
            idx = np.nonzero(~done)[0].astype(np.int32)
            _, d = env.step(acts, indices=idx)
            done[idx] |= d
            steps += 1
        assert done.any(), "no slot ever lost a life under NOOP"
        b = int(np.nonzero(done)[0][0])
        ram = env.final_state()
        lives = int(ram[b, 3])
        frame_before = int(ram[b, 5]) + 256 * int(ram[b, 6])
        assert lives == 2, f"done should fire at the FIRST life loss, lives={lives}"

        # reset at the lost-life boundary: play continues (lives stay 2,
        # frame counter advances) instead of a fresh 3-life game
        env.reset(indices=np.array([b], np.int32), noops=np.array([5], np.int32))
        ram2 = env.final_state()
        assert int(ram2[b, 3]) == 2, "reset must NOT restart the game mid-lives"
        frame_after = int(ram2[b, 5]) + 256 * int(ram2[b, 6])
        assert frame_after >= frame_before, (frame_before, frame_after)
        env.close()

    def test_game_over_resets_fully(self):
        from deep_neuroevolution_tpu.native.bridge import HostBatchEnv

        env = HostBatchEnv("toy", batch_size=1, num_threads=1, episodic_life=True)
        env.reset(noops=np.array([3], np.int32))
        # burn all 3 lives: keep stepping through lost-life resets
        for _ in range(3):
            done = False
            steps = 0
            while not done and steps < 1000:
                _, d = env.step(np.zeros(1, np.int32))
                done = bool(d[0])
                steps += 1
            assert done
            env.reset(noops=np.array([3], np.int32))
        # after the real game over, reset produced a fresh 3-life game
        assert int(env.final_state()[0, 3]) == 3
        env.close()

    def test_off_by_default_and_for_gpu_schema(self):
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.utils.config import resolve_env

        e1 = AtariEnv("toy", batch_size=1)
        assert e1.episodic_life is False  # GPU stack had no EpisodicLife
        e1.close()
        e2 = resolve_env("FrostbiteNoFrameskip-v4", batch_size=1)
        assert e2.episodic_life is True  # wrap_deepmind default (CPU stack)
        e2.close()


class TestAleBackendCompiles:
    """The HAVE_ALE code path (env_engine.cpp AleBackend, mirroring
    tf_atari.cpp:24-128) compiles and steps against the header-only API stub
    (native/ale_stub/) — VERDICT r1 missing #3 done-criterion: the path
    builds in CI and steps frames; a real ALE drops in via NEVO_ALE_PREFIX
    (recipe in ale_stub/ale_interface.hpp)."""

    def test_ale_path_compiles_and_steps(self):
        from deep_neuroevolution_tpu.native.bridge import HostBatchEnv
        from deep_neuroevolution_tpu.native.build import build_ale_stub

        so = build_ale_stub()
        env = HostBatchEnv("ale", "stub.rom", batch_size=2, num_threads=1,
                           lib_path=str(so))
        assert env.num_actions == 4
        assert env.final_state_size == 128
        assert (env.frames_per_obs, env.height, env.width) == (2, 210, 160)
        env.reset(noops=np.array([2, 5], np.int32), max_frames=10_000)
        total_rew = 0.0
        done = np.zeros(2, bool)
        for _ in range(10):
            r, d = env.step(np.zeros(2, np.int32))
            total_rew += float(r.sum())
            done |= d
        obs = env.observe()
        assert obs.shape == (2, 2, 210, 160) and obs.any()
        ram = env.final_state()
        assert ram.shape == (2, 128)
        # stub scripts +1 every 7th emulator frame; 10 steps × frameskip 4
        # per slot must have scored
        assert total_rew > 0
        # episodic life works through the ALE lives() surface too
        env.close()
        env2 = HostBatchEnv("ale", "stub.rom", batch_size=1, num_threads=1,
                            episodic_life=True, lib_path=str(so))
        env2.reset(noops=np.array([1], np.int32), max_frames=10_000)
        d = False
        steps = 0
        while not d and steps < 100:
            _, dd = env2.step(np.zeros(1, np.int32))
            d = bool(dd[0])
            steps += 1
        assert d
        assert int(env2.final_state()[0, 2]) == 2  # stub RAM[2] = lives
        env2.close()


class TestEngineGrayPath:
    """Engine-side palette decode (nevo_observe_gray + AtariEnv
    obs_mode='gray'): the C++ LUT replaces the device-side 256-entry gather
    that measured ~500 µs/member on TPU (scripts/profile_atari_stages.py,
    98% of the whole device step)."""

    def test_observe_gray_is_lut_of_observe(self):
        from deep_neuroevolution_tpu.envs.preprocess import GRAY_PALETTE_UINT8
        from deep_neuroevolution_tpu.native.bridge import HostBatchEnv

        e = HostBatchEnv("toy", "", 3, num_threads=1)
        try:
            e.set_gray_lut(GRAY_PALETTE_UINT8)
            e.reset(noops=np.array([3, 5, 7]), max_frames=1000)
            e.step(np.array([1, 1, 1], np.int32))
            raw = e.observe()
            gray = e.observe_gray()
            np.testing.assert_array_equal(gray, GRAY_PALETTE_UINT8[raw])
        finally:
            e.close()

    def test_gray_preprocess_matches_indexed_within_quantization(self):
        """preprocess_gray_frames(LUT[frames]) ≈ preprocess_frames(frames):
        only the uint8 quantization of the luminance LUT separates the two
        (≤0.5/255 per pixel; the resize is a convex combination so the bound
        survives it)."""
        from deep_neuroevolution_tpu.envs.preprocess import (
            GRAY_PALETTE_UINT8, preprocess_frames, preprocess_gray_frames)

        rng = np.random.RandomState(0)
        frames = rng.randint(0, 256, size=(2, 2, 210, 160)).astype(np.uint8)
        ref = np.asarray(preprocess_frames(jnp.asarray(frames), 84, 84))
        gray = np.asarray(preprocess_gray_frames(jnp.asarray(GRAY_PALETTE_UINT8[frames]), 84, 84))
        assert np.abs(ref - gray).max() <= 0.5 / 255 + 1e-6

    def test_atari_env_gray_rollout_runs(self):
        """Full rollout through the gray device path (AtariEnv default)."""
        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        env = AtariEnv("toy", batch_size=3, num_threads=1, pipeline_groups=1)
        assert env.obs_mode == "gray"
        try:
            model = SmallDQN(num_actions=env.num_actions)
            thetas = jax.vmap(model.init_theta)(jax.random.split(jax.random.PRNGKey(0), 3))
            res = rollout_host(
                env, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(1), 10
            )
            assert res.returns.shape == (3,)
            assert (np.asarray(res.lengths) > 0).all()
        finally:
            env.close()

    def test_atari_env_indexed_rollout_runs(self):
        """The reference-exact indexed path (device-side palette decode)
        remains available behind obs_mode='indexed'."""
        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        env = AtariEnv("toy", batch_size=2, num_threads=1, pipeline_groups=1,
                       obs_mode="indexed")
        try:
            model = SmallDQN(num_actions=env.num_actions)
            thetas = jax.vmap(model.init_theta)(jax.random.split(jax.random.PRNGKey(3), 2))
            res = rollout_host(
                env, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(4), 6
            )
            assert res.returns.shape == (2,)
        finally:
            env.close()


class TestEnginePreprocPath:
    """Engine-side FULL preprocess (nevo_observe_preproc + AtariEnv
    obs_mode='preproc'): LUT gray + 2-frame max + align-corners bilinear
    resize in C++, shipping [B, 84, 84] uint8 — ~10× fewer host→device
    bytes than 'gray' (the 17.2 MB/step upload measured ~85% of every
    rollout step through the relay tunnel)."""

    def test_engine_preproc_matches_device_pipeline(self):
        """observe_preproc == round(255·preprocess_gray_frames(observe_gray))
        within the final uint8 rounding (≤0.5/255 after scaling) — the
        engine reproduces the device's exact max+align-corners-resize
        math (preprocess.py _interp_matrix)."""
        from deep_neuroevolution_tpu.envs.preprocess import (
            GRAY_PALETTE_UINT8, preprocess_gray_frames)
        from deep_neuroevolution_tpu.native.bridge import HostBatchEnv

        e = HostBatchEnv("toy", "", 3, num_threads=2)
        try:
            e.set_gray_lut(GRAY_PALETTE_UINT8)
            e.reset(noops=np.array([3, 9, 17]), max_frames=1000)
            for a in (1, 2, 2, 3, 0):
                e.step(np.array([a, a, a], np.int32))
            gray = e.observe_gray()  # [3, 2, 210, 160]
            pre = e.observe_preproc(84, 84)  # [3, 84, 84]
            dev = np.asarray(preprocess_gray_frames(jnp.asarray(gray), 84, 84))[..., 0]
            # engine output scaled back to [0,1]; difference = its one extra
            # uint8 rounding (after the resize) + float assoc. slack
            assert np.abs(pre.astype(np.float32) / 255.0 - dev).max() <= 0.51 / 255 + 1e-5
        finally:
            e.close()

    def test_atari_env_preproc_rollout_matches_gray_actions(self):
        """A conv-policy rollout in obs_mode='preproc' produces the same
        rewards/lengths as 'gray' for the same seeds — the quantization is
        far below the policy's decision noise on the toy game."""
        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        results = {}
        for mode in ("gray", "preproc"):
            env = AtariEnv("toy", batch_size=3, num_threads=1,
                           pipeline_groups=1, obs_mode=mode)
            try:
                assert env.obs_mode == mode
                model = SmallDQN(num_actions=env.num_actions)
                thetas = jax.vmap(model.init_theta)(
                    jax.random.split(jax.random.PRNGKey(0), 3))
                res = rollout_host(
                    env, model.make_batch_act(), (thetas, None),
                    jax.random.PRNGKey(1), 12,
                )
                results[mode] = (np.asarray(res.lengths), np.asarray(res.returns))
            finally:
                env.close()
        np.testing.assert_array_equal(results["gray"][0], results["preproc"][0])
        np.testing.assert_allclose(results["gray"][1], results["preproc"][1])


class TestMirrorCRN:
    """Mirrored sampling with common random numbers (opt-in r5 extension):
    antithetic pair members share the episode's env stream so their fitness
    difference isolates the perturbation effect (the reference's pop-5000
    fleets average episode luck out instead; at small populations the
    1-episode fitness noise swamps the σ-effect)."""

    def test_seeded_reset_pins_episode_stream(self):
        from deep_neuroevolution_tpu.native.bridge import HostBatchEnv

        e = HostBatchEnv("toy", "", 4, num_threads=1)
        try:
            # same (noops, seed) on all 4 slots → identical frames forever
            e.reset(noops=np.array([5, 5, 5, 5]),
                    seeds=np.array([1234, 1234, 1234, 1234]), max_frames=1000)
            for a in (1, 2, 3, 2, 1):
                e.step(np.array([a] * 4, np.int32))
            obs = e.observe()
            for i in (1, 2, 3):
                np.testing.assert_array_equal(obs[0], obs[i])
            # different seeds → streams diverge after the serve
            e.reset(noops=np.array([5, 5, 5, 5]),
                    seeds=np.array([1234, 99, 1234, 7]), max_frames=1000)
            for _ in range(10):
                e.step(np.array([1] * 4, np.int32))
            obs = e.observe()
            np.testing.assert_array_equal(obs[0], obs[2])
            assert (obs[0] != obs[1]).any()
        finally:
            e.close()

    def test_mirror_pairs_equal_env_for_equal_policies(self):
        """With mirror_pairs=True and IDENTICAL thetas in both halves, the
        two halves must produce identical returns and lengths (same serves,
        same noops, same keys) — the property that makes the pair difference
        luck-free."""
        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host_batch
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        env = AtariEnv("toy", batch_size=8, num_threads=1, pipeline_groups=1)
        try:
            model = SmallDQN(num_actions=env.num_actions)
            half = jax.vmap(model.init_theta)(jax.random.split(jax.random.PRNGKey(0), 4))
            thetas = jnp.concatenate([half, half])  # θ+ block == θ− block
            res = rollout_host_batch(
                env, model.make_batch_act(), (thetas, None),
                jax.random.PRNGKey(5), 20, out_hw=env.warp_size,
                mirror_pairs=True,
            )
            r = np.asarray(res.returns)
            l = np.asarray(res.lengths)
            np.testing.assert_array_equal(r[:4], r[4:])
            np.testing.assert_array_equal(l[:4], l[4:])
            # and WITHOUT mirroring the halves see different episodes —
            # different slot streams serve different balls, so the final
            # RAM states (paddle/ball positions) diverge
            res2 = rollout_host_batch(
                env, model.make_batch_act(), (thetas, None),
                jax.random.PRNGKey(5), 60, out_hw=env.warp_size,
                mirror_pairs=False,
            )
            bc2 = np.asarray(res2.bc)
            assert (bc2[:4] != bc2[4:]).any()
        finally:
            env.close()

    def test_es_trainer_mirror_crn_smoke(self):
        """ESConfig(mirror_crn=True) runs a host-engine generation e2e."""
        from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN
        from deep_neuroevolution_tpu.ops import Adam, NoiseTable
        from deep_neuroevolution_tpu.utils import tabular

        tabular.dump_tabular = lambda: tabular._logger._kvs.clear()
        env = AtariEnv("toy", batch_size=8, num_threads=1, pipeline_groups=1)
        try:
            model = SmallDQN(num_actions=env.num_actions)
            cfg = ESConfig(noise_stdev=0.05, population_size=8,
                           num_eval_episodes=2, episode_cutoff_mode=15,
                           mirror_crn=True)
            tr = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.05),
                           noise_table=NoiseTable.from_seed(count=2_000_000),
                           seed=0)
            st = tr.train_step()
            assert np.isfinite(st.update_ratio)
            assert st.returns.shape[1] == 2
        finally:
            env.close()

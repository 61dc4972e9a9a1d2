"""Config loader, CLI, checkpoint/resume, and replay tests."""

import json
import subprocess
import sys

import numpy as np
import pytest

from deep_neuroevolution_tpu.algos.es import ESTrainer
from deep_neuroevolution_tpu.algos.ga import GATrainer, RSTrainer
from deep_neuroevolution_tpu.algos.nses import NSESTrainer
from deep_neuroevolution_tpu.utils import checkpoint, config, tabular


def _silence():
    tabular._logger._kvs.clear()
    tabular.dump_tabular = lambda: tabular._logger._kvs.clear()


SMALL = {"noise_size": 1_500_000, "eval_batch": 16, "num_eval_episodes": 2}


class TestConfigLoader:
    def test_cpu_schema_es_maze(self):
        exp = json.load(open("configurations/maze_es.json"))
        tr = config.load_experiment(exp, overrides=SMALL)
        assert isinstance(tr, ESTrainer)
        assert tr.config.noise_stdev == 0.05
        assert tr.model.num_params > 0
        assert tr.cutoff.tslimit == 400  # env_default for maze

    def test_cpu_schema_frostbite_es_maps_to_host_env(self):
        """FrostbiteNoFrameskip-v4 resolves to the Atari host engine (toy
        backend here — ALE gated) with the ESAtariPolicy → VBN DQN."""
        exp = json.load(open("configurations/frostbite_es.json"))
        tr = config.load_experiment(
            exp,
            overrides={**SMALL, "noise_size": 1_500_000, "env_kwargs": {"batch_size": 4}},
        )
        assert isinstance(tr, ESTrainer)
        assert tr.is_host_env
        assert tr.model.needs_ref_batch  # ESAtariPolicy → VirtualBNDQN
        assert tr.config.episodes_per_batch == 5000
        assert tr.cutoff.tslimit == 5000
        tr.env.close()

    def test_gpu_schema_ga(self):
        exp = json.load(open("configurations/ga_toy_config.json"))
        tr = config.load_experiment(exp, overrides=SMALL)
        assert isinstance(tr, GATrainer)
        assert tr.config.selection_threshold == 8
        assert tr.config.population_size == 64
        tr.env.close()

    def test_gpu_schema_es_gym(self):
        exp = json.load(open("configurations/es_gym_config.json"))
        tr = config.load_experiment(exp, overrides=SMALL)
        assert isinstance(tr, ESTrainer)
        assert not tr.is_host_env  # pure-JAX CartPole

    def test_nses_schema(self):
        exp = json.load(open("configurations/maze_nses.json"))
        tr = config.load_experiment(exp, overrides=SMALL)
        assert isinstance(tr, NSESTrainer)
        assert tr.config.algo_type == "ns"
        assert len(tr.parents) == 3

    def test_rs_algo_flag(self):
        exp = json.load(open("configurations/ga_toy_config.json"))
        tr = config.load_experiment(exp, algo="rs", overrides=SMALL)
        assert isinstance(tr, RSTrainer)
        tr.env.close()

    def test_mujoco_resolves_when_available(self):
        """Humanoid workload resolves to the MuJoCo host engine when
        mujoco/gymnasium are importable (full wiring test in
        test_mujoco.py); otherwise it gates with a clear error."""
        from deep_neuroevolution_tpu.envs import mujoco as mj

        exp = json.load(open("configurations/humanoid.json"))
        over = {**SMALL, "env_kwargs": {"batch_size": 2}}
        if mj.is_available():
            tr = config.load_experiment(exp, overrides=over)
            assert getattr(tr.env, "host_obs", None) == "vector"
            tr.env.close()
        else:
            with pytest.raises(RuntimeError, match="MuJoCo"):
                config.load_experiment(exp, overrides=over)


class TestCheckpointResume:
    def test_es_roundtrip(self, tmp_path):
        _silence()
        exp = json.load(open("configurations/maze_es.json"))
        over = {**SMALL, "num_eval_episodes": 0}
        tr = config.load_experiment(exp, overrides=over)
        tr.config.population_size = 32
        tr.train_step()
        path = str(tmp_path / "snap.pkl")
        checkpoint.save_trainer(path, tr)

        tr2 = config.load_experiment(exp, overrides=over)
        tr2.config.population_size = 32
        checkpoint.load_trainer(path, tr2)
        assert tr2.state.iteration == 1
        np.testing.assert_array_equal(np.asarray(tr2.state.theta), np.asarray(tr.state.theta))
        np.testing.assert_array_equal(
            np.asarray(tr2.state.opt_state.m), np.asarray(tr.state.opt_state.m)
        )
        # resumed trainer continues deterministically vs the original
        s_a = tr.train_step()
        s_b = tr2.train_step()
        np.testing.assert_allclose(s_a.returns, s_b.returns, rtol=1e-5)

    def test_ga_roundtrip(self, tmp_path):
        _silence()
        exp = json.load(open("configurations/ga_toy_config.json"))
        # SmallDQN has ~1.0M params — the table must be at least that big
        over = {**SMALL, "noise_size": 1_500_000, "env_kwargs": {"batch_size": 8}}
        tr = config.load_experiment(exp, overrides=over)
        tr.config.population_size = 8
        tr.config.num_test_episodes = 2
        tr.config.num_validation_episodes = 2
        tr.cutoff = tr.cutoff._replace(tslimit=20)
        tr.train_step()
        path = str(tmp_path / "snap.pkl")
        checkpoint.save_trainer(path, tr)
        tr.env.close()

        tr2 = config.load_experiment(exp, overrides=over)
        checkpoint.load_trainer(path, tr2)
        assert tr2.state.it == 1
        assert tr2.cached_parent_seeds == tr.cached_parent_seeds
        assert [o.seeds for o in tr2.state.population] == [o.seeds for o in tr.state.population]
        tr2.env.close()

    def test_policy_snapshot_roundtrip(self, tmp_path):
        from deep_neuroevolution_tpu.models import ContinuousMLP

        model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        import jax

        theta = model.init_theta(jax.random.PRNGKey(0))
        path = str(tmp_path / "policy.pkl")
        checkpoint.save_policy_snapshot(path, model, theta, extra={"env_id": "maze"})
        model2, theta2, payload = checkpoint.load_policy_snapshot(path)
        assert type(model2).__name__ == "ContinuousMLP"
        assert model2.hidden == 8
        np.testing.assert_array_equal(theta2, np.asarray(theta))

    def test_replay_tool(self, tmp_path):
        from deep_neuroevolution_tpu.models import ContinuousMLP
        from deep_neuroevolution_tpu.utils.viz import replay_snapshot
        import jax

        model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        theta = model.init_theta(jax.random.PRNGKey(0))
        path = str(tmp_path / "policy.pkl")
        checkpoint.save_policy_snapshot(path, model, theta, extra={"env_id": "maze"})
        out = str(tmp_path / "traj.npz")
        stats = replay_snapshot(path, episodes=2, save_frames=out)
        assert len(stats["returns"]) == 2
        data = np.load(out)
        assert data["bc_trajectory"].shape == (400, 2, 2)


class TestCLI:
    def test_train_command_end_to_end(self, tmp_path):
        """Drive the real CLI: 2 ES generations on the maze + resume."""
        env = {
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "PATH": "/usr/bin:/bin:/usr/local/bin",
        }
        import os

        env = {**os.environ, **env}
        env.pop("PALLAS_AXON_POOL_IPS", None)
        log = str(tmp_path / "log")
        cmd = [
            sys.executable,
            "-m",
            "deep_neuroevolution_tpu.main",
            "train",
            "--exp_file",
            "configurations/maze_es.json",
            "--log_dir",
            log,
            "--iterations",
            "2",
            "--snapshot_freq",
            "1",
            "--overrides",
            json.dumps({"noise_size": 300000, "eval_batch": 8, "num_eval_episodes": 2}),
        ]
        p = subprocess.run(cmd, capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300)
        assert p.returncode == 0, p.stderr[-2000:]
        assert "EpRewMean" in p.stdout
        assert (tmp_path / "log" / "snapshot.pkl").exists()
        assert (tmp_path / "log" / "metrics.jsonl").exists()
        # periodic reference-style policy snapshots (es.py:345-353) — one per
        # snapshot_freq with the eval reward in the name, replayable
        import glob as _glob

        pols = sorted(_glob.glob(str(tmp_path / "log" / "snapshot_iter*_rew*.pkl")))
        assert len(pols) == 2, pols
        from deep_neuroevolution_tpu.utils.viz import replay_snapshot

        stats = replay_snapshot(pols[-1], episodes=1)
        assert np.isfinite(stats["return_mean"])
        # resume path
        p2 = subprocess.run(
            cmd[:11] + ["1"] + cmd[12:], capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300
        )
        assert p2.returncode == 0, p2.stderr[-2000:]
        assert "resuming from" in p2.stdout


class TestSeedChainReplay:
    """display.py:30-89 parity: rebuild an elite from its genome and roll."""

    def test_replay_seed_chain_gpu_style(self):
        from deep_neuroevolution_tpu.ops import NoiseTable
        from deep_neuroevolution_tpu.utils.viz import replay_seed_chain

        table = NoiseTable.from_seed(count=20_000)
        res = replay_seed_chain(
            [123, [456, 0.02]],
            model_name="ContinuousMLP",
            env_id="maze",
            model_kwargs={"obs_dim": 11, "ac_dim": 2, "hidden": 8},
            noise_table=table,
        )
        assert res["lengths"][0] > 0
        # deterministic: same chain → same outcome
        res2 = replay_seed_chain(
            [123, [456, 0.02]],
            model_name="ContinuousMLP",
            env_id="maze",
            model_kwargs={"obs_dim": 11, "ac_dim": 2, "hidden": 8},
            noise_table=table,
        )
        assert res["return_mean"] == res2["return_mean"]

    def test_replay_seed_chain_cpu_style_matches_ga_reconstruct(self):
        import jax.numpy as jnp
        import numpy as np

        from deep_neuroevolution_tpu.models import ContinuousMLP
        from deep_neuroevolution_tpu.ops import NoiseTable
        from deep_neuroevolution_tpu.utils import viz

        table = NoiseTable.from_seed(count=20_000)
        model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        dim = model.num_params
        # golden: es_distributed/ga.py:256-263 reconstruction in numpy
        noise = np.asarray(table.noise)
        theta = np.asarray(model.reinit_theta(jnp.asarray(noise[100 : 100 + dim])))
        theta = theta + 0.01 * noise[900 : 900 + dim]

        captured = {}
        orig = viz.replay_policy

        def spy(model_, theta_, env_, **kw):
            captured["theta"] = np.asarray(theta_)
            return orig(model_, theta_, env_, **kw)

        viz.replay_policy = spy
        try:
            viz.replay_seed_chain(
                [100, 900],
                model_name="ContinuousMLP",
                env_id="maze",
                model_kwargs={"obs_dim": 11, "ac_dim": 2, "hidden": 8},
                genome_style="cpu",
                noise_stdev=0.01,
                noise_table=table,
            )
        finally:
            viz.replay_policy = orig
        np.testing.assert_allclose(captured["theta"], theta, rtol=1e-6)

    def test_cli_replay_seeds(self, capsys):
        import json as _json

        from deep_neuroevolution_tpu.main import main as cli_main

        rc = cli_main(
            [
                "replay",
                "--seeds", "[123, [456, 0.02]]",
                "--model", "ContinuousMLP",
                "--model_kwargs", '{"obs_dim": 11, "ac_dim": 2, "hidden": 8}',
                "--env", "maze",
                "--noise_count", "20000",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()[-1]
        stats = _json.loads(out)
        assert "return_mean" in stats and stats["lengths"][0] > 0


class TestImportHooks:
    """Population/θ import hooks: exp['load_population'] (gpu ga.py:161-162 +
    copy_population back-compat migration, ga.py:75-82), exp['load_from']
    (gpu es.py:164-171 seeds.pkl), policy.args.init_from (es.py:165-167)."""

    def _ga_exp(self, **extra):
        return {
            "game": "maze", "model": "ContinuousMLP", "population_size": 8,
            "selection_threshold": 2, "validation_threshold": 2,
            "num_validation_episodes": 1, "num_test_episodes": 1,
            "mutation_power": 0.05, "episode_cutoff_mode": 30, **extra,
        }

    def test_load_population_migrates_bare_ints(self, tmp_path):
        import pickle

        chains = [(5, 17, 23), (9, (31, 0.1))]  # first has legacy bare ints
        p = tmp_path / "pop.pkl"
        with open(p, "wb") as f:
            pickle.dump(chains, f)
        tr = config.load_experiment(
            self._ga_exp(load_population=str(p)),
            overrides={"noise_size": 100_000},
        )
        seeds0 = tr.state.population[0].seeds
        assert seeds0 == (5, (17, 0.005), (23, 0.005))  # reference 0.005 default
        assert tr.state.population[1].seeds == (9, (31, 0.1))

    def test_load_population_from_trainer_snapshot(self, tmp_path):
        from deep_neuroevolution_tpu.algos.ga import Offspring

        tr = config.load_experiment(self._ga_exp(), overrides={"noise_size": 100_000})
        tr.state.population = [Offspring((3, (7, 0.05)), 1.5, 40)]
        snap = tmp_path / "snapshot.pkl"
        checkpoint.save_trainer(str(snap), tr)

        tr2 = config.load_experiment(
            self._ga_exp(load_population=str(snap)),
            overrides={"noise_size": 100_000},
        )
        assert tr2.state.population[0].seeds == (3, (7, 0.05))
        assert tr2.state.population[0].fitness == 1.5

    def test_load_from_seeds_pkl(self, tmp_path):
        import pickle

        import jax.numpy as jnp
        import numpy as np

        p = tmp_path / "seeds.pkl"
        with open(p, "wb") as f:
            pickle.dump((11, (42, 0.02)), f)
        exp = self._ga_exp(load_from=str(p))
        exp.pop("selection_threshold")
        exp["optimizer"] = {"type": "adam", "args": {"stepsize": 0.01}}
        tr = config.load_experiment(exp, algo="es", overrides={"noise_size": 100_000})
        expected = checkpoint.theta_from_seed_chain(
            tr.model, tr.noise, (11, (42, 0.02))
        )
        np.testing.assert_allclose(
            np.asarray(tr.state.theta), np.asarray(expected), rtol=1e-6
        )

    def test_init_from_warm_start(self, tmp_path):
        import jax
        import numpy as np

        from deep_neuroevolution_tpu.models import ContinuousMLP

        small = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        theta_small = small.init_theta(jax.random.PRNGKey(3))
        snap = tmp_path / "small.pkl"
        checkpoint.save_policy_snapshot(str(snap), small, theta_small)

        exp = {
            "config": {"noise_stdev": 0.05, "episodes_per_batch": 8,
                        "timesteps_per_batch": 0, "episode_cutoff_mode": 30},
            "env_id": "maze",
            "policy": {"type": "ContinuousMLP",
                       "args": {"hidden": 16, "init_from": str(snap)}},
            "optimizer": {"type": "adam", "args": {"stepsize": 0.01}},
        }
        tr = config.load_experiment(exp, algo="es", overrides={"noise_size": 100_000})
        expected = checkpoint.initialize_from(str(snap), tr.model)
        np.testing.assert_allclose(
            np.asarray(tr.state.theta), np.asarray(expected), rtol=1e-6
        )


class TestAtariEngineDefaults:
    def test_atari_game_defaults_to_256_slots(self):
        """Atari experiments default to B=256 engine slots — the measured
        device-throughput optimum (600k vs 407k frames/s at B=64) and the
        reference's effective per-GPU concurrency (4 workers x 64 slots,
        concurrent_worker.py:129-142); explicit env_kwargs still win."""
        from deep_neuroevolution_tpu.utils import config

        env = config.resolve_env("FrostbiteNoFrameskip-v4", num_threads=1)
        try:
            assert env.batch_size == 256
            assert env.episodic_life  # CPU-schema id form (atari_wrappers)
        finally:
            env.close()
        env = config.resolve_env("FrostbiteNoFrameskip-v4", num_threads=1,
                                 batch_size=16)
        try:
            assert env.batch_size == 16  # explicit kwargs win
        finally:
            env.close()

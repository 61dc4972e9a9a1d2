"""Pod-scale ES tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_neuroevolution_tpu.envs import CartPoleEnv
from deep_neuroevolution_tpu.models import LinearClassifier
from deep_neuroevolution_tpu.ops import Adam, NoiseTable
from deep_neuroevolution_tpu.parallel.es_pod import make_pod_es_step
from deep_neuroevolution_tpu.parallel.mesh import make_pop_mesh


def ref_centered_ranks(x):
    ranks = np.empty(x.size, dtype=int)
    ranks[x.ravel().argsort(kind="stable")] = np.arange(x.size)
    y = ranks.reshape(x.shape).astype(np.float32)
    return y / (x.size - 1) - 0.5


class TestPodES:
    def setup_method(self):
        self.mesh = make_pop_mesh()
        assert self.mesh.devices.size == 8
        self.env = CartPoleEnv()
        self.model = LinearClassifier(obs_dim=4, num_actions=2)
        self.opt = Adam(stepsize=0.1)
        self.table = NoiseTable.from_seed(count=100_000)
        self.step = make_pod_es_step(
            self.env, self.model, self.opt, self.mesh, npairs_per_device=8, l2coeff=0.005
        )

    def _run_one(self, seed=0):
        theta = self.model.init_theta(jax.random.PRNGKey(seed))
        opt_state = self.opt.init(self.model.num_params)
        keys = jax.random.split(jax.random.PRNGKey(seed + 50), 8)
        res = self.step(
            theta, opt_state, self.table.noise, keys, jnp.int32(100), jnp.float32(0.2)
        )
        return theta, res

    def test_shapes_global(self):
        _, res = self._run_one()
        assert res.returns_n2.shape == (64, 2)
        assert res.noise_idxs.shape == (64,)
        assert res.lengths_n2.shape == (64, 2)

    def test_update_matches_host_recomputation(self):
        """The distributed gather/psum data path must produce exactly the
        update the reference master would compute from the same results
        (es.py:281-301 recomputed in numpy from the gathered outputs)."""
        theta0, res = self._run_one()
        rets = np.asarray(res.returns_n2)
        idxs = np.asarray(res.noise_idxs)
        table = np.asarray(self.table.noise)
        dim = self.model.num_params

        proc = ref_centered_ranks(rets)
        w = proc[:, 0] - proc[:, 1]
        g = np.zeros(dim, np.float32)
        for i, idx in enumerate(idxs):
            g += w[i] * table[idx : idx + dim]
        g /= rets.size

        # reference Adam step t=1
        globalg = -g + 0.005 * np.asarray(theta0)
        a = 0.1 * np.sqrt(1 - 0.999) / (1 - 0.9)
        m = 0.1 * globalg
        v = 0.001 * globalg * globalg
        step = -a * m / (np.sqrt(v) + 1e-8)
        expected = np.asarray(theta0) + step

        np.testing.assert_allclose(np.asarray(res.theta), expected, rtol=2e-4, atol=2e-6)

    def test_learning_through_pod_path(self):
        theta = self.model.init_theta(jax.random.PRNGKey(1))
        opt_state = self.opt.init(self.model.num_params)
        best = -1.0
        for i in range(25):
            keys = jax.random.split(jax.random.fold_in(jax.random.PRNGKey(101), i), 8)
            res = self.step(
                theta, opt_state, self.table.noise, keys, jnp.int32(500), jnp.float32(0.2)
            )
            theta, opt_state = res.theta, res.opt_state
            best = max(best, float(np.asarray(res.returns_n2).mean()))
        assert best > 50.0, f"pod ES failed to learn: best={best}"

    def test_theta_is_replicated_consistently(self):
        """Replicated outputs must be bitwise identical on every device."""
        _, res = self._run_one()
        shards = [np.asarray(s.data) for s in res.theta.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)


class TestPodNSES:
    """Pod NS-ES/NSR-ES (parallel/nses_pod.py) vs host recomputation of the
    reference master update (nses.py:217-240)."""

    def setup_method(self):
        from deep_neuroevolution_tpu.envs import MazeEnv
        from deep_neuroevolution_tpu.models import ContinuousMLP
        from deep_neuroevolution_tpu.ops import novelty
        from deep_neuroevolution_tpu.parallel.nses_pod import make_pod_nses_step

        self.mesh = make_pop_mesh()
        self.env = MazeEnv()
        self.model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        self.opt = Adam(stepsize=0.01)
        self.table = NoiseTable.from_seed(count=100_000)
        self.archive = novelty.archive_init(64, 2)
        # seed the archive with a few distinct BC points
        for p in ([10.0, 10.0], [50.0, 50.0], [100.0, 20.0]):
            self.archive = novelty.archive_add(self.archive, jnp.asarray(p))
        self.k = 2
        self.make = make_pod_nses_step

    def _step(self, algo_type):
        step = self.make(
            self.env, self.model, self.opt, self.mesh,
            npairs_per_device=4, k=self.k, algo_type=algo_type, l2coeff=0.005,
        )
        theta = self.model.init_theta(jax.random.PRNGKey(0))
        opt_state = self.opt.init(self.model.num_params)
        keys = jax.random.split(jax.random.PRNGKey(7), 8)
        res = step(
            theta, opt_state, self.table.noise, keys,
            jnp.int32(50), jnp.float32(0.05), self.archive,
        )
        return theta, res

    def test_shapes_and_replication(self):
        _, res = self._step("ns")
        assert res.returns_n2.shape == (32, 2)
        assert res.novelty_n2.shape == (32, 2)
        assert res.bcs_n2.shape == (32, 2, 2)  # pair-aligned with returns
        shards = [np.asarray(s.data) for s in res.theta.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    def test_novelty_matches_host_knn(self):
        """Per-rollout novelty must equal the reference's mean distance to
        the k nearest archive points (nses.py:22-32), recomputed on host."""
        _, res = self._step("ns")
        pts = np.asarray(self.archive.points)[: int(self.archive.count)]
        bcs = np.asarray(res.bcs_n2)  # [n, 2, bc_dim]
        novs = np.asarray(res.novelty_n2)  # [n, 2] pairs (pos, neg)
        for i in range(novs.shape[0]):
            for c in (0, 1):
                d = np.sort(np.linalg.norm(pts - bcs[i, c], axis=1))[: self.k]
                np.testing.assert_allclose(novs[i, c], d.mean(), rtol=1e-5)

    def test_update_matches_host_recomputation_ns_and_nsr(self):
        for algo_type in ("ns", "nsr"):
            theta0, res = self._step(algo_type)
            novs = np.asarray(res.novelty_n2)
            rets = np.asarray(res.returns_n2)
            idxs = np.asarray(res.noise_idxs)
            table = np.asarray(self.table.noise)
            dim = self.model.num_params

            proc = ref_centered_ranks(novs)
            if algo_type == "nsr":
                proc = (proc + ref_centered_ranks(rets)) / 2.0
            w = proc[:, 0] - proc[:, 1]
            g = np.zeros(dim, np.float32)
            for i, idx in enumerate(idxs):
                g += w[i] * table[idx : idx + dim]
            g /= novs.size

            globalg = -g + 0.005 * np.asarray(theta0)
            a = 0.01 * np.sqrt(1 - 0.999) / (1 - 0.9)
            m = 0.1 * globalg
            v = 0.001 * globalg * globalg
            step = -a * m / (np.sqrt(v) + 1e-8)
            expected = np.asarray(theta0) + step
            np.testing.assert_allclose(
                np.asarray(res.theta), expected, rtol=2e-4, atol=2e-6
            )


class TestPodGA:
    def test_randomize_and_mutate_rounds(self):
        import jax
        import jax.numpy as jnp
        from deep_neuroevolution_tpu.parallel.ga_pod import make_pod_ga_step

        mesh = make_pop_mesh()
        env = CartPoleEnv()
        model = LinearClassifier(obs_dim=4, num_actions=2)
        table = NoiseTable.from_seed(count=100_000)
        step = make_pod_ga_step(env, model, mesh, n_per_device=4)
        scale_by = model.scale_by()
        keys = jax.random.split(jax.random.PRNGKey(0), 8)

        # generation 0: randomize
        res = step(None, table.noise, keys, jnp.int32(100), jnp.float32(0.1), scale_by)
        assert res.returns.shape == (32,)
        assert res.mutation_idx.shape == (32,)

        # pick top 4 as parents, run a mutation round
        import numpy as np

        order = np.argsort(-np.asarray(res.returns))[:4]
        dim = model.num_params
        parents = jnp.stack(
            [
                jnp.asarray(np.asarray(table.noise)[i : i + dim]) * scale_by
                for i in np.asarray(res.mutation_idx)[order]
            ]
        )
        res2 = step(parents, table.noise, keys, jnp.int32(100), jnp.float32(0.1), scale_by)
        assert res2.returns.shape == (32,)
        assert np.asarray(res2.parent_idx).max() < 4


def _silence():
    from deep_neuroevolution_tpu.utils import tabular
    tabular._logger._kvs.clear()
    tabular.dump_tabular = lambda: tabular._logger._kvs.clear()


class TestPodTrainers:
    """The mesh-aware trainers behind `main.py train` (VERDICT r1 missing #1):
    quota accounting, obstat merge, cutoff, GA ladder, NS archive insertion
    over the 8-virtual-device mesh."""

    def test_pod_es_learns_cartpole(self):
        _silence()
        from deep_neuroevolution_tpu.algos.es import ESConfig
        from deep_neuroevolution_tpu.parallel.trainers import PodESTrainer

        env = CartPoleEnv()
        model = LinearClassifier(obs_dim=4, num_actions=2)
        cfg = ESConfig(noise_stdev=0.2, population_size=256, num_eval_episodes=8)
        tr = PodESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.1),
                          noise_table=NoiseTable.from_seed(count=500_000), seed=0)
        best = -np.inf
        for _ in range(30):
            st = tr.train_step()
            best = max(best, st.eval_returns.mean())
            if best > 100:
                break
        assert best > 100, f"pod ES stuck: best={best}"
        assert tr.state.episodes_so_far >= 256

    def test_pod_es_quota_mode(self):
        _silence()
        from deep_neuroevolution_tpu.algos.es import ESConfig
        from deep_neuroevolution_tpu.parallel.trainers import PodESTrainer

        env = CartPoleEnv()
        model = LinearClassifier(obs_dim=4, num_actions=2)
        cfg = ESConfig(noise_stdev=0.2, episodes_per_batch=96, timesteps_per_batch=400,
                       eval_batch=2, num_eval_episodes=4)
        tr = PodESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.1),
                          noise_table=NoiseTable.from_seed(count=200_000), seed=0)
        st = tr.train_step()
        assert st.returns.size >= 96
        assert st.lengths.sum() >= 400
        assert st.eval_returns.shape == (4,)

    def test_pod_ga_ladder(self):
        _silence()
        from deep_neuroevolution_tpu.algos.ga import GAConfig
        from deep_neuroevolution_tpu.parallel.trainers import PodGATrainer

        env = CartPoleEnv()
        model = LinearClassifier(obs_dim=4, num_actions=2)
        cfg = GAConfig(population_size=32, selection_threshold=4,
                       validation_threshold=2, num_validation_episodes=2,
                       num_test_episodes=2, mutation_power=0.1, timesteps=1e9)
        tr = PodGATrainer(env, model, cfg,
                          noise_table=NoiseTable.from_seed(count=200_000), seed=0)
        tr.train_step()
        st = tr.train_step()
        assert len(st.population) == 32
        assert st.elite is not None and st.curr_solution is not None
        assert tr.cached_parent_thetas.shape == (4, model.num_params)
        # chains from the pod fitness pass reconstruct through the cache
        chain = next(o.seeds for o in st.population if len(o.seeds) == 2)
        via_lookup = np.asarray(tr._lookup_theta(chain))
        via_full = np.asarray(tr._reconstruct(chain))
        np.testing.assert_allclose(via_lookup, via_full, atol=1e-6)

    def test_pod_nses_archive_and_selection(self):
        _silence()
        from deep_neuroevolution_tpu.algos.nses import NSESConfig
        from deep_neuroevolution_tpu.envs import MazeEnv
        from deep_neuroevolution_tpu.models import ContinuousMLP
        from deep_neuroevolution_tpu.parallel.trainers import PodNSESTrainer

        env = MazeEnv()
        model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        cfg = NSESConfig(noise_stdev=0.05, population_size=32, k=3,
                         meta_population_size=2, num_rollouts=1,
                         episode_cutoff_mode=50)
        tr = PodNSESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.01),
                            noise_table=NoiseTable.from_seed(count=200_000), seed=0)
        n0 = int(tr.archive.count)
        r = tr.train_step()
        assert int(tr.archive.count) == n0 + 1  # parent mean-BC inserted
        assert r["returns"].shape == (16, 2)
        assert r["novelty"].shape == (16, 2)


class TestPodCheckpointCompat:
    """Scale-out restart = recreate + resume (SURVEY §5.3): snapshots move
    between single-device and pod trainers in both directions."""

    def test_snapshot_roundtrips_between_single_and_pod(self, tmp_path):
        _silence()
        from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
        from deep_neuroevolution_tpu.parallel.trainers import PodESTrainer
        from deep_neuroevolution_tpu.utils import checkpoint

        env = CartPoleEnv()
        model = LinearClassifier(obs_dim=4, num_actions=2)
        table = NoiseTable.from_seed(count=200_000)
        cfg = ESConfig(noise_stdev=0.2, population_size=32, num_eval_episodes=0)

        pod = PodESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.1),
                           noise_table=table, seed=0)
        pod.train_step()
        path = str(tmp_path / "snap.pkl")
        checkpoint.save_trainer(path, pod)

        single = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.1),
                           noise_table=table, seed=99)
        checkpoint.load_trainer(path, single)
        np.testing.assert_allclose(
            np.asarray(single.state.theta), np.asarray(pod.state.theta)
        )
        assert single.state.iteration == 1
        single.train_step()  # resumes cleanly

        # and back: a single-device snapshot into a pod trainer
        checkpoint.save_trainer(path, single)
        pod2 = PodESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.1),
                            noise_table=table, seed=7)
        checkpoint.load_trainer(path, pod2)
        assert pod2.state.iteration == 2
        pod2.train_step()

    def test_snapshot_roundtrips_between_single_and_hostpod(self, tmp_path):
        """Host-pod (per-process engine pools) snapshots are family-compatible
        with single-device trainers too (checkpoint.load_trainer family())."""
        _silence()
        from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN
        from deep_neuroevolution_tpu.parallel.host_pod import HostPodESTrainer
        from deep_neuroevolution_tpu.utils import checkpoint

        env = AtariEnv("toy", batch_size=4, num_threads=1, pipeline_groups=1,
                       warp_size=20)
        try:
            model = SmallDQN(num_actions=env.num_actions, in_hw=20, in_ch=4)
            table = NoiseTable.from_seed(count=model.num_params + 10_000)
            cfg = ESConfig(noise_stdev=0.05, population_size=8,
                           num_eval_episodes=0, episode_cutoff_mode=20)
            hp = HostPodESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.05),
                                  noise_table=table, seed=0, emulate_procs=2)
            hp.train_step()
            path = str(tmp_path / "hp_snap.pkl")
            checkpoint.save_trainer(path, hp)

            single = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.05),
                               noise_table=table, seed=9)
            checkpoint.load_trainer(path, single)
            np.testing.assert_allclose(
                np.asarray(single.state.theta), np.asarray(hp.state.theta)
            )
            assert single.state.iteration == 1
        finally:
            env.close()

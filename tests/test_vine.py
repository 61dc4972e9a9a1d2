"""VINE dump + inspector tests: format parity, roundtrip, reduction, plot."""

import numpy as np

from deep_neuroevolution_tpu.inspector import (
    assemble,
    disassemble,
    list_generations,
    load_offspring,
    load_parent,
    plot_cloud_series,
    reduce_dim,
)
from deep_neuroevolution_tpu.utils import vine


def _write_gen(base, gen, n=20, bc_dim=2, seed=0):
    rs = np.random.RandomState(seed + gen)
    bcs = rs.randn(n, 2, bc_dim).astype(np.float32) * 20 + 100
    rets = rs.randn(n, 2).astype(np.float32)
    lens = rs.randint(10, 400, (n, 2))
    idxs = rs.randint(0, 10**6, n)
    seeds = rs.randint(0, 2**31 - 1, n)
    vine.master_extract_cloud(base, gen, bcs, rets, lens, idxs, seeds)
    eval_bcs = rs.randn(4, bc_dim) * 20 + 100
    eval_rets = rs.randn(4) * 5
    eval_lens = rs.randint(10, 400, 4)
    vine.master_extract_parent(base, gen, eval_bcs, eval_rets, eval_lens, 0.02)
    return bcs, rets, lens, idxs, seeds, eval_bcs, eval_rets


class TestVineFormat:
    def test_roundtrip(self, tmp_path):
        base = str(tmp_path)
        bcs, rets, lens, idxs, seeds, eval_bcs, eval_rets = _write_gen(base, 3)
        assert list_generations(base) == [3]

        cloud = load_offspring(base, 3)
        assert cloud.bc.shape == (40, 2)  # pairs flattened with sign
        np.testing.assert_allclose(cloud.bc[0], bcs[0, 0], rtol=1e-6)
        np.testing.assert_allclose(cloud.bc[1], bcs[0, 1], rtol=1e-6)
        assert cloud.sign[0] == 1.0 and cloud.sign[1] == -1.0
        np.testing.assert_allclose(cloud.fitness[0], rets[0, 0], rtol=1e-6)
        assert cloud.noise_idx[0] == idxs[0]
        assert cloud.policy_seed[0] == seeds[0]

        parent = load_parent(base, 3)
        # parent point = eval rollout closest to int(mean(eval_rets))
        target = int(np.mean(eval_rets))
        expect = int(np.abs(eval_rets - target).argmin())
        np.testing.assert_allclose(parent.bc, eval_bcs[expect], rtol=1e-6)
        assert parent.extras[-1] == np.float64(np.float32(0.02)) or abs(parent.extras[-1] - 0.02) < 1e-9

    def test_reference_loader_compat(self, tmp_path):
        """Files must be np.loadtxt / pd.read_csv(sep=' ') readable — the
        reference inspector's exact parsing (load_data.py:53-99)."""
        import pandas as pd

        base = str(tmp_path)
        _write_gen(base, 1)
        pfile = f"{base}/snapshots/snapshot_gen_0001/snapshot_parent_0001.dat"
        ofile = f"{base}/snapshots/snapshot_gen_0001/snapshot_offspring_0001.dat"
        pdata = np.loadtxt(pfile)
        assert pdata.shape == (6,)  # bc(2) + fitness + length + seed + stdev
        odata = pd.read_csv(ofile, sep=" ", header=None).values
        assert odata.shape == (40, 7)  # bc(2) + fit + len + idx + seed + sign


class TestReduction:
    def test_pca_pipeline(self, tmp_path):
        base = str(tmp_path)
        for g in range(1, 4):
            _write_gen(base, g, bc_dim=8)
        X, p_opt, ch_opt, num_os, labels = assemble(1, 3, base, bc_dim=8)
        assert X.shape == (3 * 41, 8)
        X_r = reduce_dim(X, labels=np.ravel(np.round(labels / 100)), method="pca")
        assert X_r.shape == (3 * 41, 2)
        out = disassemble(
            X_r, p_opt, ch_opt, "pca", start_iter=1, end_iter=3, path=base, chunk=41
        )
        cloud = load_offspring(out, 2, bc_dim=2)
        assert cloud.bc.shape == (40, 2)
        parent = load_parent(out, 2, bc_dim=2)
        assert parent.extras.shape == (2,)

    def test_two_end(self):
        X = np.arange(24, dtype=np.float64).reshape(4, 6)
        X_r = reduce_dim(X, labels=np.zeros(4), method="two_end")
        np.testing.assert_array_equal(X_r[:, 0], X[:, 2])
        np.testing.assert_array_equal(X_r[:, 1], X[:, 5])


class TestPlot:
    def test_render_png(self, tmp_path):
        base = str(tmp_path)
        for g in range(1, 4):
            _write_gen(base, g)
        out = str(tmp_path / "clouds.png")
        plot_cloud_series(base, out_png=out)
        import os

        assert os.path.exists(out) and os.path.getsize(out) > 10_000


class TestESIntegration:
    def test_es_writes_vine_snapshots(self, tmp_path):
        from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
        from deep_neuroevolution_tpu.envs import MazeEnv
        from deep_neuroevolution_tpu.models import ContinuousMLP
        from deep_neuroevolution_tpu.ops import NoiseTable
        from deep_neuroevolution_tpu.utils import tabular

        tabular.dump_tabular = lambda: tabular._logger._kvs.clear()
        env = MazeEnv()
        model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        cfg = ESConfig(
            noise_stdev=0.05,
            population_size=16,
            num_eval_episodes=4,
            episode_cutoff_mode=50,
            vine_snapshot_dir=str(tmp_path),
        )
        tr = ESTrainer(env, model, cfg, noise_table=NoiseTable.from_seed(count=100_000), seed=0)
        tr.train_step()
        assert list_generations(str(tmp_path)) == [1]
        cloud = load_offspring(str(tmp_path), 1)
        assert cloud.bc.shape == (16, 2)
        parent = load_parent(str(tmp_path), 1)
        assert parent.bc.shape == (2,)
        # parent policy snapshot saved alongside
        import os

        assert os.path.exists(
            str(tmp_path / "snapshots" / "snapshot_gen_0001" / "snapshot_parent_0001.h5")
        )


class TestGAVine:
    def test_ga_writes_vine_snapshots(self, tmp_path):
        from deep_neuroevolution_tpu.algos.ga import GAConfig, GATrainer
        from deep_neuroevolution_tpu.envs import MazeEnv
        from deep_neuroevolution_tpu.models import ContinuousMLP
        from deep_neuroevolution_tpu.ops import NoiseTable
        from deep_neuroevolution_tpu.utils import tabular

        tabular.dump_tabular = lambda: tabular._logger._kvs.clear()
        env = MazeEnv()
        model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        cfg = GAConfig(
            population_size=12,
            selection_threshold=4,
            validation_threshold=2,
            num_validation_episodes=2,
            num_test_episodes=2,
            mutation_power=0.05,
            episode_cutoff_mode=40,
            vine_snapshot_dir=str(tmp_path),
        )
        tr = GATrainer(env, model, cfg, noise_table=NoiseTable.from_seed(count=100_000))
        tr.train_step()
        assert list_generations(str(tmp_path)) == [1]
        cloud = load_offspring(str(tmp_path), 1)
        assert cloud.bc.shape == (24, 2)  # 12 offspring × duplicated sign columns
        parent = load_parent(str(tmp_path), 1)
        assert parent.bc.shape == (2,)

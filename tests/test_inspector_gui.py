"""Interactive VINE GUI tests (visual_inspector/figure_base + figure_custom
capabilities, SURVEY.md C33) — headless under Agg; state transitions are
driven through Inspector methods exactly as the widget callbacks would."""

import matplotlib

matplotlib.use("Agg", force=True)

import numpy as np
import pytest

from deep_neuroevolution_tpu.inspector.interactive import (
    NUM_BINS,
    Inspector,
    bin_offspring,
    color_index,
    gen_colors,
    main as gui_main,
)
from deep_neuroevolution_tpu.utils.vine import (
    master_extract_cloud,
    master_extract_parent,
)

N_OFFSPRING = 20  # antithetic pairs → 40 rows per generation
GENS = list(range(1, 7))


def _make_snapshots(base, gens=GENS, model=None, theta=None, ref_batch=None):
    rng = np.random.RandomState(0)
    for gen in gens:
        master_extract_cloud(
            str(base),
            gen,
            rng.randn(N_OFFSPRING, 2, 2) * 5,
            rng.rand(N_OFFSPRING, 2) * 100,
            rng.randint(10, 50, (N_OFFSPRING, 2)).astype(float),
            rng.randint(0, 5000, N_OFFSPRING),
            rng.randint(0, 2**31 - 1, N_OFFSPRING),
        )
        master_extract_parent(
            str(base),
            gen,
            rng.randn(4, 2),
            rng.rand(4) * 100,
            rng.randint(10, 50, 4).astype(float),
            noise_stdev=0.05,
            model=model,
            theta=theta,
            ref_batch=ref_batch,
            seed=gen,
        )


@pytest.fixture(scope="module")
def snapdir(tmp_path_factory):
    base = tmp_path_factory.mktemp("vine")
    _make_snapshots(base)
    return str(base)


class TestBinningGolden:
    """bin_offspring restates load_data.py:68-99 — verify against a direct
    numpy re-derivation."""

    def test_bins_match_reference_formula(self):
        rng = np.random.RandomState(3)
        fit = np.sort(rng.rand(200) * 50)
        pfit = 30.0
        bins, minfit, maxfit = bin_offspring(fit, pfit)

        # reference: v = linspace(min, max, numBins+1); ind = searchsorted(fit, v[1:numBins], 'right')
        maxf = max(pfit, fit[-1])
        minf = min(pfit, fit[0])
        v = np.linspace(minf, maxf, NUM_BINS + 1)
        ind = np.searchsorted(fit, v[1:NUM_BINS], side="right")
        assert minfit == minf and maxfit == maxf
        assert bins[0] == range(0, ind[0])
        for i in range(len(ind) - 1):
            assert bins[i + 1] == range(ind[i], ind[i + 1])
        # top split: last bin had > 10 → split off the top 10
        assert len(bins) == NUM_BINS + 1
        assert bins[-1] == range(len(fit) - 10, len(fit))

    def test_small_top_bin_not_split(self):
        fit = np.sort(np.linspace(0, 1, 12))
        bins, _, _ = bin_offspring(fit, 0.5)
        assert len(bins) in (NUM_BINS, NUM_BINS + 1)
        total = sum(len(b) for b in bins)
        assert total == len(fit)

    def test_color_index_clipping(self):
        assert color_index(5.0, 5.0, 5.0) == 0  # degenerate range
        assert color_index(10.0, 0.0, 10.0) == NUM_BINS - 1
        assert color_index(-1.0, 0.0, 10.0) == 0
        assert color_index(0.0, 0.0, 10.0) == 0

    def test_gen_colors_cycle(self):
        assert gen_colors(0) == gen_colors(10)
        assert len(gen_colors(3)) == NUM_BINS
        assert all(c.startswith("#") and len(c) == 7 for c in gen_colors(7))


def make_inspector(snapdir, **kw):
    kw.setdefault("interactive", False)
    return Inspector([snapdir], **kw)


class TestNavigation:
    def test_initial_state(self, snapdir):
        insp = make_inspector(snapdir)
        assert insp.gens == GENS
        assert insp.visible == set()
        cp = insp.cloud_plots[0]
        assert set(cp.gens) == set(GENS)
        # all offspring artists invisible initially
        for ga in cp.gens.values():
            assert all(not a.get_visible() for a in ga.bin_artists)

    def test_next_prev_walk(self, snapdir):
        insp = make_inspector(snapdir)
        insp.next()
        assert insp.visible == {1}
        cp = insp.cloud_plots[0]
        assert all(a.get_visible() for a in cp.gens[1].bin_artists)
        insp.next()  # visible range 1 → gen 1 dropped
        assert insp.visible == {2}
        assert all(not a.get_visible() for a in cp.gens[1].bin_artists)
        insp.prev()
        assert insp.visible == {1}

    def test_prev_from_empty_starts_at_end(self, snapdir):
        insp = make_inspector(snapdir)
        insp.prev()
        assert insp.visible == {GENS[-1]}

    def test_visible_range(self, snapdir):
        insp = make_inspector(snapdir, visible_range=3)
        insp.next()
        insp.next()
        insp.next()
        assert insp.visible == {1, 2, 3}
        insp.next()  # cap 3 → drop the min
        assert insp.visible == {2, 3, 4}
        insp.set_visible_range(1)
        insp.next()
        assert insp.visible == {5}

    def test_toggle_and_fitness_markers(self, snapdir):
        insp = make_inspector(snapdir)
        insp.toggle_gen(4)
        assert insp.is_visible(4)
        pt, annot = insp.fitness_plot._markers[4]
        assert pt.get_visible() and annot.get_visible()
        insp.toggle_gen(4)
        assert not insp.is_visible(4)
        assert not pt.get_visible()

    def test_reset_clears_everything(self, snapdir):
        insp = make_inspector(snapdir, visible_range=3)
        insp.next()
        insp.next()
        insp.reset()
        assert insp.visible == set()
        assert not insp.fitness_plot.dot.get_visible()

    def test_fast_pace(self, snapdir):
        insp = make_inspector(snapdir)
        assert insp.step == 1  # < 100 gens
        insp.step = 2
        insp.next()
        assert insp.visible == {1}
        insp.next()
        assert insp.visible == {3}
        insp.toggle_fast_pace()
        assert insp.step == 1

    def test_arrow_keys(self, snapdir):
        insp = make_inspector(snapdir)

        class E:
            key = "right"

        insp.on_key(E())
        assert insp.visible == {1}
        E.key = "left"
        insp.on_key(E())
        assert insp.visible == {1} or insp.visible == set()  # min already shown → error


class TestCloudModes:
    def test_top_only_shows_last_bin(self, snapdir):
        insp = make_inspector(snapdir)
        insp.set_cloud_mode("top")
        insp.show(2)
        ga = insp.cloud_plots[0].gens[2]
        vis = [a.get_visible() for a in ga.bin_artists]
        assert vis[-1] and not any(vis[:-1])

    def test_none_hides_all(self, snapdir):
        insp = make_inspector(snapdir)
        insp.show(2)
        insp.set_cloud_mode("none")
        ga = insp.cloud_plots[0].gens[2]
        assert not any(a.get_visible() for a in ga.bin_artists)
        # parent annotation still marks the generation
        assert ga.annotation.get_visible()
        insp.set_cloud_mode("all")
        assert all(a.get_visible() for a in ga.bin_artists)


class TestPoints:
    def test_point_from_row_layout(self, snapdir):
        insp = make_inspector(snapdir)
        cp = insp.cloud_plots[0]
        row = cp.gens[3].table[5]
        pt = cp.point_from_row(3, row)
        assert pt.gen == 3 and not pt.parent
        assert pt.x == row[0] and pt.y == row[1] and pt.fitness == row[2]
        assert "Offspring" in pt.message

    def test_select_point_sets_labels(self, snapdir):
        insp = make_inspector(snapdir)
        cp = insp.cloud_plots[0]
        pt = cp.point_from_row(3, cp.gens[3].table[0])
        insp.select_point(pt)
        assert cp.select_annot.get_visible()
        assert cp.cbar_ax.get_visible()
        assert pt.message in cp.fig._suptitle.get_text()

    def test_parent_point_hides_offspring_annot(self, snapdir):
        insp = make_inspector(snapdir)
        cp = insp.cloud_plots[0]
        insp.select_point(cp.parent_point(3))
        assert not cp.select_annot.get_visible()

    def test_replay_callback_receives_point(self, snapdir):
        calls = []
        insp = make_inspector(
            snapdir, replay_fn=lambda path, pt, stoch: calls.append((path, pt, stoch))
        )
        cp = insp.cloud_plots[0]
        pt = cp.point_from_row(2, cp.gens[2].table[7])
        insp.replay(cp, pt)
        assert len(calls) == 1
        path, got, stoch = calls[0]
        assert path == snapdir and got is pt and stoch is False
        insp.stochastic = True
        insp.replay(cp, pt)
        assert calls[1][2] is True

    def test_hover_syncs_annotations(self, snapdir):
        insp = make_inspector(snapdir)
        insp.hover(4)
        assert insp.cloud_plots[0].hover_annot.get_visible()
        assert insp.fitness_plot.hover_annot.get_visible()
        assert insp.cloud_plots[0].hover_annot.get_text() == "4"
        insp.hover(None)
        assert not insp.cloud_plots[0].hover_annot.get_visible()


class TestMovie:
    def test_movie_frames(self, snapdir):
        insp = make_inspector(snapdir)
        ani = insp.movie(insp.cloud_plots[0])
        # step 1 → one frame per generation
        assert len(ani._framedata) == len(GENS)

    def test_movie_starts_at_min_visible(self, snapdir):
        insp = make_inspector(snapdir)
        insp.show(4)
        ani = insp.movie(insp.cloud_plots[0])
        assert len(ani._framedata) == len([g for g in GENS if g >= 4])


class TestHiDimBC:
    def test_trajectory_line_set_on_select(self, tmp_path):
        rng = np.random.RandomState(1)
        d = 8  # 4 x-coords + 4 y-coords per BC
        for gen in (1, 2):
            master_extract_cloud(
                str(tmp_path), gen,
                rng.randn(6, 2, d), rng.rand(6, 2) * 10,
                rng.randint(5, 20, (6, 2)).astype(float),
                rng.randint(0, 100, 6), rng.randint(0, 100, 6),
            )
            master_extract_parent(
                str(tmp_path), gen, rng.randn(2, d), rng.rand(2) * 10,
                rng.randint(5, 20, 2).astype(float), noise_stdev=0.1, seed=gen,
            )
        insp = Inspector(
            [str(tmp_path)], bc_dim=d, hi_dim_bc=(str(tmp_path), d), interactive=False
        )
        hd = insp.cloud_plots[-1]
        pt = hd.point_from_row(1, hd.gens[1].table[0])
        assert len(pt.xs) == d // 2
        insp.select_point(pt)
        x, y = hd.traj_line.get_data()
        assert len(x) == d // 2
        np.testing.assert_allclose(x, pt.xs)


class TestCLI:
    def test_main_builds_inspector(self, snapdir):
        insp = gui_main([str(GENS[0]), str(GENS[-1]), snapdir, "--visible_range", "2"])
        assert isinstance(insp, Inspector)
        assert insp.max_visible == 2
        assert insp.interactive is False  # Agg


class TestReplayEndToEnd:
    def test_replay_point_deterministic(self, tmp_path):
        import jax

        from deep_neuroevolution_tpu.inspector.interactive import Point
        from deep_neuroevolution_tpu.inspector.replay import replay_point
        from deep_neuroevolution_tpu.models import ContinuousMLP
        from deep_neuroevolution_tpu.ops import NoiseTable

        model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        theta = model.init_theta(jax.random.PRNGKey(0))
        _make_snapshots(tmp_path, gens=[1], model=model, theta=theta)
        table = NoiseTable.from_seed(count=10_000)

        row = np.array([1.0, 2.0, 7.5, 30.0, 123, 77, -1.0])
        pt = Point(gen=1, parent=False, x=1.0, y=2.0, fitness=7.5, row=row)
        res1 = replay_point(str(tmp_path), pt, noise_table=table)
        res2 = replay_point(str(tmp_path), pt, noise_table=table)
        assert res1["seed"] == 77 == res2["seed"]
        assert res1["return_mean"] == res2["return_mean"]
        assert "bc_trajectory" in res1

    def test_replay_parent_point(self, tmp_path):
        import jax

        from deep_neuroevolution_tpu.inspector.interactive import Point
        from deep_neuroevolution_tpu.inspector.replay import replay_point
        from deep_neuroevolution_tpu.models import ContinuousMLP

        model = ContinuousMLP(obs_dim=11, ac_dim=2, hidden=8)
        theta = model.init_theta(jax.random.PRNGKey(0))
        _make_snapshots(tmp_path, gens=[1], model=model, theta=theta)
        pt = Point(gen=1, parent=True, x=0.0, y=0.0, fitness=1.0,
                   row=np.array([0.0, 0.0, 1.0, 10.0, 1, 0.05]))
        res = replay_point(str(tmp_path), pt)  # parent: no noise table needed
        assert res["lengths"] and res["returns"]


class TestProcessBCCLI:
    """Standalone reduction CLI (visual_inspector/process_bc.py parity)."""

    def test_pca_reduction_roundtrip(self, tmp_path):
        rng = np.random.RandomState(0)
        D = 8
        for gen in (1, 2, 3):
            master_extract_cloud(
                str(tmp_path), gen, rng.randn(12, 2, D), rng.rand(12, 2) * 100,
                rng.randint(5, 20, (12, 2)).astype(float),
                rng.randint(0, 100, 12), rng.randint(0, 100, 12),
            )
            master_extract_parent(
                str(tmp_path), gen, rng.randn(3, D), rng.rand(3) * 100,
                rng.randint(5, 20, 3).astype(float), noise_stdev=0.1, seed=gen,
            )
        from deep_neuroevolution_tpu.inspector.load_data import (
            list_generations,
            load_offspring,
            load_parent,
        )
        from deep_neuroevolution_tpu.inspector.process_bc import main as pbc_main

        out = pbc_main(["1", "3", str(tmp_path), str(D), "--method", "pca"])
        assert list_generations(out) == [1, 2, 3]
        cloud = load_offspring(out, 2, 2)
        assert cloud.bc.shape == (24, 2)  # 12 antithetic pairs → 24 rows, 2-D
        # option columns (fitness, length, noise_idx, seed, sign) preserved
        orig = load_offspring(str(tmp_path), 2, D)
        np.testing.assert_allclose(cloud.fitness, orig.fitness)
        np.testing.assert_array_equal(cloud.noise_idx, orig.noise_idx)
        parent = load_parent(out, 2, 2)
        assert parent.bc.shape == (2,)
        # reduced output opens in the interactive GUI directly
        insp = Inspector([out], interactive=False)
        assert insp.gens == [1, 2, 3]

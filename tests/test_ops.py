"""Golden tests for the L1 primitives against reference formulas
(es_distributed/es.py, optimizers.py, tf_util.py — reimplemented in numpy
here from the documented semantics, then checked against the JAX ops)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep_neuroevolution_tpu.ops import (
    fitness,
    flat,
    genome,
    noise,
    obstat,
    optim,
    schedules,
)


# ---------------------------------------------------------------- reference
# numpy re-statements of the reference formulas (for golden comparison)


def ref_compute_ranks(x):
    # kind='stable' pins tie order; the reference's default quicksort makes
    # tie order arbitrary, and jnp.argsort is stable — equivalent semantics
    # up to permutation within tie groups.
    ranks = np.empty(len(x), dtype=int)
    ranks[x.argsort(kind="stable")] = np.arange(len(x))
    return ranks


def ref_centered_ranks(x):
    y = ref_compute_ranks(x.ravel()).reshape(x.shape).astype(np.float32)
    y /= x.size - 1
    y -= 0.5
    return y


# ------------------------------------------------------------------- noise


class TestNoiseTable:
    def test_from_seed_matches_randomstate(self):
        t = noise.NoiseTable.from_seed(count=1000, seed=123)
        expect = np.random.RandomState(123).randn(1000).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(t.noise), expect)

    def test_get_slice(self):
        t = noise.NoiseTable.from_seed(count=1000, seed=5)
        got = np.asarray(t.get(jnp.int32(17), 64))
        np.testing.assert_array_equal(got, np.asarray(t.noise)[17:81])

    def test_get_batch(self):
        t = noise.NoiseTable.from_seed(count=1000, seed=5)
        idxs = jnp.asarray([0, 10, 900], jnp.int32)
        got = np.asarray(t.get_batch(idxs, 100))
        for row, i in zip(got, [0, 10, 900]):
            np.testing.assert_array_equal(row, np.asarray(t.noise)[i : i + 100])

    def test_sample_index_in_range(self):
        t = noise.NoiseTable.from_seed(count=1000, seed=5)
        keys = jax.random.split(jax.random.PRNGKey(0), 200)
        idxs = np.asarray([t.sample_index(k, 100) for k in keys[:20]])
        assert idxs.min() >= 0 and idxs.max() <= 900
        batch = np.asarray(t.sample_index_batch(keys[0], 100, 500))
        assert batch.min() >= 0 and batch.max() <= 900

    def test_virtual_noise_deterministic(self):
        v = noise.VirtualNoise.from_seed(count=10_000, seed=7)
        a = np.asarray(v.get(jnp.int32(42), 128))
        b = np.asarray(v.get(jnp.int32(42), 128))
        c = np.asarray(v.get(jnp.int32(43), 128))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
        batch = np.asarray(v.get_batch(jnp.asarray([42, 43], jnp.int32), 128))
        np.testing.assert_array_equal(batch[0], a)
        np.testing.assert_array_equal(batch[1], c)


# ------------------------------------------------------------------ fitness


class TestFitness:
    def test_ranks_match_reference(self):
        x = np.random.RandomState(0).randn(101).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(fitness.compute_ranks(jnp.asarray(x))), ref_compute_ranks(x)
        )

    def test_centered_ranks_match_reference_2d(self):
        x = np.random.RandomState(1).randn(50, 2).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(fitness.compute_centered_ranks(jnp.asarray(x))),
            ref_centered_ranks(x),
            rtol=1e-6,
        )

    def test_centered_ranks_range(self):
        x = np.random.RandomState(2).randn(64).astype(np.float32)
        y = np.asarray(fitness.compute_centered_ranks(jnp.asarray(x)))
        assert y.min() == -0.5 and y.max() == 0.5

    def test_batched_weighted_sum(self):
        rs = np.random.RandomState(3)
        w = rs.randn(17).astype(np.float32)
        v = rs.randn(17, 29).astype(np.float32)
        total, n = fitness.batched_weighted_sum(jnp.asarray(w), jnp.asarray(v))
        np.testing.assert_allclose(np.asarray(total), w @ v, rtol=1e-5)
        assert n == 17

    def test_gradient_from_noise_matches_dense(self):
        t = noise.NoiseTable.from_seed(count=5000, seed=11)
        rs = np.random.RandomState(4)
        idxs = rs.randint(0, 5000 - 64 + 1, size=37).astype(np.int32)
        w = rs.randn(37).astype(np.float32)
        dim = 64
        dense = sum(
            w[i] * np.asarray(t.noise)[idxs[i] : idxs[i] + dim] for i in range(37)
        )
        g = fitness.gradient_from_noise(t.noise, jnp.asarray(idxs), jnp.asarray(w), dim, chunk=8)
        np.testing.assert_allclose(np.asarray(g), dense, rtol=1e-4, atol=1e-5)

    def test_process_returns_modes(self):
        rs = np.random.RandomState(5)
        r = rs.randn(20, 2).astype(np.float32)
        sr = np.sign(r).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(fitness.process_returns(jnp.asarray(r), jnp.asarray(sr), "centered_rank")),
            ref_centered_ranks(r),
            rtol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(fitness.process_returns(jnp.asarray(r), jnp.asarray(sr), "sign")), sr
        )
        np.testing.assert_allclose(
            np.asarray(
                fitness.process_returns(jnp.asarray(r), jnp.asarray(sr), "centered_sign_rank")
            ),
            ref_centered_ranks(sr),
            rtol=1e-6,
        )


# --------------------------------------------------------------- optimizers


def ref_adam(theta, grads, stepsize, beta1=0.9, beta2=0.999, eps=1e-8):
    """Reference Adam trajectory (optimizers.py:35-50)."""
    m = np.zeros_like(theta)
    v = np.zeros_like(theta)
    thetas, ratios = [], []
    for t, g in enumerate(grads, start=1):
        a = stepsize * np.sqrt(1 - beta2**t) / (1 - beta1**t)
        m = beta1 * m + (1 - beta1) * g
        v = beta2 * v + (1 - beta2) * g * g
        step = -a * m / (np.sqrt(v) + eps)
        ratios.append(np.linalg.norm(step) / np.linalg.norm(theta))
        theta = theta + step
        thetas.append(theta.copy())
    return thetas, ratios


class TestOptim:
    def test_adam_matches_reference(self):
        rs = np.random.RandomState(6)
        theta0 = rs.randn(33).astype(np.float32)
        grads = [rs.randn(33).astype(np.float32) for _ in range(5)]
        ref_thetas, ref_ratios = ref_adam(theta0, grads, 0.01)

        opt = optim.Adam(stepsize=0.01)
        state = opt.init(33)
        theta = jnp.asarray(theta0)
        for g, rt, rr in zip(grads, ref_thetas, ref_ratios):
            state, theta, ratio = opt.update(state, theta, jnp.asarray(g))
            np.testing.assert_allclose(np.asarray(theta), rt, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(float(ratio), rr, rtol=1e-3)

    @pytest.mark.parametrize("style", ["openai", "tf"])
    def test_sgd_styles(self, style):
        rs = np.random.RandomState(7)
        theta0 = rs.randn(10).astype(np.float32)
        g1 = rs.randn(10).astype(np.float32)
        g2 = rs.randn(10).astype(np.float32)
        m = 0.9

        opt = optim.SGD(stepsize=0.1, momentum=m, momentum_style=style)
        state = opt.init(10)
        state, th1, _ = opt.update(state, jnp.asarray(theta0), jnp.asarray(g1))
        state, th2, _ = opt.update(state, th1, jnp.asarray(g2))

        if style == "openai":
            v1 = (1 - m) * g1
            v2 = m * v1 + (1 - m) * g2
        else:
            v1 = g1
            v2 = m * v1 + g2
        exp1 = theta0 - 0.1 * v1
        exp2 = exp1 - 0.1 * v2
        np.testing.assert_allclose(np.asarray(th1), exp1, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(th2), exp2, rtol=1e-5)

    def test_update_is_jittable(self):
        opt = optim.Adam(stepsize=0.01)
        state = opt.init(16)
        step = jax.jit(opt.update)
        state, theta, ratio = step(state, jnp.ones(16), jnp.ones(16))
        assert theta.shape == (16,)

    def test_make_optimizer(self):
        assert isinstance(optim.make_optimizer("adam", stepsize=0.01), optim.Adam)
        assert isinstance(optim.make_optimizer("sgd", stepsize=0.1), optim.SGD)


# ------------------------------------------------------------------- obstat


class TestObstat:
    def test_matches_reference_running_stat(self):
        rs = np.random.RandomState(8)
        xs = rs.randn(100, 7).astype(np.float32)
        eps = 1e-2

        # reference trajectory (es.py:26-48)
        ref_sum = np.zeros(7, np.float32)
        ref_sumsq = np.full(7, eps, np.float32)
        ref_count = eps

        stat = obstat.init((7,), eps)
        for batch in np.split(xs, 4):
            s, ssq, c = batch.sum(0), np.square(batch).sum(0), len(batch)
            ref_sum += s
            ref_sumsq += ssq
            ref_count += c
            stat = obstat.increment(stat, jnp.asarray(s), jnp.asarray(ssq), c)

        ref_mean = ref_sum / ref_count
        ref_std = np.sqrt(np.maximum(ref_sumsq / ref_count - ref_mean**2, 1e-2))
        np.testing.assert_allclose(np.asarray(obstat.mean(stat)), ref_mean, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(obstat.std(stat)), ref_std, rtol=1e-5)

    def test_set_from_init_roundtrip(self):
        stat = obstat.set_from_init(np.zeros(4), 0.001 * np.ones(4), 1e5)
        np.testing.assert_allclose(np.asarray(obstat.mean(stat)), np.zeros(4), atol=1e-7)
        # std floor of 1e-2 applies (reference clips at sqrt(1e-2)=0.1)
        np.testing.assert_allclose(np.asarray(obstat.std(stat)), 0.1 * np.ones(4), rtol=1e-4)


# ---------------------------------------------------------------- schedules


class TestSchedules:
    def test_constant(self):
        s = schedules.make_schedule(0.02)
        assert float(s.value(iteration=123)) == pytest.approx(0.02)

    def test_linear(self):
        s = schedules.make_schedule(
            {"type": "LinearSchedule", "schedule": 100, "initial_p": 1.0, "final_p": 0.0, "field": "frames"}
        )
        assert float(s.value(frames=0)) == pytest.approx(1.0)
        assert float(s.value(frames=50)) == pytest.approx(0.5)
        assert float(s.value(frames=1000)) == pytest.approx(0.0)

    def test_exponential(self):
        s = schedules.make_schedule(
            {"type": "ExponentialSchedule", "schedule": 10, "initial_p": 1.0, "final_p": 0.01, "field": "it"}
        )
        assert float(s.value(it=0)) == pytest.approx(1.0, rel=1e-4)
        assert float(s.value(it=10)) == pytest.approx(0.01, rel=1e-4)
        assert float(s.value(it=5)) == pytest.approx(0.1, rel=1e-3)


# --------------------------------------------------------------------- flat


class TestFlat:
    SPECS = [
        flat.ParamSpec("l0/w", (5, 8), "normc", 1.0),
        flat.ParamSpec("l0/b", (8,), "zeros"),
        flat.ParamSpec("out/w", (8, 3), "normc", 0.01),
        flat.ParamSpec("out/b", (3,), "zeros"),
    ]

    def test_roundtrip(self):
        theta = flat.init_theta(jax.random.PRNGKey(0), self.SPECS)
        assert theta.shape == (flat.total_dim(self.SPECS),)
        parts = flat.unflatten(theta, self.SPECS)
        theta2 = flat.flatten(parts, self.SPECS)
        np.testing.assert_array_equal(np.asarray(theta), np.asarray(theta2))

    def test_normc_column_norms(self):
        theta = flat.init_theta(jax.random.PRNGKey(1), self.SPECS)
        parts = flat.unflatten(theta, self.SPECS)
        norms = np.linalg.norm(np.asarray(parts["l0/w"]), axis=0)
        np.testing.assert_allclose(norms, np.ones(8), rtol=1e-5)
        norms_out = np.linalg.norm(np.asarray(parts["out/w"]), axis=0)
        np.testing.assert_allclose(norms_out, 0.01 * np.ones(3), rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(parts["l0/b"]), np.zeros(8))

    def test_reinit_normalizes_existing(self):
        rs = np.random.RandomState(9)
        theta = jnp.asarray(rs.randn(flat.total_dim(self.SPECS)).astype(np.float32))
        out = flat.reinit_theta(theta, self.SPECS)
        parts = flat.unflatten(out, self.SPECS)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(parts["l0/w"]), axis=0), np.ones(8), rtol=1e-5
        )
        np.testing.assert_array_equal(np.asarray(parts["l0/b"]), np.zeros(8))
        # direction preserved per column
        orig = np.asarray(flat.unflatten(theta, self.SPECS)["l0/w"])
        new = np.asarray(parts["l0/w"])
        cos = (orig * new).sum(0) / (np.linalg.norm(orig, axis=0) * np.linalg.norm(new, axis=0))
        np.testing.assert_allclose(cos, np.ones(8), rtol=1e-5)

    def test_scale_by_vector(self):
        sb = np.asarray(flat.scale_by_vector(self.SPECS, "fan_in"))
        assert sb.shape == (flat.total_dim(self.SPECS),)
        np.testing.assert_allclose(sb[:40], 1.0 / np.sqrt(5.0))  # l0/w fan_in=5
        np.testing.assert_array_equal(sb[40:48], np.zeros(8))  # bias

    def test_partial_load(self):
        big = [
            flat.ParamSpec("l0/w", (6, 10), "normc", 1.0),
            flat.ParamSpec("l0/b", (10,), "zeros"),
        ]
        theta_big = flat.init_theta(jax.random.PRNGKey(2), big)
        small_w = np.full((4, 7), 3.0, np.float32)
        out = flat.partial_load(theta_big, big, {"l0/w": small_w})
        parts = flat.unflatten(out, big)
        np.testing.assert_array_equal(np.asarray(parts["l0/w"])[:4, :7], small_w)
        orig = np.asarray(flat.unflatten(theta_big, big)["l0/w"])
        np.testing.assert_array_equal(np.asarray(parts["l0/w"])[4:, :], orig[4:, :])


# ------------------------------------------------------------------- genome


class TestGenome:
    def test_gpu_chain_reconstruction(self):
        t = noise.NoiseTable.from_seed(count=4000, seed=13)
        dim = 50
        buf = np.asarray(t.noise)
        scale = np.linspace(0.1, 1.0, dim).astype(np.float32)
        chain = [(100, 0.0), (200, 0.05), (300, 0.02)]  # entry0 power ignored
        expect = buf[100 : 100 + dim] * scale
        expect = expect + 0.05 * buf[200 : 200 + dim] + 0.02 * buf[300 : 300 + dim]

        idxs = jnp.asarray([c[0] for c in chain], jnp.int32)
        powers = jnp.asarray([c[1] for c in chain], jnp.float32)
        got = genome.reconstruct_gpu_style(t.noise, idxs, powers, dim, jnp.asarray(scale))
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5)

    def test_padding_is_noop(self):
        t = noise.NoiseTable.from_seed(count=4000, seed=13)
        dim = 50
        idxs = jnp.asarray([100, 200, 0, 0], jnp.int32)
        powers = jnp.asarray([0.0, 0.05, 0.0, 0.0], jnp.float32)
        short = genome.reconstruct_gpu_style(
            t.noise, idxs[:2], powers[:2], dim, jnp.ones(dim)
        )
        padded = genome.reconstruct_gpu_style(t.noise, idxs, powers, dim, jnp.ones(dim))
        np.testing.assert_allclose(np.asarray(short), np.asarray(padded), rtol=1e-6)

    def test_batch_and_extend(self):
        t = noise.NoiseTable.from_seed(count=4000, seed=14)
        dim = 32
        ci, cp = genome.pad_chains([[(5, 0.0)], [(5, 0.0), (60, 0.1)]], max_len=3)
        thetas = genome.reconstruct_gpu_style_batch(t.noise, ci, cp, dim, jnp.ones(dim))
        assert thetas.shape == (2, dim)
        child = genome.extend(thetas[0], t.noise, jnp.int32(60), 0.1, dim)
        np.testing.assert_allclose(np.asarray(child), np.asarray(thetas[1]), rtol=1e-6)

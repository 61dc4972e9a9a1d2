"""Model-layer tests: MujocoMLP action modes, VBN stats, DQN shapes,
population vmap equivalence (the IndexedBatchMatMul replacement)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_neuroevolution_tpu.models import (
    LargeDQN,
    MLPContext,
    MujocoMLP,
    SmallDQN,
    default_context,
)
from deep_neuroevolution_tpu.models.batchnorm import VBN_EPS, VirtualBNDQN


class TestConv2d:
    def test_patches_gemm_matches_lax_conv(self):
        """conv2d is im2col patches @ W (the MXU-friendly population form,
        replacing the vmap-of-lax.conv that lowered to grouped conv); golden
        vs lax.conv_general_dilated across the reference nets' layer shapes
        (dqn.py:30-47) plus VALID/odd cases."""
        from deep_neuroevolution_tpu.models.core import conv2d

        rng = np.random.RandomState(0)
        cases = [
            (84, 84, 4, 16, 8, 4, "SAME"),   # SmallDQN conv1
            (21, 21, 16, 32, 4, 2, "SAME"),  # SmallDQN conv2
            (11, 11, 32, 64, 3, 1, "SAME"),  # LargeDQN conv3
            (10, 12, 3, 5, 3, 2, "VALID"),
            (9, 9, 2, 4, 4, 3, "SAME"),      # uneven SAME pad split
        ]
        for h, w, cin, cout, k, s, pad in cases:
            x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
            W = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float32)
            b = jnp.asarray(rng.randn(cout), jnp.float32)
            ref = jax.lax.conv_general_dilated(
                x, W, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b
            got = conv2d({"c/w": W, "c/b": b}, "c", x, s, pad)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
            # unbatched [H, W, C] path (what vmap over members sees)
            got1 = conv2d({"c/w": W, "c/b": b}, "c", x[0], s, pad)
            np.testing.assert_allclose(np.asarray(got1), np.asarray(ref[0]), rtol=2e-5, atol=2e-5)

    def test_vmap_per_member_weights_is_batched_gemm(self):
        """Population forward: vmapping conv2d over per-member weights must
        produce a dot_general (batched GEMM), never a grouped convolution."""
        from deep_neuroevolution_tpu.models.core import conv2d

        B = 3
        Ws = jnp.asarray(np.random.RandomState(1).randn(B, 4, 4, 2, 8), jnp.float32)
        xs = jnp.asarray(np.random.RandomState(2).randn(B, 16, 16, 2), jnp.float32)

        def member(Wm, xm):
            return conv2d({"c/w": Wm, "c/b": jnp.zeros(8)}, "c", xm, 2)

        hlo = jax.jit(jax.vmap(member)).lower(Ws, xs).as_text()
        assert "convolution" not in hlo, "population conv must not lower to convolution ops"
        out = jax.vmap(member)(Ws, xs)
        for i in range(B):
            np.testing.assert_allclose(
                np.asarray(out[i]), np.asarray(member(Ws[i], xs[i])), rtol=1e-5, atol=1e-5
            )


class TestMujocoMLP:
    def _mk(self, ac_bins, ac_dim=3):
        return MujocoMLP(
            obs_dim=5,
            ac_dim=ac_dim,
            ac_low=tuple([-2.0] * ac_dim),
            ac_high=tuple([2.0] * ac_dim),
            ac_bins=ac_bins,
            hidden_dims=(16, 16),
            ac_noise_std=0.0,
        )

    def test_continuous_mode(self):
        m = self._mk("continuous:")
        theta = m.init_theta(jax.random.PRNGKey(0))
        a = m.act(theta, jnp.ones(5), ctx=default_context(5))
        assert a.shape == (3,)
        # normc(0.01) out layer → near-zero actions at init
        assert np.abs(np.asarray(a)).max() < 0.5

    def test_uniform_bins_snap_to_grid(self):
        m = self._mk("uniform:11")
        theta = m.init_theta(jax.random.PRNGKey(1))
        a = np.asarray(m.act(theta, jnp.ones(5), ctx=default_context(5)))
        grid = np.linspace(-2.0, 2.0, 11)
        for v in a:
            assert np.min(np.abs(grid - v)) < 1e-5

    def test_custom_bins(self):
        m = self._mk("custom:-1,0,1")
        theta = m.init_theta(jax.random.PRNGKey(2))
        a = np.asarray(m.act(theta, jnp.ones(5), ctx=default_context(5)))
        # values rescaled from [-1,1] to [-2,2] → outputs in {-2, 0, 2}
        for v in a:
            assert np.min(np.abs(np.array([-2.0, 0.0, 2.0]) - v)) < 1e-5

    def test_obs_normalization_clips(self):
        m = self._mk("continuous:")
        theta = m.init_theta(jax.random.PRNGKey(3))
        ctx = MLPContext(jnp.zeros(5), jnp.full(5, 0.001), jnp.asarray(0.0))
        # huge normalized obs get clipped to ±5, so outputs stay finite/bounded
        a1 = m.act(theta, jnp.full(5, 1e6), ctx=ctx)
        a2 = m.act(theta, jnp.full(5, 1e12), ctx=ctx)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)

    def test_action_noise_gated_by_ctx(self):
        m = MujocoMLP(
            obs_dim=5, ac_dim=2, ac_low=(-1.0, -1.0), ac_high=(1.0, 1.0),
            ac_bins="continuous:", ac_noise_std=0.1, hidden_dims=(8,),
        )
        theta = m.init_theta(jax.random.PRNGKey(4))
        key = jax.random.PRNGKey(5)
        off = MLPContext(jnp.zeros(5), jnp.ones(5), jnp.asarray(0.0))
        on = MLPContext(jnp.zeros(5), jnp.ones(5), jnp.asarray(1.0))
        a_off = m.act(theta, jnp.ones(5), key, off)
        a_off2 = m.act(theta, jnp.ones(5), jax.random.PRNGKey(99), off)
        a_on = m.act(theta, jnp.ones(5), key, on)
        np.testing.assert_allclose(np.asarray(a_off), np.asarray(a_off2), atol=1e-7)
        assert not np.allclose(np.asarray(a_off), np.asarray(a_on))

    def test_reference_humanoid_shape(self):
        """256×256 tanh MLP (humanoid.json policy args) — param count sanity:
        (376·256+256) + (256·256+256) + (256·17+17) for Humanoid-v1 dims."""
        m = MujocoMLP(
            obs_dim=376, ac_dim=17, ac_low=tuple([-0.4] * 17), ac_high=tuple([0.4] * 17),
            ac_bins="continuous:", hidden_dims=(256, 256), nonlin_type="tanh",
        )
        expect = 376 * 256 + 256 + 256 * 256 + 256 + 256 * 17 + 17
        assert m.num_params == expect


class TestDQN:
    def test_param_counts(self):
        small = SmallDQN(num_actions=18)
        # conv1 8·8·4·16 + 16; conv2 4·4·16·32 + 32; fc 11·11·32·256 + 256; out 256·18+18
        expect = (8 * 8 * 4 * 16 + 16) + (4 * 4 * 16 * 32 + 32) + (11 * 11 * 32 * 256 + 256) + (256 * 18 + 18)
        assert small.num_params == expect
        large = LargeDQN(num_actions=18)
        assert large.num_params > small.num_params

    def test_act_shape_and_range(self):
        m = SmallDQN(num_actions=6)
        theta = m.init_theta(jax.random.PRNGKey(0))
        obs = jax.random.uniform(jax.random.PRNGKey(1), (84, 84, 4))
        a = int(m.act(theta, obs))
        assert 0 <= a < 6

    def test_population_vmap_matches_loop(self):
        """vmapped per-member forward == per-member loop — the correctness
        contract of the IndexedBatchMatMul replacement (base.py:54-99)."""
        m = SmallDQN(num_actions=4)
        thetas = jax.vmap(m.init_theta)(jax.random.split(jax.random.PRNGKey(2), 3))
        obs = jax.random.uniform(jax.random.PRNGKey(3), (3, 84, 84, 4))
        batched = jax.vmap(lambda th, o: m.scores(th, o))(thetas, obs)
        for i in range(3):
            single = m.scores(thetas[i], obs[i])
            np.testing.assert_allclose(np.asarray(batched[i]), np.asarray(single), rtol=1e-5, atol=1e-5)


class TestVBN:
    def test_ref_stats_normalize_ref_batch(self):
        """With the member's own ref batch, post-BN activations of that batch
        have ~zero mean and ~unit variance at each layer (decay=0 semantics,
        policies.py:322 / batchnorm.py:74-77)."""
        m = VirtualBNDQN(num_actions=4)
        theta = m.init_theta(jax.random.PRNGKey(0))
        ref = jax.random.uniform(jax.random.PRNGKey(1), (16, 84, 84, 4))
        stats = m.ref_stats(theta, ref)

        # recompute first conv pre-activations manually
        from deep_neuroevolution_tpu.models.core import conv2d

        parts = m.unflatten(theta)
        h = conv2d({"conv1/w": parts["conv1/w"], "conv1/b": jnp.zeros(16)}, "conv1", ref, 4)
        xhat = (h - stats.mean[0]) * stats.inv_std[0]
        mean = np.asarray(jnp.mean(xhat, axis=(0, 1, 2)))
        var = np.asarray(jnp.var(xhat, axis=(0, 1, 2)))
        np.testing.assert_allclose(mean, 0.0, atol=1e-4)
        # inv_std = 1/sqrt(var + eps) → var(xhat) = var/(var+eps) ≈ 1
        np.testing.assert_allclose(var, 1.0, atol=0.05)

    def test_different_members_different_stats(self):
        m = VirtualBNDQN(num_actions=4)
        thetas = jax.vmap(m.init_theta)(jax.random.split(jax.random.PRNGKey(2), 2))
        ref = jax.random.uniform(jax.random.PRNGKey(3), (8, 84, 84, 4))
        stats = m.batch_ref_stats(thetas, ref)
        assert not np.allclose(np.asarray(stats.mean[0][0]), np.asarray(stats.mean[0][1]))

    def test_act_requires_stats(self):
        m = VirtualBNDQN(num_actions=4)
        theta = m.init_theta(jax.random.PRNGKey(4))
        obs = jnp.zeros((84, 84, 4))
        try:
            m.act(theta, obs, None, None)
            assert False, "expected assertion"
        except AssertionError:
            pass

    def test_batch_ref_stats_chunked_matches_vmap(self):
        """batch_ref_stats streams members through lax.map in chunks (peak
        HBM is O(chunk), not O(B)); the chunked path — including the padded
        ragged tail — must match the flat vmap to fp32 tolerance (lax.map
        over chunks compiles differently from flat vmap, so bit-equality is
        not guaranteed)."""

        class Tiny(VirtualBNDQN):
            REF_STATS_CHUNK = 2

        m = Tiny(num_actions=3, in_hw=16, in_ch=2)
        # guards the ADVICE-r2 regression where an annotated field shadowed
        # the subclass override and B<=chunk made this test compare the flat
        # path against itself
        assert m.REF_STATS_CHUNK == 2
        thetas = jax.vmap(m.init_theta)(jax.random.split(jax.random.PRNGKey(5), 5))
        ref = jax.random.uniform(jax.random.PRNGKey(6), (4, 16, 16, 2))
        chunked = m.batch_ref_stats(thetas, ref)  # 5 = 2×2 chunks + pad
        flat = jax.vmap(lambda th: m.ref_stats(th, ref))(thetas)
        for a, b in zip(jax.tree.leaves(chunked), jax.tree.leaves(flat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


class TestBatchExplicitForward:
    """The batch-explicit population forward (batch_scores_parts routing the
    fc through pop_matvec) must match the vmapped per-member act path — same
    per-member contraction, different XLA structure."""

    def test_smalldqn_batch_matches_vmap(self):
        m = SmallDQN(num_actions=6, in_hw=20, in_ch=2, matvec_impl="xla")
        B = 5
        thetas = jax.vmap(m.init_theta)(jax.random.split(jax.random.PRNGKey(0), B))
        obs = jax.random.uniform(jax.random.PRNGKey(1), (B, 20, 20, 2))
        parts, _ = m.prepare_batch_params((thetas, None))
        ref = jax.vmap(lambda p, o: m.scores_parts(p, o))(parts, obs)
        got = m.batch_scores_parts(parts, obs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
        acts = m.make_batch_act()((thetas, None), obs, jax.random.split(jax.random.PRNGKey(2), B))
        np.testing.assert_array_equal(np.asarray(acts), np.argmax(np.asarray(ref), axis=-1))

    def test_largedqn_batch_matches_vmap(self):
        m = LargeDQN(num_actions=4, in_hw=16, in_ch=1, matvec_impl="xla")
        B = 3
        thetas = jax.vmap(m.init_theta)(jax.random.split(jax.random.PRNGKey(3), B))
        obs = jax.random.uniform(jax.random.PRNGKey(4), (B, 16, 16, 1))
        parts, _ = m.prepare_batch_params((thetas, None))
        ref = jax.vmap(lambda p, o: m.scores_parts(p, o))(parts, obs)
        got = m.batch_scores_parts(parts, obs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_vbn_batch_matches_vmap(self):
        for affine in ("bias", "full"):
            m = VirtualBNDQN(num_actions=5, in_hw=20, in_ch=2, affine=affine, matvec_impl="xla")
            B = 4
            thetas = jax.vmap(m.init_theta)(jax.random.split(jax.random.PRNGKey(5), B))
            ref_batch = jax.random.uniform(jax.random.PRNGKey(6), (8, 20, 20, 2))
            stats = m.batch_ref_stats(thetas, ref_batch)
            obs = jax.random.uniform(jax.random.PRNGKey(7), (B, 20, 20, 2))
            parts, stats_p = m.prepare_batch_params((thetas, stats))
            ref = jax.vmap(lambda p, o, st: m.act_parts(p, o, None, st))(parts, obs, stats_p)
            keys = jax.random.split(jax.random.PRNGKey(8), B)
            got = m.make_batch_act()((thetas, stats), obs, keys)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_vbn_bf16_close_to_f32(self):
        """bf16 compute keeps scores within bf16 tolerance (actions are
        argmax — the shipped configs care about ties only at measure zero)."""
        m32 = VirtualBNDQN(num_actions=5, in_hw=20, in_ch=2, matvec_impl="xla")
        m16 = VirtualBNDQN(num_actions=5, in_hw=20, in_ch=2, matvec_impl="xla",
                           compute_dtype="bfloat16")
        B = 3
        thetas = jax.vmap(m32.init_theta)(jax.random.split(jax.random.PRNGKey(9), B))
        ref_batch = jax.random.uniform(jax.random.PRNGKey(10), (8, 20, 20, 2))
        obs = jax.random.uniform(jax.random.PRNGKey(11), (B, 20, 20, 2))
        s32 = m32.batch_ref_stats(thetas, ref_batch)
        s16 = m16.batch_ref_stats(thetas, ref_batch)
        p32, st32 = m32.prepare_batch_params((thetas, s32))
        p16, st16 = m16.prepare_batch_params((thetas, s16))
        a = m32.batch_scores_parts(p32, obs, st32)
        b = m16.batch_scores_parts(p16, obs, st16)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.1, atol=0.1)


class TestPopulationLinearPallas:
    def test_interpret_matches_einsum(self):
        from deep_neuroevolution_tpu.ops.pallas_forward import (
            population_linear, population_linear_ref)

        key = jax.random.PRNGKey(0)
        for B, K, N, C in [(4, 96, 24, 1), (4, 64, 32, 2)]:
            x = jax.random.normal(key, (B, K), jnp.float32)
            W = jax.random.normal(jax.random.fold_in(key, 1), (B, K, N), jnp.float32)
            y = population_linear(x, W, members_per_step=C, interpret=True)
            yr = population_linear_ref(x, W)
            np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=2e-5, atol=1e-4)


class TestFusedVBNDQN:
    def test_fused_kernel_matches_split_path(self):
        """ops/pallas_fused_dqn.py (interpret mode): the single-kernel
        forward matches the batch-explicit path to bf16 tolerance and picks
        identical argmax actions."""
        m = VirtualBNDQN(num_actions=18, matvec_impl="xla")
        B = 2
        thetas = jax.vmap(m.init_theta)(jax.random.split(jax.random.PRNGKey(0), B))
        ref = jax.random.uniform(jax.random.PRNGKey(1), (4, 84, 84, 4))
        stats = m.batch_ref_stats(thetas, ref)
        obs = jax.random.uniform(jax.random.PRNGKey(2), (B, 84, 84, 4))
        parts, st = m.prepare_batch_params((thetas, stats))
        split = np.asarray(m.batch_scores_parts(parts, obs, st))
        fused = np.asarray(
            m.batch_scores_fused(m.fuse_prepare(parts, stats), obs, interpret=True)
        )[:, :18]
        np.testing.assert_allclose(fused, split, atol=0.05, rtol=0.05)
        np.testing.assert_array_equal(np.argmax(split, axis=1), np.argmax(fused, axis=1))

    def test_fused1_kernel_matches_split_path(self):
        """vbn_dqn_fused1_scores (the single-kernel VBN variant,
        ops/pallas_fused_dqn.py) numerical parity against the split route —
        the same direct comparison the two-kernel and LargeDQN whole-net
        variants get (previously only covered via a trainer smoke test)."""
        m = VirtualBNDQN(num_actions=18, matvec_impl="xla")
        B = 2
        thetas = jax.vmap(m.init_theta)(jax.random.split(jax.random.PRNGKey(4), B))
        ref = jax.random.uniform(jax.random.PRNGKey(5), (4, 84, 84, 4))
        stats = m.batch_ref_stats(thetas, ref)
        obs = jax.random.uniform(jax.random.PRNGKey(6), (B, 84, 84, 4))
        parts, st = m.prepare_batch_params((thetas, stats))
        split = np.asarray(m.batch_scores_parts(parts, obs, st))
        fused1 = np.asarray(
            m.batch_scores_fused(m.fuse_prepare(parts, stats, style="one"),
                                 obs, interpret=True)
        )[:, :18]
        np.testing.assert_allclose(fused1, split, atol=0.05, rtol=0.05)
        np.testing.assert_array_equal(np.argmax(split, axis=1), np.argmax(fused1, axis=1))

    def test_forward_impl_auto_uses_split_on_cpu(self):
        m = VirtualBNDQN(num_actions=6)
        assert not m._use_fused()  # CPU backend in tests
        m2 = VirtualBNDQN(num_actions=6, in_hw=20, in_ch=2, forward_impl="auto")
        assert not m2._fused_eligible()

    def test_fused_conv_chain_matches_einsum_small_and_large(self):
        """dqn_conv_chain_fused (one member's whole conv stack per grid
        step, ops/pallas_fused_dqn.py) must match the batch-explicit einsum
        chain for BOTH reference geometries (dqn.py:30-47) — actions
        identical, scores within bf16 accumulation tolerance."""
        from deep_neuroevolution_tpu.models import LargeDQN, SmallDQN

        for cls in (SmallDQN, LargeDQN):
            m_split = cls(num_actions=18, compute_dtype="bfloat16",
                          conv_impl="einsum")
            m_fused = cls(num_actions=18, compute_dtype="bfloat16",
                          conv_impl="fused", fused_interpret=True)
            assert m_fused._conv_fused_eligible()
            B = 3
            key = jax.random.PRNGKey(0)
            thetas = jax.vmap(m_split.init_theta)(jax.random.split(key, B))
            parts, _ = m_split.prepare_batch_params((thetas, None))
            obs = jax.random.uniform(jax.random.fold_in(key, 1), (B, 84, 84, 4))
            s_split = np.asarray(m_split.batch_scores_parts(parts, obs))
            s_fused = np.asarray(m_fused.batch_scores_parts(parts, obs))
            np.testing.assert_allclose(s_fused, s_split, atol=0.05, rtol=0.05)
            np.testing.assert_array_equal(
                np.argmax(s_split, axis=1), np.argmax(s_fused, axis=1))

    def test_large_dqn_whole_fused_matches_split(self):
        """large_dqn_fused_scores (whole net per grid step incl. the
        flatten-free channel-major fc accumulation) must pick the same
        actions as the split route, scores within bf16 tolerance."""
        from deep_neuroevolution_tpu.models import LargeDQN

        m_split = LargeDQN(num_actions=18, compute_dtype="bfloat16",
                           forward_impl="split", conv_impl="einsum")
        m_fused = LargeDQN(num_actions=18, compute_dtype="bfloat16",
                           forward_impl="fused", fused_interpret=True)
        B = 2
        key = jax.random.PRNGKey(3)
        thetas = jax.vmap(m_split.init_theta)(jax.random.split(key, B))
        parts, _ = m_split.prepare_batch_params((thetas, None))
        fused_parts, _ = m_fused.prepare_batch_params((thetas, None))
        assert "__fused_lg__" in fused_parts
        obs = jax.random.uniform(jax.random.fold_in(key, 1), (B, 84, 84, 4))
        s_split = np.asarray(m_split.batch_scores_parts(parts, obs))
        s_fused = np.asarray(m_fused.batch_scores_fused(
            fused_parts["__fused_lg__"], obs, interpret=True))[:, :18]
        np.testing.assert_allclose(s_fused, s_split, atol=0.05, rtol=0.05)
        np.testing.assert_array_equal(
            np.argmax(s_split, axis=1), np.argmax(s_fused, axis=1))
        # the act path routes through the fused kernel
        a = np.asarray(m_fused.batch_act_parts(fused_parts, obs, None))
        np.testing.assert_array_equal(a, np.argmax(s_split, axis=1))

    def test_population_linear_large_members_route_to_xla(self):
        """Members past the VMEM double-buffer budget (LargeDQN fc scale)
        route to the XLA batched einsum (the r3 K-tiled Pallas kernel ran at
        218 GB/s vs XLA's 745 — scripts/exp_large_fwd.py) and must match the
        reference einsum exactly."""
        from deep_neuroevolution_tpu.ops.pallas_forward import (
            population_linear, population_linear_ref)

        key = jax.random.PRNGKey(7)
        B, K, N = 2, 7744, 512  # forces the large-member branch (K·N > 4096·256)
        x = jax.random.normal(key, (B, K), jnp.float32) * 0.1
        W = jax.random.normal(jax.random.fold_in(key, 1), (B, K, N), jnp.float32) * 0.1
        y = population_linear(x, W, interpret=True)
        yr = population_linear_ref(x, W)
        np.testing.assert_allclose(np.asarray(y), np.asarray(yr), rtol=2e-4, atol=2e-4)

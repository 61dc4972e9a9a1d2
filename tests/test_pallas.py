"""Pallas gradient kernel tests (interpreter mode on the CPU platform; the
compiled path is exercised on real TPU by bench.py and the perf scripts)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_neuroevolution_tpu.ops.pallas_kernels import (
    GRANULE,
    gradient_from_noise_pallas,
    required_table_size,
    sample_aligned_indices,
)


def _golden(table, idxs, w, dim):
    out = np.zeros(dim, np.float32)
    for i in range(len(idxs)):
        out += w[i] * table[idxs[i] : idxs[i] + dim]
    return out


class TestPallasGradient:
    def test_matches_golden_interpret(self):
        N = 200_000
        dim = 5000
        tile = 2048
        rs = np.random.RandomState(0)
        table = rs.randn(N + 16 * 1024).astype(np.float32)
        B = 37
        idxs = (rs.randint(0, (N - dim) // GRANULE, B) * GRANULE).astype(np.int32)
        w = rs.randn(B).astype(np.float32)
        g = gradient_from_noise_pallas(
            jnp.asarray(table), jnp.asarray(idxs), jnp.asarray(w), dim, tile, True
        )
        np.testing.assert_allclose(np.asarray(g), _golden(table, idxs, w, dim), rtol=2e-4, atol=1e-4)

    def test_dim_not_multiple_of_tile(self):
        """Padding tiles overread into valid table slack and are discarded."""
        N = 100_000
        dim = 3000  # not a multiple of tile
        tile = 2048
        rs = np.random.RandomState(1)
        table = rs.randn(N + 8 * 1024).astype(np.float32)
        idxs = (rs.randint(0, (N - 2 * tile) // GRANULE, 5) * GRANULE).astype(np.int32)
        w = rs.randn(5).astype(np.float32)
        g = gradient_from_noise_pallas(
            jnp.asarray(table), jnp.asarray(idxs), jnp.asarray(w), dim, tile, True
        )
        assert g.shape == (dim,)
        np.testing.assert_allclose(np.asarray(g), _golden(table, idxs, w, dim), rtol=2e-4, atol=1e-4)

    def test_sample_aligned_indices(self):
        key = jax.random.PRNGKey(0)
        idxs = np.asarray(sample_aligned_indices(key, 10_000_000, 400_000, 256))
        assert np.all(idxs % GRANULE == 0)
        assert idxs.max() + 400_000 <= 10_000_000
        # padded-dim slack honored too
        assert idxs.max() + ((400_000 + 16 * 1024 - 1) // (16 * 1024)) * 16 * 1024 <= 10_000_000

    def test_required_table_size(self):
        assert required_table_size(1000, 100, tile=64) == 1000 + (128 - 100)

    def test_tight_table_shrinks_tile(self):
        """An r2-sized table (num_params + small margin) must not sample from
        an empty randint range: the auto tile shrinks until the padded dim
        fits (ADVICE r3 medium finding)."""
        from deep_neuroevolution_tpu.ops.pallas_kernels import _fit_tile, _round_up

        dim = 1_008_450  # VBN-DQN param count
        table_size = dim + 10_000  # old margin: < round_up(dim, 512K tile)
        tile = _fit_tile(dim, table_size)
        assert _round_up(dim, tile) <= table_size
        key = jax.random.PRNGKey(3)
        idxs = np.asarray(sample_aligned_indices(key, table_size, dim, 64))
        assert np.all(idxs >= 0)
        assert np.all(idxs % GRANULE == 0)
        assert idxs.max() + _round_up(dim, tile) <= table_size

    def test_table_too_small_raises(self):
        import pytest

        with pytest.raises(ValueError, match="noise table too small"):
            sample_aligned_indices(jax.random.PRNGKey(0), 1000, 5000, 4)

    def test_es_trainer_pallas_mode_cpu(self):
        """End-to-end ES with use_pallas_grad (interpreter on CPU is too slow
        for the kernel itself — verify the aligned-sampling plumbing by
        running the XLA path against aligned indices instead)."""
        from deep_neuroevolution_tpu.ops.fitness import gradient_from_noise

        N = 300_000
        dim = 498
        key = jax.random.PRNGKey(2)
        idxs = sample_aligned_indices(key, N, dim, 16)
        table = jax.random.normal(key, (N,))
        w = jax.random.normal(key, (16,))
        g = gradient_from_noise(table, idxs, w, dim, 8)
        assert np.isfinite(np.asarray(g)).all()

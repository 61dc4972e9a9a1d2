"""Full ES-on-host-engine integration: VBN conv policy + C++ toy game +
device preprocessing — the Frostbite-ES path minus the ALE ROMs."""

import jax
import numpy as np

from deep_neuroevolution_tpu.algos.es import ESConfig, ESTrainer
from deep_neuroevolution_tpu.envs.atari import AtariEnv
from deep_neuroevolution_tpu.models.batchnorm import VirtualBNDQN
from deep_neuroevolution_tpu.ops import Adam, NoiseTable
from deep_neuroevolution_tpu.utils import tabular


def _silence():
    tabular._logger._kvs.clear()
    tabular.dump_tabular = lambda: tabular._logger._kvs.clear()


def test_es_vbn_on_toy_atari():
    _silence()
    env = AtariEnv("toy", batch_size=8, num_threads=2)
    model = VirtualBNDQN(num_actions=env.num_actions)
    cfg = ESConfig(
        noise_stdev=0.02,
        population_size=8,
        num_eval_episodes=2,
        episode_cutoff_mode=25,
    )
    tr = ESTrainer(
        env,
        model,
        cfg,
        optimizer=Adam(stepsize=0.01),
        noise_table=NoiseTable.from_seed(count=2_500_000),
        seed=0,
    )
    assert tr.ref_batch is not None and tr.ref_batch.shape == (128, 84, 84, 4)
    st = tr.train_step()
    assert st.returns.shape == (4, 2)
    assert np.all(st.lengths > 0) and np.all(st.lengths <= 25)
    assert np.isfinite(st.update_ratio)
    assert tr.state.iteration == 1
    # a second generation reuses the compiled kernels and changes theta
    theta1 = np.asarray(tr.state.theta).copy()
    tr.train_step()
    assert not np.allclose(np.asarray(tr.state.theta), theta1)
    env.close()


def test_es_vbn_fused1_impl_through_trainer():
    """The single-kernel fused1 forward (interpret mode on CPU) drives a
    full ESTrainer generation: prepare_batch_params hands the rollout
    engine the '__fused__' layout dict per slot group and training still
    steps (the group slicing happens on raw thetas BEFORE prepare, so the
    kernel-layout build is per-group — locking in that ordering)."""
    _silence()
    env = AtariEnv("toy", batch_size=4, num_threads=1, pipeline_groups=2)
    try:
        model = VirtualBNDQN(num_actions=env.num_actions,
                             forward_impl="fused1", fused_interpret=True)
        cfg = ESConfig(noise_stdev=0.02, population_size=4,
                       num_eval_episodes=0, episode_cutoff_mode=5)
        tr = ESTrainer(env, model, cfg, optimizer=Adam(stepsize=0.01),
                       noise_table=NoiseTable.from_seed(count=1_500_000), seed=0)
        st = tr.train_step()
        assert st.returns.shape == (2, 2)
        assert np.isfinite(st.update_ratio)
    finally:
        env.close()


class TestHostObstatSampling:
    """Per-rollout Bernoulli obs-stat sampling on the HOST paths
    (es.py:356-363 calc_obstat_prob — the CPU workers' semantics; the r2
    engine only sampled on the device path, found by the pendulum parity
    study: identical ob_counts across p=1.0 and p=0.01 arms)."""

    def test_obstat_prob_thins_host_batch_collection(self):
        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host_batch
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        env = AtariEnv("toy", batch_size=16, num_threads=1, pipeline_groups=1)
        try:
            model = SmallDQN(num_actions=env.num_actions)
            thetas = jax.vmap(model.init_theta)(jax.random.split(jax.random.PRNGKey(0), 16))
            kwargs = dict(timestep_limit=5, out_hw=84)
            full = rollout_host_batch(
                env, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(1),
                collect_obstat=True, obstat_prob=None, **kwargs)
            none = rollout_host_batch(
                env, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(1),
                collect_obstat=True, obstat_prob=1e-9, **kwargs)
            part = rollout_host_batch(
                env, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(1),
                collect_obstat=True, obstat_prob=0.5, **kwargs)
            assert float(full.ob_count) == 16 * 5
            assert float(none.ob_count) == 0.0
            assert 0.0 < float(part.ob_count) < 16 * 5
            # sampled slots contribute all their steps (per-ROLLOUT gating)
            assert float(part.ob_count) % 5 == 0
        finally:
            env.close()

    def test_obstat_valid_excludes_padded_slots(self):
        """Padded duplicate slots of under-filled host-pod sub-rounds must
        not bias the obs moments (ADVICE r3: nses under-filled padding);
        the RNG stream must be unchanged by the mask."""
        from deep_neuroevolution_tpu.algos.rollout_host import rollout_host_batch
        from deep_neuroevolution_tpu.envs.atari import AtariEnv
        from deep_neuroevolution_tpu.models import SmallDQN

        env = AtariEnv("toy", batch_size=8, num_threads=1, pipeline_groups=1)
        try:
            model = SmallDQN(num_actions=env.num_actions)
            thetas = jax.vmap(model.init_theta)(jax.random.split(jax.random.PRNGKey(0), 8))
            valid = np.arange(8) < 6  # last 2 slots are padding
            kwargs = dict(timestep_limit=5, out_hw=84)
            full = rollout_host_batch(
                env, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(1),
                collect_obstat=True, **kwargs)
            masked = rollout_host_batch(
                env, model.make_batch_act(), (thetas, None), jax.random.PRNGKey(1),
                collect_obstat=True, obstat_valid=valid, **kwargs)
            assert float(full.ob_count) == 8 * 5
            assert float(masked.ob_count) == 6 * 5
            # returns/lengths unaffected — the mask only gates obs moments
            np.testing.assert_array_equal(
                np.asarray(full.returns), np.asarray(masked.returns))
            assert not np.allclose(np.asarray(full.ob_sum), np.asarray(masked.ob_sum))
        finally:
            env.close()

"""Full ES-on-host-engine integration: VBN conv policy + C++ toy game +
device preprocessing — the Frostbite-ES path minus the ALE ROMs."""

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

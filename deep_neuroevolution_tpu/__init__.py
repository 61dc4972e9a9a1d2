"""deep_neuroevolution_tpu — a TPU-native neuroevolution framework.

A ground-up JAX/XLA/pjit/Pallas re-design with the capabilities of
uber-research/deep-neuroevolution (reference mounted at /root/reference):
Evolution Strategies (ES), Deep GA, Random Search, and novelty-seeking
variants (NS-ES / NSR-ES) on Atari, continuous control, and the Hard Maze,
scaled over TPU device meshes.

Design stance (see SURVEY.md §7): ONE engine, not two stacks. The population
is evaluated on-device in lockstep — stacked per-member parameters, vmapped
policy forwards (the TPU-native replacement for the reference's
IndexedBatchMatMul CUDA op, gym_tensorflow/ops/indexedmatmul.cpp), a
`lax.while_loop` vectorized env rollout (replacing the Redis worker fleet of
es_distributed/dist.py and the threaded ConcurrentWorkers of
gpu_implementation/neuroevolution/concurrent_worker.py), and fitness/gradient
reduction via XLA collectives over the `pop` mesh axis (replacing the
master/relay Redis tree).
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401

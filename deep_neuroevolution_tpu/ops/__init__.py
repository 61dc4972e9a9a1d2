"""L1 shared primitives (SURVEY.md layer map): noise table, fitness shaping,
flat-vector optimizers, running obs stats, schedules, flat-param packing,
seed-chain genomes. All pure-JAX, CPU-testable, device-shardable."""

from . import fitness, flat, genome, noise, obstat, optim, schedules  # noqa: F401
from .fitness import (  # noqa: F401
    batched_weighted_sum,
    compute_centered_ranks,
    compute_ranks,
    gradient_from_noise,
    process_returns,
)
from .noise import NoiseTable, VirtualNoise  # noqa: F401
from .optim import SGD, Adam, make_optimizer  # noqa: F401
from .schedules import make_schedule  # noqa: F401

"""Device mesh construction for population parallelism.

The reference scales by forking hundreds of CPU workers wired through a
master/relay Redis tree (es_distributed/main.py:74-86, dist.py) or by
one RLEvalutionWorker per GPU (concurrent_worker.py:129-142). The TPU-native
replacement is a 1-D `pop` mesh over every chip in the slice: the population
dimension shards across devices, fitness vectors ride `all_gather` and the
gradient rides `psum` over ICI/DCN (SURVEY §2.3 table).

θ and the noise table are REPLICATED: every device derives the identical
optimizer update from the psum-reduced gradient plus the shared seed-indexed
noise, so no parameter broadcast exists at all — the reference already proved
seeds-not-weights suffices (workers send only noise_inds_n, es.py:430).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POP_AXIS = "pop"


def make_pop_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (POP_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pop_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(POP_AXIS))

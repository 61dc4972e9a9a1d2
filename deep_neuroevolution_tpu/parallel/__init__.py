"""Pod-scale parallelism: pop-axis mesh, shard_map'd generation steps, and
multi-host control plane (the Redis/AWS fabric replacement, SURVEY §2.3/§5.8)."""

from .distributed import coordinator_only, init_multihost, is_coordinator, process_count  # noqa: F401
from .es_pod import PodGenResult, make_pod_es_step  # noqa: F401
from .mesh import POP_AXIS, make_pop_mesh, pop_sharded, replicated  # noqa: F401

"""L4/L5: evaluation engine and algorithm family (ES, GA, RS, NS-ES/NSR-ES)."""

from .rollout import RolloutResult, collect_ref_batch, rollout_batch, rollout_batch_scan  # noqa: F401

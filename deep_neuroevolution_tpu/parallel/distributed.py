"""Multi-host (pod) initialization and control-plane helpers.

What this replaces (SURVEY §5.8): the reference's whole distributed fabric —
master/relay Redis processes (es_distributed/dist.py, redis_config/*.conf),
the AWS fleet launcher (scripts/launch.py:85-141 boot scripts wiring redis
unix sockets), and per-machine worker forking (main.py:74-86). On a TPU pod
slice the data plane is XLA collectives over ICI/DCN; the only remaining
control plane is `jax.distributed.initialize` (coordinator discovery) plus
host-0 gating for logging/checkpoint writes.

Launch model: run the SAME program on every host of the slice —
    python -m deep_neuroevolution_tpu.main train --exp_file cfg.json ...
On Cloud TPU the coordinator/process env is auto-detected; elsewhere pass
coordinator_address/num_processes/process_id explicitly (see scripts/pod_run.sh).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with auto-detection on TPU pods. Safe to
    call when single-host (no-op if already initialized or args absent)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        # already initialized, or single-process run without coordinator info
        pass


def is_coordinator() -> bool:
    """True on host 0 — gate log/snapshot writes (the reference had exactly
    one master process doing this; es.py:141-353)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def coordinator_only(fn):
    """Decorator: run only on host 0 (tabular dumps, snapshot writes)."""

    @functools.wraps(fn)
    def wrapper(*a, **kw):
        if is_coordinator():
            return fn(*a, **kw)
        return None

    return wrapper

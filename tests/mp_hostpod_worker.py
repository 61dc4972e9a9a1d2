"""Worker for the host-engine pod test (per-process C++ engine pools).

Two OS processes, ONE CPU device each; each owns its own toy-Atari
HostBatchEnv; `main.py train` auto-selects the HostPod trainers
(utils/config.py pick_trainer) because jax.process_count() > 1. The global
update must be bit-identical to the single-process run that emulates the two
pools sequentially (overrides {"host_pod": 2}) — the determinism contract of
parallel/host_pod.py.

argv: <pid> <nproc> <port> <out_npz> <log_dir> <algo es|ga>
"""

import json
import os
import sys

pid, nproc, port, out_path, log_dir, algo = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5],
    sys.argv[6],
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)

import jax._src.xla_bridge as xb  # noqa: E402

xb._backend_factories.pop("axon", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_neuroevolution_tpu import main as cli  # noqa: E402
from tests.hostpod_common import (  # noqa: E402
    EXP_ES, EXP_ES_QUOTA, EXP_GA, EXP_NSES, EXP_RS, OVERRIDES,
)

exp = {"es": EXP_ES, "es_quota": EXP_ES_QUOTA, "ga": EXP_GA, "rs": EXP_RS,
       "nses": EXP_NSES}[algo]
cli_algo = "es" if algo == "es_quota" else algo
rc = cli.main(
    [
        "train",
        "--exp_str", json.dumps(exp),
        "--algo", cli_algo,
        "--iterations", "2",
        "--log_dir", log_dir,
        "--snapshot_freq", "0",
        "--no_resume",
        "--overrides", json.dumps(OVERRIDES),
    ]
)
assert rc == 0
tr = cli._LAST_TRAINER
expect = {"es": "HostPodESTrainer", "es_quota": "HostPodESTrainer",
          "ga": "HostPodGATrainer", "rs": "HostPodRSTrainer",
          "nses": "HostPodNSESTrainer"}[algo]
assert type(tr).__name__ == expect, type(tr).__name__
suffix = "" if pid == 0 else f".p{pid}"
if algo in ("es", "es_quota"):
    assert tr.state.iteration == 2
    np.savez(out_path + suffix, theta=np.asarray(tr.state.theta),
             episodes=tr.state.episodes_so_far)
elif algo == "nses":
    arch_n = int(tr.archive.count)
    np.savez(
        out_path + suffix,
        parents=np.stack([np.asarray(p.theta) for p in tr.parents]),
        archive=np.asarray(tr.archive.points)[:arch_n],
        curr_parent=tr.curr_parent,
    )
else:  # ga / rs
    pop = tr.state.population
    np.savez(
        out_path + suffix,
        fitness=np.asarray([o.fitness for o in pop], np.float32),
        chain_reprs=np.asarray([repr(o.seeds) for o in pop]),
        elite=np.asarray(repr(tr.state.elite.seeds if tr.state.elite else None)),
    )
print(f"proc {pid} done", flush=True)

"""Worker for the true multi-process pod test (run by test_multiprocess.py).

Each OS process owns 2 virtual CPU devices; jax.distributed assembles the
4-device global mesh and the pod ES step's all_gather/psum ride Gloo across
the process boundary — the same code path a multi-host TPU slice uses over
DCN (parallel/distributed.py launch model).

argv: <process_id> <num_processes> <coordinator_port> <out_npz_path>
"""

import os
import sys

pid, nproc, port, out_path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax._src.xla_bridge as xb  # noqa: E402

xb._backend_factories.pop("axon", None)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deep_neuroevolution_tpu.envs import CartPoleEnv  # noqa: E402
from deep_neuroevolution_tpu.models import LinearClassifier  # noqa: E402
from deep_neuroevolution_tpu.ops import Adam, NoiseTable  # noqa: E402
from deep_neuroevolution_tpu.parallel.es_pod import make_pod_es_step  # noqa: E402
from deep_neuroevolution_tpu.parallel.mesh import POP_AXIS  # noqa: E402

assert jax.process_count() == nproc and jax.device_count() == 2 * nproc

mesh = Mesh(np.array(jax.devices()), (POP_AXIS,))
env = CartPoleEnv()
model = LinearClassifier(obs_dim=4, num_actions=2)
opt = Adam(stepsize=0.1)
step = make_pod_es_step(env, model, opt, mesh, npairs_per_device=2)

table = NoiseTable.from_seed(count=50_000)
theta = model.init_theta(jax.random.PRNGKey(0))
opt_state = opt.init(model.num_params)
keys_host = np.asarray(jax.random.split(jax.random.PRNGKey(1), jax.device_count()))
keys = jax.make_array_from_callback(
    keys_host.shape, NamedSharding(mesh, P(POP_AXIS)), lambda idx: keys_host[idx]
)
res = step(theta, opt_state, table.noise, keys, jnp.int32(20), jnp.float32(0.2))

theta_local = np.asarray(res.theta.addressable_data(0))  # replicated output
returns = np.asarray(multihost_utils.process_allgather(res.returns_n2, tiled=True))
if pid == 0:
    np.savez(out_path, theta=theta_local, returns=returns)
else:
    np.savez(out_path + f".p{pid}", theta=theta_local)
print(f"proc {pid} done", flush=True)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware in this environment is a single chip reached through the
axon PJRT tunnel plugin, which a sitecustomize registers in every interpreter
and which slows every XLA compile (even CPU ones) by a tunnel round-trip.
Tests must be fast and hermetic, so we deregister the plugin before any
backend initializes and pin the CPU platform with 8 virtual devices —
multi-chip sharding is validated on those (the same mechanism the driver's
dryrun_multichip uses via xla_force_host_platform_device_count).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

import jax  # noqa: E402

# the axon register() call pins jax_platforms=axon via jax.config; undo it
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()} — XLA_FLAGS was set "
    "after another jax import initialized the backend"
)

import pytest  # noqa: E402

from deep_neuroevolution_tpu.utils import tabular as _tabular  # noqa: E402

# captured before any test module can rebind it (several silence the logger
# with `tabular.dump_tabular = lambda: ...` — sometimes at module scope)
_REAL_DUMP_TABULAR = _tabular.dump_tabular


@pytest.fixture(autouse=True)
def _restore_tabular_logger():
    """Undo any tabular.dump_tabular silencing after each test so logger
    tests (test_tb_events) see the real function regardless of ordering."""
    yield
    _tabular.dump_tabular = _REAL_DUMP_TABULAR
    _tabular._logger._kvs.clear()

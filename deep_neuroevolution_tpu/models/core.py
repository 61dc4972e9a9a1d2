"""Policy model base: networks as pure functions of a flat θ vector.

Reference surfaces being replaced:
* CPU stack `Policy` (es_distributed/policies.py:15-113): TF graph +
  `set_trainable_flat`/`get_trainable_flat` concat/slice assign machinery
  (tf_util.py:224-246).
* GPU stack `BaseModel` (gpu neuroevolution/models/base.py:26-192):
  per-slot weight variables with scatter loads and IndexedBatchMatMul so one
  graph evaluates B different policies (ops/indexedmatmul.cpp).

TPU-native design: a model is a frozen dataclass holding its `ParamSpec`
list; `act(theta, obs, key, ctx)` is a pure function. Population evaluation
is `jax.vmap(model.act)` over stacked [B, D] thetas — XLA lowers the vmapped
dense/conv layers to batched MXU GEMMs, which is exactly what the custom
IndexedBatchMatMul CUDA kernel hand-built (SURVEY §2.2 item 4); no custom
kernel is needed. Non-trainable context (ob stats, VBN ref stats) is passed
via `ctx` instead of living in graph variables.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import flat
from ..ops.flat import ParamSpec


def dense(parts: Dict[str, jax.Array], name: str, x: jax.Array) -> jax.Array:
    """x @ w + b for specs named `{name}/w`, `{name}/b`
    (tf_util.py:150-162 dense; base.py:84-99)."""
    return x @ parts[f"{name}/w"] + parts[f"{name}/b"]


def conv2d(
    parts: Dict[str, jax.Array],
    name: str,
    x: jax.Array,
    stride: int,
    padding: str = "SAME",
) -> jax.Array:
    """NHWC conv with HWIO weights + bias (tf_util.py:133-148 conv;
    base.py:54-82 implements the same contraction as patches@w).

    Accepts unbatched [H, W, C] input (the per-member single-frame case) and
    adds/removes the batch dim so it vmaps cleanly over the population."""
    w = parts[f"{name}/w"]
    b = parts[f"{name}/b"]
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + b.reshape((1, 1, 1, -1))
    return y[0] if squeeze else y


NONLINS = {
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "lrelu": lambda x: jnp.maximum(x, 0.2 * x),  # tf_util lrelu default leak 0.2
    "elu": jax.nn.elu,
}


@dataclasses.dataclass(frozen=True)
class Model:
    """Base for all policies. Subclasses define `specs` (via `build_specs`)
    and `act`."""

    def __post_init__(self):
        object.__setattr__(self, "_specs", tuple(self.build_specs()))

    @property
    def specs(self) -> Tuple[ParamSpec, ...]:
        return self._specs

    @property
    def num_params(self) -> int:
        return flat.total_dim(self.specs)

    def build_specs(self) -> Sequence[ParamSpec]:
        raise NotImplementedError

    # ----------------------------------------------------------------- init

    def init_theta(self, key: jax.Array) -> jax.Array:
        """Fresh flat θ with each layer's initializer (normc etc.)."""
        return flat.init_theta(key, self.specs)

    def reinit_theta(self, theta: jax.Array) -> jax.Array:
        """CPU-GA reinitialize: normalize existing weight columns, zero biases
        (tf_util.py:122-130; used by ga.py:256-260 genome reconstruction)."""
        return flat.reinit_theta(theta, self.specs)

    def scale_by(self, style: str = "fan_in") -> jax.Array:
        """[D] per-element genome init scale (base.py:166-175)."""
        return flat.scale_by_vector(self.specs, style)

    def unflatten(self, theta: jax.Array) -> Dict[str, jax.Array]:
        return flat.unflatten(theta, self.specs)

    # ------------------------------------------------------------------ act

    def act(self, theta: jax.Array, obs: jax.Array, key: Optional[jax.Array] = None, ctx=None):
        """Single-member action. Population use: jax.vmap(self.act)."""
        raise NotImplementedError

    def make_batch_act(self):
        """act_fn for the rollout engine: (params, obs[B,...], keys[B]) →
        actions[B,...]. `params` is (thetas [B, D], ctx pytree broadcast or
        stacked [B, ...])."""

        def batch_act(params, obs, keys):
            thetas, ctx = params
            return jax.vmap(lambda th, o, k: self.act(th, o, k, ctx))(thetas, obs, keys)

        return batch_act

    # VBN protocol (overridden by models that need a ref batch;
    # policies.py:319-330, batchnorm.py:52-123)
    @property
    def needs_ref_batch(self) -> bool:
        return False

    @property
    def needs_ob_stat(self) -> bool:
        return False

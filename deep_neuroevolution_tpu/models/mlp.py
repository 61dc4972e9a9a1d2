"""MujocoPolicy — feed-forward MLP for continuous control.

Reference: es_distributed/policies.py:122-302 (MujocoPolicy). Semantics
preserved:
* obs normalization clip((o - μ)/σ, ±5) with externally-supplied running
  stats (policies.py:149-152; stats ride in `ctx`, the analog of the
  non-trainable ob_mean/ob_std graph variables).
* hidden stack: nonlin(dense(hd)) per hidden_dims entry, normc(1.0) init
  (policies.py:155-161).
* action head modes (policies.py:166-198):
  - 'continuous'  → dense normc(0.01)
  - 'uniform:k'   → k bins per action dim, argmax score → lerp low..high
  - 'custom:v,..' → bins at custom values in [-1,1] rescaled to [low,high]
  (`bins` helper policies.py:116-120: dense to dim·k, argmax over k.)
* action noise: a += randn·ac_noise_std when a random stream is supplied
  (policies.py:202-206) — gated here by ctx.noise_scale ∈ {0, 1} so the same
  compiled fn serves train (noisy) and eval (clean) rollouts.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.flat import ParamSpec
from .core import NONLINS, Model, dense


class MLPContext(NamedTuple):
    ob_mean: jax.Array  # [obs_dim]
    ob_std: jax.Array  # [obs_dim]
    noise_scale: jax.Array  # scalar f32: 1.0 = apply ac_noise_std, 0.0 = off


@dataclasses.dataclass(frozen=True)
class MujocoMLP(Model):
    obs_dim: int = 0
    ac_dim: int = 0
    ac_low: Tuple[float, ...] = ()
    ac_high: Tuple[float, ...] = ()
    ac_bins: str = "continuous:"  # mode[:arg] — policies.py:171
    ac_noise_std: float = 0.01
    nonlin_type: str = "tanh"
    hidden_dims: Tuple[int, ...] = (256, 256)
    connection_type: str = "ff"

    def __post_init__(self):
        assert self.connection_type == "ff", "reference implements only 'ff' (policies.py:155-162)"
        super().__post_init__()
        mode, _, arg = self.ac_bins.partition(":")
        object.__setattr__(self, "_bin_mode", mode)
        if mode == "uniform":
            object.__setattr__(self, "_num_bins", int(arg))
        elif mode == "custom":
            vals = np.array([float(v) for v in arg.split(",")], np.float32)
            assert vals.ndim == 1 and vals[0] == -1 and vals[-1] == 1  # policies.py:183
            object.__setattr__(self, "_acvals", tuple(vals.tolist()))
            object.__setattr__(self, "_num_bins", len(vals))
        elif mode == "continuous":
            object.__setattr__(self, "_num_bins", 0)
        else:
            raise NotImplementedError(mode)

    @property
    def needs_ob_stat(self) -> bool:
        return True  # policies.py:211-213

    def build_specs(self) -> Sequence[ParamSpec]:
        mode = self.ac_bins.partition(":")[0]
        specs = []
        in_dim = self.obs_dim
        for i, hd in enumerate(self.hidden_dims):
            specs += [
                ParamSpec(f"l{i}/w", (in_dim, hd), "normc", 1.0),
                ParamSpec(f"l{i}/b", (hd,), "zeros"),
            ]
            in_dim = hd
        if mode == "continuous":
            out = self.ac_dim
        else:
            arg = self.ac_bins.partition(":")[2]
            k = int(arg) if mode == "uniform" else len(arg.split(","))
            out = self.ac_dim * k
        specs += [
            ParamSpec("out/w", (in_dim, out), "normc", 0.01),  # policies.py:117,196
            ParamSpec("out/b", (out,), "zeros"),
        ]
        return specs

    def act_parts(self, parts, obs, key=None, ctx: Optional[MLPContext] = None):
        nonlin = NONLINS[self.nonlin_type]

        x = obs.astype(jnp.float32)
        if ctx is not None:
            x = jnp.clip((x - ctx.ob_mean) / ctx.ob_std, -5.0, 5.0)  # policies.py:151

        for i in range(len(self.hidden_dims)):
            x = nonlin(dense(parts, f"l{i}", x))

        scores = dense(parts, "out", x)
        low = jnp.asarray(self.ac_low, jnp.float32)
        high = jnp.asarray(self.ac_high, jnp.float32)

        if self._bin_mode == "continuous":
            a = scores
        elif self._bin_mode == "uniform":
            k = self._num_bins
            aidx = jnp.argmax(scores.reshape(self.ac_dim, k), axis=-1)  # policies.py:176
            a = aidx.astype(jnp.float32) / (k - 1.0) * (high - low) + low  # policies.py:178
        else:  # custom
            k = self._num_bins
            acvals = jnp.asarray(self._acvals)  # [k] in [-1, 1]
            # rescale to [low, high] per action dim (policies.py:185-188)
            acvals_ak = (high - low)[:, None] / (acvals[-1] - acvals[0]) * (
                acvals - acvals[0]
            )[None, :] + low[:, None]
            aidx = jnp.argmax(scores.reshape(self.ac_dim, k), axis=-1)
            a = jnp.take_along_axis(acvals_ak, aidx[:, None], axis=1)[:, 0]

        if ctx is not None and self.ac_noise_std != 0 and key is not None:
            a = a + jax.random.normal(key, a.shape) * (self.ac_noise_std * ctx.noise_scale)
        return a


def default_context(obs_dim: int, noise: bool = False) -> MLPContext:
    return MLPContext(
        jnp.zeros((obs_dim,), jnp.float32),
        jnp.ones((obs_dim,), jnp.float32),
        jnp.asarray(1.0 if noise else 0.0, jnp.float32),
    )

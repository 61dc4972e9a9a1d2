"""Flat parameter-vector packing, initialization, and genome scaling.

The entire reference framework operates on flat float32 θ vectors: noise
perturbations are slices added to θ (es_distributed/es.py:411-426), GA
genomes reconstruct θ from seed chains (ga.py:250-264,
gpu neuroevolution/models/base.py:123-156), and checkpoints store θ
(policies.py:49-67). The TF graphs convert via concat/slice assign ops
(tf_util.py:224-246 `SetFromFlat`/`GetFlat`; base.py:158-192 scatter loads).

TPU-native design: θ stays a flat [D] array end-to-end; `unflatten` is a set
of *static* slices + reshapes that XLA fuses into the consuming matmuls (no
scatter/assign machinery needed — parameters are just function arguments).
Population evaluation vmaps over stacked [B, D] thetas, which replaces the
per-slot scatter_update + IndexedBatchMatMul scheme of the GPU stack.

Initializer semantics preserved:
* `normc` — normalized-column init: randn columns rescaled to L2 norm `std`
  (es_distributed/tf_util.py:108-120); `reinit` re-applies the same
  normalization to existing values (tf_util.py:122-130), which is how CPU-GA
  turns a raw noise slice into a valid init (ga.py:256-260).
* `scale_by` — GPU-stack genome init scale per parameter: θ₀ = ε·scale_by
  with scale_by = std/√fan_in for dqn.py:26-28 models, the base.py:46-49
  factor for the xavier variants, and 0 for biases (so biases init to 0).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    """One named parameter tensor inside the flat vector."""

    name: str
    shape: Tuple[int, ...]
    init: str = "normc"  # 'normc' | 'zeros' | 'scaled_normal'
    std: float = 1.0
    # genome init scale for GPU-style seed reconstruction (θ₀ = ε·scale_by);
    # None → derived by `default_scale_by`.
    scale_by: float | None = None

    @property
    def size(self) -> int:
        return int(np.prod(self.shape))


def total_dim(specs: Sequence[ParamSpec]) -> int:
    return sum(s.size for s in specs)


def offsets(specs: Sequence[ParamSpec]) -> Dict[str, Tuple[int, int]]:
    out, off = {}, 0
    for s in specs:
        out[s.name] = (off, s.size)
        off += s.size
    return out


def unflatten(theta: jax.Array, specs: Sequence[ParamSpec]) -> Dict[str, jax.Array]:
    """Flat [D] → dict of shaped tensors via static slices (fusable)."""
    parts, off = {}, 0
    for s in specs:
        parts[s.name] = jax.lax.slice(theta, (off,), (off + s.size,)).reshape(s.shape)
        off += s.size
    return parts


def flatten(parts: Dict[str, jax.Array], specs: Sequence[ParamSpec]) -> jax.Array:
    return jnp.concatenate([parts[s.name].reshape(-1).astype(jnp.float32) for s in specs])


def _normc(key: jax.Array, shape: Tuple[int, ...], std: float) -> jax.Array:
    """Normalized-column init (tf_util.py:108-120): randn [fan_in, cols]
    columns rescaled so each column has L2 norm `std`, then reshaped."""
    flat_shape = (int(np.prod(shape[:-1])), shape[-1])
    out = jax.random.normal(key, flat_shape, dtype=jnp.float32)
    out = out * (std / jnp.sqrt(jnp.sum(jnp.square(out), axis=0, keepdims=True)))
    return out.reshape(shape)


def init_theta(key: jax.Array, specs: Sequence[ParamSpec]) -> jax.Array:
    """Fresh flat θ with each spec's initializer."""
    chunks = []
    for i, s in enumerate(specs):
        k = jax.random.fold_in(key, i)
        if s.init == "normc":
            chunks.append(_normc(k, s.shape, s.std).reshape(-1))
        elif s.init == "zeros":
            chunks.append(jnp.zeros((s.size,), jnp.float32))
        elif s.init == "scaled_normal":
            chunks.append(jax.random.normal(k, (s.size,), jnp.float32) * s.std)
        else:
            raise ValueError(f"unknown init {s.init!r}")
    return jnp.concatenate(chunks)


def reinit_theta(theta: jax.Array, specs: Sequence[ParamSpec]) -> jax.Array:
    """The CPU-GA `reinitialize` transform (tf_util.py:122-130, ga.py:256-260):
    rescale each weight tensor's columns of the *existing* values to L2 norm
    `std`; zero the biases. Applied after loading a raw noise slice as θ."""
    parts = unflatten(theta, specs)
    out = {}
    for s in specs:
        x = parts[s.name]
        if s.init == "normc":
            flat = x.reshape(-1, s.shape[-1])
            flat = flat * (s.std / jnp.sqrt(jnp.sum(jnp.square(flat), axis=0, keepdims=True)))
            out[s.name] = flat.reshape(s.shape)
        else:
            out[s.name] = jnp.zeros_like(x)
    return flatten(out, specs)


def default_scale_by(spec: ParamSpec, style: str = "fan_in") -> float:
    """Per-parameter genome scale for GPU-style seed reconstruction.

    style='fan_in' — gpu dqn.py:26-28: std/√(prod(shape[:-1])) for weights.
    style='base'   — gpu base.py:46-49: std·√((shape[-2]+shape[-1])·prod(shape[:-2])/2)
                     (reproduced verbatim for the dqn_xavier variants).
    Biases always 0 (base.py:50-52 create_bias_variable).
    """
    if spec.init == "zeros":
        return 0.0
    if spec.scale_by is not None:
        return spec.scale_by
    shape = spec.shape
    if style == "fan_in":
        return spec.std / float(np.sqrt(np.prod(shape[:-1])))
    if style == "base":
        factor = (shape[-2] + shape[-1]) * float(np.prod(shape[:-2], dtype=np.float64) if len(shape) > 2 else 1.0) / 2.0
        return spec.std * float(np.sqrt(factor))
    raise ValueError(f"unknown scale_by style {style!r}")


def scale_by_vector(specs: Sequence[ParamSpec], style: str = "fan_in") -> jax.Array:
    """Concatenated per-element scale vector [D] (base.py:166-175
    make_weights builds the same per-variable constant blocks)."""
    return jnp.concatenate(
        [jnp.full((s.size,), default_scale_by(s, style), jnp.float32) for s in specs]
    )


def partial_load(
    theta_big: jax.Array,
    specs_big: Sequence[ParamSpec],
    parts_small: Dict[str, np.ndarray],
) -> jax.Array:
    """Warm-start surgery (policies.py:219-249 `initialize_from`): write a
    smaller policy's arrays into the prefix slices of a larger one with the
    same parameter names."""
    parts = {k: np.array(v) for k, v in jax.device_get(unflatten(theta_big, specs_big)).items()}
    for name, small in parts_small.items():
        small = np.asarray(small)
        big = parts[name]
        assert small.ndim == big.ndim and all(a >= b for a, b in zip(big.shape, small.shape)), (
            name,
            big.shape,
            small.shape,
        )
        big[tuple(np.s_[:d] for d in small.shape)] = small
        parts[name] = big
    return flatten({k: jnp.asarray(v) for k, v in parts.items()}, specs_big)

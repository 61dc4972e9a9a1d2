"""Hyperparameter schedules (mutation power etc.).

Reference semantics: gpu_implementation/neuroevolution/helper.py:46-88 —
Constant / Linear / Exponential schedules keyed on a named progress `field`
(e.g. frames elapsed), built by `make_schedule` from a bare number or a
`{"type": ..., ...}` dict in the experiment JSON
(gpu_implementation/configurations/*.json).

All `value` computations are jnp-traceable so a schedule can be evaluated
inside the jitted generation step from a device-resident progress counter.
"""

from __future__ import annotations

import numbers

import jax.numpy as jnp


class ConstantSchedule:
    def __init__(self, value):
        self._value = value

    def value(self, **kwargs):
        return jnp.asarray(self._value, jnp.float32)


class LinearSchedule:
    """initial_p → final_p linearly over `schedule` units of `field`
    (helper.py:54-64), clamped at final_p."""

    def __init__(self, schedule, final_p, initial_p, field):
        self.schedule = schedule
        self.field = field
        self.final_p = final_p
        self.initial_p = initial_p

    def value(self, **kwargs):
        assert self.field in kwargs, f"schedule field {self.field!r} not in {list(kwargs)}"
        fraction = jnp.minimum(jnp.asarray(kwargs[self.field], jnp.float32) / self.schedule, 1.0)
        return self.initial_p + fraction * (self.final_p - self.initial_p)


class ExponentialSchedule:
    """Geometric interpolation: exp(linear in log-space) (helper.py:67-81)."""

    def __init__(self, initial_p, final_p, schedule, field):
        self.initial_p = initial_p
        self.final_p = final_p
        self.schedule = schedule
        self.field = field
        self.linear = LinearSchedule(
            initial_p=float(jnp.log(jnp.asarray(initial_p))),
            final_p=float(jnp.log(jnp.asarray(final_p))),
            schedule=schedule,
            field=field,
        )

    def value(self, **kwargs):
        return jnp.exp(self.linear.value(**kwargs))


def make_schedule(args):
    """Number → ConstantSchedule; dict → schedule by `type` (helper.py:84-88)."""
    if isinstance(args, numbers.Number):
        return ConstantSchedule(args)
    types = {
        "ConstantSchedule": ConstantSchedule,
        "LinearSchedule": LinearSchedule,
        "ExponentialSchedule": ExponentialSchedule,
    }
    return types[args["type"]](**{k: v for k, v in args.items() if k != "type"})

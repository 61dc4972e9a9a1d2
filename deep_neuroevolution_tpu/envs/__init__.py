"""L2 environments: batched pure-function envs + registry.

`make(game, ...)` mirrors gym_tensorflow.make (gym_tensorflow/__init__.py:7-14):
'maze', 'gym.CartPole-v1', Atari game names (native engine)."""

from . import cartpole, maze, mujoco, pendulum  # noqa: F401  (registers envs)
from .core import Continuous, Discrete, Env, make, register  # noqa: F401
from .mujoco import MujocoHostEnv  # noqa: F401
from .cartpole import CartPoleEnv  # noqa: F401
from .maze import MazeEnv  # noqa: F401
from .pendulum import PendulumEnv  # noqa: F401

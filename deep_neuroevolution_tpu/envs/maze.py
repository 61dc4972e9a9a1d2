"""Hard Maze — pure-JAX vectorized reimplementation of the reference's C++
NEAT hard-maze (gym_tensorflow/maze/maze.h:299-816, tf_maze.cpp:40-104).

The reference runs one C++ `maze::Environment` per batch slot on the host
thread pool; here the whole simulation (ray-segment intersection over the 13
wall segments, radar quadrants, kinematics) is jnp math over a tiny state
pytree, vmapped over the population and fused into the policy forward by XLA
— the env literally runs *on* the TPU (SURVEY §2.2 item 3).

Semantics preserved (all cited to maze.h / tf_maze.cpp):
* File format: disable, steps, num_lines, start x y, heading, end x y,
  poi x y, then line segments (maze.h:468-495 load_from).
* Sensors: 6 rangefinders at [-90,-45,0,45,90,-180]° relative to heading,
  range 100, min distance to wall intersection (maze.h:345-358,736-773);
  4 radar quadrants [315,405),[45,135),[135,225),[225,315) firing 1.0 when
  the goal direction (in heading frame, maze.h custom `angle()` with
  atan-based quadrant fix, maze.h:144-160) falls inside (maze.h:775-811).
* Observation: [1 (bias), rangefinders/100 ×6, radar ×4] = 11 dims
  (maze.h:553-577 generate_neural_inputs; tf_maze.py:60 obs shape 11).
* Dynamics: outputs clipped to [0,1]; target vel = (o-0.5)*6, delta clamped
  to ±0.2, vel clamped to ±3 (maze.h:604-658 interpret_outputs); heading in
  degrees wrapping [0,360); movement blocked when any wall is within radius
  8 of the new location (maze.h:660-702 Update/collide_lines).
* Episode: 400 steps; reward 0 except at the final step, where it is
  −distance(hero, goal) (tf_maze.cpp:78-93); actions arrive offset by +0.5
  (tf_maze.cpp:80: interpret_outputs(a0+0.5, a1+0.5)).
* BC / final state: (x, y) (tf_maze.cpp:66-72, MazeFinalStateOp).
* reset(): position=start, heading/speed/ang_vel=0 (maze.h:321-332);
  the noop argument is accepted and ignored, as in the C++ env
  (tf_maze.cpp:95-99).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core import Continuous, Env, register

_DEG2RAD = np.pi / 180.0  # maze.h uses 3.1415926 but f32 rounds identically

# hard_maze.txt shipped by the reference (maze/hard_maze.txt); embedded so the
# framework is self-contained. Format per maze.h:468-495.
HARD_MAZE_TXT = """0
400
13
36 184
0
31 20
31 20
41 5 3 8
3 8 4 49
4 49 57 53
4 49 7 202
7 202 195 198
195 198 186 8
186 8 39 5
56 54 56 157
57 106 158 162
77 201 108 164
6 80 33 121
192 146 87 91
56 55 133 30
"""

RANGEFINDER_ANGLES = (-90.0, -45.0, 0.0, 45.0, 90.0, -180.0)  # maze.h:352-358
RADAR_ANGLES = ((315.0, 405.0), (45.0, 135.0), (135.0, 225.0), (225.0, 315.0))  # maze.h:361-372
RANGEFINDER_RANGE = 100.0  # maze.h:343
HERO_RADIUS = 8.0  # maze.h:342
EPISODE_STEPS = 400  # tf_maze.cpp:91-94


class MazeState(NamedTuple):
    x: jax.Array  # scalar f32
    y: jax.Array
    heading: jax.Array  # degrees [0, 360)
    speed: jax.Array
    ang_vel: jax.Array
    t: jax.Array  # scalar i32 step count


def parse_maze(text: str):
    toks = text.split()
    it = iter(toks)
    nxt = lambda: next(it)
    disable = int(nxt())
    steps = int(nxt())
    num_lines = int(nxt())
    start = (float(nxt()), float(nxt()))
    heading = float(nxt())
    end = (float(nxt()), float(nxt()))
    poi = (float(nxt()), float(nxt()))
    segs = np.array([[float(nxt()) for _ in range(4)] for _ in range(num_lines)], np.float32)
    return dict(disable=disable, steps=steps, start=start, heading=heading, end=end, poi=poi, segs=segs)


def _point_angle(x, y):
    """maze.h:144-160 Point::angle — atan-based with the reference's exact
    quadrant handling: x>0 → atan(y/x) (may be negative); x<0 → +180;
    x==0 → 90 or 270."""
    ang = jnp.arctan(y / jnp.where(x == 0.0, 1.0, x)) / np.pi * 180.0
    ang = jnp.where(x > 0.0, ang, ang + 180.0)
    return jnp.where(x == 0.0, jnp.where(y > 0.0, 90.0, 270.0), ang)


@dataclasses.dataclass(frozen=True)
class MazeEnv(Env):
    """Vectorizable Hard Maze. Construct via `make('maze')` or directly."""

    maze_text: str = HARD_MAZE_TXT

    def __post_init__(self):
        cfg = parse_maze(self.maze_text)
        object.__setattr__(self, "_cfg", cfg)
        # static geometry as numpy → closed over as jnp constants
        object.__setattr__(self, "_segs", jnp.asarray(cfg["segs"]))  # [L, 4] ax ay bx by
        object.__setattr__(self, "_start", jnp.asarray(cfg["start"], jnp.float32))
        object.__setattr__(self, "_end", jnp.asarray(cfg["end"], jnp.float32))

    obs_shape: Tuple[int, ...] = (11,)
    action_space = Continuous(2)
    default_timestep_cutoff: int = EPISODE_STEPS  # tf_maze.py:34-36
    bc_dim: int = 2

    # ------------------------------------------------------------------ api

    def reset(self, key: jax.Array) -> MazeState:
        del key  # maze reset is deterministic (maze.h:321-332)
        z = jnp.zeros((), jnp.float32)
        return MazeState(self._start[0], self._start[1], z, z, z, jnp.zeros((), jnp.int32))

    def observe(self, state: MazeState) -> jax.Array:
        rf = self._rangefinders(state) / RANGEFINDER_RANGE  # maze.h:560-566
        radar = self._radar(state)  # maze.h:569-573
        return jnp.concatenate([jnp.ones((1,), jnp.float32), rf, radar])

    def step(self, state: MazeState, action: jax.Array, key: jax.Array):
        del key
        # tf_maze.cpp:80 — env adds +0.5 so a zero-centered policy output maps
        # to the [0,1] range interpret_outputs expects
        o1 = jnp.clip(action[0] + 0.5, 0.0, 1.0)
        o2 = jnp.clip(action[1] + 0.5, 0.0, 1.0)

        # interpret_outputs velocity mode (maze.h:636-658)
        d_ang = jnp.clip((o1 - 0.5) * 6.0 - state.ang_vel, -0.2, 0.2)
        d_speed = jnp.clip((o2 - 0.5) * 6.0 - state.speed, -0.2, 0.2)
        ang_vel = jnp.clip(state.ang_vel + d_ang, -3.0, 3.0)
        speed = jnp.clip(state.speed + d_speed, -3.0, 3.0)

        # Update (maze.h:660-692): velocity uses the OLD heading, then heading
        # integrates ang_vel
        rad = state.heading * _DEG2RAD
        vx = jnp.cos(rad) * speed
        vy = jnp.sin(rad) * speed
        heading = state.heading + ang_vel
        heading = jnp.where(heading > 360.0, heading - 360.0, heading)
        heading = jnp.where(heading < 0.0, heading + 360.0, heading)

        nx, ny = state.x + vx, state.y + vy
        blocked = self._collides(nx, ny)  # maze.h:694-702
        x = jnp.where(blocked, state.x, nx)
        y = jnp.where(blocked, state.y, ny)

        t = state.t + 1
        done = t >= EPISODE_STEPS  # tf_maze.cpp:90-94
        dist = jnp.sqrt((x - self._end[0]) ** 2 + (y - self._end[1]) ** 2)
        reward = jnp.where(done, -dist, 0.0)  # tf_maze.cpp:83-87

        return MazeState(x, y, heading, speed, ang_vel, t), reward, done

    def behavior(self, state: MazeState) -> jax.Array:
        return jnp.stack([state.x, state.y])  # tf_maze.cpp:66-72

    def distance_to_target(self, state: MazeState) -> jax.Array:
        return jnp.sqrt((state.x - self._end[0]) ** 2 + (state.y - self._end[1]) ** 2)

    # ------------------------------------------------------------- internals

    def _collides(self, x, y) -> jax.Array:
        """Any wall segment within HERO_RADIUS of (x, y)? (maze.h:694-702 via
        Line::distance, maze.h:264-287)."""
        ax, ay, bx, by = self._segs[:, 0], self._segs[:, 1], self._segs[:, 2], self._segs[:, 3]
        abx, aby = bx - ax, by - ay
        ab2 = abx * abx + aby * aby
        u = ((x - ax) * abx + (y - ay) * aby) / jnp.where(ab2 == 0.0, 1.0, ab2)
        # reference: u outside [0,1] → distance to nearest endpoint
        u = jnp.clip(u, 0.0, 1.0)
        px, py = ax + u * abx, ay + u * aby
        d2 = (px - x) ** 2 + (py - y) ** 2
        d2 = jnp.where(ab2 == 0.0, 0.0, d2)  # degenerate segment → dist 0 (maze.h:269-273)
        return jnp.any(d2 < HERO_RADIUS * HERO_RADIUS)

    def _rangefinders(self, state: MazeState) -> jax.Array:
        """Min intersection distance per sensor ray (maze.h:736-773).
        The reference builds the ray by projecting at the *relative* sensor
        angle then rotating by heading (maze.h:741-749) — equivalent to a ray
        at absolute angle heading+sensor."""
        angles = (jnp.asarray(RANGEFINDER_ANGLES) + state.heading) * _DEG2RAD  # [S]
        dx = jnp.cos(angles) * RANGEFINDER_RANGE
        dy = jnp.sin(angles) * RANGEFINDER_RANGE

        # segment-segment intersection, reference formula (maze.h:216-262):
        # wall = A→B, ray = C→D; r,s strictly inside (0,1)
        Ax, Ay = self._segs[:, 0][:, None], self._segs[:, 1][:, None]  # [L,1]
        Bx, By = self._segs[:, 2][:, None], self._segs[:, 3][:, None]
        Cx, Cy = state.x, state.y
        Dx, Dy = Cx + dx[None, :], Cy + dy[None, :]  # [1,S] → broadcast [L,S]

        rTop = (Ay - Cy) * (Dx - Cx) - (Ax - Cx) * (Dy - Cy)
        rBot = (Bx - Ax) * (Dy - Cy) - (By - Ay) * (Dx - Cx)
        sTop = (Ay - Cy) * (Bx - Ax) - (Ax - Cx) * (By - Ay)
        sBot = rBot  # identical expression in the reference (maze.h:231-232)

        safe_rBot = jnp.where(rBot == 0.0, 1.0, rBot)
        r = rTop / safe_rBot
        s = sTop / jnp.where(sBot == 0.0, 1.0, sBot)
        hit = (rBot != 0.0) & (r > 0.0) & (r < 1.0) & (s > 0.0) & (s < 1.0)

        ix = Ax + r * (Bx - Ax)
        iy = Ay + r * (By - Ay)
        dist = jnp.sqrt((ix - Cx) ** 2 + (iy - Cy) ** 2)
        dist = jnp.where(hit, dist, RANGEFINDER_RANGE)
        return jnp.min(dist, axis=0)  # [S]

    def _radar(self, state: MazeState) -> jax.Array:
        """Goal-direction quadrant indicator (maze.h:775-811 update_radar_gen):
        rotate goal by −heading around hero, translate, take custom angle()."""
        rad = -state.heading * _DEG2RAD
        tx = self._end[0] - state.x
        ty = self._end[1] - state.y
        rx = jnp.cos(rad) * tx - jnp.sin(rad) * ty
        ry = jnp.sin(rad) * tx + jnp.cos(rad) * ty
        angle = _point_angle(rx, ry)
        a1 = jnp.asarray([a for a, _ in RADAR_ANGLES])
        a2 = jnp.asarray([b for _, b in RADAR_ANGLES])
        fire = ((angle >= a1) & (angle < a2)) | ((angle + 360.0 >= a1) & (angle + 360.0 < a2))
        return fire.astype(jnp.float32)


def _load_reference_maze() -> str:
    """Prefer the reference's hard_maze.txt when present (bit-identical
    geometry); fall back to the embedded copy."""
    p = Path("/root/reference/gpu_implementation/gym_tensorflow/maze/hard_maze.txt")
    if p.exists():
        return p.read_text()
    return HARD_MAZE_TXT


register("maze", lambda **kw: MazeEnv(**kw))

"""Atari env family: C++ batched host engine + on-device preprocessing.

Replaces the reference's gym_tensorflow Atari path (SURVEY C22/C23):
per-slot ALE instances stepped by a thread pool in C++
(atari/tf_atari.cpp:24-128), indexed frames preprocessed in the TF graph
(tf_atari.py:81-94), 4-frame stacking as graph state
(wrappers/stack_frames.py). Here the engine lives in
deep_neuroevolution_tpu/native (C ABI + ctypes), preprocessing/stacking run
on-device (envs/preprocess.py), and the rollout loop is
algos/rollout_host.rollout_host_batch.

ALE availability is environment-dependent (ROMs are not redistributable);
when the engine was built without ALE, `toy` — the built-in C++ catch game
with identical frame/reset/RAM semantics — exercises the entire path, like
the reference's pure-python fallback did (gym_tensorflow/tf_env.py:31-123).
Set NEVO_ALE_PREFIX to an ALE install before first build to enable the real
games.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# minimal-action-set sizes per game (tf_atari.py:152-213 game_actions)
GAME_ACTIONS = {
    "air_raid": 6, "alien": 18, "amidar": 10, "assault": 7, "asterix": 9,
    "asteroids": 14, "atlantis": 4, "bank_heist": 18, "battle_zone": 18,
    "beam_rider": 9, "berzerk": 18, "bowling": 6, "boxing": 18, "breakout": 4,
    "carnival": 6, "centipede": 18, "chopper_command": 18, "crazy_climber": 9,
    "demon_attack": 6, "double_dunk": 18, "elevator_action": 18, "enduro": 9,
    "fishing_derby": 18, "freeway": 3, "frostbite": 18, "gopher": 8,
    "gravitar": 18, "hero": 18, "ice_hockey": 18, "jamesbond": 18,
    "journey_escape": 16, "kangaroo": 18, "krull": 18, "kung_fu_master": 14,
    "montezuma_revenge": 18, "ms_pacman": 9, "name_this_game": 6, "phoenix": 8,
    "pitfall": 18, "pong": 6, "pooyan": 6, "private_eye": 18, "qbert": 6,
    "riverraid": 18, "road_runner": 18, "robotank": 18, "seaquest": 18,
    "skiing": 3, "solaris": 18, "space_invaders": 6, "star_gunner": 18,
    "tennis": 18, "time_pilot": 10, "tutankham": 8, "up_n_down": 6,
    "venture": 18, "video_pinball": 9, "wizard_of_wor": 10,
    "yars_revenge": 18, "zaxxon": 18,
}
GAMES = tuple(GAME_ACTIONS)

FRAMESKIP = 4
DEFAULT_TIMESTEP_CUTOFF = 100_000 * FRAMESKIP  # tf_atari.py:40-41


def is_available() -> bool:
    """True when the native engine compiled with ALE support."""
    try:
        from ..native.bridge import HostBatchEnv

        e = HostBatchEnv("ale", "", 1)
        e.close()
        return True
    except Exception:
        return False


class AtariEnv:
    """Batched host-engine env. Not the pure-function device Env — use
    `algos.rollout_host.rollout_host_batch` (the trainers dispatch on
    `is_host_env`)."""

    is_host_env = True
    bc_dim = 128  # RAM bytes (tf_atari.cpp:114-119; policies.py:410-418)

    def __init__(
        self,
        game: str = "toy",
        batch_size: int = 64,
        rom_path: Optional[str] = None,
        num_threads: int = 0,
        warp_size: int = 84,
        pipeline_groups: int = 2,
        episodic_life: bool = False,
        obs_mode: str = "gray",
    ):
        from ..native.bridge import HostBatchEnv

        self.game = game
        # EpisodicLife (atari_wrappers.py:50-84): the CPU stack's
        # wrap_deepmind default for training envs; the GPU stack's C++ env
        # has no equivalent, so it is opt-in here and config.py enables it
        # for CPU-schema '<Game>NoFrameskip-v4' experiment ids
        self.episodic_life = episodic_life
        if game == "toy":
            self._env = HostBatchEnv(
                "toy", "", batch_size, num_threads, episodic_life=episodic_life
            )
            self.num_actions = self._env.num_actions
        else:
            assert game in GAME_ACTIONS, f"{game} not in the Atari suite"
            rom = rom_path or f"{game}.bin"
            self._env = HostBatchEnv(
                "ale", rom, batch_size, num_threads, episodic_life=episodic_life
            )
            self.num_actions = self._env.num_actions
        # 'gray' (default): the engine decodes indexed color → luminance via
        # a C++ LUT (nevo_observe_gray) and the device skips the palette
        # gather — which measured ~500 µs/member on TPU, 98% of the device
        # step (scripts/profile_atari_stages.py). 'indexed' ships raw
        # indexed frames and decodes on device (bit-exact f32 reference
        # path, tf_atari.py:81-94); divergence between the two is only the
        # LUT's ≤0.5/255 uint8 quantization per pixel.
        # 'preproc' (r5): the ENGINE also does the 2-frame max + the
        # align-corners bilinear resize (nevo_observe_preproc) and ships
        # [B, 84, 84] uint8 — ~10× fewer bytes than 'gray'. Measured here:
        # a 256-slot 'gray' observation is 17.2 MB and the host→HBM link of
        # a relay/tunnel host moves ~40 MB/s, so the upload alone was ~85%
        # of every rollout step. Additional divergence vs 'gray': one more
        # ≤0.5/255 quantization (after the resize instead of before it).
        assert obs_mode in ("gray", "indexed", "preproc"), obs_mode
        self.obs_mode = obs_mode
        if obs_mode in ("gray", "preproc"):
            from .preprocess import GRAY_PALETTE_UINT8

            self._env.set_gray_lut(GRAY_PALETTE_UINT8)
        self.batch_size = batch_size
        self.warp_size = warp_size
        self.obs_shape = (warp_size, warp_size, 4)
        self.default_timestep_cutoff = DEFAULT_TIMESTEP_CUTOFF
        self.discrete_action = True
        # host/device overlap: the rollout engine interleaves this many slot
        # groups so the TPU computes one group's actions while the C++ pool
        # steps the next (the reference ran 4 RLEvalutionWorkers per GPU for
        # the same reason, concurrent_worker.py:129-142)
        self.pipeline_groups = pipeline_groups

    # batched host interface consumed by rollout_host_batch
    def reset(self, indices=None, noops=None, max_frames: int = DEFAULT_TIMESTEP_CUTOFF,
              seeds=None):
        self._env.reset(indices=indices, noops=noops, max_frames=max_frames, seeds=seeds)

    def step(self, actions: np.ndarray, indices=None):
        return self._env.step(actions, indices=indices)

    def observe(self, indices=None) -> np.ndarray:
        if self.obs_mode == "preproc":
            return self._env.observe_preproc(self.warp_size, self.warp_size,
                                             indices=indices)
        if self.obs_mode == "gray":
            return self._env.observe_gray(indices=indices)
        return self._env.observe(indices=indices)

    def final_state(self) -> np.ndarray:
        return self._env.final_state()

    def close(self):
        self._env.close()

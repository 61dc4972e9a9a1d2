"""Atari (ALE) host-engine bridge — gated on the native library.

The reference's Atari path is a C++ TF op owning one ALE instance per batch
slot (gym_tensorflow/atari/tf_atari.cpp). The TPU equivalent is a C++
batched-ALE host pool behind a C ABI (native/), driven asynchronously and
feeding uint8 frames into device buffers; preprocessing (grayscale palette,
2-frame max, 84×84 resize, 4-stack) runs on-device (envs/preprocess.py,
mirroring tf_atari.py:81-94). Built in a later milestone; this module gates
cleanly when the native engine or ALE ROMs are absent, like the reference's
stub (gym_tensorflow/atari/__init__.py:5-8).
"""

from __future__ import annotations

# minimal-action-set game list mirrors tf_atari.py:152-213
GAMES = (
    "frostbite",
    "pong",
    "breakout",
    "seaquest",
    "space_invaders",
    "qbert",
    "enduro",
    "beam_rider",
    "amidar",
    "asteroids",
    "asterix",
    "atlantis",
    "gravitar",
    "kangaroo",
    "skiing",
    "venture",
    "zaxxon",
)


def is_available() -> bool:
    return False  # native engine lands in a later milestone


class AtariEnv:
    def __init__(self, *a, **kw):
        raise RuntimeError(
            "Atari requires the native batched-ALE engine (deep_neuroevolution_tpu/native); "
            "not built in this environment. Use 'maze' or 'gym.*' envs."
        )

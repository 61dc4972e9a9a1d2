"""ctypes bridge to the native batched env engine (env_engine.cpp).

The Python-visible class `HostBatchEnv` is the batched, index-addressable
interface of the reference's TF env ops (gym_tensorflow/tf_env.py:27-80:
reset(indices, max_frames), step(action, indices) → (reward, done),
observation(indices)) re-hosted on the C ABI. NumPy buffers are reused
across calls to avoid per-step allocation.
"""

from __future__ import annotations

import ctypes
from typing import Optional, Tuple

import numpy as np

from .build import ensure_built


_libs: dict = {}


def _load(path: Optional[str] = None):
    """Load (and memoize) an engine .so. Default: the auto-built engine;
    tests pass alternates (e.g. the HAVE_ALE stub build)."""
    key = path or "__default__"
    if key not in _libs:
        lib = ctypes.CDLL(str(path if path else ensure_built()))
        lib.nevo_create.restype = ctypes.c_void_p
        lib.nevo_create.argtypes = [ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.nevo_destroy.argtypes = [ctypes.c_void_p]
        lib.nevo_obs_shape.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
        lib.nevo_action_count.argtypes = [ctypes.c_void_p]
        lib.nevo_action_count.restype = ctypes.c_int
        lib.nevo_final_state_size.argtypes = [ctypes.c_void_p]
        lib.nevo_final_state_size.restype = ctypes.c_int
        iptr = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        fptr = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8ptr = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.nevo_set_episodic_life.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.nevo_reset.argtypes = [ctypes.c_void_p, iptr, iptr, iptr, ctypes.c_int]
        lib.nevo_step.argtypes = [ctypes.c_void_p, iptr, iptr, ctypes.c_int, fptr, u8ptr]
        lib.nevo_observe.argtypes = [ctypes.c_void_p, iptr, ctypes.c_int, u8ptr]
        lib.nevo_final_state.argtypes = [ctypes.c_void_p, iptr, ctypes.c_int, fptr]
        lib.nevo_has_gray = hasattr(lib, "nevo_set_gray_lut")
        if lib.nevo_has_gray:  # absent in pre-r3 .so builds
            lib.nevo_set_gray_lut.argtypes = [ctypes.c_void_p, u8ptr]
            lib.nevo_observe_gray.argtypes = [ctypes.c_void_p, iptr, ctypes.c_int, u8ptr]
        lib.nevo_has_seeded = hasattr(lib, "nevo_reset_seeded")
        if lib.nevo_has_seeded:  # absent in pre-r5 .so builds
            lib.nevo_reset_seeded.argtypes = [
                ctypes.c_void_p, iptr, iptr, iptr, iptr, ctypes.c_int,
            ]
        lib.nevo_has_preproc = hasattr(lib, "nevo_observe_preproc")
        if lib.nevo_has_preproc:  # absent in pre-r5 .so builds
            lib.nevo_observe_preproc.argtypes = [
                ctypes.c_void_p, iptr, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8ptr,
            ]
        _libs[key] = lib
    return _libs[key]


class HostBatchEnv:
    """Batched host simulator pool (toy game or ALE)."""

    def __init__(
        self,
        backend: str = "toy",
        arg: str = "",
        batch_size: int = 64,
        num_threads: int = 0,
        episodic_life: bool = False,
        lib_path: Optional[str] = None,
    ):
        lib = _load(lib_path)
        self._lib = lib
        self._h = lib.nevo_create(backend.encode(), arg.encode(), batch_size, num_threads)
        if not self._h:
            raise RuntimeError(f"backend {backend!r} unavailable (ALE not compiled in?)")
        if episodic_life:
            # EpisodicLife training episodes (atari_wrappers.py:50-84): done
            # on life loss; the game truly restarts only on game over
            lib.nevo_set_episodic_life(self._h, 1)
        self.episodic_life = episodic_life
        self.batch_size = batch_size
        dims = (ctypes.c_int * 3)()
        lib.nevo_obs_shape(self._h, dims)
        self.frames_per_obs, self.height, self.width = dims[0], dims[1], dims[2]
        self.num_actions = lib.nevo_action_count(self._h)
        self.final_state_size = lib.nevo_final_state_size(self._h)
        self._all = np.arange(batch_size, dtype=np.int32)
        # reusable buffers
        self._rew = np.zeros(batch_size, np.float32)
        self._done = np.zeros(batch_size, np.uint8)
        self._obs = np.zeros(
            (batch_size, self.frames_per_obs, self.height, self.width), np.uint8
        )
        self._fs = np.zeros((batch_size, self.final_state_size), np.float32)

    def reset(
        self,
        indices: Optional[np.ndarray] = None,
        noops: Optional[np.ndarray] = None,
        max_frames: int = 100_000,
        seeds: Optional[np.ndarray] = None,
    ) -> None:
        idx = self._all if indices is None else np.ascontiguousarray(indices, np.int32)
        if noops is None:
            # random noop start 1..30 (tf_atari.py:65 reset)
            noops = np.random.randint(1, 31, size=idx.size)
        noops = np.ascontiguousarray(noops, np.int32)
        mf = np.full(idx.size, max_frames, np.int32)
        if seeds is not None:
            # per-slot episode-RNG seeds: mirrored antithetic pairs share
            # the env stream (common random numbers; nevo_reset_seeded)
            if not getattr(self._lib, "nevo_has_seeded", False):
                raise RuntimeError(
                    "this engine .so predates seeded resets; rebuild with "
                    "`python -m deep_neuroevolution_tpu.native.build`"
                )
            sd = np.ascontiguousarray(seeds, np.int32)
            self._lib.nevo_reset_seeded(self._h, idx, noops, mf, sd, idx.size)
        else:
            self._lib.nevo_reset(self._h, idx, noops, mf, idx.size)

    def step(self, actions: np.ndarray, indices: Optional[np.ndarray] = None):
        idx = self._all if indices is None else np.ascontiguousarray(indices, np.int32)
        acts = np.ascontiguousarray(actions, np.int32)
        n = idx.size
        self._lib.nevo_step(self._h, idx, acts, n, self._rew[:n], self._done[:n])
        return self._rew[:n].copy(), self._done[:n].astype(bool)

    def observe(self, indices: Optional[np.ndarray] = None) -> np.ndarray:
        idx = self._all if indices is None else np.ascontiguousarray(indices, np.int32)
        n = idx.size
        self._lib.nevo_observe(self._h, idx, n, self._obs[:n].reshape(-1))
        # copy: the staging buffer is reused by the next call, and pipelined
        # rollouts keep several groups' frames in flight simultaneously
        return self._obs[:n].copy()

    def set_gray_lut(self, lut256: np.ndarray) -> None:
        """Install the 256-entry indexed-color → luminance LUT used by
        observe_gray (the engine-side palette decode; env_engine.h)."""
        if not getattr(self._lib, "nevo_has_gray", False):
            raise RuntimeError(
                "this engine .so predates the gray-LUT path (obs_mode='gray'); "
                "rebuild it with `python -m deep_neuroevolution_tpu.native.build` "
                "or construct AtariEnv(obs_mode='indexed')"
            )
        lut = np.ascontiguousarray(lut256, np.uint8)
        assert lut.shape == (256,)
        self._lib.nevo_set_gray_lut(self._h, lut)

    def observe_gray(self, indices: Optional[np.ndarray] = None) -> np.ndarray:
        """LUT-mapped grayscale frames [n, frames, H, W] uint8 — the palette
        decode runs in C++ instead of as a device gather (~500 µs/member on
        TPU, scripts/profile_atari_stages.py)."""
        idx = self._all if indices is None else np.ascontiguousarray(indices, np.int32)
        n = idx.size
        self._lib.nevo_observe_gray(self._h, idx, n, self._obs[:n].reshape(-1))
        return self._obs[:n].copy()

    def observe_preproc(
        self, out_h: int = 84, out_w: int = 84, indices: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """Fully-preprocessed frames [n, out_h, out_w] uint8: LUT gray →
        2-frame max → align-corners bilinear resize, all in C++
        (nevo_observe_preproc). ~10× fewer host→device bytes than raw frame
        pairs — the dominant rollout-step cost on relay/tunnel hosts."""
        if not getattr(self._lib, "nevo_has_preproc", False):
            raise RuntimeError(
                "this engine .so predates the engine-preprocess path "
                "(obs_mode='preproc'); rebuild with "
                "`python -m deep_neuroevolution_tpu.native.build`"
            )
        idx = self._all if indices is None else np.ascontiguousarray(indices, np.int32)
        n = idx.size
        if not hasattr(self, "_pre") or self._pre.shape[1:] != (out_h, out_w):
            self._pre = np.zeros((self.batch_size, out_h, out_w), np.uint8)
        self._lib.nevo_observe_preproc(self._h, idx, n, out_h, out_w, self._pre[:n].reshape(-1))
        return self._pre[:n].copy()

    def final_state(self, indices: Optional[np.ndarray] = None) -> np.ndarray:
        idx = self._all if indices is None else np.ascontiguousarray(indices, np.int32)
        n = idx.size
        self._lib.nevo_final_state(self._h, idx, n, self._fs[:n].reshape(-1))
        return self._fs[:n].copy()

    def close(self):
        if self._h:
            self._lib.nevo_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

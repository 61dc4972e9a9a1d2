"""On-device Atari frame preprocessing.

Mirrors the reference's TF-graph preprocessing exactly
(gym_tensorflow/atari/tf_atari.py:81-94 observation()):
  1. NTSC palette lookup: indexed uint8 frame → grayscale luminance
     (0.299/0.587/0.114 dot of the NTSC→RGB palette, tf_atari.py:143-150)
  2. max over the previous+current frame pair (flicker removal,
     tf_atari.py:92 reduce_max over the 2-frame axis)
  3. bilinear resize to 84×84 with ALIGN CORNERS (tf_atari.py:93
     tf.image.resize_bilinear(..., align_corners=True))
  4. 4-frame stacking as engine state (wrappers/stack_frames.py:33-51:
     shift-left + append; reset zero-fills history then appends the first
     frame).

TPU-native detail: the align-corners bilinear resize is expressed as two
constant interpolation matrices R [84, H] and C [W, 84] so the whole resize
is R @ img @ C — dense MXU matmuls instead of gather chains.

The palette constants are Atari 2600 NTSC hardware data (as shipped in the
reference, tf_atari.py:107-141, and in ALE/Stella).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# NTSC→RGB palette, 128 colors interleaved with zeros to 256 entries
# (tf_atari.py:107-141; Atari 2600 hardware palette data)
NTSC_TO_RGB = [
    0x000000, 0, 0x4A4A4A, 0, 0x6F6F6F, 0, 0x8E8E8E, 0,
    0xAAAAAA, 0, 0xC0C0C0, 0, 0xD6D6D6, 0, 0xECECEC, 0,
    0x484800, 0, 0x69690F, 0, 0x86861D, 0, 0xA2A22A, 0,
    0xBBBB35, 0, 0xD2D240, 0, 0xE8E84A, 0, 0xFCFC54, 0,
    0x7C2C00, 0, 0x904811, 0, 0xA26221, 0, 0xB47A30, 0,
    0xC3903D, 0, 0xD2A44A, 0, 0xDFB755, 0, 0xECC860, 0,
    0x901C00, 0, 0xA33915, 0, 0xB55328, 0, 0xC66C3A, 0,
    0xD5824A, 0, 0xE39759, 0, 0xF0AA67, 0, 0xFCBC74, 0,
    0x940000, 0, 0xA71A1A, 0, 0xB83232, 0, 0xC84848, 0,
    0xD65C5C, 0, 0xE46F6F, 0, 0xF08080, 0, 0xFC9090, 0,
    0x840064, 0, 0x97197A, 0, 0xA8308F, 0, 0xB846A2, 0,
    0xC659B3, 0, 0xD46CC3, 0, 0xE07CD2, 0, 0xEC8CE0, 0,
    0x500084, 0, 0x68199A, 0, 0x7D30AD, 0, 0x9246C0, 0,
    0xA459D0, 0, 0xB56CE0, 0, 0xC57CEE, 0, 0xD48CFC, 0,
    0x140090, 0, 0x331AA3, 0, 0x4E32B5, 0, 0x6848C6, 0,
    0x7F5CD5, 0, 0x956FE3, 0, 0xA980F0, 0, 0xBC90FC, 0,
    0x000094, 0, 0x181AA7, 0, 0x2D32B8, 0, 0x4248C8, 0,
    0x545CD6, 0, 0x656FE4, 0, 0x7580F0, 0, 0x8490FC, 0,
    0x001C88, 0, 0x183B9D, 0, 0x2D57B0, 0, 0x4272C2, 0,
    0x548AD2, 0, 0x65A0E1, 0, 0x75B5EF, 0, 0x84C8FC, 0,
    0x003064, 0, 0x185080, 0, 0x2D6D98, 0, 0x4288B0, 0,
    0x54A0C5, 0, 0x65B7D9, 0, 0x75CCEB, 0, 0x84E0FC, 0,
    0x004030, 0, 0x18624E, 0, 0x2D8169, 0, 0x429E82, 0,
    0x54B899, 0, 0x65D1AE, 0, 0x75E7C2, 0, 0x84FCD4, 0,
    0x004400, 0, 0x1A661A, 0, 0x328432, 0, 0x48A048, 0,
    0x5CBA5C, 0, 0x6FD26F, 0, 0x80E880, 0, 0x90FC90, 0,
    0x143C00, 0, 0x355F18, 0, 0x527E2D, 0, 0x6E9C42, 0,
    0x87B754, 0, 0x9ED065, 0, 0xB4E775, 0, 0xC8FC84, 0,
    0x303800, 0, 0x505916, 0, 0x6D762B, 0, 0x88923E, 0,
    0xA0AB4F, 0, 0xB7C25F, 0, 0xCCD86E, 0, 0xE0EC7C, 0,
    0x482C00, 0, 0x694D14, 0, 0x866A26, 0, 0xA28638, 0,
    0xBB9F47, 0, 0xD2B656, 0, 0xE8CC63, 0, 0xFCE070, 0,
]


def _palettes():
    rgb = np.empty((256, 3), np.uint8)
    for i in range(256):
        z = NTSC_TO_RGB[i]
        rgb[i] = [(z >> 16) & 0xFF, (z >> 8) & 0xFF, z & 0xFF]
    rgbf = rgb.astype(np.float32) / 255.0
    gray = rgbf @ np.array([0.299, 0.587, 0.114], np.float32)  # tf_atari.py:150
    return rgb, gray


RGB_PALETTE_UINT8, GRAYSCALE_PALETTE = _palettes()

# uint8-quantized luminance LUT for the ENGINE-side palette decode
# (native/env_engine.cpp nevo_observe_gray): round(255·gray). TPU has no
# fast gather — the device-side 256-entry lookup measured ~500 µs/member,
# 98% of the whole device step (scripts/profile_atari_stages.py), so the
# production path maps indexed→gray in C++ and ships gray uint8. The only
# divergence from the reference's f32 path is the ≤0.5/255 quantization
# per pixel before resize.
GRAY_PALETTE_UINT8 = np.round(255.0 * GRAYSCALE_PALETTE).astype(np.uint8)


def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] align-corners bilinear interpolation matrix
    (tf resize_bilinear align_corners=True: src = i·(in−1)/(out−1))."""
    m = np.zeros((out_size, in_size), np.float32)
    scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
    for i in range(out_size):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


@partial(jax.jit, static_argnums=(1, 2))
def preprocess_frames(frames: jax.Array, out_h: int = 84, out_w: int = 84) -> jax.Array:
    """[B, 2, H, W] uint8 indexed frames → [B, out_h, out_w, 1] f32 in [0,1].

    palette-gray lookup → 2-frame max → align-corners bilinear resize
    (tf_atari.py:90-94)."""
    B, F, H, W = frames.shape
    gray = jnp.asarray(GRAYSCALE_PALETTE)[frames.astype(jnp.int32)]  # [B, 2, H, W] f32
    gray = jnp.max(gray, axis=1)  # flicker removal
    R = jnp.asarray(_interp_matrix(H, out_h))  # [oh, H]
    C = jnp.asarray(_interp_matrix(W, out_w)).T  # [W, ow]
    out = jnp.einsum("oh,bhw,wc->boc", R, gray, C)  # two MXU matmuls
    return out[..., None]


@partial(jax.jit, static_argnums=(1, 2))
def preprocess_gray_frames(frames: jax.Array, out_h: int = 84, out_w: int = 84) -> jax.Array:
    """[B, 2, H, W] uint8 GRAYSCALE frames (engine-side LUT already applied,
    nevo_observe_gray) → [B, out_h, out_w, 1] f32 in [0,1].

    Same palette→max→resize order as preprocess_frames (tf_atari.py:90-94);
    the palette step already happened in C++, so the device does only
    scale + 2-frame max + the align-corners resize matmuls."""
    B, F, H, W = frames.shape
    gray = frames.astype(jnp.float32) * (1.0 / 255.0)
    gray = jnp.max(gray, axis=1)
    R = jnp.asarray(_interp_matrix(H, out_h))
    C = jnp.asarray(_interp_matrix(W, out_w)).T
    out = jnp.einsum("oh,bhw,wc->boc", R, gray, C)
    return out[..., None]


@jax.jit
def scale_preproc_frames(frames: jax.Array) -> jax.Array:
    """[B, h, w] uint8 ENGINE-preprocessed frames (nevo_observe_preproc:
    LUT gray + 2-frame max + align-corners resize already applied in C++) →
    [B, h, w, 1] f32 in [0,1]. The device's only remaining step is the
    scale; everything upstream matches preprocess_gray_frames to ≤0.5/255
    (the engine's final uint8 rounding)."""
    return frames.astype(jnp.float32)[..., None] * (1.0 / 255.0)


@jax.jit
def stack_reset(frame: jax.Array, num_stack: int = 4) -> jax.Array:
    """Zero history + first frame in the last channel slot
    (stack_frames.py:36-38)."""
    B, H, W, _ = frame.shape
    zeros = jnp.zeros((B, H, W, num_stack - 1), frame.dtype)
    return jnp.concatenate([zeros, frame], axis=-1)


@jax.jit
def stack_step(stack: jax.Array, frame: jax.Array) -> jax.Array:
    """Shift-left + append (stack_frames.py:39-42)."""
    return jnp.concatenate([stack[..., 1:], frame], axis=-1)

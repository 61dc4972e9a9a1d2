// Batched host-side environment engine — TPU-native equivalent of the
// reference's TF C++ env framework (gym_tensorflow/tf_env.cpp:40-318,
// tf_env.h:27-83): a pool of per-slot simulator instances stepped in
// parallel by a thread pool, behind a narrow C ABI consumed from Python via
// ctypes and fed into device buffers.
//
// Differences from the reference by design:
//  * No TF resource manager / op registration — a plain C handle API.
//  * The thread pool is owned by the engine (the reference borrowed TF's
//    intra-op pool, tf_env.cpp:145-153); work is sharded by slot index with
//    a completion latch, same structure as the BlockingCounter pattern.
//  * Backends are pluggable: ALE (compiled when HAVE_ALE) mirrors
//    atari/tf_atari.cpp:24-128 exactly; a built-in "catch" toy game with
//    identical frame/RAM/reset semantics exercises the full path in
//    environments without ALE.

#ifndef NEVO_ENV_ENGINE_H
#define NEVO_ENV_ENGINE_H

#include <cstdint>

extern "C" {

// Create an engine: backend "toy" or "ale"; `arg` is backend-specific
// (ALE: ROM path; toy: unused). Returns an opaque handle or null.
void* nevo_create(const char* backend, const char* arg, int batch_size, int num_threads);
void nevo_destroy(void* handle);

// Observation geometry: dims[0..2] = {frames_per_obs, height, width}.
void nevo_obs_shape(void* handle, int* dims);
int nevo_action_count(void* handle);
int nevo_final_state_size(void* handle);  // RAM_SIZE analog (tf_atari.cpp:114-119)

// Reset slots with per-slot noop counts and frame caps
// (tf_env.cpp:115-176 EnvironmentReset; tf_atari.cpp:83-112 semantics).
void nevo_reset(void* handle, const int* indices, const int* noops,
                const int* max_frames, int n);

// Seeded reset: per-slot episode-RNG seeds so mirrored (antithetic) pairs
// can share the environment's random stream (common-random-numbers variance
// reduction, opt-in). Backends whose randomness rides the noop count (ALE)
// ignore the seed.
void nevo_reset_seeded(void* handle, const int* indices, const int* noops,
                       const int* max_frames, const int* seeds, int n);

// Step slots: frameskip-accumulated reward + done flags
// (tf_env.cpp:238-318 EnvironmentStep; tf_atari.cpp:64-81).
void nevo_step(void* handle, const int* indices, const int* actions, int n,
               float* rewards, uint8_t* dones);

// Copy each slot's observation (previous+current frame buffers,
// tf_atari.cpp:57-62) into out[n, frames, H, W] uint8.
void nevo_observe(void* handle, const int* indices, int n, uint8_t* out);

// Grayscale observation path: install a 256-entry indexed-color → luminance
// LUT (the NTSC grayscale palette, tf_atari.py:143-150, quantized to uint8),
// then nevo_observe_gray emits LUT-mapped frames [n, frames, H, W] uint8.
// Moving the palette decode into the engine removes the device-side table
// gather, which on TPU costs ~500 µs/member — 98% of the device step
// (scripts/profile_atari_stages.py r3 measurement). The 2-frame max and
// resize stay on device, preserving the reference's palette→max→resize
// order (tf_atari.py:90-94).
void nevo_set_gray_lut(void* handle, const uint8_t* lut256);
void nevo_observe_gray(void* handle, const int* indices, int n, uint8_t* out);

// Full-preprocess observation path: LUT grayscale → 2-frame max →
// align-corners bilinear resize to [out_h, out_w] → uint8, emitted as
// out[n, out_h, out_w]. Same math the device runs in preprocess_gray_frames
// (tf_atari.py:90-94), quantized at the end; ships ~10× fewer bytes over
// the host→device link, which dominates rollout steps on relay/tunnel
// hosts (~40 MB/s measured). Requires the gray LUT to be installed.
void nevo_observe_preproc(void* handle, const int* indices, int n, int out_h,
                          int out_w, uint8_t* out);

// Behavior characterization / final state (RAM bytes as floats,
// tf_atari.cpp:114-119) into out[n, final_state_size].
void nevo_final_state(void* handle, const int* indices, int n, float* out);

}  // extern "C"

#endif  // NEVO_ENV_ENGINE_H

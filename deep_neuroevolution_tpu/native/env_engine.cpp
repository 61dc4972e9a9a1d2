// Batched host env engine implementation. See env_engine.h for the design
// contract and reference citations.

#include "env_engine.h"

#include <atomic>
#include <condition_variable>
#include <cstring>
#include <functional>
#include <memory>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace nevo {

// ---------------------------------------------------------------- threadpool

// Fixed pool + completion latch: the engine analog of sharding an index list
// across TF's intra-op pool with a BlockingCounter (tf_env.cpp:145-153).
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  // Run fn(i) for i in [0, n) across the pool; blocks until all complete.
  void parallel_for(int n, const std::function<void(int)>& fn) {
    if (n <= 0) return;
    std::atomic<int> next(0), done(0);
    std::mutex done_mu;
    std::condition_variable done_cv;
    int workers = static_cast<int>(workers_.size());
    int shards = workers < n ? workers : n;
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (int s = 0; s < shards; ++s) {
        jobs_.push([&, n] {
          int i;
          while ((i = next.fetch_add(1)) < n) fn(i);
          // notify UNDER the lock: the waiter owns these locals and may
          // destroy them the moment it observes done==shards, so the last
          // touch must happen before the mutex is released
          std::lock_guard<std::mutex> dlk(done_mu);
          done.fetch_add(1);
          done_cv.notify_one();
        });
      }
    }
    cv_.notify_all();
    std::unique_lock<std::mutex> dlk(done_mu);
    done_cv.wait(dlk, [&] { return done.load() == shards; });
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

// ------------------------------------------------------------------ backend

// Per-slot simulator interface (tf_env.h:27-48 BaseEnvironment/StepInterface
// /Environment<T> collapsed into one host-side class).
class Backend {
 public:
  virtual ~Backend() = default;
  virtual void reset(int idx, int noops, int max_frames) = 0;
  // seeded variant: pin the slot's episode RNG stream (mirrored-pair common
  // random numbers — antithetic members share serves). Default: ignore the
  // seed (backends whose randomness rides the noop count, like ALE).
  virtual void reset_seeded(int idx, int noops, int max_frames, uint32_t seed) {
    (void)seed;
    reset(idx, noops, max_frames);
  }
  virtual float step(int idx, int action) = 0;  // frameskip-accumulated
  virtual bool is_done(int idx) = 0;
  virtual void observe(int idx, uint8_t* out) = 0;  // [frames, H, W]
  virtual void final_state(int idx, float* out) = 0;
  virtual int frames_per_obs() const = 0;
  virtual int height() const = 0;
  virtual int width() const = 0;
  virtual int action_count() const = 0;
  virtual int final_state_size() const = 0;
  // remaining lives, or -1 if the game has no life counter. Drives the
  // EpisodicLife episode semantics (atari_wrappers.py:50-84) implemented at
  // the engine layer.
  virtual int lives(int idx) { (void)idx; return -1; }
};

// ---------------------------------------------------------------- toy game

// "Catch": a ball falls from the top; a paddle at the bottom catches it.
// Deliberately shaped like the ALE contract (tf_atari.cpp:24-128):
//  * 210x160 indexed-color frames, previous+current buffers for 2-frame max
//  * minimal action set [NOOP, FIRE, RIGHT, LEFT] → FIRE-reset protocol
//    exercises the reference's reset path (tf_atari.cpp:97-109)
//  * engine-internal frameskip 4 accumulating reward (tf_atari.cpp:64-75)
//  * 128-byte RAM exposing game state (tf_atari.cpp:114-119)
//  * per-slot max_frames cutoff counted in emulator frames past the noops
//    (tf_atari.cpp:77-81)
class ToyCatch : public Backend {
 public:
  static constexpr int H = 210, W = 160, RAM = 128, SKIP = 4;

 private:
  struct Slot;  // defined below; reset_common needs the name early

 public:
  explicit ToyCatch(int batch) : slots_(batch) {}

  void reset_seeded(int idx, int noops, int max_frames, uint32_t seed) override {
    Slot& s = slots_[idx];
    s.rng.seed(seed ? seed : (0x9E3779B9u ^ (uint32_t)idx));
    reset_common(s, noops, max_frames);
  }

  void reset(int idx, int noops, int max_frames) override {
    Slot& s = slots_[idx];
    s.rng.seed(0x9E3779B9u ^ (uint32_t)idx);  // per-slot stream; reseeded by noops below
    reset_common(s, noops, max_frames);
  }

 private:
  void reset_common(Slot& s, int noops, int max_frames) {
    s.frame = 0;
    s.score_events = 0;
    s.lives = 3;
    s.paddle_x = W / 2;
    s.ball_live = false;
    s.game_over = false;
    s.idle_frames = 0;
    s.max_frames = max_frames;
    std::memset(s.prev, 0, sizeof(s.prev));
    std::memset(s.cur, 0, sizeof(s.cur));
    // noop starts advance the RNG/frame counter — the randomization
    // mechanism of the reference reset (tf_atari.cpp:88-96)
    for (int i = 0; i < noops; ++i) emulate(s, 0);
    s.noop_frames = s.frame;
    s.game_over = false;
  }

 public:
  float step(int idx, int action) override {
    Slot& s = slots_[idx];
    float rew = 0.f;
    for (int i = 0; i < SKIP; ++i) {
      rew += emulate(s, action);
      if (is_done(idx)) break;
    }
    return rew;
  }

  bool is_done(int idx) override {
    Slot& s = slots_[idx];
    return s.game_over || (s.frame - s.noop_frames) >= s.max_frames;
  }

  void observe(int idx, uint8_t* out) override {
    Slot& s = slots_[idx];
    std::memcpy(out, s.prev, sizeof(s.prev));
    std::memcpy(out + H * W, s.cur, sizeof(s.cur));
  }

  void final_state(int idx, float* out) override {
    Slot& s = slots_[idx];
    uint8_t ram[RAM] = {0};
    ram[0] = (uint8_t)s.paddle_x;
    ram[1] = (uint8_t)(s.ball_live ? s.ball_x : 255);
    ram[2] = (uint8_t)(s.ball_live ? (s.ball_y * 255 / H) : 255);
    ram[3] = (uint8_t)s.lives;
    ram[4] = (uint8_t)(s.score_events & 0xff);
    ram[5] = (uint8_t)(s.frame & 0xff);
    ram[6] = (uint8_t)((s.frame >> 8) & 0xff);
    for (int i = 0; i < RAM; ++i) out[i] = (float)ram[i];
  }

  int frames_per_obs() const override { return 2; }
  int height() const override { return H; }
  int width() const override { return W; }
  int action_count() const override { return 4; }  // NOOP FIRE RIGHT LEFT
  int final_state_size() const override { return RAM; }
  int lives(int idx) override { return slots_[idx].lives; }

 private:
  struct Slot {
    std::mt19937 rng;
    uint8_t prev[H * W];
    uint8_t cur[H * W];
    int frame = 0, noop_frames = 0, max_frames = 100000;
    int paddle_x = W / 2;
    int ball_x = 0, ball_y = 0, ball_vx = 0;
    int idle_frames = 0;
    bool ball_live = false, game_over = false;
    int lives = 3, score_events = 0;
  };

  float emulate(Slot& s, int action) {
    // one "emulator frame". The RNG advances EVERY frame (like a real
    // emulator's internal state evolution, tf_atari.cpp:88-96's reason for
    // noop starts): serve positions depend on when the serve happens, so
    // different noop counts — and seeded resets — give genuinely different
    // episodes. Before this, the stream was consumed only at serves and
    // equal-length unseeded episodes replayed identical serve sequences.
    (void)s.rng();
    float rew = 0.f;
    s.frame++;
    if (action == 2) s.paddle_x = s.paddle_x + 4 > W - 9 ? W - 9 : s.paddle_x + 4;
    if (action == 3) s.paddle_x = s.paddle_x - 4 < 8 ? 8 : s.paddle_x - 4;
    if (!s.ball_live) {
      s.idle_frames++;
      // FIRE serves; after 60 idle frames the game auto-serves (like ALE
      // games that restart play by themselves) so episodes always terminate
      if (action == 1 || s.idle_frames > 60) {
        s.ball_live = true;
        s.idle_frames = 0;
        s.ball_x = 8 + (int)(s.rng() % (W - 16));
        s.ball_y = 20;
        s.ball_vx = (int)(s.rng() % 3) - 1;
      }
    }
    if (s.ball_live) {
      s.ball_y += 2;
      s.ball_x += s.ball_vx;
      if (s.ball_x < 4) { s.ball_x = 4; s.ball_vx = -s.ball_vx; }
      if (s.ball_x > W - 5) { s.ball_x = W - 5; s.ball_vx = -s.ball_vx; }
      if (s.ball_y >= H - 14) {  // paddle line
        int dx = s.ball_x - s.paddle_x;
        if (dx >= -10 && dx <= 10) {
          rew += 1.f;
          s.score_events++;
        } else {
          s.lives--;
          if (s.lives <= 0) s.game_over = true;
        }
        s.ball_live = false;
      }
    }
    render(s);
    return rew;
  }

  void render(Slot& s) {
    std::memcpy(s.prev, s.cur, sizeof(s.cur));
    std::memset(s.cur, 0, sizeof(s.cur));
    // walls (color 4), paddle (color 42), ball (color 66) — palette indices
    for (int y = 0; y < H; ++y) {
      s.cur[y * W + 0] = 4;
      s.cur[y * W + W - 1] = 4;
    }
    int py = H - 12;
    for (int y = py; y < py + 4 && y < H; ++y)
      for (int x = s.paddle_x - 8; x <= s.paddle_x + 8; ++x)
        if (x >= 0 && x < W) s.cur[y * W + x] = 42;
    if (s.ball_live) {
      for (int y = s.ball_y - 2; y <= s.ball_y + 2; ++y)
        for (int x = s.ball_x - 2; x <= s.ball_x + 2; ++x)
          if (x >= 0 && x < W && y >= 0 && y < H) s.cur[y * W + x] = 66;
    }
  }

  std::vector<Slot> slots_;
};

#ifdef HAVE_ALE
// ALE backend: mirrors atari/tf_atari.cpp:24-128 exactly —
// repeat_action_probability=0, minimal action set indexing, frameskip 4
// with reward accumulation, previous+current frame buffers, noop+FIRE
// reset protocol, RAM final state.
#include <ale_interface.hpp>

class AleBackend : public Backend {
 public:
  AleBackend(const std::string& rom, int batch)
      : ifaces_(batch), noop_frames_(batch, 0), max_frames_(batch, 100000) {
    for (auto& a : ifaces_) {
      a.setFloat("repeat_action_probability", 0.0f);  // tf_atari.cpp:37
      a.setInt("random_seed", 0);
      a.loadROM(rom);
    }
    h_ = ifaces_[0].getScreen().height();
    w_ = ifaces_[0].getScreen().width();
  }

  void reset(int i, int noops, int max_frames) override {
    auto& a = ifaces_[i];
    a.reset_game();
    for (int s = 0; s < noops; ++s) {  // tf_atari.cpp:88-96
      a.act(ale::PLAYER_A_NOOP);
      if (a.game_over()) a.reset_game();
    }
    auto mset = a.getMinimalActionSet();
    if (mset.size() >= 3 && mset[1] == ale::PLAYER_A_FIRE) {  // tf_atari.cpp:97-109
      step(i, 1);
      if (a.game_over()) a.reset_game();
      step(i, 2);
      if (a.game_over()) a.reset_game();
    }
    noop_frames_[i] = a.getEpisodeFrameNumber();
    max_frames_[i] = max_frames;
  }

  float step(int i, int action) override {
    auto& a = ifaces_[i];
    float rew = 0.f;
    auto mset = a.getMinimalActionSet();
    for (int k = 0; k < 4; ++k) {  // frameskip, tf_atari.cpp:64-75
      rew += a.act(mset[action]);
      if (is_done(i)) break;
    }
    return rew;
  }

  bool is_done(int i) override {
    auto& a = ifaces_[i];
    return a.game_over() ||
           a.getEpisodeFrameNumber() - noop_frames_[i] >= max_frames_[i];
  }

  void observe(int i, uint8_t* out) override {  // tf_atari.cpp:57-62
    auto& a = ifaces_[i];
    const auto ssize = h_ * w_;
    std::memcpy(out, a.theOSystem->console().mediaSource().previousFrameBuffer(), ssize);
    std::memcpy(out + ssize, a.theOSystem->console().mediaSource().currentFrameBuffer(), ssize);
  }

  void final_state(int i, float* out) override {  // tf_atari.cpp:114-119
    auto ram = ifaces_[i].getRAM();
    for (size_t k = 0; k < ram.size(); ++k) out[k] = (float)ram.get(k);
  }

  int frames_per_obs() const override { return 2; }
  int height() const override { return h_; }
  int width() const override { return w_; }
  int action_count() const override {
    return (int)const_cast<ale::ALEInterface&>(ifaces_[0]).getMinimalActionSet().size();
  }
  int final_state_size() const override { return 128; }
  int lives(int i) override { return ifaces_[i].lives(); }

 private:
  std::vector<ale::ALEInterface> ifaces_;
  std::vector<int> noop_frames_, max_frames_;
  int h_ = 0, w_ = 0;
};
#endif  // HAVE_ALE

// ------------------------------------------------------------------- engine

// Align-corners bilinear interpolation axis (src = i·(in−1)/(out−1)) — the
// exact resize the device path expresses as matmul matrices
// (envs/preprocess.py _interp_matrix, mirroring tf_atari.py:93
// resize_bilinear align_corners=True). Bilinear is separable, so the
// row-then-column lerp below equals the device's R @ img @ C.
struct InterpAxis {
  std::vector<int> lo, hi;
  std::vector<float> w;
};

static InterpAxis make_interp(int in, int out) {
  InterpAxis a;
  a.lo.resize(out);
  a.hi.resize(out);
  a.w.resize(out);
  const float scale = out > 1 ? (float)(in - 1) / (float)(out - 1) : 0.f;
  for (int i = 0; i < out; ++i) {
    float src = i * scale;
    int lo = (int)src;
    if (lo > in - 1) lo = in - 1;
    int hi = lo + 1 < in ? lo + 1 : in - 1;
    a.lo[i] = lo;
    a.hi[i] = hi;
    a.w[i] = src - (float)lo;
  }
  return a;
}

struct Engine {
  std::unique_ptr<Backend> backend;
  std::unique_ptr<ThreadPool> pool;
  int batch_size;
  // EpisodicLife episode semantics (atari_wrappers.py:50-84): losing a life
  // ends the *training* episode; the underlying game resets only on true
  // game over (a subsequent reset continues the game with a no-op step).
  bool episodic_life = false;
  std::vector<int> last_lives;
  // indexed-color → luminance LUT for nevo_observe_gray (set from Python;
  // single source of truth is envs/preprocess.py's NTSC palette)
  uint8_t gray_lut[256] = {0};
  bool has_gray_lut = false;
  // engine-side full-preprocess caches (nevo_observe_preproc)
  int pre_h = 0, pre_w = 0;
  InterpAxis prow, pcol;
};

}  // namespace nevo

using nevo::Engine;

extern "C" {

void* nevo_create(const char* backend, const char* arg, int batch_size, int num_threads) {
  auto* e = new Engine();
  e->batch_size = batch_size;
  std::string b(backend ? backend : "");
  if (b == "toy") {
    e->backend = std::make_unique<nevo::ToyCatch>(batch_size);
  }
#ifdef HAVE_ALE
  else if (b == "ale") {
    e->backend = std::make_unique<nevo::AleBackend>(arg ? arg : "", batch_size);
  }
#endif
  else {
    delete e;
    return nullptr;
  }
  if (num_threads <= 0) num_threads = (int)std::thread::hardware_concurrency();
  e->pool = std::make_unique<nevo::ThreadPool>(num_threads);
  e->last_lives.assign(batch_size, -1);
  return e;
}

void nevo_set_episodic_life(void* h, int on) {
  static_cast<Engine*>(h)->episodic_life = on != 0;
}

void nevo_destroy(void* h) { delete static_cast<Engine*>(h); }

void nevo_obs_shape(void* h, int* dims) {
  auto* e = static_cast<Engine*>(h);
  dims[0] = e->backend->frames_per_obs();
  dims[1] = e->backend->height();
  dims[2] = e->backend->width();
}

int nevo_action_count(void* h) { return static_cast<Engine*>(h)->backend->action_count(); }

int nevo_final_state_size(void* h) {
  return static_cast<Engine*>(h)->backend->final_state_size();
}

void nevo_reset(void* h, const int* indices, const int* noops, const int* max_frames, int n) {
  auto* e = static_cast<Engine*>(h);
  e->pool->parallel_for(n, [&](int i) {
    const int idx = indices[i];
    if (e->episodic_life && !e->backend->is_done(idx) && e->last_lives[idx] > 0) {
      // lost-life boundary, game still running: continue from the current
      // state with one no-op step instead of restarting
      // (atari_wrappers.py:76-84 EpisodicLifeEnv.reset)
      e->backend->step(idx, 0);
    } else {
      e->backend->reset(idx, noops[i], max_frames[i]);
    }
    e->last_lives[idx] = e->backend->lives(idx);
  });
}

void nevo_reset_seeded(void* h, const int* indices, const int* noops,
                       const int* max_frames, const int* seeds, int n) {
  // Like nevo_reset, with per-slot episode-RNG seeds: antithetic members
  // given the same (noops, seed) replay the same environment stream, so
  // their fitness DIFFERENCE isolates the perturbation effect (mirrored
  // sampling with common random numbers — an opt-in extension beyond the
  // reference, whose pop-5000 fleets average the luck noise out instead).
  auto* e = static_cast<Engine*>(h);
  e->pool->parallel_for(n, [&](int i) {
    const int idx = indices[i];
    if (e->episodic_life && !e->backend->is_done(idx) && e->last_lives[idx] > 0) {
      e->backend->step(idx, 0);
    } else {
      e->backend->reset_seeded(idx, noops[i], max_frames[i], (uint32_t)seeds[i]);
    }
    e->last_lives[idx] = e->backend->lives(idx);
  });
}

void nevo_step(void* h, const int* indices, const int* actions, int n, float* rewards,
               uint8_t* dones) {
  auto* e = static_cast<Engine*>(h);
  e->pool->parallel_for(n, [&](int i) {
    const int idx = indices[i];
    rewards[i] = e->backend->step(idx, actions[i]);
    bool done = e->backend->is_done(idx);
    if (e->episodic_life) {
      // done on life loss while lives remain (atari_wrappers.py:62-72)
      const int l = e->backend->lives(idx);
      if (l >= 0 && l < e->last_lives[idx] && l > 0) done = true;
      e->last_lives[idx] = l;
    }
    dones[i] = done ? 1 : 0;
  });
}

void nevo_observe(void* h, const int* indices, int n, uint8_t* out) {
  auto* e = static_cast<Engine*>(h);
  const size_t per =
      (size_t)e->backend->frames_per_obs() * e->backend->height() * e->backend->width();
  e->pool->parallel_for(n, [&](int i) { e->backend->observe(indices[i], out + per * i); });
}

void nevo_set_gray_lut(void* h, const uint8_t* lut256) {
  auto* e = static_cast<Engine*>(h);
  std::memcpy(e->gray_lut, lut256, 256);
  e->has_gray_lut = true;
}

void nevo_observe_gray(void* h, const int* indices, int n, uint8_t* out) {
  auto* e = static_cast<Engine*>(h);
  const size_t per =
      (size_t)e->backend->frames_per_obs() * e->backend->height() * e->backend->width();
  const uint8_t* lut = e->gray_lut;
  e->pool->parallel_for(n, [&](int i) {
    uint8_t* dst = out + per * i;
    e->backend->observe(indices[i], dst);
    // in-place LUT map: per-byte table lookup, auto-vectorizable; ~µs per
    // 67 KB slot vs ~500 µs on the device (the gather this replaces)
    for (size_t k = 0; k < per; ++k) dst[k] = lut[dst[k]];
  });
}

void nevo_observe_preproc(void* h, const int* indices, int n, int out_h, int out_w,
                          uint8_t* out) {
  // Full DeepMind preprocess in the engine: LUT grayscale (per frame) →
  // 2-frame max → align-corners bilinear resize → uint8. Byte-for-byte the
  // same pipeline the device runs in preprocess_gray_frames
  // (tf_atari.py:90-94 order), quantized to uint8 at the end so a 256-slot
  // observation ships as ~1.8 MB instead of 17.2 MB of raw frame pairs —
  // the host→HBM link (~40 MB/s through a relay tunnel) was 85% of every
  // rollout step. Divergence from the device path: ≤0.5/255 per output
  // pixel (the final rounding).
  auto* e = static_cast<Engine*>(h);
  const int H = e->backend->height(), W = e->backend->width();
  const int F = e->backend->frames_per_obs();
  if (e->pre_h != out_h || e->pre_w != out_w) {  // lazily (re)build axes —
    e->prow = nevo::make_interp(H, out_h);       // called from the single
    e->pcol = nevo::make_interp(W, out_w);       // Python thread, before
    e->pre_h = out_h;                            // the pool fans out
    e->pre_w = out_w;
  }
  const nevo::InterpAxis& prow = e->prow;
  const nevo::InterpAxis& pcol = e->pcol;
  const uint8_t* lut = e->gray_lut;
  const size_t per_out = (size_t)out_h * out_w;
  e->pool->parallel_for(n, [&](int i) {
    thread_local std::vector<uint8_t> raw;
    thread_local std::vector<float> rowbuf;
    raw.resize((size_t)F * H * W);
    rowbuf.resize((size_t)out_h * W);
    e->backend->observe(indices[i], raw.data());
    const uint8_t* f0 = raw.data();
    const uint8_t* f1 = F > 1 ? raw.data() + (size_t)H * W : raw.data();
    // fused LUT+max+row-lerp: only the two source rows of each output row
    // are touched, in gray space (LUT applied per frame BEFORE the max,
    // matching the existing engine-gray + device-max order)
    for (int r = 0; r < out_h; ++r) {
      const uint8_t* a0 = f0 + (size_t)prow.lo[r] * W;
      const uint8_t* a1 = f1 + (size_t)prow.lo[r] * W;
      const uint8_t* b0 = f0 + (size_t)prow.hi[r] * W;
      const uint8_t* b1 = f1 + (size_t)prow.hi[r] * W;
      const float wr = prow.w[r];
      float* dst = rowbuf.data() + (size_t)r * W;
      for (int c = 0; c < W; ++c) {
        const uint8_t ga = lut[a0[c]] > lut[a1[c]] ? lut[a0[c]] : lut[a1[c]];
        const uint8_t gb = lut[b0[c]] > lut[b1[c]] ? lut[b0[c]] : lut[b1[c]];
        dst[c] = (1.f - wr) * (float)ga + wr * (float)gb;
      }
    }
    uint8_t* o = out + per_out * i;
    for (int r = 0; r < out_h; ++r) {
      const float* src = rowbuf.data() + (size_t)r * W;
      for (int c = 0; c < out_w; ++c) {
        const float v =
            (1.f - pcol.w[c]) * src[pcol.lo[c]] + pcol.w[c] * src[pcol.hi[c]];
        const float q = v + 0.5f;
        o[(size_t)r * out_w + c] = (uint8_t)(q > 255.f ? 255.f : q);
      }
    }
  });
}

void nevo_final_state(void* h, const int* indices, int n, float* out) {
  auto* e = static_cast<Engine*>(h);
  const size_t per = (size_t)e->backend->final_state_size();
  e->pool->parallel_for(n,
                        [&](int i) { e->backend->final_state(indices[i], out + per * i); });
}

}  // extern "C"

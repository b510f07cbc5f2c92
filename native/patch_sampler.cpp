// Native patch sampler: multithreaded random-crop + 8-mode augmentation for
// HSI training batches.
//
// The reference does this per batch in Python/numpy inside the step loop
// (reference model.py:300-310: randint crop, data_augmentation, np copy).
// At TPU step rates (sub-millisecond) the Python sampler becomes the
// bottleneck, so the framework's hot host path is native: one call fills a
// (B, P, P, C) float32 batch from the in-RAM cube store, with crops and
// augmentations parallelized across a thread pool and written directly into
// the caller's buffer (which jax device_put consumes zero-copy on the host
// side).
//
// Augmentation modes match reference utils.py:7-34 exactly:
//   0: identity            4: rot180
//   1: flipud              5: rot180 + flipud
//   2: rot90 (CCW)         6: rot270
//   3: rot90 + flipud      7: rot270 + flipud
//
// RNG: xoshiro256** seeded per call; crop/mode draws follow the same
// (x, y, mode) per-sample order as the Python sampler so behavior is
// reproducible given the same seed stream contract.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libpatch_sampler.so patch_sampler.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstring>
#include <system_error>
#include <thread>
#include <vector>

namespace {

struct Xoshiro256 {
  uint64_t s[4];
  explicit Xoshiro256(uint64_t seed) {
    // splitmix64 expansion
    uint64_t x = seed;
    for (int i = 0; i < 4; ++i) {
      x += 0x9e3779b97f4a7c15ULL;
      uint64_t z = x;
      z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
      z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static inline uint64_t rotl(uint64_t v, int k) { return (v << k) | (v >> (64 - k)); }
  uint64_t next() {
    const uint64_t result = rotl(s[1] * 5, 7) * 9;
    const uint64_t t = s[1] << 17;
    s[2] ^= s[0];
    s[3] ^= s[1];
    s[1] ^= s[2];
    s[0] ^= s[3];
    s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  // Uniform integer in [0, n), n > 0, via 64-bit modulo. The modulo bias is
  // exactly quantifiable: (2^64 mod n) residues occur with probability
  // ceil(2^64/n)/2^64 and the rest with floor(2^64/n)/2^64, so the relative
  // over-representation is < n/2^64 — for the largest draw here (a crop
  // offset, n ≤ ~2^9 for 512² cubes) that is < 2^-55, i.e. undetectable
  // below ~10^16 samples. Kept over Lemire rejection deliberately: rejection
  // consumes a data-dependent number of next() calls, which would break the
  // fixed-draws-per-sample replay contract that skip-ahead resume relies on.
  uint64_t below(uint64_t n) { return next() % n; }
};

// Copy one augmented patch. src points at cube (H, W, C) row-major float32;
// crop starts at (x0, y0) with size P×P. dst is (P, P, C).
void copy_patch(const float* cube, int64_t H, int64_t W, int64_t C,
                int64_t x0, int64_t y0, int64_t P, int mode, float* dst) {
  (void)H;
  // Source pixel for destination (i, j) under each mode, in crop-local
  // coordinates (r, c) of the un-augmented P×P crop.
  for (int64_t i = 0; i < P; ++i) {
    for (int64_t j = 0; j < P; ++j) {
      int64_t r, c;
      switch (mode) {
        case 0: r = i;          c = j;          break;  // identity
        case 1: r = P - 1 - i;  c = j;          break;  // flipud
        case 2: r = j;          c = P - 1 - i;  break;  // rot90 CCW
        case 3: r = j;          c = i;          break;  // rot90 + flipud
        case 4: r = P - 1 - i;  c = P - 1 - j;  break;  // rot180
        case 5: r = i;          c = P - 1 - j;  break;  // rot180 + flipud
        case 6: r = P - 1 - j;  c = i;          break;  // rot270
        case 7: r = P - 1 - j;  c = P - 1 - i;  break;  // rot270 + flipud
        default: r = i;         c = j;          break;
      }
      const float* src_px = cube + ((x0 + r) * W + (y0 + c)) * C;
      float* dst_px = dst + (i * P + j) * C;
      std::memcpy(dst_px, src_px, sizeof(float) * C);
    }
  }
}

}  // namespace

extern "C" {

// Fill a (batch, P, P, C) float32 buffer with augmented random crops.
//
//   cubes:      array of `num_cubes` pointers to (H_i, W_i, C) float32 cubes
//   heights/widths: per-cube dims; channels shared
//   batch_start: global sample index of the first sample (for the cyclic
//                cube indexing of reference model.py:304)
//   seed:       RNG seed for this batch
//   out:        (batch, P, P, C) float32, caller-allocated
//   num_threads: 0 = hardware concurrency
//
// Returns 0 on success, nonzero on bad arguments or resource failure.
int sample_batch(const float** cubes, const int64_t* heights,
                 const int64_t* widths, int64_t num_cubes, int64_t channels,
                 int64_t batch, int64_t patch, int64_t batch_start,
                 uint64_t seed, float* out, int num_threads) try {
  if (num_cubes <= 0 || batch <= 0 || patch <= 0 || channels <= 0) return 1;
  for (int64_t k = 0; k < num_cubes; ++k) {
    if (heights[k] < patch || widths[k] < patch) return 2;
  }

  // Draw all crop decisions serially so the stream is independent of the
  // thread count, then parallelize the copies.
  struct Job { int64_t cube, x0, y0; int mode; };
  std::vector<Job> jobs(batch);
  Xoshiro256 rng(seed);
  for (int64_t i = 0; i < batch; ++i) {
    int64_t idx = (batch_start + i) % num_cubes;
    int64_t hmax = heights[idx] - patch;
    int64_t wmax = widths[idx] - patch;
    jobs[i].cube = idx;
    jobs[i].x0 = hmax > 0 ? (int64_t)rng.below((uint64_t)hmax) : 0;
    jobs[i].y0 = wmax > 0 ? (int64_t)rng.below((uint64_t)wmax) : 0;
    jobs[i].mode = (int)rng.below(8);
  }

  int n_threads = num_threads > 0
                      ? num_threads
                      : (int)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if ((int64_t)n_threads > batch) n_threads = (int)batch;

  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= batch) break;
      const Job& job = jobs[i];
      copy_patch(cubes[job.cube], heights[job.cube], widths[job.cube],
                 channels, job.x0, job.y0, patch, job.mode,
                 out + i * patch * patch * channels);
    }
  };
  std::vector<std::thread> pool;
  pool.reserve(n_threads - 1);
  for (int t = 1; t < n_threads; ++t) {
    try {
      pool.emplace_back(worker);
    } catch (const std::system_error&) {
      break;  // thread pressure: run with the threads we got + this one
    }
  }
  worker();
  for (auto& th : pool) th.join();
  return 0;
} catch (...) {
  // An exception crossing the extern "C"/ctypes boundary is UB (in practice
  // std::terminate, killing the training process). bad_alloc etc. become a
  // recoverable nonzero return that the Python wrapper turns into
  // RuntimeError.
  return 3;
}

}  // extern "C"

// Native threaded data-loading pipeline for kfac_pytorch_tpu.
//
// TPU-native replacement for the reference's persistent-worker loader
// (/root/reference/examples/utils.py:93-121 MultiEpochsDataLoader +
// torchvision RandomCrop/RandomHorizontalFlip at
// /root/reference/examples/pytorch_cifar10_resnet.py:158-166): the host
// prepares augmented, normalized float32 NHWC batches on a C++ thread pool
// with a bounded prefetch ring, so batch assembly overlaps device compute
// (jax.device_put of batch t+1 while step t runs).
//
// Determinism contract (shared with the pure-NumPy fallback in
// kfac_pytorch_tpu/data/loader.py — the two produce BITWISE-identical
// batches): all randomness derives from splitmix64 counters keyed by
// (seed, epoch, position), never from thread timing.
//   * epoch key      es   = splitmix64(seed * GOLDEN + epoch)
//   * shuffle        key_i = splitmix64(es ^ (i * GOLDEN)); order = argsort
//                    by (key, i)
//   * augmentation   r_k  = splitmix64(es ^ AUG_SALT ^ (k * MIX)); the k-th
//                    sample of the epoch crops at (r%span, (r>>16)%span) and
//                    flips iff (r>>32)&1
//   * normalization  out = ((float)u8 / 255.0f - mean[c]) / std[c] — the
//                    exact float32 op sequence NumPy uses.
//
// Concurrency protocol: producers CLAIM a (batch, ring slot) pair under the
// mutex (slot.batch = b, slot.ready = false) before filling, so two batches
// mapping to the same slot can never interleave; the consumer takes batches
// in order, waiting on (slot.batch == b && slot.ready). Epoch state
// (shuffle order, epoch key, counters) is only mutated under the mutex, and
// workers re-check the epoch generation at every claim, so a start_epoch
// racing a worker's loop-around parks that worker on the epoch barrier
// instead of letting it read torn state.
//
// C ABI only (loaded via ctypes; no pybind11 in this environment).

#include <algorithm>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t GOLDEN = 0x9E3779B97F4A7C15ULL;
constexpr uint64_t MIX = 0xD1B54A32D192ED03ULL;
constexpr uint64_t AUG_SALT = 0xA5A5A5A55A5A5A5AULL;

inline uint64_t splitmix64(uint64_t x) {
  uint64_t z = x + GOLDEN;
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

struct Slot {
  std::vector<float> x;
  std::vector<int32_t> y;
  int64_t batch = -1;   // batch index claimed/stored; -1 = free
  bool ready = false;   // filled and readable by the consumer
};

struct Loader {
  // dataset (borrowed pointers — the Python wrapper keeps them alive)
  const uint8_t* images = nullptr;
  const int32_t* labels = nullptr;
  int64_t n = 0;
  int h = 0, w = 0, c = 0;
  int batch = 0;
  int pad = 0;
  bool flip = false;
  bool augment = false;
  bool shuffle = false;
  uint64_t seed = 0;
  float mean[8] = {0};
  float stdv[8] = {1, 1, 1, 1, 1, 1, 1, 1};

  // epoch state — mutated only under mu
  uint64_t epoch_key = 0;
  std::vector<int64_t> order;
  int64_t n_batches = 0;
  int64_t next_batch = 0;
  int64_t consumed = 0;    // next batch index the consumer will take
  int64_t epoch_gen = -1;  // bumped by start_epoch
  bool stop = false;

  // prefetch ring
  std::vector<Slot> slots;
  std::mutex mu;
  std::condition_variable cv_ready;  // consumer waits for its batch
  std::condition_variable cv_free;   // producers wait for a free slot
  std::condition_variable cv_epoch;  // epoch barrier

  std::vector<std::thread> workers;

  void fill_batch(int64_t b, Slot& s) {
    const int span = 2 * pad + 1;
    const int64_t hw = (int64_t)h * w;
    const int64_t img = hw * c;
    for (int i = 0; i < batch; ++i) {
      const int64_t k = b * batch + i;          // epoch position
      const int64_t src = order.empty() ? k : order[k];
      s.y[i] = labels[src];
      const uint8_t* in = images + src * img;
      float* out = s.x.data() + (int64_t)i * img;
      int y0 = 0, x0 = 0;
      bool do_flip = false;
      if (augment) {
        const uint64_t r =
            splitmix64(epoch_key ^ AUG_SALT ^ ((uint64_t)k * MIX));
        y0 = (int)(r % (uint64_t)span) - pad;
        x0 = (int)((r >> 16) % (uint64_t)span) - pad;
        do_flip = flip && ((r >> 32) & 1ULL);
      }
      // crop window starts at (y0, x0) in unpadded coords (may be negative:
      // zero padding). Flip applies after the crop, mirroring width.
      for (int yy = 0; yy < h; ++yy) {
        const int sy = yy + y0;
        float* row = out + (int64_t)yy * w * c;
        if (sy < 0 || sy >= h) {
          for (int xx = 0; xx < w * c; ++xx) {
            const int ch = xx % c;
            row[xx] = (0.0f - mean[ch]) / stdv[ch];
          }
          continue;
        }
        for (int xx = 0; xx < w; ++xx) {
          const int ox = do_flip ? (w - 1 - xx) : xx;
          const int sx = xx + x0;
          float* px = row + (int64_t)ox * c;
          if (sx < 0 || sx >= w) {
            for (int ch = 0; ch < c; ++ch)
              px[ch] = (0.0f - mean[ch]) / stdv[ch];
          } else {
            const uint8_t* sp = in + ((int64_t)sy * w + sx) * c;
            for (int ch = 0; ch < c; ++ch) {
              const float v = (float)sp[ch] / 255.0f;
              px[ch] = (v - mean[ch]) / stdv[ch];
            }
          }
        }
      }
    }
  }

  void worker_loop() {
    int64_t my_gen = -1;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_epoch.wait(lk, [&] { return stop || epoch_gen > my_gen; });
        if (stop) return;
        my_gen = epoch_gen;
      }
      for (;;) {
        Slot* s = nullptr;
        int64_t b;
        {
          std::unique_lock<std::mutex> lk(mu);
          if (stop) return;
          if (epoch_gen != my_gen) break;  // epoch restarted: re-sync
          if (next_batch >= n_batches) break;
          b = next_batch++;
          const int slot_id = (int)(b % (int64_t)slots.size());
          // claim only within the in-flight window (b < consumed + depth):
          // batches inside one window map to DISTINCT slots, so a producer
          // looping around can never steal the slot a lower unconsumed
          // batch still needs (out-of-order claims deadlock the in-order
          // consumer)
          cv_free.wait(lk, [&] {
            return stop || epoch_gen != my_gen
                || (slots[slot_id].batch == -1
                    && b < consumed + (int64_t)slots.size());
          });
          if (stop) return;
          if (epoch_gen != my_gen) break;  // restarted mid-wait: abandon
          // claim under the lock: batch set BEFORE fill, ready after —
          // a second producer mapping to this slot blocks in cv_free
          s = &slots[slot_id];
          s->batch = b;
          s->ready = false;
        }
        fill_batch(b, *s);  // exclusive: the slot is claimed
        {
          std::lock_guard<std::mutex> lk(mu);
          s->ready = true;
          cv_ready.notify_all();
        }
      }
    }
  }

  void start_epoch(int64_t epoch) {
    std::vector<int64_t> new_order;
    const uint64_t ek = splitmix64(seed * GOLDEN + (uint64_t)epoch);
    if (shuffle) {
      std::vector<std::pair<uint64_t, int64_t>> keys(n);
      for (int64_t i = 0; i < n; ++i)
        keys[i] = {splitmix64(ek ^ ((uint64_t)i * GOLDEN)), i};
      std::sort(keys.begin(), keys.end());
      new_order.resize(n);
      for (int64_t i = 0; i < n; ++i) new_order[i] = keys[i].second;
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      epoch_key = ek;
      order.swap(new_order);
      for (auto& s : slots) {
        s.batch = -1;
        s.ready = false;
      }
      consumed = 0;
      next_batch = 0;
      ++epoch_gen;
      cv_epoch.notify_all();
      cv_free.notify_all();
      cv_ready.notify_all();
    }
  }

  // Blocking fetch of the next batch in order; copies into caller buffers.
  // Returns 1 on success, 0 at epoch end.
  int next(float* out_x, int32_t* out_y) {
    std::unique_lock<std::mutex> lk(mu);
    if (consumed >= n_batches) return 0;
    const int64_t b = consumed;
    const int slot_id = (int)(b % (int64_t)slots.size());
    cv_ready.wait(lk, [&] {
      return stop || (slots[slot_id].batch == b && slots[slot_id].ready);
    });
    if (stop) return 0;
    Slot& s = slots[slot_id];
    lk.unlock();  // exclusive: producers can't reclaim until batch = -1
    std::memcpy(out_x, s.x.data(), s.x.size() * sizeof(float));
    std::memcpy(out_y, s.y.data(), s.y.size() * sizeof(int32_t));
    lk.lock();
    s.batch = -1;
    s.ready = false;
    ++consumed;
    cv_free.notify_all();
    return 1;
  }
};

}  // namespace

extern "C" {

void* kfac_dl_create(const uint8_t* images, const int32_t* labels,
                     int64_t n, int h, int w, int c, int batch, int pad,
                     int flip, int augment, int shuffle,
                     const float* mean, const float* stdv, uint64_t seed,
                     int n_threads, int depth) {
  if (c > 8 || n <= 0 || batch <= 0 || batch > n) return nullptr;
  auto* L = new Loader();
  L->images = images;
  L->labels = labels;
  L->n = n;
  L->h = h;
  L->w = w;
  L->c = c;
  L->batch = batch;
  L->pad = pad;
  L->flip = flip != 0;
  L->augment = augment != 0;
  L->shuffle = shuffle != 0;
  L->seed = seed;
  for (int i = 0; i < c; ++i) {
    L->mean[i] = mean ? mean[i] : 0.0f;
    L->stdv[i] = stdv ? stdv[i] : 1.0f;
  }
  L->n_batches = n / batch;  // drop_last semantics (training loaders)
  const int d = std::max(2, depth);
  L->slots.resize(d);
  for (auto& s : L->slots) {
    s.x.resize((size_t)batch * h * w * c);
    s.y.resize(batch);
  }
  const int nt = std::max(1, n_threads);
  L->workers.reserve(nt);
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back([L] { L->worker_loop(); });
  return L;
}

int64_t kfac_dl_batches(void* handle) {
  return handle ? static_cast<Loader*>(handle)->n_batches : 0;
}

void kfac_dl_start_epoch(void* handle, int64_t epoch) {
  if (handle) static_cast<Loader*>(handle)->start_epoch(epoch);
}

int kfac_dl_next(void* handle, float* out_x, int32_t* out_y) {
  return handle ? static_cast<Loader*>(handle)->next(out_x, out_y) : 0;
}

void kfac_dl_destroy(void* handle) {
  if (!handle) return;
  auto* L = static_cast<Loader*>(handle);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop = true;
    L->cv_epoch.notify_all();
    L->cv_free.notify_all();
    L->cv_ready.notify_all();
  }
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"

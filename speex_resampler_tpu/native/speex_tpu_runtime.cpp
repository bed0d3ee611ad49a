// speex_tpu_runtime — native host runtime for the TPU resampler fleet.
//
// Role: the host-side counterpart of the reference's C runtime plumbing.
// Where the reference stages one stream's bytes across the wasm heap
// (src/index.ts:71-115) and re-aligns stream chunks in JS
// (src/index.ts:139-161), this runtime manages a *fleet*: per-stream FIFO
// ring buffers accept ragged pushes (bytes or frames), and full launch
// quanta are gathered/transposed into the time-major [n_in, B] int16 slab
// the device step consumes (lane l = stream*channels + channel; see
// speex_resampler_tpu/parallel/batch.py).  Output slabs [n_out, B] are
// scattered back to per-stream interleaved PCM.
//
// Pure C ABI for ctypes; no dependencies beyond libc++.  All hot loops are
// time-blocked to keep the strided slab writes cache-resident.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread -o libspeex_tpu_runtime.so \
//            speex_tpu_runtime.cpp

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <memory>
#include <mutex>
#include <new>
#include <shared_mutex>
#include <thread>
#include <vector>

namespace {

// Fork-join pool over index ranges.  The caller's thread participates, so
// a pool of size n uses n-1 workers; size <= 1 (or tiny jobs) runs inline
// with zero overhead — important on single-vCPU hosts where the serial
// path IS the fast path.  Work is distributed by an atomic chunk counter
// so uneven per-range cost (e.g. ragged per-stream flush) load-balances.
class Pool {
 public:
  explicit Pool(int n_threads) {
    const int extra = n_threads - 1;
    for (int i = 0; i < extra; ++i)
      workers_.emplace_back([this] { WorkerLoop(); });
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(m_);
      stop_ = true;
      ++gen_;
    }
    cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  int size() const { return static_cast<int>(workers_.size()) + 1; }

  // Run fn over [0, total) split into grain-sized chunks across the pool.
  void Run(long total, long grain,
           const std::function<void(long, long)>& fn) {
    if (total <= 0) return;
    if (workers_.empty() || total <= grain) {
      fn(0, total);
      return;
    }
    {
      std::lock_guard<std::mutex> lk(m_);
      fn_ = &fn;
      total_ = total;
      grain_ = grain;
      next_.store(0, std::memory_order_relaxed);
      remaining_ = static_cast<int>(workers_.size()) + 1;
      ++gen_;
    }
    cv_.notify_all();
    Participate();
    std::unique_lock<std::mutex> lk(m_);
    done_cv_.wait(lk, [this] { return remaining_ == 0; });
    fn_ = nullptr;
  }

 private:
  void Participate() {
    const std::function<void(long, long)>& fn = *fn_;
    const long total = total_, grain = grain_;
    long i;
    while ((i = next_.fetch_add(grain, std::memory_order_relaxed)) < total) {
      const long hi = (i + grain < total) ? i + grain : total;
      fn(i, hi);
    }
    std::lock_guard<std::mutex> lk(m_);
    if (--remaining_ == 0) done_cv_.notify_all();
  }

  void WorkerLoop() {
    uint64_t seen = 0;
    for (;;) {
      {
        std::unique_lock<std::mutex> lk(m_);
        cv_.wait(lk, [&] { return stop_ || gen_ != seen; });
        if (stop_) return;
        seen = gen_;
        if (!fn_) continue;  // stop-gen bump or already-finished job
      }
      Participate();
    }
  }

  std::vector<std::thread> workers_;
  std::mutex m_;
  std::condition_variable cv_, done_cv_;
  const std::function<void(long, long)>* fn_ = nullptr;
  long total_ = 0, grain_ = 0;
  std::atomic<long> next_{0};
  int remaining_ = 0;
  uint64_t gen_ = 0;
  bool stop_ = false;
};

// Contiguous FIFO: amortized O(1) push/consume with front compaction.
struct Fifo {
  std::vector<int16_t> data;
  size_t head = 0;

  size_t size() const { return data.size() - head; }
  const int16_t* front() const { return data.data() + head; }

  void push(const int16_t* src, size_t n) {
    if (head > 0 && head >= data.size() / 2) {
      data.erase(data.begin(), data.begin() + static_cast<long>(head));
      head = 0;
    }
    data.insert(data.end(), src, src + n);
  }

  void consume(size_t n) {
    head += n;
    if (head >= data.size()) {
      data.clear();
      head = 0;
    }
  }
};

struct Runtime {
  int n_streams;
  int channels;
  long n_in;  // frames per lane per launch (the launch quantum)
  long B;     // n_streams * channels
  std::vector<Fifo> fifo;                 // per stream, interleaved frames
  std::vector<std::vector<uint8_t>> carry;  // per stream, byte-alignment
  std::vector<uint8_t> active;            // slots excluded from lockstep
  std::unique_ptr<Pool> pool;             // gather/scatter parallelism
  // srt_set_threads swaps the pool while fill/unpack may be running on
  // other engine threads (MultiFleet buckets are served concurrently):
  // writers (the swap) take this exclusively, pool users share it.
  std::shared_mutex pool_mu;
};

// Rows per cache-blocked transpose tile in the scatter (slab -> per-stream
// PCM).  64 measured 1.6x over 16 at -O3 (1.9x with -march=native) on the
// flagship geometry (S=1024, C=2, n_out=10240): the longer per-stream
// inner run amortizes pointer setup while the tile's source lines
// (64 rows x 64 B) still fit L1; 128 regresses (tile exceeds L1).
constexpr long kTimeTile = 64;

// Gather one [t0, t1) row range of the time-major slab from per-stream
// sources.  Stream-inner loops make the slab writes sequential (one
// contiguous row at a time) while each stream's source line stays hot in
// L2 across the whole tile (S cache lines ~= 64 KB).  C==1/C==2 specialize
// to single 16/32-bit stores — the generic per-frame memcpy of 2*C bytes
// is ~50x slower at C==2.
template <typename Fn>
static void gather_rows(int n_streams, int C, long B, long t0, long t1,
                        int16_t* out, Fn src_of) {
  if (C == 2) {
    for (long t = t0; t < t1; ++t) {
      uint32_t* dst = reinterpret_cast<uint32_t*>(out + t * B);
      for (int s = 0; s < n_streams; ++s) {
        const int16_t* src = src_of(s);
        if (src)
          dst[s] = reinterpret_cast<const uint32_t*>(src)[t];
      }
    }
  } else if (C == 1) {
    for (long t = t0; t < t1; ++t) {
      int16_t* dst = out + t * B;
      for (int s = 0; s < n_streams; ++s) {
        const int16_t* src = src_of(s);
        if (src)
          dst[s] = src[t];
      }
    }
  } else {
    for (long t = t0; t < t1; ++t) {
      int16_t* dst = out + t * B;
      for (int s = 0; s < n_streams; ++s) {
        const int16_t* src = src_of(s);
        if (src)
          std::memcpy(dst + static_cast<long>(s) * C, src + t * C,
                      static_cast<size_t>(C) * 2);
      }
    }
  }
}

}  // namespace

extern "C" {

void* srt_create(int n_streams, int channels, long n_in_per_launch) {
  if (n_streams <= 0 || channels <= 0 || n_in_per_launch <= 0) return nullptr;
  auto* rt = new (std::nothrow) Runtime;
  if (!rt) return nullptr;
  rt->n_streams = n_streams;
  rt->channels = channels;
  rt->n_in = n_in_per_launch;
  rt->B = static_cast<long>(n_streams) * channels;
  rt->fifo.resize(static_cast<size_t>(n_streams));
  rt->carry.resize(static_cast<size_t>(n_streams));
  rt->active.assign(static_cast<size_t>(n_streams), 1);
  unsigned hw = std::thread::hardware_concurrency();
  rt->pool.reset(new Pool(hw > 1 ? static_cast<int>(hw) : 1));
  return rt;
}

// Resize the gather/scatter thread pool (default: hardware concurrency).
// Returns the effective size.  Safe concurrently with fill/unpack: the
// swap excludes in-flight pool users via Runtime::pool_mu.
int srt_set_threads(void* h, int n) {
  auto* rt = static_cast<Runtime*>(h);
  if (!rt || n < 1) return -1;
  std::unique_lock<std::shared_mutex> lk(rt->pool_mu);
  rt->pool.reset(new Pool(n));
  return rt->pool->size();
}

void srt_destroy(void* h) { delete static_cast<Runtime*>(h); }

// Push n_frames interleaved frames ([n, C] int16) for one stream.
int srt_push(void* h, int stream, const int16_t* frames, long n_frames) {
  auto* rt = static_cast<Runtime*>(h);
  if (!rt || stream < 0 || stream >= rt->n_streams || n_frames < 0) return -1;
  rt->fifo[static_cast<size_t>(stream)].push(
      frames, static_cast<size_t>(n_frames) * rt->channels);
  return 0;
}

// Push raw bytes with the reference Transform-stream alignment-carry
// semantics (src/index.ts:139-161): bytes that do not complete a frame are
// held until the next push.  Returns frames accepted, or -1.
long srt_push_bytes(void* h, int stream, const uint8_t* bytes, long n) {
  auto* rt = static_cast<Runtime*>(h);
  if (!rt || stream < 0 || stream >= rt->n_streams || n < 0) return -1;
  auto& carry = rt->carry[static_cast<size_t>(stream)];
  const long frame_bytes = rt->channels * 2;

  std::vector<uint8_t> buf;
  const uint8_t* p = bytes;
  long total = n;
  if (!carry.empty()) {
    buf.reserve(carry.size() + static_cast<size_t>(n));
    buf.insert(buf.end(), carry.begin(), carry.end());
    buf.insert(buf.end(), bytes, bytes + n);
    p = buf.data();
    total = static_cast<long>(buf.size());
    carry.clear();
  }
  const long frames = total / frame_bytes;
  const long used = frames * frame_bytes;
  if (frames > 0) {
    // int16 little-endian on all supported hosts; frames may be unaligned
    std::vector<int16_t> tmp(static_cast<size_t>(used) / 2);
    std::memcpy(tmp.data(), p, static_cast<size_t>(used));
    rt->fifo[static_cast<size_t>(stream)].push(tmp.data(), tmp.size());
  }
  if (total - used > 0)
    carry.assign(p + used, p + total);
  return frames;
}

// Staged whole frames for ONE stream (O(1); the array form below is O(S)
// and too heavy for a per-push backpressure check).  Returns -1 on a bad
// stream index.
long srt_staged_one(void* h, int stream) {
  auto* rt = static_cast<Runtime*>(h);
  if (!rt || stream < 0 || stream >= rt->n_streams) return -1;
  return static_cast<long>(rt->fifo[static_cast<size_t>(stream)].size()) /
         rt->channels;
}

// Staged whole frames per stream (out: long[n_streams]).
void srt_staged(void* h, long* out) {
  auto* rt = static_cast<Runtime*>(h);
  for (int s = 0; s < rt->n_streams; ++s)
    out[s] = static_cast<long>(rt->fifo[static_cast<size_t>(s)].size()) /
             rt->channels;
}

// Mark a slot (in)active: inactive slots are excluded from the lockstep
// readiness test and zero-filled in launch slabs (dynamic fleet occupancy).
// Deactivating clears the slot's buffers.
int srt_set_active(void* h, int stream, int is_active) {
  auto* rt = static_cast<Runtime*>(h);
  if (!rt || stream < 0 || stream >= rt->n_streams) return -1;
  rt->active[static_cast<size_t>(stream)] = is_active ? 1 : 0;
  if (!is_active) {
    rt->fifo[static_cast<size_t>(stream)] = Fifo();
    rt->carry[static_cast<size_t>(stream)].clear();
  }
  return 0;
}

// Number of full launch quanta available across all ACTIVE streams.
long srt_ready_launches(void* h) {
  auto* rt = static_cast<Runtime*>(h);
  long m = -1;
  for (int s = 0; s < rt->n_streams; ++s) {
    if (!rt->active[static_cast<size_t>(s)]) continue;
    long f = static_cast<long>(rt->fifo[static_cast<size_t>(s)].size()) /
             rt->channels;
    m = (m < 0 || f < m) ? f : m;
  }
  return m <= 0 ? 0 : m / rt->n_in;
}

// Gather one launch quantum into the time-major slab out[n_in][B] and
// consume the frames.  Requires srt_ready_launches() >= 1; returns -1 if
// any stream is short.
int srt_fill_launch(void* h, int16_t* out) {
  auto* rt = static_cast<Runtime*>(h);
  const int C = rt->channels;
  const long B = rt->B, n_in = rt->n_in;
  bool any_inactive = false, any_active = false;
  for (int s = 0; s < rt->n_streams; ++s) {
    if (!rt->active[static_cast<size_t>(s)]) { any_inactive = true; continue; }
    any_active = true;
    if (static_cast<long>(rt->fifo[static_cast<size_t>(s)].size()) <
        n_in * C)
      return -1;
  }
  if (!any_active) return -1;  // no launch is "ready" with zero streams
  if (any_inactive)
    std::memset(out, 0, static_cast<size_t>(n_in) * B * 2);
  std::vector<const int16_t*> srcs(static_cast<size_t>(rt->n_streams));
  for (int s = 0; s < rt->n_streams; ++s)
    srcs[static_cast<size_t>(s)] = rt->active[static_cast<size_t>(s)]
        ? rt->fifo[static_cast<size_t>(s)].front() : nullptr;
  // parallel over time-row ranges: each range's slab writes are disjoint
  std::shared_lock<std::shared_mutex> pool_lk(rt->pool_mu);
  rt->pool->Run(n_in, /*grain=*/256, [&](long t0, long t1) {
    gather_rows(rt->n_streams, C, B, t0, t1, out,
                [&](int s) { return srcs[static_cast<size_t>(s)]; });
  });
  for (int s = 0; s < rt->n_streams; ++s)
    if (rt->active[static_cast<size_t>(s)])
      rt->fifo[static_cast<size_t>(s)].consume(
          static_cast<size_t>(n_in) * C);
  return 0;
}

// Drain: zero-pad every stream to one launch quantum, consume everything.
// Writes the pre-drain staged frame count per stream to staged_out
// (long[n_streams]) so the caller can trim per-stream valid output.
// Returns the max staged count (0 = nothing to flush, slab untouched).
long srt_fill_flush(void* h, int16_t* out, long* staged_out) {
  auto* rt = static_cast<Runtime*>(h);
  const int C = rt->channels;
  const long B = rt->B, n_in = rt->n_in;
  long mx = 0;
  for (int s = 0; s < rt->n_streams; ++s) {
    long f = rt->active[static_cast<size_t>(s)]
        ? static_cast<long>(rt->fifo[static_cast<size_t>(s)].size()) / C
        : 0;
    if (f > n_in) f = n_in;
    staged_out[s] = f;
    if (f > mx) mx = f;
  }
  if (mx == 0) return 0;
  std::memset(out, 0, static_cast<size_t>(n_in) * B * 2);
  // parallel over streams (column ranges are disjoint; ragged per-stream
  // lengths load-balance through the pool's chunked work queue)
  std::shared_lock<std::shared_mutex> pool_lk(rt->pool_mu);
  rt->pool->Run(rt->n_streams, /*grain=*/8, [&](long s0, long s1) {
    for (long s = s0; s < s1; ++s) {
      const long f = staged_out[s];
      const int16_t* src = rt->fifo[static_cast<size_t>(s)].front();
      int16_t* dst = out + s * C;
      for (long t = 0; t < f; ++t, src += C, dst += B)
        std::memcpy(dst, src, static_cast<size_t>(C) * 2);
    }
  });
  for (int s = 0; s < rt->n_streams; ++s)
    rt->fifo[static_cast<size_t>(s)].consume(
        static_cast<size_t>(staged_out[s]) * C);
  return mx;
}

// Checkpoint support: copy (without consuming) one stream's staged frames
// into dst[staged][C].  Caller sizes dst from srt_staged().
// Returns -1 on an out-of-range stream (the PyStager reference raises).
int srt_peek(void* h, int stream, int16_t* dst) {
  auto* rt = static_cast<Runtime*>(h);
  if (!rt || stream < 0 || stream >= rt->n_streams) return -1;
  const auto& f = rt->fifo[static_cast<size_t>(stream)];
  std::memcpy(dst, f.front(), f.size() * 2);
  return 0;
}

// Checkpoint support: alignment-carry bytes for one stream (-1 = bad index).
long srt_carry_size(void* h, int stream) {
  auto* rt = static_cast<Runtime*>(h);
  if (!rt || stream < 0 || stream >= rt->n_streams) return -1;
  return static_cast<long>(rt->carry[static_cast<size_t>(stream)].size());
}

int srt_get_carry(void* h, int stream, uint8_t* dst) {
  auto* rt = static_cast<Runtime*>(h);
  if (!rt || stream < 0 || stream >= rt->n_streams) return -1;
  const auto& c = rt->carry[static_cast<size_t>(stream)];
  std::memcpy(dst, c.data(), c.size());
  return 0;
}

// Scatter a device result slab y[n_out][B] back to one stream's
// interleaved PCM dst[n_out][C].  Returns -1 on an out-of-range stream.
int srt_unpack(void* h, const int16_t* y, long n_out, int stream,
               int16_t* dst) {
  auto* rt = static_cast<Runtime*>(h);
  if (!rt || stream < 0 || stream >= rt->n_streams) return -1;
  const int C = rt->channels;
  const long B = rt->B;
  const int16_t* src = y + static_cast<long>(stream) * C;
  for (long t = 0; t < n_out; ++t, src += B, dst += C)
    std::memcpy(dst, src, static_cast<size_t>(C) * 2);
  return 0;
}

// Scatter the whole slab y[n_out][B] to [S, n_out, C] (stream-major).
// Time-tiled with per-stream inner runs: bounds the TLB working set to one
// page per stream per tile while keeping word-sized stores.
void srt_unpack_all(void* h, const int16_t* y, long n_out, int16_t* dst) {
  auto* rt = static_cast<Runtime*>(h);
  const int C = rt->channels;
  const long B = rt->B;
  // parallel over time-row tiles; each worker range walks whole tiles so
  // per-stream destination runs stay contiguous
  std::shared_lock<std::shared_mutex> pool_lk(rt->pool_mu);
  rt->pool->Run((n_out + kTimeTile - 1) / kTimeTile, /*grain=*/16,
                [&](long k0, long k1) {
  for (long t0 = k0 * kTimeTile; t0 < k1 * kTimeTile && t0 < n_out;
       t0 += kTimeTile) {
    const long t1 = (t0 + kTimeTile < n_out) ? t0 + kTimeTile : n_out;
    if (C == 2) {
      for (int s = 0; s < rt->n_streams; ++s) {
        const uint32_t* src =
            reinterpret_cast<const uint32_t*>(y + t0 * B) + s;
        uint32_t* d = reinterpret_cast<uint32_t*>(
            dst + (static_cast<long>(s) * n_out + t0) * 2);
        for (long t = t0; t < t1; ++t, src += B / 2)
          *d++ = *src;
      }
    } else if (C == 1) {
      for (int s = 0; s < rt->n_streams; ++s) {
        const int16_t* src = y + t0 * B + s;
        int16_t* d = dst + static_cast<long>(s) * n_out + t0;
        for (long t = t0; t < t1; ++t, src += B)
          *d++ = *src;
      }
    } else {
      for (int s = 0; s < rt->n_streams; ++s) {
        const int16_t* src = y + t0 * B + static_cast<long>(s) * C;
        int16_t* d = dst + (static_cast<long>(s) * n_out + t0) * C;
        for (long t = t0; t < t1; ++t, src += B, d += C)
          std::memcpy(d, src, static_cast<size_t>(C) * 2);
      }
    }
  }
  });
}

// ---- Lane-major fast path -------------------------------------------------
//
// The time-major slab layout above matches the device kernels' input, but
// both host transforms then walk one axis with a B-element stride (1 KB at
// the 256-stream flagship) — a cache-hostile transpose the reference never
// pays because its wasm heap serves ONE stream (src/index.ts:92,111-115).
// The lane-major pair below keeps every host access CONTIGUOUS per stream
// (the transpose rides the TPU inside the jitted step, where it is
// HBM-bandwidth trivial): measured 23x on the gather and 3.3x on the
// scatter at S=256, q=9408 on the serving host — both within ~30% of a
// bare memcpy of the same bytes.

// Gather one launch quantum into the LANE-MAJOR slab out[B][stride]
// (stride >= n_in; columns [n_in, stride) are never touched, so a
// persistent slab's zero tail survives).  Per stream this DEINTERLEAVES
// [n_in, C] frames into C contiguous rows.  Same readiness contract and
// consumption as srt_fill_launch.
int srt_fill_launch_lm(void* h, int16_t* out, long stride) {
  auto* rt = static_cast<Runtime*>(h);
  const int C = rt->channels;
  const long n_in = rt->n_in;
  if (stride < n_in) return -1;
  bool any_active = false;
  for (int s = 0; s < rt->n_streams; ++s) {
    if (!rt->active[static_cast<size_t>(s)]) continue;
    any_active = true;
    if (static_cast<long>(rt->fifo[static_cast<size_t>(s)].size()) <
        n_in * C)
      return -1;
  }
  if (!any_active) return -1;
  std::shared_lock<std::shared_mutex> pool_lk(rt->pool_mu);
  rt->pool->Run(rt->n_streams, /*grain=*/8, [&](long s0, long s1) {
    for (long s = s0; s < s1; ++s) {
      int16_t* lane0 = out + s * C * stride;
      if (!rt->active[static_cast<size_t>(s)]) {
        for (int c = 0; c < C; ++c)
          std::memset(lane0 + static_cast<long>(c) * stride, 0,
                      static_cast<size_t>(n_in) * 2);
        continue;
      }
      const int16_t* src = rt->fifo[static_cast<size_t>(s)].front();
      if (C == 2) {
        // one 32-bit load per frame, split into the two lane rows
        const uint32_t* sp = reinterpret_cast<const uint32_t*>(src);
        int16_t* r0 = lane0;
        int16_t* r1 = lane0 + stride;
        for (long t = 0; t < n_in; ++t) {
          const uint32_t v = sp[t];  // little-endian, as srt_push_bytes
          r0[t] = static_cast<int16_t>(v & 0xffffu);
          r1[t] = static_cast<int16_t>(v >> 16);
        }
      } else if (C == 1) {
        std::memcpy(lane0, src, static_cast<size_t>(n_in) * 2);
      } else {
        for (int c = 0; c < C; ++c) {
          int16_t* r = lane0 + static_cast<long>(c) * stride;
          for (long t = 0; t < n_in; ++t) r[t] = src[t * C + c];
        }
      }
    }
  });
  for (int s = 0; s < rt->n_streams; ++s)
    if (rt->active[static_cast<size_t>(s)])
      rt->fifo[static_cast<size_t>(s)].consume(
          static_cast<size_t>(n_in) * C);
  return 0;
}

// Scatter a LANE-MAJOR result slab y[B][n_out] to [S, n_out, C]: per
// stream this INTERLEAVES C contiguous rows — a streaming zip the
// compiler vectorizes, vs. the B-strided walk of srt_unpack_all.
void srt_unpack_all_lm(void* h, const int16_t* y, long n_out,
                       int16_t* dst) {
  auto* rt = static_cast<Runtime*>(h);
  const int C = rt->channels;
  std::shared_lock<std::shared_mutex> pool_lk(rt->pool_mu);
  rt->pool->Run(rt->n_streams, /*grain=*/8, [&](long s0, long s1) {
    for (long s = s0; s < s1; ++s) {
      const int16_t* lane0 = y + s * C * n_out;
      if (C == 2) {
        const int16_t* a = lane0;
        const int16_t* b = lane0 + n_out;
        uint32_t* d = reinterpret_cast<uint32_t*>(dst + s * n_out * 2);
        for (long t = 0; t < n_out; ++t)
          d[t] = static_cast<uint16_t>(a[t]) |
                 (static_cast<uint32_t>(static_cast<uint16_t>(b[t])) << 16);
      } else if (C == 1) {
        std::memcpy(dst + s * n_out, lane0,
                    static_cast<size_t>(n_out) * 2);
      } else {
        int16_t* d = dst + s * n_out * C;
        for (int c = 0; c < C; ++c) {
          const int16_t* r = lane0 + static_cast<long>(c) * n_out;
          for (long t = 0; t < n_out; ++t) d[t * C + c] = r[t];
        }
      }
    }
  });
}

}  // extern "C"

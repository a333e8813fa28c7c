// Native host-side input pipeline kernels for causal_gen_tpu.
//
// The reference framework has no native code (its input path is per-sample
// torchvision transforms in DataLoader worker processes). Here the host-side
// batch assembly — index gather + zero-pad + random crop + horizontal flip on
// uint8 NHWC batches — is one multithreaded C++ pass so a single process
// feeds the TPU without a worker pool. Exposed as a C ABI consumed via
// ctypes (causal_gen_tpu/data/native.py), with a pure-numpy fallback.
//
// Build: cd native && make   (produces libcausal_gen_native.so)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// number of worker threads: hardware concurrency capped at 8
int n_threads() {
  unsigned hc = std::thread::hardware_concurrency();
  if (hc == 0) hc = 4;
  return static_cast<int>(hc > 8 ? 8 : hc);
}

template <typename F>
void parallel_for(int n, F f) {
  int t = n_threads();
  if (n < 2 * t) {
    for (int i = 0; i < n; ++i) f(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int w = 0; w < t; ++w) {
    pool.emplace_back([&] {
      int i;
      while ((i = next.fetch_add(1)) < n) f(i);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Gather + zero-pad + per-sample crop + optional horizontal flip, fused.
//
// in:    (n_src, h, w, c) uint8 source images
// idx:   (n,) int64 row indices into `in`
// ys,xs: (n,) int32 crop offsets into the (h+2*pad_h, w+2*pad_w) padded frame
// flips: (n,) uint8 nonzero => flip horizontally (after crop)
// out:   (n, out_h, out_w, c) uint8
void cg_gather_crop_flip(const uint8_t* in, int64_t n_src, int h, int w, int c,
                         const int64_t* idx, int64_t n, int pad_h, int pad_w,
                         int out_h, int out_w, const int32_t* ys,
                         const int32_t* xs, const uint8_t* flips,
                         uint8_t* out) {
  const int64_t src_img = static_cast<int64_t>(h) * w * c;
  const int64_t dst_img = static_cast<int64_t>(out_h) * out_w * c;
  parallel_for(static_cast<int>(n), [&](int i) {
    const uint8_t* src = in + idx[i] * src_img;
    uint8_t* dst = out + i * dst_img;
    const int y0 = ys[i] - pad_h;  // crop origin in unpadded coordinates
    const int x0 = xs[i] - pad_w;
    const bool flip = flips[i] != 0;
    for (int r = 0; r < out_h; ++r) {
      const int sr = y0 + r;
      uint8_t* drow = dst + static_cast<int64_t>(r) * out_w * c;
      if (sr < 0 || sr >= h) {
        std::memset(drow, 0, static_cast<size_t>(out_w) * c);
        continue;
      }
      const uint8_t* srow = src + static_cast<int64_t>(sr) * w * c;
      if (!flip) {
        for (int q = 0; q < out_w; ++q) {
          const int sq = x0 + q;
          if (sq < 0 || sq >= w) {
            std::memset(drow + q * c, 0, c);
          } else {
            std::memcpy(drow + q * c, srow + sq * c, c);
          }
        }
      } else {
        for (int q = 0; q < out_w; ++q) {
          const int sq = x0 + (out_w - 1 - q);
          if (sq < 0 || sq >= w) {
            std::memset(drow + q * c, 0, c);
          } else {
            std::memcpy(drow + q * c, srow + sq * c, c);
          }
        }
      }
    }
  });
}

// Plain batched gather: out[i] = in[idx[i]] (for eval loaders).
void cg_gather(const uint8_t* in, int64_t n_src, int64_t img_bytes,
               const int64_t* idx, int64_t n, uint8_t* out) {
  parallel_for(static_cast<int>(n), [&](int i) {
    std::memcpy(out + i * img_bytes, in + idx[i] * img_bytes,
                static_cast<size_t>(img_bytes));
  });
}

}  // extern "C"

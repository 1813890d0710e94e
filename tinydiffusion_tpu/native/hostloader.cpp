// Host-side batch assembly primitives (C++, loaded via ctypes).
//
// The reference's host data path is torch DataLoader workers
// (conditional_diffusion_laion.py:418-433); this framework keeps datasets as
// contiguous host arrays and assembles each shuffled batch on the fly. In
// numpy that costs multiple passes (fancy-index gather -> astype(f32) ->
// scale -> shift, each a full copy); on this machine's single CPU core the
// passes serialize with everything else. These kernels fuse the whole
// assembly into one pass over the batch bytes.
//
// Build: g++ -O3 -march=native -shared -fPIC hostloader.cpp -o libhostloader.so
// (done on demand by tinydiffusion_tpu/data/native.py, cached).

#include <cstdint>
#include <cstring>

extern "C" {

// out[i, :] = src[idx[i], :] * scale + shift   (uint8 -> float32, fused)
void gather_normalize_u8(const uint8_t* src, const int64_t* idx, int64_t n_idx,
                         int64_t row_elems, float scale, float shift,
                         float* out) {
  for (int64_t i = 0; i < n_idx; ++i) {
    const uint8_t* row = src + idx[i] * row_elems;
    float* orow = out + i * row_elems;
    for (int64_t j = 0; j < row_elems; ++j) {
      orow[j] = static_cast<float>(row[j]) * scale + shift;
    }
  }
}

// out[i, :] = src[idx[i], :]   (raw row gather, any dtype via byte size)
void gather_rows(const void* src, const int64_t* idx, int64_t n_idx,
                 int64_t row_bytes, void* out) {
  const char* s = static_cast<const char*>(src);
  char* o = static_cast<char*>(out);
  for (int64_t i = 0; i < n_idx; ++i) {
    std::memcpy(o + i * row_bytes, s + idx[i] * row_bytes, row_bytes);
  }
}

// Parse an IDX-format payload (big-endian dims already stripped by caller):
// here just a fused uint8 -> normalized float over a whole array, used when
// materializing datasets once at startup.
void normalize_u8(const uint8_t* src, int64_t n, float scale, float shift,
                  float* out) {
  for (int64_t i = 0; i < n; ++i) {
    out[i] = static_cast<float>(src[i]) * scale + shift;
  }
}

}  // extern "C"

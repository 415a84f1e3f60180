// recflow_native: C kernels for the host-side input pipeline hot path.
//
// The reference delegates its host hot path to TensorFlow's C++ tf.data /
// proto-parsing kernels (SURVEY §2 component inventory); this library is our
// native equivalent for the RFB pipeline: batch string hashing (rfhash64)
// and CSR -> padded-id assembly. Loaded from Python via ctypes
// (recommendflow_tpu/native.py) with a bit-identical numpy fallback.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstring>

extern "C" {

static const uint64_t FNV_OFFSET = 0xCBF29CE484222325ULL;
static const uint64_t FNV_PRIME = 0x100000001B3ULL;
static const uint64_t GOLDEN = 0x9E3779B97F4A7C15ULL;
static const uint64_t M1 = 0xBF58476D1CE4E5B9ULL;
static const uint64_t M2 = 0x94D049BB133111EBULL;

static inline uint64_t splitmix64(uint64_t z) {
  z ^= z >> 30;
  z *= M1;
  z ^= z >> 27;
  z *= M2;
  z ^= z >> 31;
  return z;
}

// rfhash64 over n strings packed as a padded byte matrix [n, max_len].
// Must stay bit-identical to recommendflow_tpu/data/hashing.py::hash64.
void rf_hash_matrix(const uint8_t* mat, const int32_t* lengths,
                    int64_t n, int64_t max_len, uint64_t seed,
                    uint64_t* out) {
  const uint64_t init = FNV_OFFSET ^ (seed * GOLDEN);
  for (int64_t i = 0; i < n; ++i) {
    uint64_t h = init;
    const uint8_t* row = mat + i * max_len;
    const int32_t len = lengths[i];
    for (int32_t j = 0; j < len; ++j) {
      h = (h ^ (uint64_t)row[j]) * FNV_PRIME;
    }
    out[i] = splitmix64(h);
  }
}

// rfhash64 over a contiguous byte blob with per-string byte offsets
// (avoids the padded-matrix copy for ragged inputs).
void rf_hash_blob(const uint8_t* blob, const int32_t* byte_splits,
                  int64_t n, uint64_t seed, uint64_t* out) {
  const uint64_t init = FNV_OFFSET ^ (seed * GOLDEN);
  for (int64_t i = 0; i < n; ++i) {
    uint64_t h = init;
    for (int32_t j = byte_splits[i]; j < byte_splits[i + 1]; ++j) {
      h = (h ^ (uint64_t)blob[j]) * FNV_PRIME;
    }
    out[i] = splitmix64(h);
  }
}

// CSR (values, row_splits) -> padded int64 [n_rows, max_len] with pad_value
// fill; truncates rows longer than max_len. Returns nothing; out must be
// pre-allocated. Also writes per-position validity into mask (uint8).
void rf_pad_csr_i64(const int64_t* values, const int32_t* row_splits,
                    int64_t n_rows, int64_t max_len, int64_t pad_value,
                    int64_t* out, uint8_t* mask) {
  for (int64_t i = 0; i < n_rows; ++i) {
    const int32_t start = row_splits[i];
    int32_t len = row_splits[i + 1] - start;
    if (len > max_len) len = (int32_t)max_len;
    int64_t* orow = out + i * max_len;
    uint8_t* mrow = mask + i * max_len;
    for (int32_t j = 0; j < len; ++j) {
      orow[j] = values[start + j];
      mrow[j] = 1;
    }
    for (int64_t j = len; j < max_len; ++j) {
      orow[j] = pad_value;
      mrow[j] = 0;
    }
  }
}

// Same for float32 dense columns.
void rf_pad_csr_f32(const float* values, const int32_t* row_splits,
                    int64_t n_rows, int64_t max_len, float pad_value,
                    float* out) {
  for (int64_t i = 0; i < n_rows; ++i) {
    const int32_t start = row_splits[i];
    int32_t len = row_splits[i + 1] - start;
    if (len > max_len) len = (int32_t)max_len;
    float* orow = out + i * max_len;
    for (int32_t j = 0; j < len; ++j) orow[j] = values[start + j];
    for (int64_t j = len; j < max_len; ++j) orow[j] = pad_value;
  }
}

// Fused: hash a ragged string column (blob + byte_splits + row_splits) into
// a padded [n_rows, max_len] int32 id matrix, 1-based with 0 = pad; strings
// that are empty or "-1" map to pad. One pass, no intermediate Python.
void rf_hash_column_padded(const uint8_t* blob, const int32_t* byte_splits,
                           const int32_t* row_splits, int64_t n_rows,
                           int64_t max_len, uint64_t seed, int64_t num_bins,
                           int32_t* out) {
  const uint64_t init = FNV_OFFSET ^ (seed * GOLDEN);
  for (int64_t i = 0; i < n_rows; ++i) {
    const int32_t vstart = row_splits[i];
    int32_t len = row_splits[i + 1] - vstart;
    if (len > max_len) len = (int32_t)max_len;
    int32_t* orow = out + i * max_len;
    for (int32_t j = 0; j < len; ++j) {
      const int32_t b0 = byte_splits[vstart + j];
      const int32_t b1 = byte_splits[vstart + j + 1];
      const int32_t blen = b1 - b0;
      bool miss = (blen == 0) ||
                  (blen == 2 && blob[b0] == '-' && blob[b0 + 1] == '1');
      if (miss) {
        orow[j] = 0;
        continue;
      }
      uint64_t h = init;
      for (int32_t k = b0; k < b1; ++k) {
        h = (h ^ (uint64_t)blob[k]) * FNV_PRIME;
      }
      orow[j] = (int32_t)(splitmix64(h) % (uint64_t)num_bins) + 1;
    }
    for (int64_t j = len; j < max_len; ++j) orow[j] = 0;
  }
}

}  // extern "C"

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

// ---------------------------------------------------------------- wordpiece
// ASCII fast path of the WordPiece tokenizer (encoder/tokenizer.py). The
// Python Tokenizer routes ASCII-only texts here and keeps full-Unicode
// texts (NFD folding, CJK splits) on its own path, so behavior over a batch
// is bit-identical to pure Python (tests/test_encoder_export.py asserts).

}  // extern "C"

#include <string>
#include <unordered_map>
#include <vector>
#include <mutex>
#include <thread>
#include <algorithm>

namespace {

struct WpVocab {
  std::unordered_map<std::string, int32_t> map;
  int32_t pad, unk, cls, sep;
  bool lowercase;
};

std::vector<WpVocab*>& wp_registry() {
  static std::vector<WpVocab*> r;
  return r;
}
std::mutex& wp_mutex() {
  static std::mutex m;
  return m;
}

inline bool ascii_punct(uint8_t c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

void wp_encode_one(const WpVocab& v, const uint8_t* text, int32_t len,
                   int64_t maxlen, int64_t max_wp_len, int32_t* tok_row) {
  const int64_t budget = maxlen - 2;
  std::vector<int32_t> ids;
  ids.reserve(maxlen);
  std::string word;
  std::string cand;
  auto flush = [&]() {
    if (word.empty() || (int64_t)ids.size() >= budget) { word.clear(); return; }
    if ((int64_t)word.size() > max_wp_len) {
      ids.push_back(v.unk);
      word.clear();
      return;
    }
    // greedy longest-match wordpiece with '##' continuations
    size_t start = 0;
    std::vector<int32_t> pieces;
    bool ok = true;
    while (start < word.size()) {
      size_t end = word.size();
      int32_t piece = -1;
      while (start < end) {
        cand.assign(start > 0 ? "##" : "");
        cand.append(word, start, end - start);
        auto it = v.map.find(cand);
        if (it != v.map.end()) { piece = it->second; break; }
        --end;
      }
      if (piece < 0) { ok = false; break; }
      pieces.push_back(piece);
      start = end;
    }
    if (ok) ids.insert(ids.end(), pieces.begin(), pieces.end());
    else ids.push_back(v.unk);
    word.clear();
  };
  for (int32_t i = 0; i < len && (int64_t)ids.size() < budget + 8; ++i) {
    uint8_t c = text[i];
    if (v.lowercase && c >= 'A' && c <= 'Z') c += 32;
    if (c == ' ' || (c >= 0x09 && c <= 0x0d) || (c >= 0x1c && c <= 0x1f)) {
      flush();
    } else if (ascii_punct(c)) {
      flush();
      if ((int64_t)ids.size() < budget + 8) {
        char pc[2] = {(char)c, 0};
        auto it = v.map.find(pc);
        ids.push_back(it != v.map.end() ? it->second : v.unk);
      }
    } else {
      word.push_back((char)c);
    }
  }
  flush();
  if ((int64_t)ids.size() > budget) ids.resize(budget);
  int64_t j = 0;
  tok_row[j++] = v.cls;
  for (int32_t id : ids) tok_row[j++] = id;
  tok_row[j++] = v.sep;
  for (; j < maxlen; ++j) tok_row[j] = v.pad;
}

}  // namespace

extern "C" {

int64_t rf_wp_build(const uint8_t* blob, const int32_t* offsets, int64_t n,
                    int32_t pad, int32_t unk, int32_t cls, int32_t sep,
                    int32_t lowercase) {
  auto* v = new WpVocab();
  v->map.reserve((size_t)n * 2);
  for (int64_t i = 0; i < n; ++i) {
    std::string t((const char*)blob + offsets[i],
                  (size_t)(offsets[i + 1] - offsets[i]));
    v->map.emplace(std::move(t), (int32_t)i);
  }
  v->pad = pad; v->unk = unk; v->cls = cls; v->sep = sep;
  v->lowercase = lowercase != 0;
  std::lock_guard<std::mutex> g(wp_mutex());
  wp_registry().push_back(v);
  return (int64_t)wp_registry().size() - 1;
}

void rf_wp_encode_batch(int64_t handle, const uint8_t* blob,
                        const int64_t* offsets, int64_t n_texts,
                        int64_t maxlen, int64_t max_wp_len,
                        int32_t* out_tok, int32_t n_threads) {
  const WpVocab* v;
  {
    std::lock_guard<std::mutex> g(wp_mutex());
    v = wp_registry()[(size_t)handle];
  }
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      wp_encode_one(*v, blob + offsets[i],
                    (int32_t)(offsets[i + 1] - offsets[i]),
                    maxlen, max_wp_len, out_tok + i * maxlen);
    }
  };
  if (n_threads <= 1 || n_texts < 256) {
    work(0, n_texts);
    return;
  }
  std::vector<std::thread> ts;
  const int64_t per = (n_texts + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    const int64_t lo = t * per, hi = std::min(n_texts, lo + per);
    if (lo < hi) ts.emplace_back(work, lo, hi);
  }
  for (auto& th : ts) th.join();
}

}  // extern "C"

// FSST: Fast Static Symbol Table string compression.
//
// Reference behavior: liquid-cache leans on the `fsst-rs` crate
// (src/core/Cargo.toml) for dictionary-value compression inside
// `RawFsstBuffer` (src/core/src/liquid_array/raw/fsst_buffer.rs).
// This is an independent C++ implementation of the public FSST
// algorithm (Boncz, Neumann, Leis: "FSST: Fast Random Access String
// Compression", VLDB 2020): a table of up to 255 symbols of 1..8 bytes
// each, greedy longest-match encoding, one-byte codes, code 255 = escape
// followed by a literal byte.  Training is the paper's iterative
// bottom-up symbol construction: compress a sample with the current
// table, count symbol and adjacent-pair frequencies, keep the 255
// highest-gain (count * length) candidates, repeat.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <algorithm>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kMaxSymbols = 255;   // codes 0..254; 255 = escape
constexpr int kMaxSymLen = 8;
constexpr int kGenerations = 5;
constexpr uint64_t kMaxSampleBytes = 1 << 16;

struct SymbolTable {
  uint8_t lens[kMaxSymbols];
  uint8_t syms[kMaxSymbols][kMaxSymLen];
  int n = 0;
  // per-first-byte candidate codes, sorted by length descending so the
  // greedy matcher can take the first hit.
  std::vector<uint16_t> by_first[256];

  void build_index() {
    for (auto &v : by_first) v.clear();
    for (int c = 0; c < n; ++c) by_first[syms[c][0]].push_back((uint16_t)c);
    for (auto &v : by_first) {
      std::sort(v.begin(), v.end(), [this](uint16_t a, uint16_t b) {
        return lens[a] > lens[b];
      });
    }
  }

  // longest symbol matching in[0..len); returns code or -1.
  inline int find(const uint8_t *in, uint64_t len) const {
    for (uint16_t c : by_first[in[0]]) {
      uint8_t l = lens[c];
      if (l <= len && std::memcmp(syms[c], in, l) == 0) return c;
    }
    return -1;
  }
};

struct Key {
  uint64_t w;  // symbol bytes little-endian packed
  uint8_t len;
  bool operator==(const Key &o) const { return w == o.w && len == o.len; }
};
struct KeyHash {
  size_t operator()(const Key &k) const {
    uint64_t h = k.w * 0x9E3779B97F4A7C15ull + k.len;
    h ^= h >> 29; h *= 0xBF58476D1CE4E5B9ull; h ^= h >> 32;
    return (size_t)h;
  }
};

Key make_key(const uint8_t *p, uint8_t len) {
  Key k{0, len};
  std::memcpy(&k.w, p, len);
  return k;
}

// One training generation: greedy-compress every sample string with the
// current table, counting symbol hits and adjacent concatenations, then
// keep the top-gain candidates as the next table.
void train_generation(SymbolTable &st,
                      const uint8_t *data, const uint64_t *offsets,
                      uint64_t n_strings) {
  std::unordered_map<Key, uint64_t, KeyHash> gain;
  gain.reserve(4096);
  for (uint64_t s = 0; s < n_strings; ++s) {
    const uint8_t *p = data + offsets[s];
    const uint8_t *end = data + offsets[s + 1];
    Key prev{0, 0};
    while (p < end) {
      uint64_t remain = (uint64_t)(end - p);
      int code = st.n ? st.find(p, remain) : -1;
      uint8_t l = code >= 0 ? st.lens[code] : 1;
      Key cur = make_key(p, l);
      gain[cur] += l;
      // single-byte base candidates keep every byte reachable
      if (l > 1) gain[make_key(p, 1)] += 1;
      if (prev.len && prev.len + l <= kMaxSymLen) {
        // candidate concatenation of the previous and current symbol
        uint8_t buf[kMaxSymLen];
        std::memcpy(buf, &prev.w, prev.len);
        std::memcpy(buf + prev.len, p, l);
        gain[make_key(buf, (uint8_t)(prev.len + l))] += (uint64_t)(prev.len + l);
      }
      prev = cur;
      p += l;
    }
  }
  // pick top-255 by gain; longer symbols win ties (more compression)
  std::vector<std::pair<uint64_t, Key>> ranked;
  ranked.reserve(gain.size());
  for (auto &kv : gain) {
    // a 1-byte symbol saves nothing by itself but avoids 2-byte escapes;
    // weight it at count (gain already = count * len = count).
    ranked.push_back({kv.second, kv.first});
  }
  std::sort(ranked.begin(), ranked.end(), [](const auto &a, const auto &b) {
    if (a.first != b.first) return a.first > b.first;
    return a.second.len > b.second.len;
  });
  st.n = 0;
  for (auto &r : ranked) {
    if (st.n >= kMaxSymbols) break;
    st.lens[st.n] = r.second.len;
    std::memset(st.syms[st.n], 0, kMaxSymLen);
    std::memcpy(st.syms[st.n], &r.second.w, r.second.len);
    ++st.n;
  }
  st.build_index();
}

}  // namespace

extern "C" {

// Train a symbol table on (data, offsets[n_strings+1]) — string i is
// data[offsets[i]..offsets[i+1]).  Caller frees with lqt_fsst_free.
void *lqt_fsst_train(const uint8_t *data, const uint64_t *offsets,
                     uint64_t n_strings) {
  auto *st = new SymbolTable();
  // cap the sample: take whole strings until the byte budget is hit
  uint64_t n = n_strings;
  while (n > 1 && offsets[n] - offsets[0] > kMaxSampleBytes) --n;
  if (n == 0) { st->build_index(); return st; }
  for (int g = 0; g < kGenerations; ++g) {
    train_generation(*st, data, offsets, n);
  }
  return st;
}

void lqt_fsst_free(void *h) { delete (SymbolTable *)h; }

// Worst case output: 2 bytes per input byte (all escapes).
uint64_t lqt_fsst_max_compressed_len(uint64_t in_len) { return 2 * in_len; }

uint64_t lqt_fsst_compress(void *h, const uint8_t *in, uint64_t len,
                           uint8_t *out, uint64_t cap) {
  auto *st = (SymbolTable *)h;
  uint64_t o = 0;
  uint64_t i = 0;
  while (i < len) {
    int code = st->find(in + i, len - i);
    if (code >= 0) {
      if (o + 1 > cap) return UINT64_MAX;
      out[o++] = (uint8_t)code;
      i += st->lens[code];
    } else {
      if (o + 2 > cap) return UINT64_MAX;
      out[o++] = 255;
      out[o++] = in[i++];
    }
  }
  return o;
}

uint64_t lqt_fsst_decompress(void *h, const uint8_t *in, uint64_t len,
                             uint8_t *out, uint64_t cap) {
  auto *st = (SymbolTable *)h;
  uint64_t o = 0;
  for (uint64_t i = 0; i < len;) {
    uint8_t c = in[i++];
    if (c == 255) {
      if (i >= len || o + 1 > cap) return UINT64_MAX;
      out[o++] = in[i++];
    } else {
      if (c >= st->n) return UINT64_MAX;  // corrupt input
      uint8_t l = st->lens[c];
      if (o + l > cap) return UINT64_MAX;
      std::memcpy(out + o, st->syms[c], l);
      o += l;
    }
  }
  return o;
}

// Decompressed size without writing output (for exact allocation).
uint64_t lqt_fsst_decompressed_len(void *h, const uint8_t *in, uint64_t len) {
  auto *st = (SymbolTable *)h;
  uint64_t o = 0;
  for (uint64_t i = 0; i < len;) {
    uint8_t c = in[i++];
    if (c == 255) { ++i; ++o; }
    else {
      if (c >= st->n) return UINT64_MAX;
      o += st->lens[c];
    }
  }
  return o;
}

// Serialized table: u16 n, then per symbol u8 len + len bytes.
uint64_t lqt_fsst_table_serialize(void *h, uint8_t *out, uint64_t cap) {
  auto *st = (SymbolTable *)h;
  uint64_t need = 2;
  for (int c = 0; c < st->n; ++c) need += 1 + st->lens[c];
  if (out == nullptr) return need;
  if (cap < need) return UINT64_MAX;
  out[0] = (uint8_t)(st->n & 0xff);
  out[1] = (uint8_t)(st->n >> 8);
  uint64_t o = 2;
  for (int c = 0; c < st->n; ++c) {
    out[o++] = st->lens[c];
    std::memcpy(out + o, st->syms[c], st->lens[c]);
    o += st->lens[c];
  }
  return o;
}

void *lqt_fsst_table_deserialize(const uint8_t *buf, uint64_t len) {
  if (len < 2) return nullptr;
  auto *st = new SymbolTable();
  int n = buf[0] | (buf[1] << 8);
  if (n > kMaxSymbols) { delete st; return nullptr; }
  uint64_t o = 2;
  for (int c = 0; c < n; ++c) {
    if (o >= len) { delete st; return nullptr; }
    uint8_t l = buf[o++];
    if (l == 0 || l > kMaxSymLen || o + l > len) { delete st; return nullptr; }
    st->lens[c] = l;
    std::memset(st->syms[c], 0, kMaxSymLen);
    std::memcpy(st->syms[c], buf + o, l);
    o += l;
  }
  st->n = n;
  st->build_index();
  return st;
}

int lqt_fsst_num_symbols(void *h) { return ((SymbolTable *)h)->n; }

// Batch helpers: compress/decompress many strings in one call (cuts
// ctypes crossing overhead for dictionary-sized batches).
// in: concatenated bytes; in_offsets: n+1; out: caller buffer; returns
// total bytes written and fills out_offsets (n+1), or UINT64_MAX.
uint64_t lqt_fsst_compress_batch(void *h, const uint8_t *in,
                                 const uint64_t *in_offsets, uint64_t n,
                                 uint8_t *out, uint64_t cap,
                                 uint64_t *out_offsets) {
  uint64_t o = 0;
  out_offsets[0] = 0;
  for (uint64_t s = 0; s < n; ++s) {
    uint64_t r = lqt_fsst_compress(h, in + in_offsets[s],
                                   in_offsets[s + 1] - in_offsets[s],
                                   out + o, cap - o);
    if (r == UINT64_MAX) return UINT64_MAX;
    o += r;
    out_offsets[s + 1] = o;
  }
  return o;
}

uint64_t lqt_fsst_decompress_batch(void *h, const uint8_t *in,
                                   const uint64_t *in_offsets, uint64_t n,
                                   uint8_t *out, uint64_t cap,
                                   uint64_t *out_offsets) {
  uint64_t o = 0;
  out_offsets[0] = 0;
  for (uint64_t s = 0; s < n; ++s) {
    uint64_t r = lqt_fsst_decompress(h, in + in_offsets[s],
                                     in_offsets[s + 1] - in_offsets[s],
                                     out + o, cap - o);
    if (r == UINT64_MAX) return UINT64_MAX;
    o += r;
    out_offsets[s + 1] = o;
  }
  return o;
}

}  // extern "C"

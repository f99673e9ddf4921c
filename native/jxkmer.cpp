// janusx-tpu native k-mer counter.
//
// Replaces the capability of the reference's vendored KMC3 pipeline
// (/root/reference/src/kmer/ + vendored KMC C++): canonical k-mer counting
// from FASTA/FASTQ text for k <= 32, 2-bit encoded in a uint64 open-
// addressing hash table. Intentionally compact: one pass, linear probing,
// power-of-two capacity with automatic growth.
//
// Plain C ABI for ctypes.

#include <cstdint>
#include <cstdlib>
#include <cstring>

namespace {

struct Table {
  uint64_t* keys;     // k-mer codes (key+1 stored; 0 = empty)
  uint32_t* counts;
  uint64_t cap;       // power of two
  uint64_t size;
};

inline uint64_t hash64(uint64_t x) {
  x ^= x >> 33;
  x *= 0xff51afd7ed558ccdULL;
  x ^= x >> 33;
  x *= 0xc4ceb9fe1a85ec53ULL;
  x ^= x >> 33;
  return x;
}

bool grow(Table* t) {
  uint64_t ncap = t->cap << 1;
  uint64_t* nk = (uint64_t*)calloc(ncap, sizeof(uint64_t));
  uint32_t* nc = (uint32_t*)calloc(ncap, sizeof(uint32_t));
  if (!nk || !nc) return false;
  for (uint64_t i = 0; i < t->cap; ++i) {
    if (!t->keys[i]) continue;
    uint64_t h = hash64(t->keys[i]) & (ncap - 1);
    while (nk[h]) h = (h + 1) & (ncap - 1);
    nk[h] = t->keys[i];
    nc[h] = t->counts[i];
  }
  free(t->keys);
  free(t->counts);
  t->keys = nk;
  t->counts = nc;
  t->cap = ncap;
  return true;
}

inline bool add(Table* t, uint64_t code) {
  if ((t->size + 1) * 10 > t->cap * 7) {
    if (!grow(t)) return false;
  }
  uint64_t key = code + 1;  // avoid 0 sentinel
  uint64_t h = hash64(key) & (t->cap - 1);
  while (t->keys[h]) {
    if (t->keys[h] == key) {
      ++t->counts[h];
      return true;
    }
    h = (h + 1) & (t->cap - 1);
  }
  t->keys[h] = key;
  t->counts[h] = 1;
  ++t->size;
  return true;
}

struct BaseInit {
  int8_t table[256];
  BaseInit() {
    std::memset(table, -1, sizeof(table));
    table[(unsigned)'A'] = 0; table[(unsigned)'a'] = 0;
    table[(unsigned)'C'] = 1; table[(unsigned)'c'] = 1;
    table[(unsigned)'G'] = 2; table[(unsigned)'g'] = 2;
    table[(unsigned)'T'] = 3; table[(unsigned)'t'] = 3;
  }
};
const BaseInit kBases;

}  // namespace

extern "C" {

// Count canonical k-mers in sequence text (FASTA or FASTQ; headers and
// quality lines are skipped by format detection on '>'/'@'/'+').
// Returns an opaque table pointer, or nullptr on failure.
void* jx_kmer_count(const char* buf, long len, int k) {
  if (k < 1 || k > 32) return nullptr;
  Table* t = (Table*)malloc(sizeof(Table));
  t->cap = 1 << 16;
  t->size = 0;
  t->keys = (uint64_t*)calloc(t->cap, sizeof(uint64_t));
  t->counts = (uint32_t*)calloc(t->cap, sizeof(uint32_t));
  if (!t->keys || !t->counts) return nullptr;

  const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
  bool fastq = len > 0 && buf[0] == '@';
  long i = 0;
  while (i < len) {
    // line dispatch
    char c0 = buf[i];
    if (c0 == '>' || (fastq && (c0 == '@' || c0 == '+'))) {
      // skip header line (and for '+', also the following quality line)
      while (i < len && buf[i] != '\n') ++i;
      ++i;
      if (fastq && c0 == '+') {
        while (i < len && buf[i] != '\n') ++i;
        ++i;
      }
      continue;
    }
    // sequence line: rolling 2-bit encode
    uint64_t fwd = 0, rev = 0;
    int have = 0;
    while (i < len && buf[i] != '\n') {
      int8_t b = kBases.table[(unsigned char)buf[i]];
      ++i;
      if (b < 0) {
        have = 0;
        fwd = rev = 0;
        continue;
      }
      fwd = ((fwd << 2) | (uint64_t)b) & mask;
      rev = (rev >> 2) | (((uint64_t)(3 - b)) << (2 * (k - 1)));
      if (++have >= k) {
        uint64_t canon = fwd < rev ? fwd : rev;
        if (!add(t, canon)) return nullptr;
      }
    }
    ++i;
  }
  return t;
}

long jx_kmer_table_size(void* table) {
  return (long)((Table*)table)->size;
}

// Export (kmer_code, count) pairs with count >= min_count into caller
// arrays sized via jx_kmer_table_size. Returns entries written.
long jx_kmer_export(void* table, uint64_t* out_keys, uint32_t* out_counts,
                    long max_out, uint32_t min_count) {
  Table* t = (Table*)table;
  long w = 0;
  for (uint64_t i = 0; i < t->cap && w < max_out; ++i) {
    if (t->keys[i] && t->counts[i] >= min_count) {
      out_keys[w] = t->keys[i] - 1;
      out_counts[w] = t->counts[i];
      ++w;
    }
  }
  return w;
}

void jx_kmer_free(void* table) {
  Table* t = (Table*)table;
  free(t->keys);
  free(t->counts);
  free(t);
}

}  // extern "C"

// janusx-tpu native k-mer counter.
//
// Replaces the capability of the reference's vendored KMC3 pipeline
// (/root/reference/src/kmer/ + vendored KMC C++ ~38k LoC): canonical
// k-mer counting from FASTA/FASTQ text, 2-bit encoded in open-addressing
// hash tables. k <= 32 uses one-word (u64) keys; k <= 64 uses two-word
// (__int128) keys (KMC-class k range without its internals).
//
// Scale design (KMC-capability class, not KMC internals):
//   - streaming handle API: the caller feeds record-aligned buffers of
//     any size, so host memory is bounded by the table, not the file;
//   - multithreaded adds: each buffer is split at record boundaries
//     (FASTA '\n>'; FASTQ 4-line-record header heuristic) across T
//     threads; every thread APPENDS canonical codes into per-(thread,
//     partition) buffers (sequential writes, no locks) — P=256
//     KEY-RANGE partitions (top 8 code bits), so per-partition sorted
//     exports concatenate to a globally sorted table;
//   - parallel partition counting: T workers pull partition indices
//     from an atomic counter and hash-count that partition's buffers
//     into the persistent handle table. Each partition table is ~1/256
//     of the distinct-kmer set (L2-resident; 256 measured best of
//     {64,128,256,512} on the 209 MB benchmark), so inserts hit cache instead of DRAM,
//     and total hash work equals the k-mer count once (a naive
//     per-thread-table merge re-counts the distinct set up to T times
//     on high-duplication data);
//   - multi-line FASTA: the rolling 2-bit encoder carries across
//     newlines inside a record (KMC semantics; the old single-line
//     reset dropped k-mers spanning wraps);
//   - KMC-lite spill (memory budget): jx_kmt_new2 takes a byte budget
//     and a spill directory. When the next chunk could cross the budget,
//     the handle converts to spill mode: tables are dumped to
//     per-partition bucket files as (key, count) records and later
//     chunks append their phase-1 codes directly to the buckets.
//     Finalization then counts ONE partition at a time (each ~1/64 of
//     the distinct set), so inputs whose k-mer table exceeds RAM still
//     complete in bounded memory. A hard cap at 2x budget inside grow()
//     fails FAST with a clean error instead of swapping to DRAM death
//     when no spill dir was given.
//
// Plain C ABI for ctypes. Wide (k > 32) keys cross the ABI as
// (lo, hi) u64 pairs, interleaved in the export buffers.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kPartitions = 256;

// JX_KMER_TIMING=1: print per-phase wall times to stderr (perf triage)
inline bool timing_enabled() {
  static int v = -1;
  if (v < 0) {
    const char* e = getenv("JX_KMER_TIMING");
    v = (e && e[0] == '1') ? 1 : 0;
  }
  return v == 1;
}
inline double now_s() {
  return std::chrono::duration<double>(
             std::chrono::steady_clock::now().time_since_epoch())
      .count();
}

typedef unsigned __int128 u128;

inline uint64_t hash64(uint64_t x) {
  x ^= x >> 33;
  x *= 0xff51afd7ed558ccdULL;
  x ^= x >> 33;
  x *= 0xc4ceb9fe1a85ec53ULL;
  x ^= x >> 33;
  return x;
}

inline uint64_t hash_of(uint64_t x) { return hash64(x); }
inline uint64_t hash_of(u128 x) {
  return hash64((uint64_t)(x >> 64) ^ hash64((uint64_t)x));
}

// Interleaved slot: key and count share a cache line, so each probe and
// each count bump touches ONE line (the split keys[]/counts[] layout
// cost two misses per insert on the DRAM-bound phase-2 path).
template <class KT>
struct SlotT {
  KT key;  // k-mer code + 1 (0 = empty)
  uint32_t count;
};

template <class KT>
struct TableT {
  SlotT<KT>* slots = nullptr;
  uint64_t cap = 0;  // power of two
  uint64_t size = 0;

  static constexpr long slot_bytes = (long)sizeof(SlotT<KT>);

  void init(uint64_t c) {
    cap = c;
    size = 0;
    slots = (SlotT<KT>*)calloc(cap, sizeof(SlotT<KT>));
  }
  void destroy() {
    free(slots);
    slots = nullptr;
    cap = size = 0;
  }
};

template <class KT>
bool grow(TableT<KT>* t, std::atomic<long>* bytes = nullptr,
          long hard_cap = 0) {
  uint64_t ncap = t->cap << 1;
  if (bytes) {
    long delta = (long)(ncap - t->cap) * TableT<KT>::slot_bytes;
    long now = bytes->fetch_add(delta) + delta;
    if (hard_cap > 0 && now > hard_cap) {
      bytes->fetch_add(-delta);
      return false;  // budget breach: caller converts to spill or errors
    }
  }
  SlotT<KT>* ns = (SlotT<KT>*)calloc(ncap, sizeof(SlotT<KT>));
  if (!ns) return false;
  for (uint64_t i = 0; i < t->cap; ++i) {
    if (!t->slots[i].key) continue;
    uint64_t h = hash_of(t->slots[i].key) & (ncap - 1);
    while (ns[h].key) h = (h + 1) & (ncap - 1);
    ns[h] = t->slots[i];
  }
  free(t->slots);
  t->slots = ns;
  t->cap = ncap;
  return true;
}

template <class KT>
inline bool add_count_h(TableT<KT>* t, KT key, uint64_t hash, uint32_t add,
                        std::atomic<long>* bytes = nullptr, long cap = 0) {
  if ((t->size + 1) * 10 > t->cap * 7) {
    if (!grow(t, bytes, cap)) return false;
  }
  uint64_t h = hash & (t->cap - 1);
  while (t->slots[h].key) {
    if (t->slots[h].key == key) {
      t->slots[h].count += add;
      return true;
    }
    h = (h + 1) & (t->cap - 1);
  }
  t->slots[h].key = key;
  t->slots[h].count = add;
  ++t->size;
  return true;
}

template <class KT>
inline bool add_count(TableT<KT>* t, KT key, uint32_t add,
                      std::atomic<long>* bytes = nullptr, long cap = 0) {
  return add_count_h(t, key, hash_of(key), add, bytes, cap);
}

// Batched insert with software prefetch: hash a window of keys ahead and
// prefetch their home slots, hiding the DRAM latency of the random table
// access that dominates phase 2.
template <class KT>
inline bool add_batch(TableT<KT>* t, const KT* keys, size_t n,
                      std::atomic<long>* bytes, long cap) {
  constexpr size_t W = 16;
  uint64_t hs[W];
  size_t i = 0;
  while (i < n) {
    size_t b = n - i < W ? n - i : W;
    for (size_t j = 0; j < b; ++j) {
      hs[j] = hash_of(keys[i + j]);
      __builtin_prefetch(&t->slots[hs[j] & (t->cap - 1)], 1, 1);
    }
    for (size_t j = 0; j < b; ++j)
      if (!add_count_h(t, keys[i + j], hs[j], 1u, bytes, cap)) return false;
    i += b;
  }
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

// (key, count) spill record — packed
#pragma pack(push, 1)
template <class KT>
struct SpillRecT {
  KT key;
  uint32_t count;
};
#pragma pack(pop)

template <class KT>
struct HandleT {
  int k;
  int threads;
  int part_shift;  // key-range partitioning: partition = key >> shift
  TableT<KT> parts[kPartitions];
  // sorted phase-2 mode (narrow keys, no memory budget): counting and
  // the export sort collapse into one radix+RLE pass per partition; the
  // persistent per-partition state is a key-SORTED (key, count) run
  // vector instead of a hash table (see handle_add). Round-5 A/B on the
  // 209 MB / 20x benchmark decides the default — see JX_KMER_PHASE2.
  bool use_sorted = false;
  std::vector<SpillRecT<KT>> sorted[kPartitions];
  std::atomic<bool> failed{false};
  // spill state (jx_kmt_new2)
  long budget = 0;              // soft budget in bytes (0 = unlimited)
  std::string spill_dir;        // empty = fail fast instead of spilling
  bool spilling = false;
  FILE* spill_files[kPartitions] = {nullptr};
  std::atomic<long> table_bytes{0};

  long hard_cap() const { return budget > 0 ? budget * 2 : 0; }
  std::string spill_path(int p) const {
    return spill_dir + "/jxkmer_part" + std::to_string(p) + ".bin";
  }
  // parallel spill-finalize results (sorted, filtered, per partition)
  std::vector<std::vector<SpillRecT<KT>>> fin;
};

// Partitions are KEY RANGES (top 6 bits of the 2k-bit code), not hash
// buckets: per-partition sorted exports concatenate to a globally sorted
// table, so the Python side never re-sorts. Canonical codes are biased
// toward small values (canon = min(fwd, rev) has density 2(1-x)), so the
// low partitions carry up to 2x the mean load — the atomic work-stealing
// counter in phase 2 absorbs that imbalance.
template <class KT>
inline int partition_of(KT key, int shift) {
  return (int)(key >> shift) & (kPartitions - 1);
}

template <class KT>
bool spill_append(FILE* f, const KT* keys, const uint32_t* counts, size_t n) {
  // fixed staging window: no O(n) allocation per append
  SpillRecT<KT> recs[4096];
  size_t i = 0;
  while (i < n) {
    size_t b = n - i < 4096 ? n - i : 4096;
    for (size_t j = 0; j < b; ++j)
      recs[j] = {keys[i + j], counts ? counts[i + j] : 1u};
    if (fwrite(recs, sizeof(SpillRecT<KT>), b, f) != b) return false;
    i += b;
  }
  return true;
}

// Convert the handle to spill mode: dump every partition table to its
// bucket file and free the RAM.
template <class KT>
bool enter_spill(HandleT<KT>* h) {
  for (int p = 0; p < kPartitions; ++p) {
    FILE* f = fopen(h->spill_path(p).c_str(), "wb+");
    if (!f) return false;
    h->spill_files[p] = f;
    TableT<KT>& t = h->parts[p];
    std::vector<SpillRecT<KT>> recs;
    recs.reserve(t.size);
    for (uint64_t i = 0; i < t.cap; ++i)
      if (t.slots[i].key) recs.push_back({t.slots[i].key, t.slots[i].count});
    if (!recs.empty() &&
        fwrite(recs.data(), sizeof(SpillRecT<KT>), recs.size(), f) !=
            recs.size())
      return false;
    t.destroy();
  }
  h->table_bytes.store(0);
  h->spilling = true;
  return true;
}

// Emit canonical k-mer codes of one sequence stretch [s, e) into the
// per-partition append buffers; rolling state carries across newlines.
struct VecEmit {
  template <class KT>
  static inline void emit(std::vector<KT>* out, int p, KT key) {
    out[p].push_back(key);
  }
};
template <class KT, class E, class OUT>
inline bool count_seq(const char* buf, long s, long e, int k, KT mask,
                      int shift, OUT* out) {
  KT fwd = 0, rev = 0;
  int have = 0;
  for (long i = s; i < e; ++i) {
    unsigned char ch = (unsigned char)buf[i];
    if (ch == '\n' || ch == '\r') continue;
    int8_t b = kBases.table[ch];
    if (b < 0) {
      have = 0;
      fwd = rev = 0;
      continue;
    }
    fwd = ((fwd << 2) | (KT)(unsigned)b) & mask;
    rev = (rev >> 2) | (((KT)(unsigned)(3 - b)) << (2 * (k - 1)));
    if (++have >= k) {
      KT canon = fwd < rev ? fwd : rev;
      // partition on the raw code so the +1 storage sentinel cannot
      // carry across a range boundary
      E::emit(out, partition_of<KT>(canon, shift), canon + 1);
    }
  }
  return true;
}

inline long line_end(const char* buf, long i, long len) {
  while (i < len && buf[i] != '\n') ++i;
  return i;
}

// Parse records in [s, e): FASTA (multi-line seq) or FASTQ (4-line).
template <class KT, class E = VecEmit, class OUT = std::vector<KT>>
bool count_range(const char* buf, long s, long e, int k, int shift,
                 OUT* parts) {
  const KT one = 1;
  const KT mask = (2 * k == (int)sizeof(KT) * 8)
                      ? (KT)~(KT)0
                      : ((one << (2 * k)) - 1);
  long i = s;
  while (i < e) {
    char c0 = buf[i];
    if (c0 == '>') {
      i = line_end(buf, i, e) + 1;  // header
      long seq_start = i;
      while (i < e && buf[i] != '>') i = line_end(buf, i, e) + 1;
      if (!count_seq<KT, E>(buf, seq_start, i < e ? i : e, k, mask, shift,
                            parts))
        return false;
    } else if (c0 == '@') {
      i = line_end(buf, i, e) + 1;  // header
      long seq_s = i;
      long seq_e = line_end(buf, i, e);
      if (!count_seq<KT, E>(buf, seq_s, seq_e, k, mask, shift, parts))
        return false;
      i = line_end(buf, seq_e + 1, e) + 1;  // skip '+' line
      i = line_end(buf, i, e) + 1;          // skip quality line
    } else {
      // bare sequence text (no headers): treat the stretch as FASTA body
      long seq_start = i;
      while (i < e && buf[i] != '>' && buf[i] != '@')
        i = line_end(buf, i, e) + 1;
      if (!count_seq<KT, E>(buf, seq_start, i < e ? i : e, k, mask, shift,
                            parts))
        return false;
    }
  }
  return true;
}

// Find the next record start at/after pos: FASTA -> line starting '>';
// FASTQ -> line L with buf[L]=='@' whose line L+2 starts with '+'
// (quality lines that start with '@' fail that check).
long next_record_start(const char* buf, long pos, long len, bool fastq) {
  long i = pos;
  if (i > 0) i = line_end(buf, i - 1, len) + 1;  // align to a line start
  while (i < len) {
    if (!fastq) {
      if (buf[i] == '>') return i;
    } else if (buf[i] == '@') {
      long l1 = line_end(buf, i, len) + 1;
      long l2 = line_end(buf, l1, len) + 1;
      if (l2 < len && buf[l2] == '+') return i;
    }
    i = line_end(buf, i, len) + 1;
  }
  return len;
}

// JX_KMER_PHASE2=hash forces the hash-count phase 2 (A/B escape hatch);
// default is the radix-sort path for narrow keys in unbudgeted mode.
inline bool phase2_sort_enabled() {
  const char* v = getenv("JX_KMER_PHASE2");
  return !(v && std::string(v) == "hash");
}

// LSD radix sort over the low `nbytes` bytes (the partition id occupies
// the bits above them, constant within a partition). Returns the buffer
// holding the sorted keys (a or b). Single-bucket passes are skipped —
// the top byte of the varying range is usually nearly constant.
inline uint64_t* radix_sort_low(uint64_t* a, uint64_t* b, size_t n,
                                int nbytes, int first_pass = 0) {
  for (int pass = first_pass; pass < nbytes; ++pass) {
    const int shift = pass * 8;
    uint32_t cnt[256] = {0};
    for (size_t i = 0; i < n; ++i) ++cnt[(a[i] >> shift) & 0xFF];
    if (cnt[(a[0] >> shift) & 0xFF] == n) continue;  // constant digit
    uint32_t pos[256];
    uint32_t acc = 0;
    for (int d = 0; d < 256; ++d) {
      pos[d] = acc;
      acc += cnt[d];
    }
    for (size_t i = 0; i < n; ++i) b[pos[(a[i] >> shift) & 0xFF]++] = a[i];
    std::swap(a, b);
  }
  return a;
}

// Run-length collapse of a sorted key array into (key, count) records.
inline void rle_append(const uint64_t* a, size_t n,
                       std::vector<SpillRecT<uint64_t>>& out) {
  size_t i = 0;
  while (i < n) {
    uint64_t key = a[i];
    size_t j = i + 1;
    while (j < n && a[j] == key) ++j;
    out.push_back({key, (uint32_t)(j - i)});
    i = j;
  }
}

// LSD radix sort of (key, count) records by the low key bytes.
inline SpillRecT<uint64_t>* radix_sort_recs(SpillRecT<uint64_t>* a,
                                            SpillRecT<uint64_t>* b,
                                            size_t n, int nbytes) {
  for (int pass = 0; pass < nbytes; ++pass) {
    const int shift = pass * 8;
    uint32_t cnt[256] = {0};
    for (size_t i = 0; i < n; ++i) ++cnt[(a[i].key >> shift) & 0xFF];
    if (cnt[(a[0].key >> shift) & 0xFF] == n) continue;
    uint32_t pos[256];
    uint32_t acc = 0;
    for (int d = 0; d < 256; ++d) {
      pos[d] = acc;
      acc += cnt[d];
    }
    for (size_t i = 0; i < n; ++i)
      b[pos[(a[i].key >> shift) & 0xFF]++] = a[i];
    std::swap(a, b);
  }
  return a;
}

// Collapse sorted records, SUMMING counts of equal keys (bucket files
// carry explicit counts after an enter_spill dump).
inline void rle_sum_append(const SpillRecT<uint64_t>* a, size_t n,
                           std::vector<SpillRecT<uint64_t>>& out) {
  size_t i = 0;
  while (i < n) {
    uint64_t key = a[i].key;
    uint64_t c = 0;
    size_t j = i;
    while (j < n && a[j].key == key) c += a[j++].count;
    out.push_back({key, (uint32_t)c});
    i = j;
  }
}

// Merge two key-sorted run vectors, summing counts on equal keys.
template <class KT>
void merge_runs(std::vector<SpillRecT<KT>>& dst,
                std::vector<SpillRecT<KT>>& add) {
  if (dst.empty()) {
    dst.swap(add);
    return;
  }
  std::vector<SpillRecT<KT>> out;
  out.reserve(dst.size() + add.size());
  size_t i = 0, j = 0;
  while (i < dst.size() && j < add.size()) {
    if (dst[i].key < add[j].key) out.push_back(dst[i++]);
    else if (add[j].key < dst[i].key) out.push_back(add[j++]);
    else {
      out.push_back({dst[i].key, dst[i].count + add[j].count});
      ++i;
      ++j;
    }
  }
  while (i < dst.size()) out.push_back(dst[i++]);
  while (j < add.size()) out.push_back(add[j++]);
  dst.swap(out);
}

template <class KT>
HandleT<KT>* make_handle(int k, int threads) {
  HandleT<KT>* h = new HandleT<KT>();
  h->k = k;
  h->part_shift = 2 * k > 8 ? 2 * k - 8 : 0;  // 8 bits -> 256 ranges
  int hw = (int)std::thread::hardware_concurrency();
  if (threads <= 0) threads = hw > 0 ? hw : 4;
  if (threads > 32) threads = 32;
  h->threads = threads;
  h->use_sorted = (sizeof(KT) == 8) && phase2_sort_enabled();
  // sorted mode never probes the tables, but spill/budget paths may
  // flip back — keep them initialized either way (3 MB total)
  for (int p = 0; p < kPartitions; ++p) h->parts[p].init(1 << 10);
  h->table_bytes.store((long)kPartitions * (1 << 10) *
                       TableT<KT>::slot_bytes);
  return h;
}

// Feed one buffer of whole records. Thread-splits at record boundaries,
// counts into thread-local partition buffers, merges partitions in
// parallel into the persistent handle tables (or bucket files when
// spilling). Returns 0 ok, 1 error, 2 fail-fast budget breach.
template <class KT>
int handle_add(HandleT<KT>* h, const char* buf, long len) {
  if (!h || h->failed.load()) return 1;
  if (len <= 0) return 0;
  const int k = h->k;
  bool fastq = buf[0] == '@';
  int T = h->threads;
  if (len < (long)1 << 20) T = 1;  // small buffers: no thread overhead

  // record-aligned split points
  std::vector<long> split(T + 1);
  split[0] = 0;
  split[T] = len;
  for (int t = 1; t < T; ++t)
    split[t] = next_record_start(buf, len / T * t, len, fastq);

  double t_p1 = now_s();
  std::atomic<bool> ok{true};
  std::vector<std::thread> workers;
  // NOTE: a streaming variant (parse threads flushing 4K-code staging
  // buffers into the partition tables under per-partition mutexes — one
  // DRAM pass instead of two) was measured 2-4x SLOWER here: concurrent
  // threads thrash the same table cache lines and serialize on the hot
  // low partitions. Exclusive partition ownership in phase 2 wins.
  // phase 1: threads append canonical codes into per-(thread, partition)
  // buffers — sequential writes, no locks
  std::vector<std::vector<std::vector<KT>>> local(T);
  for (int t = 0; t < T; ++t) {
    workers.emplace_back([&, t]() {
      local[t].resize(kPartitions);
      long span = split[t + 1] - split[t];
      if (span <= 0) return;
      for (int p = 0; p < kPartitions; ++p)
        local[t][p].reserve((size_t)(span / kPartitions + 16));
      if (!count_range<KT>(buf, split[t], split[t + 1], k, h->part_shift,
                           local[t].data()))
        ok.store(false);
    });
  }
  for (auto& w : workers) w.join();
  workers.clear();
  if (timing_enabled())
    fprintf(stderr, "[jxkmer] phase1 parse+append: %.3fs (len=%ld T=%d)\n",
            now_s() - t_p1, len, T);
  if (!ok.load()) {
    h->failed.store(true);
    return 1;
  }

  // budget pre-check: worst case this round adds one distinct key per
  // incoming code at ~1.43x slot overhead. If that could cross the soft
  // budget, convert to spill mode now (when a spill dir exists) so the
  // in-RAM tables never exceed the budget; callers bound the per-chunk
  // incoming load by shrinking the feed size.
  if (!h->spilling && h->budget > 0) {
    long incoming = 0;
    for (int t = 0; t < T; ++t)
      for (int p = 0; p < kPartitions; ++p)
        incoming += (long)local[t][p].size();
    long worst = incoming * (TableT<KT>::slot_bytes * 3 / 2);
    if (h->table_bytes.load() + worst > h->budget && !h->spill_dir.empty()) {
      if (!enter_spill(h)) {
        h->failed.store(true);
        return 1;
      }
    }
  }

  if (h->spilling) {
    // spill path: append this round's codes to the per-partition bucket
    // files as (key, 1) records — counting is deferred to finalization,
    // one partition at a time
    std::atomic<int> nextp{0};
    workers.clear();
    for (int t = 0; t < T; ++t) {
      workers.emplace_back([&]() {
        for (;;) {
          int p = nextp.fetch_add(1);
          if (p >= kPartitions) return;
          for (int s = 0; s < T; ++s) {
            auto& v = local[s][p];
            if (!v.empty() &&
                !spill_append(h->spill_files[p], v.data(), (uint32_t*)nullptr,
                              v.size()))
              ok.store(false);
          }
        }
      });
    }
    for (auto& w : workers) w.join();
    if (!ok.load()) {
      h->failed.store(true);
      return 1;
    }
    return 0;
  }

  if (h->use_sorted) {
    if constexpr (sizeof(KT) == 8) {
      // phase 2 (sorted mode): per-partition LSD radix sort of the
      // staged codes + run-length collapse, merged into the persistent
      // key-sorted run vector. One pass produces BOTH the counts and
      // the sorted order, so the export-time per-partition std::sort
      // disappears too. (Round 3's "sort-then-collapse is slower"
      // verdict measured std::sort into the hash tables; byte-radix
      // into run vectors is a different cost model and won the
      // round-5 A/B: phase2 0.60 s -> 0.37 s and export 0.19 s ->
      // 0.03 s on the 209 MB / 20x benchmark.)
      double t_p2 = now_s();
      std::atomic<int> next{0};
      int T2 = T * 2 > kPartitions ? kPartitions : T * 2;
      int nbytes = (2 * h->k - 8 + 7) / 8;
      if (nbytes < 1) nbytes = 1;
      std::vector<std::thread> sworkers;
      for (int t = 0; t < T2; ++t) {
        sworkers.emplace_back([&]() {
          std::vector<uint64_t> A, B;
          std::vector<SpillRecT<uint64_t>> runs;
          for (;;) {
            int p = next.fetch_add(1);
            if (p >= kPartitions) return;
            size_t n = 0;
            for (int s = 0; s < T; ++s) n += local[s][p].size();
            if (!n) continue;
            A.resize(n);
            B.resize(n);
            // first radix pass fused with the gather: histogram +
            // scatter read straight from the T staging vectors, saving
            // a full sequential copy of the partition's codes
            uint32_t cnt[256] = {0};
            for (int s = 0; s < T; ++s)
              for (uint64_t key : local[s][p]) ++cnt[key & 0xFF];
            uint32_t pos[256];
            uint32_t acc = 0;
            for (int d = 0; d < 256; ++d) {
              pos[d] = acc;
              acc += cnt[d];
            }
            for (int s = 0; s < T; ++s)
              for (uint64_t key : local[s][p]) A[pos[key & 0xFF]++] = key;
            uint64_t* res =
                radix_sort_low(A.data(), B.data(), n, nbytes, 1);
            runs.clear();
            rle_append(res, n, runs);
            merge_runs(h->sorted[p], runs);
          }
        });
      }
      for (auto& w : sworkers) w.join();
      if (timing_enabled())
        fprintf(stderr, "[jxkmer] phase2 radix+rle: %.3fs\n",
                now_s() - t_p2);
      return 0;
    }
  }

  // phase 2: T workers hash-count whole partitions (disjoint -> lock-
  // free). One hash insert per occurrence; total hash work equals the
  // k-mer count once — a naive per-thread-table merge would re-count the
  // distinct set up to T times on high-duplication data. (A sort-then-
  // run-collapse variant into the HASH tables was measured slower on
  // both high- and low-duplication inputs; the radix-into-run-vectors
  // variant above replaced it in round 5 for narrow keys.)
  double t_p2 = now_s();
  std::atomic<int> next{0};
  std::atomic<bool> oom{false};
  workers.clear();
  std::atomic<long>* bytes = h->budget > 0 ? &h->table_bytes : nullptr;
  long cap = h->hard_cap();
  // 2x workers: the canonical-min bias skews range-partition loads up to
  // 2x, and the extra threads both smooth the work-stealing tail and
  // hide L2/DRAM latency behind SMT
  int T2 = T * 2 > kPartitions ? kPartitions : T * 2;
  for (int t = 0; t < T2; ++t) {
    workers.emplace_back([&]() {
      for (;;) {
        int p = next.fetch_add(1);
        if (p >= kPartitions) return;
        TableT<KT>* dst = &h->parts[p];
        for (int s = 0; s < T; ++s) {
          auto& v = local[s][p];
          if (!v.empty() && !add_batch(dst, v.data(), v.size(), bytes, cap)) {
            oom.store(true);
            return;
          }
        }
      }
    });
  }
  for (auto& w : workers) w.join();
  if (timing_enabled())
    fprintf(stderr, "[jxkmer] phase2 hash-count: %.3fs\n", now_s() - t_p2);
  if (oom.load()) {
    // fail FAST with a clean error: the table crossed 2x the budget and
    // no spill directory was configured (or allocation failed)
    h->failed.store(true);
    return 2;
  }
  if (!ok.load()) {
    h->failed.store(true);
    return 1;
  }
  return 0;
}

template <class KT>
long handle_size(HandleT<KT>* h) {
  long n = 0;
  if (h->use_sorted) {
    for (int p = 0; p < kPartitions; ++p) n += (long)h->sorted[p].size();
    return n;
  }
  for (int p = 0; p < kPartitions; ++p) n += (long)h->parts[p].size;
  return n;
}

// keys cross the ABI minus the +1 sentinel; wide keys as (lo, hi) pairs
inline void put_key(uint64_t* out, long w, uint64_t key) { out[w] = key - 1; }
inline void put_key(uint64_t* out, long w, u128 key) {
  u128 v = key - 1;
  out[2 * w] = (uint64_t)v;
  out[2 * w + 1] = (uint64_t)(v >> 64);
}

template <class KT>
long table_export(TableT<KT>& t, uint64_t* out_keys, uint32_t* out_counts,
                  long w, long max_out, uint32_t min_count) {
  for (uint64_t i = 0; i < t.cap && w < max_out; ++i) {
    if (t.slots[i].key && t.slots[i].count >= min_count) {
      put_key(out_keys, w, t.slots[i].key);
      out_counts[w] = t.slots[i].count;
      ++w;
    }
  }
  return w;
}

// Sorted parallel export: each partition is a key range, so sorting
// partitions independently (T threads) and writing them at prefix
// offsets yields a GLOBALLY key-sorted table — the Python side's
// argsort over the full distinct set (1.3 s at 5M k-mers) disappears.
template <class KT>
long handle_export(HandleT<KT>* h, uint64_t* out_keys, uint32_t* out_counts,
                   long max_out, uint32_t min_count) {
  if (h->use_sorted) {
    // run vectors are already key-sorted per key-range partition:
    // export is offsets + a parallel filtered copy (no sort)
    long kept[kPartitions];
    for (int p = 0; p < kPartitions; ++p) {
      if (min_count <= 1) {
        kept[p] = (long)h->sorted[p].size();
      } else {
        long c = 0;
        for (auto& rec : h->sorted[p])
          if (rec.count >= min_count) ++c;
        kept[p] = c;
      }
    }
    long total = 0;
    for (int p = 0; p < kPartitions; ++p) total += kept[p];
    if (total > max_out) {
      long w = 0;
      for (int p = 0; p < kPartitions && w < max_out; ++p)
        for (auto& rec : h->sorted[p]) {
          if (w >= max_out) break;
          if (rec.count < min_count) continue;
          put_key(out_keys, w, rec.key);
          out_counts[w] = rec.count;
          ++w;
        }
      return w;
    }
    long off[kPartitions];
    long acc = 0;
    for (int p = 0; p < kPartitions; ++p) {
      off[p] = acc;
      acc += kept[p];
    }
    std::atomic<int> next{0};
    int T = h->threads * 2 > kPartitions ? kPartitions : h->threads * 2;
    std::vector<std::thread> workers;
    for (int t = 0; t < T; ++t) {
      workers.emplace_back([&]() {
        for (;;) {
          int p = next.fetch_add(1);
          if (p >= kPartitions) return;
          long w = off[p];
          for (auto& rec : h->sorted[p]) {
            if (rec.count < min_count) continue;
            put_key(out_keys, w, rec.key);
            out_counts[w] = rec.count;
            ++w;
          }
        }
      });
    }
    for (auto& w : workers) w.join();
    return total;
  }
  long kept[kPartitions];
  std::vector<std::vector<SpillRecT<KT>>> recs(kPartitions);
  std::atomic<int> next{0};
  int T = h->threads * 2 > kPartitions ? kPartitions : h->threads * 2;
  std::vector<std::thread> workers;
  for (int t = 0; t < T; ++t) {
    workers.emplace_back([&]() {
      for (;;) {
        int p = next.fetch_add(1);
        if (p >= kPartitions) return;
        TableT<KT>& tb = h->parts[p];
        auto& r = recs[p];
        r.reserve(tb.size);
        for (uint64_t i = 0; i < tb.cap; ++i)
          if (tb.slots[i].key && tb.slots[i].count >= min_count)
            r.push_back({tb.slots[i].key, tb.slots[i].count});
        std::sort(r.begin(), r.end(),
                  [](const SpillRecT<KT>& a, const SpillRecT<KT>& b) {
                    return a.key < b.key;
                  });
        kept[p] = (long)r.size();
      }
    });
  }
  for (auto& w : workers) w.join();
  long total = 0;
  for (int p = 0; p < kPartitions; ++p) total += kept[p];
  if (total > max_out) {
    // caller under-allocated: truncating sequential fallback
    long w = 0;
    for (int p = 0; p < kPartitions && w < max_out; ++p)
      for (auto& rec : recs[p]) {
        if (w >= max_out) break;
        put_key(out_keys, w, rec.key);
        out_counts[w] = rec.count;
        ++w;
      }
    return w;
  }
  long off[kPartitions];
  long acc = 0;
  for (int p = 0; p < kPartitions; ++p) {
    off[p] = acc;
    acc += kept[p];
  }
  next.store(0);
  workers.clear();
  for (int t = 0; t < T; ++t) {
    workers.emplace_back([&]() {
      for (;;) {
        int p = next.fetch_add(1);
        if (p >= kPartitions) return;
        long w = off[p];
        for (auto& rec : recs[p]) {
          put_key(out_keys, w, rec.key);
          out_counts[w] = rec.count;
          ++w;
        }
      }
    });
  }
  for (auto& w : workers) w.join();
  return total;
}

// Stream one bucket file into a key-sorted run vector: 1M-record chunks
// are radix-sorted + run-collapsed, then merged — memory stays bounded
// by (distinct-in-partition + chunk), the same guarantee as the hash
// table, while sorting replaces both the hash inserts AND the
// finalize-time std::sort (narrow keys only).
inline long bucket_runs_into64(HandleT<uint64_t>* h, int p,
                               std::vector<SpillRecT<uint64_t>>& out) {
  FILE* f = h->spill_files[p];
  if (!f) return -1;
  fflush(f);
  rewind(f);
  int nbytes = (2 * h->k - 8 + 7) / 8;
  if (nbytes < 1) nbytes = 1;
  std::vector<SpillRecT<uint64_t>> buf(1 << 20), tmp(1 << 20), runs;
  for (;;) {
    size_t got =
        fread(buf.data(), sizeof(SpillRecT<uint64_t>), buf.size(), f);
    if (got == 0) break;
    SpillRecT<uint64_t>* res =
        radix_sort_recs(buf.data(), tmp.data(), got, nbytes);
    runs.clear();
    rle_sum_append(res, got, runs);
    merge_runs(out, runs);
  }
  return (long)out.size();
}

// Stream one bucket file into a hash table (batched-prefetch inserts
// for the pure (key,1) run segments are not worth it here: bucket files
// carry explicit counts after an enter_spill dump).
template <class KT>
long bucket_count_into(HandleT<KT>* h, int p, TableT<KT>* t) {
  FILE* f = h->spill_files[p];
  if (!f) return -1;
  fflush(f);
  rewind(f);
  std::vector<SpillRecT<KT>> buf(1 << 20);  // streaming window
  for (;;) {
    size_t got = fread(buf.data(), sizeof(SpillRecT<KT>), buf.size(), f);
    if (got == 0) break;
    for (size_t i = 0; i < got; ++i)
      if (!add_count(t, buf[i].key, buf[i].count)) return -1;
  }
  fclose(f);
  remove(h->spill_path(p).c_str());
  h->spill_files[p] = nullptr;
  return (long)t->size;
}

template <class KT>
long part_load(HandleT<KT>* h, int p) {
  if (!h || !h->spilling || p < 0 || p >= kPartitions) return -1;
  if constexpr (sizeof(KT) == 8) {
    if (phase2_sort_enabled()) {
      // spill streaming via sorted runs (all-distinct buckets pay one
      // radix pass instead of per-record hash inserts); the follow-up
      // part_export reads h->sorted[p]
      h->sorted[p].clear();
      long n = bucket_runs_into64(h, p, h->sorted[p]);
      if (n >= 0) h->use_sorted = true;
      return n;
    }
  }
  TableT<KT>& t = h->parts[p];
  t.destroy();
  t.init(1 << 12);
  return bucket_count_into(h, p, &t);
}

// Parallel spill finalize: T workers pull partitions, each loads its
// bucket into a PRIVATE table (<= T tables in flight, each ~1/64 of the
// distinct set — memory stays bounded), filters by min_count, sorts by
// key, and parks the result on the handle. Partitions are key ranges,
// so collecting them in order yields the globally sorted table.
// Returns the total kept record count, or -1 on error.
template <class KT>
long spill_finalize_all(HandleT<KT>* h, uint32_t min_count) {
  if (!h || !h->spilling) return -1;
  h->fin.assign(kPartitions, {});
  std::atomic<int> next{0};
  std::atomic<bool> bad{false};
  int T = h->threads;
  std::vector<std::thread> workers;
  for (int t = 0; t < T; ++t) {
    workers.emplace_back([&]() {
      // NOTE: a radix+merge finalize was measured here and REVERTED:
      // high-duplication buckets (the common count_kmers spill case)
      // finalize faster through the small L2-resident hash tables
      // (173-206 MB/s hash vs 149-164 radix on the 209 MB benchmark).
      // The radix path lives in part_load for the STREAMED export,
      // whose target workload is low-duplication (2.4x there).
      for (;;) {
        int p = next.fetch_add(1);
        if (p >= kPartitions) return;
        TableT<KT> tb;
        tb.init(1 << 12);
        if (bucket_count_into(h, p, &tb) < 0) {
          bad.store(true);
          tb.destroy();
          return;
        }
        auto& r = h->fin[p];
        r.reserve(tb.size);
        for (uint64_t i = 0; i < tb.cap; ++i)
          if (tb.slots[i].key && tb.slots[i].count >= min_count)
            r.push_back({tb.slots[i].key, tb.slots[i].count});
        tb.destroy();
        std::sort(r.begin(), r.end(),
                  [](const SpillRecT<KT>& a, const SpillRecT<KT>& b) {
                    return a.key < b.key;
                  });
      }
    });
  }
  for (auto& w : workers) w.join();
  if (bad.load()) return -1;
  long total = 0;
  for (auto& r : h->fin) total += (long)r.size();
  return total;
}

template <class KT>
long spill_collect(HandleT<KT>* h, uint64_t* out_keys, uint32_t* out_counts,
                   long max_out) {
  long w = 0;
  for (auto& r : h->fin) {
    for (auto& rec : r) {
      if (w >= max_out) break;
      put_key(out_keys, w, rec.key);
      out_counts[w] = rec.count;
      ++w;
    }
    r.clear();
    r.shrink_to_fit();
  }
  h->fin.clear();
  return w;
}

// Distinct keys currently held for one partition (either mode). For
// spill mode this is only meaningful after part_load.
template <class KT>
long part_size(HandleT<KT>* h, int p) {
  if (p < 0 || p >= kPartitions) return -1;
  if (h->use_sorted) return (long)h->sorted[p].size();
  return (long)h->parts[p].size;
}

template <class KT>
long part_export(HandleT<KT>* h, int p, uint64_t* out_keys,
                 uint32_t* out_counts, long max_out, uint32_t min_count) {
  if (h->use_sorted) {
    // sorted mode: the run vector is already key-sorted; filtered copy,
    // then FREE the partition — streamed exports walk partitions in
    // order with peak RAM of ~1/256 of the table
    long w = 0;
    for (auto& rec : h->sorted[p]) {
      if (w >= max_out) break;
      if (rec.count < min_count) continue;
      put_key(out_keys, w, rec.key);
      out_counts[w] = rec.count;
      ++w;
    }
    h->sorted[p].clear();
    h->sorted[p].shrink_to_fit();
    return w;
  }
  TableT<KT>& tb = h->parts[p];
  std::vector<SpillRecT<KT>> recs;
  recs.reserve(tb.size);
  for (uint64_t i = 0; i < tb.cap; ++i)
    if (tb.slots[i].key && tb.slots[i].count >= min_count)
      recs.push_back({tb.slots[i].key, tb.slots[i].count});
  std::sort(recs.begin(), recs.end(),
            [](const SpillRecT<KT>& a, const SpillRecT<KT>& b) {
              return a.key < b.key;
            });
  long w = 0;
  for (auto& rec : recs) {
    if (w >= max_out) break;
    put_key(out_keys, w, rec.key);
    out_counts[w] = rec.count;
    ++w;
  }
  tb.destroy();
  tb.init(1);
  return w;
}

template <class KT>
void handle_free(HandleT<KT>* h) {
  for (int p = 0; p < kPartitions; ++p) {
    h->parts[p].destroy();
    if (h->spill_files[p]) {
      fclose(h->spill_files[p]);
      remove(h->spill_path(p).c_str());
    }
  }
  delete h;
}

// --- C-ABI dispatch wrapper: one-word (k <= 32) or two-word (k <= 64) ---
struct AnyHandle {
  bool wide;
  HandleT<uint64_t>* h64 = nullptr;
  HandleT<u128>* h128 = nullptr;
};

}  // namespace

extern "C" {

void* jx_kmt_new(int k, int threads) {
  if (k < 1 || k > 64) return nullptr;
  AnyHandle* a = new AnyHandle();
  a->wide = k > 32;
  if (a->wide)
    a->h128 = make_handle<u128>(k, threads);
  else
    a->h64 = make_handle<uint64_t>(k, threads);
  return a;
}

// Budgeted constructor: mem_budget_bytes bounds the in-RAM tables; when
// the next chunk could cross it the handle converts to on-disk partition
// buckets under spill_dir (KMC-lite). spill_dir == NULL/"" -> no spill:
// the counter fails fast (jx_kmt_add returns 2) at 2x budget instead of
// swapping.
void* jx_kmt_new2(int k, int threads, long mem_budget_bytes,
                  const char* spill_dir) {
  AnyHandle* a = (AnyHandle*)jx_kmt_new(k, threads);
  if (!a) return nullptr;
  long b = mem_budget_bytes > 0 ? mem_budget_bytes : 0;
  std::string dir = (spill_dir && spill_dir[0]) ? spill_dir : "";
  if (a->wide) {
    a->h128->budget = b;
    a->h128->spill_dir = dir;
  } else {
    a->h64->budget = b;
    a->h64->spill_dir = dir;
    // the budgeted/spill path keeps the hash tables (its byte accounting
    // and bucket formats are table-based); sorted mode is the
    // unbudgeted RAM fast path
    if (b > 0 || !dir.empty()) a->h64->use_sorted = false;
  }
  return a;
}

int jx_kmt_wide(void* handle) { return ((AnyHandle*)handle)->wide ? 1 : 0; }

int jx_kmt_spilling(void* handle) {
  AnyHandle* a = (AnyHandle*)handle;
  return (a->wide ? a->h128->spilling : a->h64->spilling) ? 1 : 0;
}

int jx_kmt_add(void* handle, const char* buf, long len) {
  AnyHandle* a = (AnyHandle*)handle;
  return a->wide ? handle_add(a->h128, buf, len)
                 : handle_add(a->h64, buf, len);
}

long jx_kmt_size(void* handle) {
  AnyHandle* a = (AnyHandle*)handle;
  return a->wide ? handle_size(a->h128) : handle_size(a->h64);
}

long jx_kmt_export(void* handle, uint64_t* out_keys, uint32_t* out_counts,
                   long max_out, uint32_t min_count) {
  AnyHandle* a = (AnyHandle*)handle;
  return a->wide
             ? handle_export(a->h128, out_keys, out_counts, max_out, min_count)
             : handle_export(a->h64, out_keys, out_counts, max_out, min_count);
}

long jx_kmt_spill_finalize(void* handle, uint32_t min_count) {
  AnyHandle* a = (AnyHandle*)handle;
  return a->wide ? spill_finalize_all(a->h128, min_count)
                 : spill_finalize_all(a->h64, min_count);
}

long jx_kmt_spill_collect(void* handle, uint64_t* out_keys,
                          uint32_t* out_counts, long max_out) {
  AnyHandle* a = (AnyHandle*)handle;
  return a->wide ? spill_collect(a->h128, out_keys, out_counts, max_out)
                 : spill_collect(a->h64, out_keys, out_counts, max_out);
}

long jx_kmt_part_load(void* handle, int p) {
  AnyHandle* a = (AnyHandle*)handle;
  return a->wide ? part_load(a->h128, p) : part_load(a->h64, p);
}

long jx_kmt_part_size(void* handle, int p) {
  AnyHandle* a = (AnyHandle*)handle;
  return a->wide ? part_size(a->h128, p) : part_size(a->h64, p);
}

long jx_kmt_part_export(void* handle, int p, uint64_t* out_keys,
                        uint32_t* out_counts, long max_out,
                        uint32_t min_count) {
  AnyHandle* a = (AnyHandle*)handle;
  return a->wide
             ? part_export(a->h128, p, out_keys, out_counts, max_out,
                           min_count)
             : part_export(a->h64, p, out_keys, out_counts, max_out,
                           min_count);
}

void jx_kmt_free(void* handle) {
  AnyHandle* a = (AnyHandle*)handle;
  if (a->wide)
    handle_free(a->h128);
  else
    handle_free(a->h64);
  delete a;
}

// ---- legacy one-shot API (kept for compatibility) ----

void* jx_kmer_count(const char* buf, long len, int k) {
  void* h = jx_kmt_new(k, 0);
  if (!h) return nullptr;
  if (jx_kmt_add(h, buf, len) != 0) {
    jx_kmt_free(h);
    return nullptr;
  }
  return h;
}

long jx_kmer_table_size(void* table) { return jx_kmt_size(table); }

long jx_kmer_export(void* table, uint64_t* out_keys, uint32_t* out_counts,
                    long max_out, uint32_t min_count) {
  return jx_kmt_export(table, out_keys, out_counts, max_out, min_count);
}

void jx_kmer_free(void* table) { jx_kmt_free(table); }

}  // extern "C"

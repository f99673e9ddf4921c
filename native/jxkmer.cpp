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
//     partition) buffers (sequential writes, no locks) — P=64
//     partitions routed by hash top bits;
//   - parallel partition counting: T workers pull partition indices
//     from an atomic counter and hash-count that partition's buffers
//     into the persistent handle table. Each partition table is ~1/64
//     of the distinct-kmer set, so inserts hit cache instead of DRAM,
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
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kPartitions = 64;

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

template <class KT>
struct TableT {
  KT* keys = nullptr;  // k-mer code + 1 (0 = empty)
  uint32_t* counts = nullptr;
  uint64_t cap = 0;  // power of two
  uint64_t size = 0;

  static constexpr long slot_bytes = (long)sizeof(KT) + 4;

  void init(uint64_t c) {
    cap = c;
    size = 0;
    keys = (KT*)calloc(cap, sizeof(KT));
    counts = (uint32_t*)calloc(cap, sizeof(uint32_t));
  }
  void destroy() {
    free(keys);
    free(counts);
    keys = nullptr;
    counts = nullptr;
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
  KT* nk = (KT*)calloc(ncap, sizeof(KT));
  uint32_t* nc = (uint32_t*)calloc(ncap, sizeof(uint32_t));
  if (!nk || !nc) return false;
  for (uint64_t i = 0; i < t->cap; ++i) {
    if (!t->keys[i]) continue;
    uint64_t h = hash_of(t->keys[i]) & (ncap - 1);
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

template <class KT>
inline bool add_count(TableT<KT>* t, KT key, uint32_t add,
                      std::atomic<long>* bytes = nullptr, long cap = 0) {
  if ((t->size + 1) * 10 > t->cap * 7) {
    if (!grow(t, bytes, cap)) return false;
  }
  uint64_t h = hash_of(key) & (t->cap - 1);
  while (t->keys[h]) {
    if (t->keys[h] == key) {
      t->counts[h] += add;
      return true;
    }
    h = (h + 1) & (t->cap - 1);
  }
  t->keys[h] = key;
  t->counts[h] = add;
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
  TableT<KT> parts[kPartitions];
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
};

template <class KT>
inline int partition_of(KT key) {
  return (int)(hash_of(key) >> 58) & (kPartitions - 1);
}

template <class KT>
bool spill_append(FILE* f, const KT* keys, const uint32_t* counts, size_t n) {
  std::vector<SpillRecT<KT>> recs(n);
  for (size_t i = 0; i < n; ++i)
    recs[i] = {keys[i], counts ? counts[i] : 1u};
  return fwrite(recs.data(), sizeof(SpillRecT<KT>), n, f) == n;
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
      if (t.keys[i]) recs.push_back({t.keys[i], t.counts[i]});
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
template <class KT>
inline bool count_seq(const char* buf, long s, long e, int k, KT mask,
                      std::vector<KT>* out) {
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
      out[partition_of<KT>(canon + 1)].push_back(canon + 1);
    }
  }
  return true;
}

inline long line_end(const char* buf, long i, long len) {
  while (i < len && buf[i] != '\n') ++i;
  return i;
}

// Parse records in [s, e): FASTA (multi-line seq) or FASTQ (4-line).
template <class KT>
bool count_range(const char* buf, long s, long e, int k,
                 std::vector<KT>* parts) {
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
      if (!count_seq(buf, seq_start, i < e ? i : e, k, mask, parts))
        return false;
    } else if (c0 == '@') {
      i = line_end(buf, i, e) + 1;  // header
      long seq_s = i;
      long seq_e = line_end(buf, i, e);
      if (!count_seq(buf, seq_s, seq_e, k, mask, parts)) return false;
      i = line_end(buf, seq_e + 1, e) + 1;  // skip '+' line
      i = line_end(buf, i, e) + 1;          // skip quality line
    } else {
      // bare sequence text (no headers): treat the stretch as FASTA body
      long seq_start = i;
      while (i < e && buf[i] != '>' && buf[i] != '@')
        i = line_end(buf, i, e) + 1;
      if (!count_seq(buf, seq_start, i < e ? i : e, k, mask, parts))
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

template <class KT>
HandleT<KT>* make_handle(int k, int threads) {
  HandleT<KT>* h = new HandleT<KT>();
  h->k = k;
  int hw = (int)std::thread::hardware_concurrency();
  if (threads <= 0) threads = hw > 0 ? hw : 4;
  if (threads > 32) threads = 32;
  h->threads = threads;
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

  // phase 1: threads append canonical codes into per-(thread, partition)
  // buffers — sequential writes, no locks
  std::vector<std::vector<std::vector<KT>>> local(T);
  std::atomic<bool> ok{true};
  std::vector<std::thread> workers;
  for (int t = 0; t < T; ++t) {
    workers.emplace_back([&, t]() {
      local[t].resize(kPartitions);
      long span = split[t + 1] - split[t];
      if (span <= 0) return;
      for (int p = 0; p < kPartitions; ++p)
        local[t][p].reserve((size_t)(span / kPartitions + 16));
      if (!count_range<KT>(buf, split[t], split[t + 1], k, local[t].data()))
        ok.store(false);
    });
  }
  for (auto& w : workers) w.join();
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

  // phase 2: T workers hash-count whole partitions (disjoint -> lock-
  // free). One hash insert per occurrence; total hash work equals the
  // k-mer count once — a naive per-thread-table merge would re-count the
  // distinct set up to T times on high-duplication data. (A sort-then-
  // run-collapse variant was measured slower on both high- and low-
  // duplication inputs: the sort's sequential bandwidth costs more than
  // the duplicate inserts it saves.)
  std::atomic<int> next{0};
  std::atomic<bool> oom{false};
  workers.clear();
  std::atomic<long>* bytes = h->budget > 0 ? &h->table_bytes : nullptr;
  long cap = h->hard_cap();
  for (int t = 0; t < T; ++t) {
    workers.emplace_back([&]() {
      for (;;) {
        int p = next.fetch_add(1);
        if (p >= kPartitions) return;
        TableT<KT>* dst = &h->parts[p];
        for (KT key : local[0][p])
          if (!add_count(dst, key, 1u, bytes, cap)) {
            oom.store(true);
            return;
          }
        for (int s = 1; s < T; ++s)
          for (KT key : local[s][p])
            if (!add_count(dst, key, 1u, bytes, cap)) {
              oom.store(true);
              return;
            }
      }
    });
  }
  for (auto& w : workers) w.join();
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
    if (t.keys[i] && t.counts[i] >= min_count) {
      put_key(out_keys, w, t.keys[i]);
      out_counts[w] = t.counts[i];
      ++w;
    }
  }
  return w;
}

template <class KT>
long handle_export(HandleT<KT>* h, uint64_t* out_keys, uint32_t* out_counts,
                   long max_out, uint32_t min_count) {
  long w = 0;
  for (int p = 0; p < kPartitions && w < max_out; ++p)
    w = table_export(h->parts[p], out_keys, out_counts, w, max_out,
                     min_count);
  return w;
}

template <class KT>
long part_load(HandleT<KT>* h, int p) {
  if (!h || !h->spilling || p < 0 || p >= kPartitions) return -1;
  FILE* f = h->spill_files[p];
  if (!f) return -1;
  fflush(f);
  rewind(f);
  TableT<KT>& t = h->parts[p];
  t.destroy();
  t.init(1 << 12);
  std::vector<SpillRecT<KT>> buf(1 << 20);  // streaming window
  for (;;) {
    size_t got = fread(buf.data(), sizeof(SpillRecT<KT>), buf.size(), f);
    if (got == 0) break;
    for (size_t i = 0; i < got; ++i)
      if (!add_count(&t, buf[i].key, buf[i].count)) return -1;
  }
  fclose(f);
  remove(h->spill_path(p).c_str());
  h->spill_files[p] = nullptr;
  return (long)t.size;
}

template <class KT>
long part_export(HandleT<KT>* h, int p, uint64_t* out_keys,
                 uint32_t* out_counts, long max_out, uint32_t min_count) {
  long w = table_export(h->parts[p], out_keys, out_counts, 0L, max_out,
                        min_count);
  h->parts[p].destroy();
  h->parts[p].init(1);
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

long jx_kmt_part_load(void* handle, int p) {
  AnyHandle* a = (AnyHandle*)handle;
  return a->wide ? part_load(a->h128, p) : part_load(a->h64, p);
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

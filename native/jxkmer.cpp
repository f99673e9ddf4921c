// janusx-tpu native k-mer counter.
//
// Replaces the capability of the reference's vendored KMC3 pipeline
// (/root/reference/src/kmer/ + vendored KMC C++ ~38k LoC): canonical
// k-mer counting from FASTA/FASTQ text for k <= 32, 2-bit encoded in
// open-addressing hash tables.
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
//     reset dropped k-mers spanning wraps).
//
//   - KMC-lite spill (memory budget): jx_kmt_new2 takes a byte budget
//     and a spill directory. When the in-RAM tables cross the budget,
//     the handle converts to spill mode: tables are dumped to
//     per-partition bucket files as (key, count) records and later
//     chunks append their phase-1 codes directly to the buckets.
//     Finalization then counts ONE partition at a time (each ~1/64 of
//     the distinct set), so inputs whose k-mer table exceeds RAM still
//     complete in bounded memory — the capability class of KMC's
//     external-memory partitioning without its internals. A hard cap at
//     2x budget inside grow() fails FAST with a clean error instead of
//     swapping to DRAM death when no spill dir was given.
//
// Plain C ABI for ctypes.

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

struct Table {
  uint64_t* keys = nullptr;  // k-mer code + 1 (0 = empty)
  uint32_t* counts = nullptr;
  uint64_t cap = 0;  // power of two
  uint64_t size = 0;

  void init(uint64_t c) {
    cap = c;
    size = 0;
    keys = (uint64_t*)calloc(cap, sizeof(uint64_t));
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

inline uint64_t hash64(uint64_t x) {
  x ^= x >> 33;
  x *= 0xff51afd7ed558ccdULL;
  x ^= x >> 33;
  x *= 0xc4ceb9fe1a85ec53ULL;
  x ^= x >> 33;
  return x;
}

bool grow(Table* t, std::atomic<long>* bytes = nullptr, long hard_cap = 0) {
  uint64_t ncap = t->cap << 1;
  if (bytes) {
    long delta = (long)(ncap - t->cap) * 12;
    long now = bytes->fetch_add(delta) + delta;
    if (hard_cap > 0 && now > hard_cap) {
      bytes->fetch_add(-delta);
      return false;  // budget breach: caller converts to spill or errors
    }
  }
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

inline bool add_count(Table* t, uint64_t key, uint32_t add,
                      std::atomic<long>* bytes = nullptr, long cap = 0) {
  if ((t->size + 1) * 10 > t->cap * 7) {
    if (!grow(t, bytes, cap)) return false;
  }
  uint64_t h = hash64(key) & (t->cap - 1);
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

struct Handle {
  int k;
  int threads;
  Table parts[kPartitions];
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

// (key, count) spill record — 12 bytes packed
#pragma pack(push, 1)
struct SpillRec {
  uint64_t key;
  uint32_t count;
};
#pragma pack(pop)

bool spill_append(FILE* f, const uint64_t* keys, const uint32_t* counts,
                  size_t n) {
  std::vector<SpillRec> recs(n);
  for (size_t i = 0; i < n; ++i) recs[i] = {keys[i], counts ? counts[i] : 1u};
  return fwrite(recs.data(), sizeof(SpillRec), n, f) == n;
}

// Convert the handle to spill mode: dump every partition table to its
// bucket file and free the RAM.
bool enter_spill(Handle* h) {
  for (int p = 0; p < kPartitions; ++p) {
    FILE* f = fopen(h->spill_path(p).c_str(), "wb+");
    if (!f) return false;
    h->spill_files[p] = f;
    Table& t = h->parts[p];
    std::vector<SpillRec> recs;
    recs.reserve(t.size);
    for (uint64_t i = 0; i < t.cap; ++i)
      if (t.keys[i]) recs.push_back({t.keys[i], t.counts[i]});
    if (!recs.empty() &&
        fwrite(recs.data(), sizeof(SpillRec), recs.size(), f) != recs.size())
      return false;
    t.destroy();
  }
  h->table_bytes.store(0);
  h->spilling = true;
  return true;
}

inline int partition_of(uint64_t key) {
  return (int)(hash64(key) >> 58) & (kPartitions - 1);
}

// Emit canonical k-mer codes of one sequence stretch [s, e) into the
// per-partition append buffers; rolling state carries across newlines.
inline bool count_seq(const char* buf, long s, long e, int k, uint64_t mask,
                      std::vector<uint64_t>* out) {
  uint64_t fwd = 0, rev = 0;
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
    fwd = ((fwd << 2) | (uint64_t)b) & mask;
    rev = (rev >> 2) | (((uint64_t)(3 - b)) << (2 * (k - 1)));
    if (++have >= k) {
      uint64_t canon = fwd < rev ? fwd : rev;
      out[partition_of(canon + 1)].push_back(canon + 1);
    }
  }
  return true;
}

inline long line_end(const char* buf, long i, long len) {
  while (i < len && buf[i] != '\n') ++i;
  return i;
}

// Parse records in [s, e): FASTA (multi-line seq) or FASTQ (4-line).
bool count_range(const char* buf, long s, long e, int k,
                 std::vector<uint64_t>* parts) {
  const uint64_t mask = (k == 32) ? ~0ULL : ((1ULL << (2 * k)) - 1);
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

}  // namespace

extern "C" {

void* jx_kmt_new(int k, int threads) {
  if (k < 1 || k > 32) return nullptr;
  Handle* h = new Handle();
  h->k = k;
  int hw = (int)std::thread::hardware_concurrency();
  if (threads <= 0) threads = hw > 0 ? hw : 4;
  if (threads > 32) threads = 32;
  h->threads = threads;
  for (int p = 0; p < kPartitions; ++p) h->parts[p].init(1 << 10);
  h->table_bytes.store((long)kPartitions * (1 << 10) * 12);
  return h;
}

// Budgeted constructor: mem_budget_bytes bounds the in-RAM tables; when
// the next chunk could cross it the handle converts to on-disk partition
// buckets under spill_dir (KMC-lite). spill_dir == NULL/"" -> no spill:
// the counter fails fast (jx_kmt_add returns 2) at 2x budget instead of
// swapping.
void* jx_kmt_new2(int k, int threads, long mem_budget_bytes,
                  const char* spill_dir) {
  Handle* h = (Handle*)jx_kmt_new(k, threads);
  if (!h) return nullptr;
  h->budget = mem_budget_bytes > 0 ? mem_budget_bytes : 0;
  if (spill_dir && spill_dir[0]) h->spill_dir = spill_dir;
  return h;
}

int jx_kmt_spilling(void* handle) {
  return ((Handle*)handle)->spilling ? 1 : 0;
}

// Feed one buffer of whole records. Thread-splits at record boundaries,
// counts into thread-local partition tables, merges partitions in
// parallel into the persistent handle tables. Returns 0 on success.
int jx_kmt_add(void* handle, const char* buf, long len) {
  Handle* h = (Handle*)handle;
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
  std::vector<std::vector<std::vector<uint64_t>>> local(T);
  std::atomic<bool> ok{true};
  std::vector<std::thread> workers;
  for (int t = 0; t < T; ++t) {
    workers.emplace_back([&, t]() {
      local[t].resize(kPartitions);
      long span = split[t + 1] - split[t];
      if (span <= 0) return;
      for (int p = 0; p < kPartitions; ++p)
        local[t][p].reserve((size_t)(span / kPartitions + 16));
      if (!count_range(buf, split[t], split[t + 1], k, local[t].data()))
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
    if (h->table_bytes.load() + incoming * 18 > h->budget &&
        !h->spill_dir.empty()) {
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
                !spill_append(h->spill_files[p], v.data(), nullptr, v.size()))
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
        Table* dst = &h->parts[p];
        for (int s = 0; s < T; ++s)
          for (uint64_t key : local[s][p])
            if (!add_count(dst, key, 1, bytes, cap)) {
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

// ---- spilled-mode finalization: count one partition at a time ----

// Load bucket p: stream its (key, count) records through a fresh hash
// table (bounded by that partition's DISTINCT set, ~1/64 of the total).
// Returns the distinct count, or -1 on error.
long jx_kmt_part_load(void* handle, int p) {
  Handle* h = (Handle*)handle;
  if (!h || !h->spilling || p < 0 || p >= kPartitions) return -1;
  FILE* f = h->spill_files[p];
  if (!f) return -1;
  fflush(f);
  rewind(f);
  Table& t = h->parts[p];
  t.destroy();
  t.init(1 << 12);
  std::vector<SpillRec> buf(1 << 20);  // 12 MB streaming window
  for (;;) {
    size_t got = fread(buf.data(), sizeof(SpillRec), buf.size(), f);
    if (got == 0) break;
    for (size_t i = 0; i < got; ++i)
      if (!add_count(&t, buf[i].key, buf[i].count)) return -1;
  }
  fclose(f);
  remove(h->spill_path(p).c_str());
  h->spill_files[p] = nullptr;
  return (long)t.size;
}

// Export + free one loaded partition (spilled-mode finalization).
long jx_kmt_part_export(void* handle, int p, uint64_t* out_keys,
                        uint32_t* out_counts, long max_out,
                        uint32_t min_count) {
  Handle* h = (Handle*)handle;
  Table& t = h->parts[p];
  long w = 0;
  for (uint64_t i = 0; i < t.cap && w < max_out; ++i) {
    if (t.keys[i] && t.counts[i] >= min_count) {
      out_keys[w] = t.keys[i] - 1;
      out_counts[w] = t.counts[i];
      ++w;
    }
  }
  t.destroy();
  t.init(1);
  return w;
}

long jx_kmt_size(void* handle) {
  Handle* h = (Handle*)handle;
  long n = 0;
  for (int p = 0; p < kPartitions; ++p) n += (long)h->parts[p].size;
  return n;
}

long jx_kmt_export(void* handle, uint64_t* out_keys, uint32_t* out_counts,
                   long max_out, uint32_t min_count) {
  Handle* h = (Handle*)handle;
  long w = 0;
  for (int p = 0; p < kPartitions && w < max_out; ++p) {
    Table& t = h->parts[p];
    for (uint64_t i = 0; i < t.cap && w < max_out; ++i) {
      if (t.keys[i] && t.counts[i] >= min_count) {
        out_keys[w] = t.keys[i] - 1;
        out_counts[w] = t.counts[i];
        ++w;
      }
    }
  }
  return w;
}

void jx_kmt_free(void* handle) {
  Handle* h = (Handle*)handle;
  for (int p = 0; p < kPartitions; ++p) {
    h->parts[p].destroy();
    if (h->spill_files[p]) {
      fclose(h->spill_files[p]);
      remove(h->spill_path(p).c_str());
    }
  }
  delete h;
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

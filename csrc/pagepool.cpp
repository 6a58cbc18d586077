// Native page-pool runtime for quest-tpu.
//
// Reference counterparts: the Python KvPool free-set allocator
// (/root/reference/quest/utils/kv_cache.py:7-62) and the per-step
// host-side index building in InferenceController.begin_forward
// (/root/reference/quest/utils/controller.py:80-129), which the
// reference re-runs in Python for every decoded token. Here the pool
// and the batch page-table assembly are native: O(1) page alloc/free
// per sequence and one C call per engine step that fills the device-
// bound int32 page-table/seq-len arrays for a whole continuous batch.
//
// Pure host-side bookkeeping; the device never sees this code — it
// consumes the int32 arrays via scalar-prefetch in the Pallas kernels.
//
// Build: make -C csrc   (produces libquestpool.so; ctypes-loaded by
// quest_tpu/kv/pool.py with a pure-Python fallback).

#include <cstdint>
#include <cstring>
#include <mutex>
#include <unordered_map>
#include <vector>

namespace {

struct Sequence {
  std::vector<int32_t> pages;  // physical page ids, logical order
  int64_t len = 0;             // tokens stored
  bool live = false;
};

struct Pool {
  int64_t total_pages;
  int64_t page_size;
  std::vector<int32_t> free_list;  // LIFO, like the reference free-set
  std::vector<int32_t> refs;       // per-page refcount (prefix sharing)
  std::vector<Sequence> seqs;
  std::vector<int32_t> free_seq_ids;
  std::mutex mu;
};

std::mutex g_mu;
std::unordered_map<int64_t, Pool*> g_pools;
int64_t g_next_handle = 1;

Pool* get(int64_t h) {
  std::lock_guard<std::mutex> l(g_mu);
  auto it = g_pools.find(h);
  return it == g_pools.end() ? nullptr : it->second;
}

}  // namespace

extern "C" {

int64_t qp_create(int64_t total_pages, int64_t page_size, int64_t max_seqs) {
  if (total_pages <= 0 || page_size <= 0 || max_seqs <= 0) return -1;
  Pool* p = new Pool();
  p->total_pages = total_pages;
  p->page_size = page_size;
  p->free_list.reserve(total_pages);
  p->refs.assign(total_pages, 0);
  // LIFO: push descending so low page ids are handed out first
  for (int64_t i = total_pages - 1; i >= 0; --i)
    p->free_list.push_back(static_cast<int32_t>(i));
  p->seqs.resize(max_seqs);
  p->free_seq_ids.reserve(max_seqs);
  for (int64_t i = max_seqs - 1; i >= 0; --i)
    p->free_seq_ids.push_back(static_cast<int32_t>(i));
  std::lock_guard<std::mutex> l(g_mu);
  int64_t h = g_next_handle++;
  g_pools[h] = p;
  return h;
}

void qp_destroy(int64_t h) {
  std::lock_guard<std::mutex> l(g_mu);
  auto it = g_pools.find(h);
  if (it != g_pools.end()) {
    delete it->second;
    g_pools.erase(it);
  }
}

int64_t qp_free_pages(int64_t h) {
  Pool* p = get(h);
  if (!p) return -1;
  std::lock_guard<std::mutex> l(p->mu);
  return static_cast<int64_t>(p->free_list.size());
}

// Create a sequence; returns seq_id or -1 if at capacity.
int32_t qp_seq_create(int64_t h) {
  Pool* p = get(h);
  if (!p) return -1;
  std::lock_guard<std::mutex> l(p->mu);
  if (p->free_seq_ids.empty()) return -1;
  int32_t id = p->free_seq_ids.back();
  p->free_seq_ids.pop_back();
  Sequence& s = p->seqs[id];
  s.pages.clear();
  s.len = 0;
  s.live = true;
  return id;
}

// Release a sequence's pages back to the pool (KvCache.release :128).
int32_t qp_seq_release(int64_t h, int32_t seq_id) {
  Pool* p = get(h);
  if (!p) return -1;
  std::lock_guard<std::mutex> l(p->mu);
  if (seq_id < 0 || seq_id >= (int32_t)p->seqs.size() ||
      !p->seqs[seq_id].live)
    return -1;
  Sequence& s = p->seqs[seq_id];
  // Pages are refcounted (prefix sharing, qp_pages_retain): only pages
  // reaching zero return to the free list.
  for (int32_t pg : s.pages)
    if (--p->refs[pg] == 0) p->free_list.push_back(pg);
  s.pages.clear();
  s.len = 0;
  s.live = false;
  p->free_seq_ids.push_back(seq_id);
  return 0;
}

// Increment the refcount of owned (ref > 0) pages — a shared-prefix
// hold that outlives the owning sequence. Validates first; on any
// invalid page nothing is modified. Returns 0 / -1.
int32_t qp_pages_retain(int64_t h, const int32_t* pages, int64_t n) {
  Pool* p = get(h);
  if (!p) return -1;
  std::lock_guard<std::mutex> l(p->mu);
  for (int64_t i = 0; i < n; ++i) {
    int32_t pg = pages[i];
    if (pg < 0 || pg >= p->total_pages || p->refs[pg] <= 0) return -1;
  }
  for (int64_t i = 0; i < n; ++i) ++p->refs[pages[i]];
  return 0;
}

// Drop a hold taken with qp_pages_retain (or inherited from a released
// sequence); pages reaching zero return to the free list.
int32_t qp_pages_release(int64_t h, const int32_t* pages, int64_t n) {
  Pool* p = get(h);
  if (!p) return -1;
  std::lock_guard<std::mutex> l(p->mu);
  for (int64_t i = 0; i < n; ++i) {
    int32_t pg = pages[i];
    if (pg < 0 || pg >= p->total_pages || p->refs[pg] <= 0) return -1;
  }
  for (int64_t i = 0; i < n; ++i)
    if (--p->refs[pages[i]] == 0) p->free_list.push_back(pages[i]);
  return 0;
}

// Extend a sequence by n_tokens, allocating pages on demand
// (KvCache.append_seq :115). Returns the number of NEW pages, or -1 on
// pool exhaustion (nothing is allocated in that case).
int64_t qp_seq_extend(int64_t h, int32_t seq_id, int64_t n_tokens) {
  Pool* p = get(h);
  if (!p) return -1;
  std::lock_guard<std::mutex> l(p->mu);
  if (seq_id < 0 || seq_id >= (int32_t)p->seqs.size() ||
      !p->seqs[seq_id].live || n_tokens < 0)
    return -1;
  Sequence& s = p->seqs[seq_id];
  int64_t new_len = s.len + n_tokens;
  int64_t need = (new_len + p->page_size - 1) / p->page_size -
                 static_cast<int64_t>(s.pages.size());
  if (need > static_cast<int64_t>(p->free_list.size())) return -1;
  for (int64_t i = 0; i < need; ++i) {
    int32_t pg = p->free_list.back();
    p->free_list.pop_back();
    p->refs[pg] = 1;
    s.pages.push_back(pg);
  }
  s.len = new_len;
  return need;
}

int64_t qp_seq_len(int64_t h, int32_t seq_id) {
  Pool* p = get(h);
  if (!p) return -1;
  std::lock_guard<std::mutex> l(p->mu);
  if (seq_id < 0 || seq_id >= (int32_t)p->seqs.size() ||
      !p->seqs[seq_id].live)
    return -1;
  return p->seqs[seq_id].len;
}

int64_t qp_seq_num_pages(int64_t h, int32_t seq_id) {
  Pool* p = get(h);
  if (!p) return -1;
  std::lock_guard<std::mutex> l(p->mu);
  if (seq_id < 0 || seq_id >= (int32_t)p->seqs.size() ||
      !p->seqs[seq_id].live)
    return -1;
  return static_cast<int64_t>(p->seqs[seq_id].pages.size());
}

// Fill the batched page tables + lengths for one engine step.
// out_tables: [n, table_width] int32 (row-major), padded with pad_page.
// out_lens:   [n] int32 sequence lengths.
// Returns 0, or -1 on any invalid seq id / overflow.
int32_t qp_fill_batch_tables(int64_t h, const int32_t* seq_ids, int64_t n,
                             int64_t table_width, int32_t pad_page,
                             int32_t* out_tables, int32_t* out_lens) {
  Pool* p = get(h);
  if (!p) return -1;
  std::lock_guard<std::mutex> l(p->mu);
  for (int64_t i = 0; i < n; ++i) {
    int32_t id = seq_ids[i];
    if (id < 0 || id >= (int32_t)p->seqs.size() || !p->seqs[id].live)
      return -1;
    const Sequence& s = p->seqs[id];
    if ((int64_t)s.pages.size() > table_width) return -1;
    int32_t* row = out_tables + i * table_width;
    std::memcpy(row, s.pages.data(), s.pages.size() * sizeof(int32_t));
    for (int64_t j = (int64_t)s.pages.size(); j < table_width; ++j)
      row[j] = pad_page;
    out_lens[i] = static_cast<int32_t>(s.len);
  }
  return 0;
}

}  // extern "C"

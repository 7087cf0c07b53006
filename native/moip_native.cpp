// Native runtime components for moip_aira_tpu.
//
// The reference implementation's runtime is all C++ (SURVEY §2); the rebuilt
// framework keeps its hot host-side paths native too:
//
//  * the Pareto/relaxation store (reference src/solutions.{h,cpp}) — the
//    dominance scan `find` runs before every CLMOIP solve (aira.cpp:816-823)
//    and is the host's hottest loop,
//  * the branch-and-bound node pool behind the wave backend — pop/push of
//    (lo, hi) bound vectors for thousands of nodes per second.
//
// Exposed as a plain C ABI consumed through ctypes (no pybind11 dependency).
// Build: make -C native          (produces libmoip_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Solutions store
// ---------------------------------------------------------------------------

// Dominance-antichain query index — the exact twin of core/store.py's
// _DomIndex.  Keys are sign-folded so every relation is componentwise >=;
// `add` drops dominated keys both ways (a dominated key can never be the
// only answer); with 2-dim keys the antichain is a staircase kept sorted
// ascending by key0 (key1 then strictly descending => binary search).
struct DomIndex {
  int dim = 0;
  std::vector<double> keys;   // size n*dim
  std::vector<int64_t> rows;  // payload: raw store row ids
  int64_t size() const { return static_cast<int64_t>(rows.size()); }

  static bool geq(const double* a, const double* b, int d) {
    for (int j = 0; j < d; ++j)
      if (a[j] < b[j]) return false;
    return true;
  }

  void add(const double* key, int64_t row) {
    const int64_t n = size();
    for (int64_t i = 0; i < n; ++i)
      if (geq(&keys[i * dim], key, dim)) return;  // dominated / duplicate
    // drop stored keys the new key dominates (order-preserving compaction,
    // same as the NumPy boolean-mask compaction)
    int64_t w = 0;
    for (int64_t i = 0; i < n; ++i) {
      if (geq(key, &keys[i * dim], dim)) continue;
      if (w != i) {
        std::memcpy(&keys[w * dim], &keys[i * dim], sizeof(double) * dim);
        rows[w] = rows[i];
      }
      ++w;
    }
    keys.resize(w * dim);
    rows.resize(w);
    if (dim == 2) {
      // staircase insert position: first i with keys[i*2] >= key[0]
      int64_t i = 0;
      while (i < w && keys[i * 2] < key[0]) ++i;
      keys.insert(keys.begin() + i * 2, key, key + 2);
      rows.insert(rows.begin() + i, row);
    } else {
      keys.insert(keys.end(), key, key + dim);
      rows.push_back(row);
    }
  }

  int64_t covers(const double* q) const {
    const int64_t n = size();
    if (n == 0) return -1;
    if (dim == 2) {
      // binary search: first i with keys[i*2] >= q[0]; its key1 is the
      // max over the eligible suffix (antichain staircase)
      int64_t lo = 0, hi = n;
      while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (keys[mid * 2] < q[0]) lo = mid + 1; else hi = mid;
      }
      if (lo < n && keys[lo * 2 + 1] >= q[1]) return rows[lo];
      return -1;
    }
    for (int64_t i = 0; i < n; ++i)
      if (geq(&keys[i * dim], q, dim)) return rows[i];
    return -1;
  }
};

struct Store {
  int k = 0;
  // structure-of-arrays mirror of the reference's std::list<Result*>
  std::vector<double> ips;        // size n*k
  std::vector<int64_t> results;   // size n*k (zeros for infeasible)
  std::vector<uint8_t> infeas;    // size n
  int64_t n = 0;
  // lazy query index (sense learned at the first find; twin of store.py)
  bool sense_known = false;
  bool sense_min = true;
  int64_t idx_built = 0;
  DomIndex idx_inf;   // k-dim keys: fold * ip           (infeasible rows)
  DomIndex idx_feas;  // 2k-dim keys: (fold*ip, -fold*res) (feasible rows)
};

static void store_index_row(Store* s, int64_t i) {
  const int k = s->k;
  const double f = s->sense_min ? 1.0 : -1.0;
  std::vector<double> key(2 * k);
  for (int j = 0; j < k; ++j) key[j] = f * s->ips[i * k + j];
  if (s->infeas[i]) {
    s->idx_inf.add(key.data(), i);
  } else {
    for (int j = 0; j < k; ++j)
      key[k + j] = -f * static_cast<double>(s->results[i * k + j]);
    s->idx_feas.add(key.data(), i);
  }
}

static void store_ensure_index(Store* s, bool sense_min) {
  if (!s->sense_known || s->sense_min != sense_min) {
    s->sense_known = true;
    s->sense_min = sense_min;
    s->idx_inf = DomIndex();
    s->idx_inf.dim = s->k;
    s->idx_feas = DomIndex();
    s->idx_feas.dim = 2 * s->k;
    s->idx_built = 0;
  }
  while (s->idx_built < s->n) {
    store_index_row(s, s->idx_built);
    s->idx_built++;
  }
}

void* moip_store_create(int objcnt) {
  Store* s = new Store();
  s->k = objcnt;
  return s;
}

void moip_store_destroy(void* h) { delete static_cast<Store*>(h); }

int64_t moip_store_size(void* h) { return static_cast<Store*>(h)->n; }

void moip_store_insert(void* h, const double* ip, const int64_t* result,
                       int infeasible) {
  Store* s = static_cast<Store*>(h);
  s->ips.insert(s->ips.end(), ip, ip + s->k);
  if (infeasible) {
    s->results.insert(s->results.end(), s->k, 0);
  } else {
    s->results.insert(s->results.end(), result, result + s->k);
  }
  s->infeas.push_back(infeasible ? 1 : 0);
  s->n++;
  if (s->sense_known && s->idx_built == s->n - 1) {
    store_index_row(s, s->n - 1);
    s->idx_built = s->n;
  }
}

// Relaxation find (reference solutions.cpp:17-47).  sense_min != 0 for MIN.
// Answers through the dominance-antichain index (infeasible keys first,
// exactly as the NumPy twin).  Returns the answering raw row or -1; on a
// hit copies the stored result and sets *out_infeasible.
int64_t moip_store_find(void* h, const double* q, int sense_min,
                        int64_t* out_result, int* out_infeasible) {
  Store* s = static_cast<Store*>(h);
  const int k = s->k;
  if (s->n == 0) return -1;
  store_ensure_index(s, sense_min != 0);
  const double f = sense_min ? 1.0 : -1.0;
  std::vector<double> qf(2 * k);
  for (int j = 0; j < k; ++j) {
    qf[j] = f * q[j];
    qf[k + j] = -f * q[j];
  }
  int64_t i = s->idx_inf.covers(qf.data());
  if (i >= 0) {
    *out_infeasible = 1;
    return i;
  }
  i = s->idx_feas.covers(qf.data());
  if (i >= 0) {
    std::memcpy(out_result, &s->results[i * k], sizeof(int64_t) * k);
    *out_infeasible = 0;
    return i;
  }
  return -1;
}

// Batched find: nq queries at once; hits/infeas/results are caller buffers.
void moip_store_find_batch(void* h, const double* qs, int64_t nq,
                           int sense_min, uint8_t* hit, uint8_t* infeas,
                           int64_t* results) {
  Store* s = static_cast<Store*>(h);
  const int k = s->k;
  for (int64_t b = 0; b < nq; ++b) {
    int out_inf = 0;
    int64_t idx =
        moip_store_find(h, qs + b * k, sense_min, results + b * k, &out_inf);
    hit[b] = idx >= 0 ? 1 : 0;
    infeas[b] = static_cast<uint8_t>(out_inf);
    (void)s;
  }
}

void moip_store_merge(void* h, void* other_h) {
  Store* s = static_cast<Store*>(h);
  Store* o = static_cast<Store*>(other_h);
  s->ips.insert(s->ips.end(), o->ips.begin(), o->ips.end());
  s->results.insert(s->results.end(), o->results.begin(), o->results.end());
  s->infeas.insert(s->infeas.end(), o->infeas.begin(), o->infeas.end());
  s->n += o->n;
  o->ips.clear();
  o->results.clear();
  o->infeas.clear();
  o->n = 0;
  // the drained donor's index must not outlive its raw rows; the target's
  // index absorbs the new rows lazily at its next find
  o->sense_known = false;
  o->idx_built = 0;
  o->idx_inf = DomIndex();
  o->idx_feas = DomIndex();
}

// Feasible points, descending-lexicographic, deduplicated (reference
// solutions.h:54-57 + result.cpp:9-46).  Returns the number of rows written.
int64_t moip_store_sorted_unique(void* h, int64_t* out, int64_t max_rows) {
  Store* s = static_cast<Store*>(h);
  const int k = s->k;
  std::vector<const int64_t*> rows;
  rows.reserve(s->n);
  for (int64_t i = 0; i < s->n; ++i) {
    if (!s->infeas[i]) rows.push_back(&s->results[i * k]);
  }
  std::sort(rows.begin(), rows.end(),
            [k](const int64_t* a, const int64_t* b) {
              for (int j = 0; j < k; ++j) {
                if (a[j] != b[j]) return a[j] > b[j];
              }
              return false;
            });
  int64_t written = 0;
  const int64_t* prev = nullptr;
  for (const int64_t* r : rows) {
    if (prev && std::memcmp(prev, r, sizeof(int64_t) * k) == 0) continue;
    if (written >= max_rows) break;
    std::memcpy(out + written * k, r, sizeof(int64_t) * k);
    prev = r;
    ++written;
  }
  return written;
}

}  // extern "C"

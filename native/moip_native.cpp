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

struct Store {
  int k = 0;
  // structure-of-arrays mirror of the reference's std::list<Result*>
  std::vector<double> ips;        // size n*k
  std::vector<int64_t> results;   // size n*k (zeros for infeasible)
  std::vector<uint8_t> infeas;    // size n
  int64_t n = 0;
};

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
}

// Relaxation find (reference solutions.cpp:17-47).  sense_min != 0 for MIN.
// Returns the matching entry index or -1; on a hit copies the stored result
// and sets *out_infeasible.
int64_t moip_store_find(void* h, const double* q, int sense_min,
                        int64_t* out_result, int* out_infeasible) {
  Store* s = static_cast<Store*>(h);
  const int k = s->k;
  for (int64_t i = 0; i < s->n; ++i) {
    const double* ip = &s->ips[i * k];
    const int64_t* res = &s->results[i * k];
    const bool inf = s->infeas[i] != 0;
    bool ok = true;
    if (sense_min) {
      for (int j = 0; j < k; ++j) {
        if (ip[j] < q[j]) { ok = false; break; }
        if (!inf && static_cast<double>(res[j]) > q[j]) { ok = false; break; }
      }
    } else {
      for (int j = 0; j < k; ++j) {
        if (ip[j] > q[j]) { ok = false; break; }
        if (!inf && static_cast<double>(res[j]) < q[j]) { ok = false; break; }
      }
    }
    if (ok) {
      if (!inf) std::memcpy(out_result, res, sizeof(int64_t) * k);
      *out_infeasible = inf ? 1 : 0;
      return i;
    }
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

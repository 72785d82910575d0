// Native exact MIPS top-k over a flat embedding matrix.
//
// The reference consumed this capability through FAISS's C++ IndexFlatIP
// (reference src/pipelines/training.py:646-697). This is the framework's
// own native searcher, used by the host-side serving path
// (ttamm_tpu/serve/) when no TPU is attached: multithreaded over queries,
// blocked over items for cache locality, bounded min-heap per query.
//
// Build: `make -C native` -> libttamm_native.so (loaded via ctypes from
// ttamm_tpu/serve/native_bridge.py; pybind11 is intentionally not used —
// the ABI is a single C function).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct HeapEntry {
  float score;
  int64_t index;
};

// Min-heap on score: top() is the weakest of the current top-k.
inline bool heap_less(const HeapEntry& a, const HeapEntry& b) {
  return a.score > b.score;
}

void search_queries(const float* items, int64_t n, int32_t d,
                    const float* queries, int32_t k, float* out_scores,
                    int64_t* out_indices, std::atomic<int64_t>* next_query,
                    int64_t num_queries) {
  constexpr int64_t kBlock = 4096;  // items per pass; ~2 MB of rows at d=128
  std::vector<HeapEntry> heap;
  heap.reserve(static_cast<size_t>(k) + 1);
  std::vector<float> block_scores(kBlock);

  for (;;) {
    const int64_t q = next_query->fetch_add(1);
    if (q >= num_queries) break;
    const float* query = queries + q * d;

    heap.clear();
    for (int64_t start = 0; start < n; start += kBlock) {
      const int64_t end = std::min(start + kBlock, n);
      const int64_t count = end - start;
      // Dot products for this block (compiler autovectorizes the inner
      // loop; d is typically a multiple of 8).
      for (int64_t i = 0; i < count; ++i) {
        const float* row = items + (start + i) * d;
        float acc = 0.f;
        for (int32_t j = 0; j < d; ++j) acc += query[j] * row[j];
        block_scores[i] = acc;
      }
      for (int64_t i = 0; i < count; ++i) {
        const float score = block_scores[i];
        if (heap.size() < static_cast<size_t>(k)) {
          heap.push_back({score, start + i});
          std::push_heap(heap.begin(), heap.end(), heap_less);
        } else if (score > heap.front().score) {
          std::pop_heap(heap.begin(), heap.end(), heap_less);
          heap.back() = {score, start + i};
          std::push_heap(heap.begin(), heap.end(), heap_less);
        }
      }
    }

    // Emit in descending score order (sort_heap with a ">"-comparator
    // yields descending scores directly).
    std::sort_heap(heap.begin(), heap.end(), heap_less);
    const int32_t found = static_cast<int32_t>(heap.size());
    for (int32_t i = 0; i < found; ++i) {
      out_scores[q * k + i] = heap[i].score;
      out_indices[q * k + i] = heap[i].index;
    }
    for (int32_t i = found; i < k; ++i) {
      out_scores[q * k + i] = -3.4e38f;
      out_indices[q * k + i] = -1;
    }
  }
}

}  // namespace

extern "C" {

// Exact inner-product top-k. Returns 0 on success.
//   items:   [n, d] row-major float32
//   queries: [b, d] row-major float32
//   out_scores / out_indices: [b, k] preallocated
//   num_threads: 0 = hardware concurrency
int ttamm_flat_topk(const float* items, int64_t n, int32_t d,
                    const float* queries, int64_t b, int32_t k,
                    float* out_scores, int64_t* out_indices,
                    int32_t num_threads) {
  if (items == nullptr || queries == nullptr || out_scores == nullptr ||
      out_indices == nullptr)
    return 1;
  if (n <= 0 || d <= 0 || b <= 0 || k <= 0) return 2;
  if (k > n) return 3;

  int32_t threads = num_threads > 0
                        ? num_threads
                        : static_cast<int32_t>(std::thread::hardware_concurrency());
  if (threads <= 0) threads = 1;
  threads = static_cast<int32_t>(
      std::min<int64_t>(threads, b));

  std::atomic<int64_t> next_query{0};
  if (threads == 1) {
    search_queries(items, n, d, queries, k, out_scores, out_indices,
                   &next_query, b);
    return 0;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int32_t t = 0; t < threads; ++t) {
    pool.emplace_back(search_queries, items, n, d, queries, k, out_scores,
                      out_indices, &next_query, b);
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"

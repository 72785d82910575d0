// Native exact MIPS top-k over a flat embedding matrix.
//
// The reference consumed this capability through FAISS's C++ IndexFlatIP
// (reference src/pipelines/training.py:646-697). This is the framework's
// own native searcher, used by the host-side serving path
// (ttamm_tpu/serve/) when no TPU is attached.
//
// Layout: queries are processed in tiles of kQueryTile; each item block is
// read ONCE per tile instead of once per query, so the corpus sweep — the
// memory-bandwidth bottleneck of a flat exact search — is amortized over
// the tile (a [B, D] x [D, N] GEMM blocking, not a per-query scan). The
// micro-kernel keeps the tile's scores in per-query accumulators and
// vectorizes ACROSS the query tile (row element broadcast x query column),
// which avoids per-dot horizontal reductions entirely. Threads pull whole
// query tiles from an atomic counter; per-query bounded min-heaps produce
// the top-k.
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

// Queries per tile — the corpus-traffic amortization factor. 32 f32 =
// four 8-lane AVX2 accumulator registers per set; with two independent
// sets (depth unroll) the working accumulators fit the register file.
// Measured on the 2-CPU dev host at N=100k, D=128: tile 32 + unroll 2
// beats tile 16 + unroll 4 by ~25-30% (2.0-2.4k vs 1.6-1.8k q/s).
constexpr int32_t kQueryTile = 32;
// Items per pass: bounds the [kBlock, kQueryTile] score buffer (64 KB).
constexpr int64_t kBlock = 1024;

struct HeapEntry {
  float score;
  int64_t index;
};

// Min-heap on score: top() is the weakest of the current top-k.
inline bool heap_less(const HeapEntry& a, const HeapEntry& b) {
  return a.score > b.score;
}

void search_query_tiles(const float* items, int64_t n, int32_t d,
                        const float* queries, int32_t k, float* out_scores,
                        int64_t* out_indices,
                        std::atomic<int64_t>* next_tile,
                        int64_t num_queries) {
  const int64_t num_tiles = (num_queries + kQueryTile - 1) / kQueryTile;
  // Query tile transposed to [d][kQueryTile] so the micro-kernel's inner
  // loop is contiguous over the tile; unused lanes are zero-padded.
  std::vector<float> qT(static_cast<size_t>(d) * kQueryTile);
  std::vector<float> scores_tile(static_cast<size_t>(kBlock) * kQueryTile);
  std::vector<HeapEntry> heaps(static_cast<size_t>(kQueryTile) *
                               (static_cast<size_t>(k) + 1));
  std::vector<int32_t> heap_sizes(kQueryTile);

  for (;;) {
    const int64_t tile = next_tile->fetch_add(1);
    if (tile >= num_tiles) break;
    const int64_t q0 = tile * kQueryTile;
    const int32_t qcount = static_cast<int32_t>(
        std::min<int64_t>(kQueryTile, num_queries - q0));

    std::fill(qT.begin(), qT.end(), 0.f);
    for (int32_t t = 0; t < qcount; ++t) {
      const float* query = queries + (q0 + t) * d;
      for (int32_t j = 0; j < d; ++j) qT[j * kQueryTile + t] = query[j];
    }
    std::fill(heap_sizes.begin(), heap_sizes.end(), 0);

    for (int64_t start = 0; start < n; start += kBlock) {
      const int64_t end = std::min(start + kBlock, n);
      const int64_t count = end - start;

      // Micro-kernel: each item row is read once and scored against the
      // whole tile. acc[] vectorizes across the tile (no horizontal
      // reduction); the row element is a broadcast. Two independent
      // accumulator sets over a depth-4 unroll break the FMA latency
      // chain without spilling the register file at this tile width.
      if (qcount > 4) {
        const int32_t d4 = d & ~3;
        for (int64_t i = 0; i < count; ++i) {
          const float* row = items + (start + i) * d;
          float acc0[kQueryTile] = {0.f};
          float acc1[kQueryTile] = {0.f};
          for (int32_t j = 0; j < d4; j += 4) {
            const float r0 = row[j], r1 = row[j + 1];
            const float r2 = row[j + 2], r3 = row[j + 3];
            const float* qc =
                qT.data() + static_cast<size_t>(j) * kQueryTile;
            for (int32_t t = 0; t < kQueryTile; ++t) {
              acc0[t] += r0 * qc[t] + r1 * qc[kQueryTile + t];
              acc1[t] += r2 * qc[2 * kQueryTile + t] +
                         r3 * qc[3 * kQueryTile + t];
            }
          }
          for (int32_t j = d4; j < d; ++j) {
            const float r = row[j];
            const float* qc =
                qT.data() + static_cast<size_t>(j) * kQueryTile;
            for (int32_t t = 0; t < kQueryTile; ++t) acc0[t] += r * qc[t];
          }
          float* out =
              scores_tile.data() + static_cast<size_t>(i) * kQueryTile;
          for (int32_t t = 0; t < kQueryTile; ++t)
            out[t] = acc0[t] + acc1[t];
        }
      } else {
        // Narrow tile (tail or tiny batch): per-query dot products avoid
        // the wide kernel's wasted zero lanes.
        for (int64_t i = 0; i < count; ++i) {
          const float* row = items + (start + i) * d;
          float* out =
              scores_tile.data() + static_cast<size_t>(i) * kQueryTile;
          for (int32_t t = 0; t < qcount; ++t) {
            const float* query = queries + (q0 + t) * d;
            float acc = 0.f;
            for (int32_t j = 0; j < d; ++j) acc += query[j] * row[j];
            out[t] = acc;
          }
        }
      }

      for (int32_t t = 0; t < qcount; ++t) {
        HeapEntry* heap = heaps.data() + static_cast<size_t>(t) * (k + 1);
        int32_t& size = heap_sizes[t];
        for (int64_t i = 0; i < count; ++i) {
          const float score =
              scores_tile[static_cast<size_t>(i) * kQueryTile + t];
          if (size < k) {
            heap[size++] = {score, start + i};
            std::push_heap(heap, heap + size, heap_less);
          } else if (score > heap[0].score) {
            std::pop_heap(heap, heap + size, heap_less);
            heap[size - 1] = {score, start + i};
            std::push_heap(heap, heap + size, heap_less);
          }
        }
      }
    }

    // Emit in descending score order (sort_heap with a ">"-comparator
    // yields descending scores directly).
    for (int32_t t = 0; t < qcount; ++t) {
      HeapEntry* heap = heaps.data() + static_cast<size_t>(t) * (k + 1);
      const int32_t found = heap_sizes[t];
      std::sort_heap(heap, heap + found, heap_less);
      const int64_t q = q0 + t;
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
  const int64_t num_tiles = (b + kQueryTile - 1) / kQueryTile;
  threads = static_cast<int32_t>(std::min<int64_t>(threads, num_tiles));

  std::atomic<int64_t> next_tile{0};
  if (threads == 1) {
    search_query_tiles(items, n, d, queries, k, out_scores, out_indices,
                       &next_tile, b);
    return 0;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int32_t t = 0; t < threads; ++t) {
    pool.emplace_back(search_query_tiles, items, n, d, queries, k,
                      out_scores, out_indices, &next_tile, b);
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // extern "C"

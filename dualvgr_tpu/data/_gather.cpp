// Threaded row-gather for the host data path (dualvgr_tpu/data/native.py).
//
// The RAM-cached FeatureStore assembles each training batch by gathering
// feature rows (flagship appearance batch: 256 rows x 2 MB = 0.5 GB per
// step). numpy fancy indexing runs that copy on one core; this kernel
// splits the rows across std::threads, each issuing straight memcpys —
// the loader equivalent of the reference's num_workers forked copies
// (reference DataLoader.py:163), without pickling or process forks.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread _gather.cpp -o _gather.so
// (done lazily by native.py; any failure falls back to numpy).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Copy rows[i]-th row of src (n_src rows x row_bytes) into dst row i.
// Returns 0 on success, -1 on an out-of-range row index.
int gather_rows(const char* src, int64_t n_src, int64_t row_bytes,
                const int64_t* rows, int64_t n_out, char* dst,
                int n_threads) {
  for (int64_t i = 0; i < n_out; ++i) {
    if (rows[i] < 0 || rows[i] >= n_src) return -1;
  }
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n_out) n_threads = static_cast<int>(n_out);

  auto worker = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      std::memcpy(dst + i * row_bytes, src + rows[i] * row_bytes,
                  static_cast<size_t>(row_bytes));
    }
  };

  if (n_threads == 1) {
    worker(0, n_out);
    return 0;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  int64_t chunk = (n_out + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t begin = t * chunk;
    int64_t end = begin + chunk < n_out ? begin + chunk : n_out;
    if (begin >= end) break;
    threads.emplace_back(worker, begin, end);
  }
  for (auto& th : threads) th.join();
  return 0;
}

}  // extern "C"

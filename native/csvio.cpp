// Native CSV matrix I/O + asynchronous telemetry logger.
//
// The reference's runtime is C++ end to end; its reference-trajectory
// loading (robot_utils.cpp loadReferences: getline + stod per cell) and its
// per-step CSV logging (mpc.cpp logCurrentStep: ofstream << on the control
// thread) are both native. This module provides the TPU framework's native
// equivalents behind a plain C ABI (consumed via ctypes, no pybind11):
//
//  - csv_read_matrix: mmap'd single-pass float parser (no per-cell string
//    allocation) for headerless comma CSVs -> packed double array.
//  - telemetry_*: a background-thread CSV writer with a bounded queue, so
//    logging never blocks the 50 Hz control loop.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread csvio.cpp -o libmpcio.so

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// CSV reading
// ---------------------------------------------------------------------------

// Parses a comma/newline-separated float matrix. Returns a malloc'd buffer
// the caller frees with csv_free. skip_rows skips header lines.
// On success: *out_rows/*out_cols set, returns pointer. On failure: nullptr.
double* csv_read_matrix(const char* path, int skip_rows, int64_t* out_rows,
                        int64_t* out_cols) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    return nullptr;
  }
  size_t n = static_cast<size_t>(st.st_size);
  const char* data =
      static_cast<const char*>(mmap(nullptr, n, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (data == MAP_FAILED) return nullptr;

  const char* p = data;
  const char* end = data + n;
  for (int s = 0; s < skip_rows && p < end; ++s) {
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }

  std::vector<double> vals;
  vals.reserve(n / 8);
  int64_t cols = -1, cur_cols = 0, rows = 0;
  while (p < end) {
    char c = *p;
    if (c == '\n') {  // handle separators BEFORE strtod (it eats newlines)
      if (cur_cols > 0) {
        if (cols < 0) cols = cur_cols;
        if (cur_cols != cols) {  // ragged row: fail
          munmap(const_cast<char*>(data), n);
          return nullptr;
        }
        ++rows;
        cur_cols = 0;
      }
      ++p;
      continue;
    }
    if (c == ',' || c == ' ' || c == '\t' || c == '\r') {
      ++p;
      continue;
    }
    char* next = nullptr;
    double v = strtod(p, &next);
    if (next == p) {  // unparseable junk
      ++p;
      continue;
    }
    vals.push_back(v);
    ++cur_cols;
    p = next;
  }
  if (cur_cols > 0) {  // final row without trailing newline
    if (cols < 0) cols = cur_cols;
    if (cur_cols != cols) {
      munmap(const_cast<char*>(data), n);
      return nullptr;
    }
    ++rows;
  }
  munmap(const_cast<char*>(data), n);
  if (rows == 0 || cols <= 0) return nullptr;

  double* out = static_cast<double*>(malloc(sizeof(double) * vals.size()));
  if (!out) return nullptr;
  memcpy(out, vals.data(), sizeof(double) * vals.size());
  *out_rows = rows;
  *out_cols = cols;
  return out;
}

void csv_free(double* ptr) { free(ptr); }

// ---------------------------------------------------------------------------
// Asynchronous telemetry logger
// ---------------------------------------------------------------------------

struct Telemetry {
  FILE* f = nullptr;
  int64_t row_len = 0;
  std::thread worker;
  std::mutex mu;
  std::condition_variable cv;
  std::deque<std::vector<double>> queue;
  std::atomic<bool> stop{false};
  std::atomic<int64_t> dropped{0};
  size_t max_queue = 1 << 16;

  void run() {
    std::vector<char> buf;
    buf.reserve(1 << 16);
    for (;;) {
      std::vector<double> row;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [&] { return stop.load() || !queue.empty(); });
        if (queue.empty()) {
          if (stop.load()) break;
          continue;
        }
        row = std::move(queue.front());
        queue.pop_front();
      }
      buf.clear();
      char tmp[32];
      for (size_t i = 0; i < row.size(); ++i) {
        int len = snprintf(tmp, sizeof(tmp), "%.9g", row[i]);
        if (i) buf.push_back(',');
        buf.insert(buf.end(), tmp, tmp + len);
      }
      buf.push_back('\n');
      fwrite(buf.data(), 1, buf.size(), f);
    }
    fflush(f);
  }
};

void* telemetry_open(const char* path, const char* header) {
  FILE* f = fopen(path, "w");
  if (!f) return nullptr;
  if (header && header[0]) {
    fputs(header, f);
    fputc('\n', f);
  }
  auto* t = new Telemetry();
  t->f = f;
  t->worker = std::thread([t] { t->run(); });
  return t;
}

// Non-blocking: copies the row into the queue; drops (and counts) if full.
int telemetry_log(void* handle, const double* row, int64_t len) {
  auto* t = static_cast<Telemetry*>(handle);
  {
    std::lock_guard<std::mutex> lk(t->mu);
    if (t->queue.size() >= t->max_queue) {
      t->dropped.fetch_add(1);
      return -1;
    }
    t->queue.emplace_back(row, row + len);
  }
  t->cv.notify_one();
  return 0;
}

int64_t telemetry_dropped(void* handle) {
  return static_cast<Telemetry*>(handle)->dropped.load();
}

void telemetry_close(void* handle) {
  auto* t = static_cast<Telemetry*>(handle);
  t->stop.store(true);
  t->cv.notify_all();
  if (t->worker.joinable()) t->worker.join();
  fclose(t->f);
  delete t;
}

}  // extern "C"

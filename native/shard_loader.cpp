// Native shard loader: mmap'd .npy shards + multithreaded batch gather.
//
// The runtime tier of the data path (the reference leans on torch's
// DataLoader + numpy mmap, reference: data.py:7-28). This library:
//   * parses .npy headers (v1/v2, C-order float32) and mmaps the payload,
//   * serves shuffled-batch row gathers with a worker thread pool
//     (parallel page-fault + memcpy across rows — the actual bottleneck
//     of a cold mmap read),
//   * exposes a flat C ABI consumed via ctypes (no pybind11 in image).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread shard_loader.cpp
//        -o libshard_loader.so     (see phasegen_tpu/data/native_loader.py)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <memory>
#include <mutex>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct Shard {
  const uint8_t* base = nullptr;   // mmap base
  size_t map_len = 0;
  const float* data = nullptr;     // payload
  int64_t rows = 0;
  int64_t row_elems = 0;           // product of trailing dims
  int fd = -1;
};

// One gather dispatch. Each job owns its pointers AND its progress
// counters, so a worker that straddles a job boundary (woke for job N,
// descheduled, resumed after job N+1 was dispatched) still operates on
// the job object it copied under the mutex: job N is already drained
// (next >= total), the worker exits its inner loop and re-waits — it can
// never claim items of, or count completions against, a job whose fields
// it didn't read under the lock.
struct Job {
  const int64_t* rows = nullptr;
  float* out = nullptr;
  int total = 0;
  std::atomic<int> next{0};
  std::atomic<int> done{0};
};

struct Loader {
  std::vector<Shard> shards;
  std::vector<int64_t> row_offset;  // cumulative rows per shard
  std::vector<int64_t> dims;        // trailing dims (shared by all shards)
  std::string error;

  // thread pool (generation-counter job dispatch)
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  bool shutdown = false;
  uint64_t job_gen = 0;             // bumped per job, guarded by mu
  std::shared_ptr<Job> job;         // current job, guarded by mu

  ~Loader() {
    {
      std::lock_guard<std::mutex> lk(mu);
      shutdown = true;
    }
    cv_work.notify_all();
    for (auto& t : workers) t.join();
    for (auto& s : shards) {
      if (s.base) munmap(const_cast<uint8_t*>(s.base), s.map_len);
      if (s.fd >= 0) close(s.fd);
    }
  }
};

// Minimal .npy header parser: returns false + error on anything but
// little-endian C-order float32.
bool parse_npy(Loader* L, Shard* s, const uint8_t* p, size_t len) {
  if (len < 10 || memcmp(p, "\x93NUMPY", 6) != 0) {
    L->error = "not a .npy file";
    return false;
  }
  int major = p[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = p[8] | (p[9] << 8);
    hoff = 10;
  } else {
    hlen = p[8] | (p[9] << 8) | (p[10] << 16) |
           (static_cast<size_t>(p[11]) << 24);
    hoff = 12;
  }
  if (hoff + hlen > len) {
    L->error = "truncated .npy header";
    return false;
  }
  std::string hdr(reinterpret_cast<const char*>(p + hoff), hlen);
  if (hdr.find("'<f4'") == std::string::npos) {
    L->error = "dtype must be little-endian float32 ('<f4')";
    return false;
  }
  if (hdr.find("'fortran_order': False") == std::string::npos) {
    L->error = "fortran_order arrays unsupported";
    return false;
  }
  size_t sp = hdr.find("'shape':");
  size_t lp = hdr.find('(', sp), rp = hdr.find(')', lp);
  if (sp == std::string::npos || lp == std::string::npos ||
      rp == std::string::npos) {
    L->error = "malformed shape";
    return false;
  }
  std::vector<int64_t> shape;
  int64_t cur = -1;
  for (size_t i = lp + 1; i <= rp; ++i) {
    char c = hdr[i];
    if (c >= '0' && c <= '9') {
      cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    } else if (cur >= 0) {
      shape.push_back(cur);
      cur = -1;
    }
  }
  if (shape.empty()) {
    L->error = "scalar shards unsupported";
    return false;
  }
  s->rows = shape[0];
  s->row_elems = 1;
  std::vector<int64_t> trail(shape.begin() + 1, shape.end());
  for (int64_t d : trail) s->row_elems *= d;
  if (L->dims.empty()) {
    L->dims = trail;
  } else if (L->dims != trail) {
    L->error = "shards disagree on row shape";
    return false;
  }
  s->data = reinterpret_cast<const float*>(p + hoff + hlen);
  size_t need = hoff + hlen + sizeof(float) * size_t(s->rows) *
                                  size_t(s->row_elems);
  if (need > len) {
    L->error = "payload shorter than header shape";
    return false;
  }
  return true;
}

void worker_loop(Loader* L) {
  uint64_t seen_gen = 0;
  for (;;) {
    std::shared_ptr<Job> j;
    {
      std::unique_lock<std::mutex> lk(L->mu);
      L->cv_work.wait(lk, [&] { return L->shutdown || L->job_gen > seen_gen; });
      if (L->shutdown) return;
      seen_gen = L->job_gen;
      j = L->job;  // copy the job handle under the lock — see struct Job
    }
    for (;;) {
      int i = j->next.fetch_add(1);
      if (i >= j->total) break;
      int64_t g = j->rows[i];
      // locate shard by cumulative offsets
      size_t si = 0;
      while (si + 1 < L->row_offset.size() && g >= L->row_offset[si + 1])
        ++si;
      const Shard& s = L->shards[si];
      int64_t local = g - L->row_offset[si];
      memcpy(j->out + size_t(i) * s.row_elems,
             s.data + size_t(local) * s.row_elems,
             sizeof(float) * size_t(s.row_elems));
      if (j->done.fetch_add(1) + 1 == j->total) {
        std::lock_guard<std::mutex> lk(L->mu);
        L->cv_done.notify_all();
      }
    }
  }
}

}  // namespace

extern "C" {

void* psl_open(const char** paths, int n_paths, int n_threads) {
  auto* L = new Loader();
  int64_t cum = 0;
  for (int i = 0; i < n_paths; ++i) {
    Shard s;
    s.fd = open(paths[i], O_RDONLY);
    if (s.fd < 0) {
      L->error = std::string("cannot open ") + paths[i];
      return L;  // error queryable via psl_error
    }
    struct stat st;
    fstat(s.fd, &st);
    s.map_len = size_t(st.st_size);
    s.base = static_cast<const uint8_t*>(
        mmap(nullptr, s.map_len, PROT_READ, MAP_PRIVATE, s.fd, 0));
    if (s.base == MAP_FAILED) {
      s.base = nullptr;
      close(s.fd);
      s.fd = -1;
      L->error = std::string("mmap failed for ") + paths[i];
      return L;
    }
    madvise(const_cast<uint8_t*>(s.base), s.map_len, MADV_WILLNEED);
    bool ok = parse_npy(L, &s, s.base, s.map_len);
    // always record the shard so ~Loader unmaps/closes it on any path
    // (a parse failure must not leak the fd + mapping)
    L->row_offset.push_back(cum);
    cum += ok ? s.rows : 0;
    L->shards.push_back(s);
    if (!ok) return L;
  }
  L->row_offset.push_back(cum);
  if (n_threads < 1) n_threads = 1;
  for (int t = 0; t < n_threads; ++t)
    L->workers.emplace_back(worker_loop, L);
  return L;
}

const char* psl_error(void* h) {
  auto* L = static_cast<Loader*>(h);
  return L->error.empty() ? nullptr : L->error.c_str();
}

int64_t psl_total_rows(void* h) {
  auto* L = static_cast<Loader*>(h);
  return L->row_offset.empty() ? 0 : L->row_offset.back();
}

int psl_row_ndim(void* h) {
  return int(static_cast<Loader*>(h)->dims.size());
}

void psl_row_shape(void* h, int64_t* out) {
  auto* L = static_cast<Loader*>(h);
  for (size_t i = 0; i < L->dims.size(); ++i) out[i] = L->dims[i];
}

// Gather n rows (global indices) into out (n * row_elems floats).
void psl_gather(void* h, const int64_t* rows, int n, float* out) {
  auto* L = static_cast<Loader*>(h);
  if (L->shards.empty() || n <= 0) return;
  auto j = std::make_shared<Job>();
  j->rows = rows;
  j->out = out;
  j->total = n;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->job = j;
    ++L->job_gen;
  }
  L->cv_work.notify_all();
  // wait on THIS job's counter — a stale worker from a previous dispatch
  // cannot increment it (it holds the old Job object)
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv_done.wait(lk, [&] { return j->done.load() >= j->total; });
}

void psl_close(void* h) { delete static_cast<Loader*>(h); }

}  // extern "C"

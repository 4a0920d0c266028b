// SRPK: packed tensor-record store + threaded batch gather.
//
// TPU-native replacement for the reference's optional LMDB image store
// (reference: datasets/base.py:122-131, datasets/LRHR_dataset.py:18-27,
// datasets/tool/prepare_data.py LMDB mode).  Design differences are
// deliberate: records are raw fixed-shape uint8/float32 tensors (decoded
// once at pack time), the file is mmap'd, and batch reads fan out over a
// thread pool so the host input pipeline can keep a TPU fed without a
// Python-side decode loop.
//
// File layout (little-endian):
//   [0]   8B   magic "SRPK\x00\x00\x00\x01"
//   [8]   8B   u64 record_count
//   [16]  8B   u64 record_bytes (fixed per record)
//   [24]  8B   u64 ndim
//   [32]  8*8B u64 shape[8]  (trailing zeros unused)
//   [96]  4B   u32 dtype code (0=u8, 1=f32)
//   [100] 28B  reserved
//   [128] record_count * record_bytes   payload
//
// C ABI (ctypes-friendly); thread-safe after open.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <atomic>
#include <thread>
#include <vector>

namespace {

constexpr uint64_t kHeaderBytes = 128;
constexpr char kMagic[8] = {'S', 'R', 'P', 'K', 0, 0, 0, 1};

struct SrpkFile {
  int fd = -1;
  const uint8_t* base = nullptr;  // mmap base
  size_t mapped_bytes = 0;
  uint64_t count = 0;
  uint64_t record_bytes = 0;
  uint64_t ndim = 0;
  uint64_t shape[8] = {0};
  uint32_t dtype = 0;
};

const uint8_t* payload(const SrpkFile* f) { return f->base + kHeaderBytes; }

}  // namespace

extern "C" {

// Returns an opaque handle or nullptr on failure.
void* srpk_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || (size_t)st.st_size < kHeaderBytes) {
    ::close(fd);
    return nullptr;
  }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (mem == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  auto* f = new SrpkFile();
  f->fd = fd;
  f->base = static_cast<const uint8_t*>(mem);
  f->mapped_bytes = st.st_size;
  if (memcmp(f->base, kMagic, 8) != 0) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete f;
    return nullptr;
  }
  memcpy(&f->count, f->base + 8, 8);
  memcpy(&f->record_bytes, f->base + 16, 8);
  memcpy(&f->ndim, f->base + 24, 8);
  memcpy(f->shape, f->base + 32, 64);
  memcpy(&f->dtype, f->base + 96, 4);
  if (kHeaderBytes + f->count * f->record_bytes > (uint64_t)st.st_size) {
    munmap(mem, st.st_size);
    ::close(fd);
    delete f;
    return nullptr;
  }
  return f;
}

void srpk_close(void* handle) {
  auto* f = static_cast<SrpkFile*>(handle);
  if (!f) return;
  munmap(const_cast<uint8_t*>(f->base), f->mapped_bytes);
  ::close(f->fd);
  delete f;
}

uint64_t srpk_count(void* handle) {
  return static_cast<SrpkFile*>(handle)->count;
}
uint64_t srpk_record_bytes(void* handle) {
  return static_cast<SrpkFile*>(handle)->record_bytes;
}
uint64_t srpk_ndim(void* handle) {
  return static_cast<SrpkFile*>(handle)->ndim;
}
void srpk_shape(void* handle, uint64_t* out8) {
  memcpy(out8, static_cast<SrpkFile*>(handle)->shape, 64);
}
uint32_t srpk_dtype(void* handle) {
  return static_cast<SrpkFile*>(handle)->dtype;
}

// Copy one record into out (caller allocates record_bytes).
int srpk_read(void* handle, uint64_t idx, uint8_t* out) {
  auto* f = static_cast<SrpkFile*>(handle);
  if (idx >= f->count) return -1;
  memcpy(out, payload(f) + idx * f->record_bytes, f->record_bytes);
  return 0;
}

// Gather n records into a contiguous [n, record] buffer using `threads`
// worker threads (the batched read the training loader calls per step).
int srpk_read_batch(void* handle, const uint64_t* indices, uint64_t n,
                    uint8_t* out, int threads) {
  auto* f = static_cast<SrpkFile*>(handle);
  for (uint64_t i = 0; i < n; ++i) {
    if (indices[i] >= f->count) return -1;
  }
  if (threads < 1) threads = 1;
  if ((uint64_t)threads > n) threads = (int)n;
  std::atomic<uint64_t> next(0);
  auto worker = [&]() {
    uint64_t i;
    while ((i = next.fetch_add(1)) < n) {
      memcpy(out + i * f->record_bytes,
             payload(f) + indices[i] * f->record_bytes, f->record_bytes);
    }
  };
  if (threads == 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(threads);
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return 0;
}

// Writer: create a file for `count` records and stream them in.
// Simple two-call protocol: srpk_create → srpk_append (count times) → close fd.
typedef struct {
  FILE* fp;
  uint64_t written;
  uint64_t count;
  uint64_t record_bytes;
} SrpkWriter;

void* srpk_create(const char* path, uint64_t count, uint64_t record_bytes,
                  uint64_t ndim, const uint64_t* shape, uint32_t dtype) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return nullptr;
  uint8_t header[kHeaderBytes] = {0};
  memcpy(header, kMagic, 8);
  memcpy(header + 8, &count, 8);
  memcpy(header + 16, &record_bytes, 8);
  memcpy(header + 24, &ndim, 8);
  memcpy(header + 32, shape, ndim * 8);
  memcpy(header + 96, &dtype, 4);
  if (fwrite(header, 1, kHeaderBytes, fp) != kHeaderBytes) {
    fclose(fp);
    return nullptr;
  }
  auto* w = new SrpkWriter{fp, 0, count, record_bytes};
  return w;
}

int srpk_append(void* whandle, const uint8_t* record) {
  auto* w = static_cast<SrpkWriter*>(whandle);
  if (w->written >= w->count) return -1;
  if (fwrite(record, 1, w->record_bytes, w->fp) != w->record_bytes) return -2;
  w->written++;
  return 0;
}

int srpk_finish(void* whandle) {
  auto* w = static_cast<SrpkWriter*>(whandle);
  int rc = (w->written == w->count) ? 0 : -1;
  fclose(w->fp);
  delete w;
  return rc;
}

}  // extern "C"

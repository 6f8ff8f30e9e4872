// Native .npy loader for the host data pipeline.
//
// The reference's data path is Python numpy loads of thousands of small
// (1024, 3) arrays (posa/dataset.py:384-439).  This reader parses the .npy
// v1/v2 header, memory-maps the payload and converts to float32 in place,
// with a multithreaded batch API so a whole scene's objects load in one
// call.  Exposed to Python over ctypes (lsdm_tpu/data/npy_native.py) — no
// pybind11 dependency.
//
// Supported: C-order arrays, dtypes <f4 <f8 <i4 <i8 |u1; enough for every
// array the datasets ship.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Header {
  size_t data_offset = 0;
  size_t n_elems = 0;
  char dtype = 0;       // 'f' float, 'i' int, 'u' unsigned
  int itemsize = 0;
  int ndim = 0;
  long shape[8] = {0};
  bool ok = false;
};

Header parse_header(const unsigned char* buf, size_t len) {
  Header h;
  if (len < 10 || memcmp(buf, "\x93NUMPY", 6) != 0) return h;
  int major = buf[6];
  size_t header_len, header_start;
  if (major == 1) {
    header_len = buf[8] | (buf[9] << 8);
    header_start = 10;
  } else {
    header_len = buf[8] | (buf[9] << 8) | ((size_t)buf[10] << 16) |
                 ((size_t)buf[11] << 24);
    header_start = 12;
  }
  if (header_start + header_len > len) return h;
  std::string hdr((const char*)buf + header_start, header_len);

  // descr
  size_t dp = hdr.find("'descr'");
  if (dp == std::string::npos) return h;
  size_t q1 = hdr.find('\'', dp + 7);
  size_t q2 = hdr.find('\'', q1 + 1);
  std::string descr = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (descr.size() < 3) return h;
  // e.g. "<f4", "<f8", "|u1"
  h.dtype = descr[1];
  h.itemsize = atoi(descr.c_str() + 2);
  if (h.itemsize <= 0 || h.itemsize > 8) return h;

  // fortran_order must be False
  if (hdr.find("'fortran_order': True") != std::string::npos) return h;

  // shape tuple
  size_t sp = hdr.find("'shape'");
  if (sp == std::string::npos) return h;
  size_t p1 = hdr.find('(', sp);
  size_t p2 = hdr.find(')', p1);
  std::string shape_s = hdr.substr(p1 + 1, p2 - p1 - 1);
  h.ndim = 0;
  h.n_elems = 1;
  const char* s = shape_s.c_str();
  while (*s && h.ndim < 8) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    long v = strtol(s, (char**)&s, 10);
    h.shape[h.ndim++] = v;
    h.n_elems *= (size_t)v;
  }
  if (h.ndim == 0) {  // 0-d scalar
    h.ndim = 1;
    h.shape[0] = 1;
  }
  h.data_offset = header_start + header_len;
  h.ok = true;
  return h;
}

// Read one file into a float32 buffer. Returns n_elems or -1.
long read_one(const char* path, float* out, long max_elems, long* shape_out,
              int* ndim_out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  size_t len = (size_t)st.st_size;
  void* map = mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (map == MAP_FAILED) return -1;
  const unsigned char* buf = (const unsigned char*)map;
  Header h = parse_header(buf, len);
  long result = -1;
  if (h.ok && (long)h.n_elems <= max_elems &&
      h.data_offset + h.n_elems * h.itemsize <= len) {
    const unsigned char* data = buf + h.data_offset;
    if (h.dtype == 'f' && h.itemsize == 4) {
      memcpy(out, data, h.n_elems * 4);
    } else if (h.dtype == 'f' && h.itemsize == 8) {
      const double* d = (const double*)data;
      for (size_t i = 0; i < h.n_elems; i++) out[i] = (float)d[i];
    } else if (h.dtype == 'i' && h.itemsize == 4) {
      const int32_t* d = (const int32_t*)data;
      for (size_t i = 0; i < h.n_elems; i++) out[i] = (float)d[i];
    } else if (h.dtype == 'i' && h.itemsize == 8) {
      const int64_t* d = (const int64_t*)data;
      for (size_t i = 0; i < h.n_elems; i++) out[i] = (float)d[i];
    } else if (h.dtype == 'u' && h.itemsize == 1) {
      for (size_t i = 0; i < h.n_elems; i++) out[i] = (float)data[i];
    } else {
      munmap(map, len);
      return -1;
    }
    if (ndim_out) *ndim_out = h.ndim;
    if (shape_out)
      for (int i = 0; i < h.ndim; i++) shape_out[i] = h.shape[i];
    result = (long)h.n_elems;
  }
  munmap(map, len);
  return result;
}

}  // namespace

extern "C" {

long npy_read(const char* path, float* out, long max_elems, long* shape_out,
              int* ndim_out) {
  return read_one(path, out, max_elems, shape_out, ndim_out);
}

// Batched multithreaded read: n files, each into out + i*elems_per_item.
// Returns number of successfully read files; failures leave zeros.
long npy_read_batch(const char** paths, long n, float* out,
                    long elems_per_item, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = (int)n;
  std::vector<long> ok(n_threads, 0);
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; t++) {
    threads.emplace_back([&, t]() {
      for (long i = t; i < n; i += n_threads) {
        long r = read_one(paths[i], out + i * elems_per_item, elems_per_item,
                          nullptr, nullptr);
        if (r >= 0) ok[t]++;
      }
    });
  }
  for (auto& th : threads) th.join();
  long total = 0;
  for (long v : ok) total += v;
  return total;
}

}  // extern "C"

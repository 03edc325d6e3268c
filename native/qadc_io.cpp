// qadc-tpu native IO: TexMex .fvecs/.ivecs/.bvecs parsing and file splitting.
//
// Host-side counterpart of the reference's vector_io.{hpp,cpp} and
// vector_file.hpp/split_vecs.cpp (mmap + sendfile): the formats store each
// vector as an int32 dimension prefix followed by the payload
// (vector_io.hpp:70-76 infers the count from the file size). Parsing strips
// the prefixes into a contiguous array; the multithreaded convert path
// replaces the reference's OpenMP loops.
//
// Exposed via a C ABI consumed from Python with ctypes (no pybind11 in this
// image). All functions return 0 on success, negative on error.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/sendfile.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct MappedFile {
  int fd = -1;
  const std::uint8_t* data = nullptr;
  std::size_t size = 0;

  int open_ro(const char* path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return -errno;
    struct stat st;
    if (fstat(fd, &st) != 0) {
      ::close(fd);
      return -errno;
    }
    size = static_cast<std::size_t>(st.st_size);
    if (size > 0) {
      void* p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
      if (p == MAP_FAILED) {
        ::close(fd);
        return -errno;
      }
      data = static_cast<const std::uint8_t*>(p);
      madvise(const_cast<std::uint8_t*>(data), size, MADV_SEQUENTIAL);
    }
    return 0;
  }

  ~MappedFile() {
    if (data) munmap(const_cast<std::uint8_t*>(data), size);
    if (fd >= 0) ::close(fd);
  }
};

// Parallel strided copy: vec i occupies (4 + dim*elem) bytes at i*stride.
template <typename SrcT, typename DstT>
void copy_vectors_raw(const std::uint8_t* base, std::size_t stride,
                      std::int64_t dim, std::int64_t begin, std::int64_t end,
                      DstT* out) {
  for (std::int64_t i = begin; i < end; ++i) {
    const SrcT* src =
        reinterpret_cast<const SrcT*>(base + static_cast<std::size_t>(i) * stride + 4);
    DstT* dst = out + (i - begin) * dim;
    for (std::int64_t d = 0; d < dim; ++d) dst[d] = static_cast<DstT>(src[d]);
  }
}

int elem_size_for(int kind) {
  switch (kind) {
    case 0: return 4;  // fvecs float32
    case 1: return 4;  // ivecs int32
    case 2: return 1;  // bvecs uint8
  }
  return -1;
}

}  // namespace

extern "C" {

// Inspect a vecs file: fills dim and count. kind: 0=fvecs, 1=ivecs, 2=bvecs.
int qadc_vecs_info(const char* path, int kind, std::int64_t* dim,
                   std::int64_t* count) {
  int es = elem_size_for(kind);
  if (es < 0) return -1000;
  MappedFile mf;
  int rc = mf.open_ro(path);
  if (rc != 0) return rc;
  if (mf.size < 4) {
    *dim = 0;
    *count = 0;
    return mf.size == 0 ? 0 : -1001;
  }
  std::int32_t d;
  std::memcpy(&d, mf.data, 4);
  if (d <= 0) return -1002;
  std::size_t stride = 4 + static_cast<std::size_t>(d) * es;
  if (mf.size % stride != 0) return -1003;
  *dim = d;
  *count = static_cast<std::int64_t>(mf.size / stride);
  return 0;
}

// Read [offset, offset+count) vectors into out (row-major, no dim prefixes).
// to_float: convert payload to float32 (any kind); else native dtype
// (fvecs->f32, ivecs->i32, bvecs->u8). threads<=0 picks hardware count.
int qadc_vecs_read(const char* path, int kind, std::int64_t offset,
                   std::int64_t count, int to_float, int threads, void* out) {
  int es = elem_size_for(kind);
  if (es < 0) return -1000;
  MappedFile mf;
  int rc = mf.open_ro(path);
  if (rc != 0) return rc;
  if (mf.size < 4) return count == 0 ? 0 : -1001;
  std::int32_t d;
  std::memcpy(&d, mf.data, 4);
  if (d <= 0) return -1002;
  std::size_t stride = 4 + static_cast<std::size_t>(d) * es;
  std::int64_t total = static_cast<std::int64_t>(mf.size / stride);
  if (offset < 0 || count < 0 || offset + count > total) return -1004;

  const std::uint8_t* base = mf.data + static_cast<std::size_t>(offset) * stride;
  int nt = threads > 0 ? threads
                       : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  std::int64_t per = (count + nt - 1) / nt;
  std::vector<std::thread> pool;
  for (int t = 0; t < nt; ++t) {
    std::int64_t b = t * per;
    std::int64_t e = std::min<std::int64_t>(count, b + per);
    if (b >= e) break;
    pool.emplace_back([=]() {
      if (to_float) {
        float* o = static_cast<float*>(out) + b * d;
        if (kind == 0)
          copy_vectors_raw<float, float>(base, stride, d, b, e, o);
        else if (kind == 1)
          copy_vectors_raw<std::int32_t, float>(base, stride, d, b, e, o);
        else
          copy_vectors_raw<std::uint8_t, float>(base, stride, d, b, e, o);
      } else {
        if (kind == 0)
          copy_vectors_raw<float, float>(base, stride, d, b, e,
                                         static_cast<float*>(out) + b * d);
        else if (kind == 1)
          copy_vectors_raw<std::int32_t, std::int32_t>(
              base, stride, d, b, e, static_cast<std::int32_t*>(out) + b * d);
        else
          copy_vectors_raw<std::uint8_t, std::uint8_t>(
              base, stride, d, b, e, static_cast<std::uint8_t*>(out) + b * d);
      }
    });
  }
  for (auto& th : pool) th.join();
  return 0;
}

// Write vectors (float32 row-major in) to a vecs file with dim prefixes.
int qadc_vecs_write(const char* path, int kind, std::int64_t dim,
                    std::int64_t count, const void* data) {
  int es = elem_size_for(kind);
  if (es < 0) return -1000;
  FILE* f = std::fopen(path, "wb");
  if (!f) return -errno;
  std::int32_t d32 = static_cast<std::int32_t>(dim);
  const std::uint8_t* src = static_cast<const std::uint8_t*>(data);
  std::size_t row = static_cast<std::size_t>(dim) * es;
  for (std::int64_t i = 0; i < count; ++i) {
    if (std::fwrite(&d32, 4, 1, f) != 1 ||
        std::fwrite(src + i * row, row, 1, f) != 1) {
      std::fclose(f);
      return -EIO;
    }
  }
  std::fclose(f);
  return 0;
}

// Zero-copy chunk extraction via sendfile (reference: split_vecs.cpp:25-55,
// vector_file.hpp:106-117): copy vectors [chunk_id*chunk_size,
// +chunk_size) to out_path.
int qadc_vecs_split(const char* in_path, const char* out_path, int kind,
                    std::int64_t chunk_id, std::int64_t chunk_size) {
  int es = elem_size_for(kind);
  if (es < 0) return -1000;
  std::int64_t dim, total;
  int rc = qadc_vecs_info(in_path, kind, &dim, &total);
  if (rc != 0) return rc;
  std::size_t stride = 4 + static_cast<std::size_t>(dim) * es;
  std::int64_t begin = chunk_id * chunk_size;
  if (begin >= total) return -1005;
  std::int64_t n = std::min<std::int64_t>(chunk_size, total - begin);

  int in_fd = ::open(in_path, O_RDONLY);
  if (in_fd < 0) return -errno;
  int out_fd = ::open(out_path, O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (out_fd < 0) {
    ::close(in_fd);
    return -errno;
  }
  off_t off = static_cast<off_t>(begin) * static_cast<off_t>(stride);
  std::size_t remaining = static_cast<std::size_t>(n) * stride;
  while (remaining > 0) {
    ssize_t sent = sendfile(out_fd, in_fd, &off, remaining);
    if (sent <= 0) {
      ::close(in_fd);
      ::close(out_fd);
      return -errno;
    }
    remaining -= static_cast<std::size_t>(sent);
  }
  ::close(in_fd);
  ::close(out_fd);
  return 0;
}

}  // extern "C"

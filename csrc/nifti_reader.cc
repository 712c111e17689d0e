// TPU-native host-side NIfTI-1 decoder.
//
// The reference leans on nibabel's C extensions for NIfTI decode
// (/root/reference/README.md:83); this is the framework's native equivalent
// (SURVEY.md §2.2): parse header, inflate .nii.gz via zlib, convert any common
// voxel dtype to float32, min-max normalize to [0,1], and bilinear-resize
// (half-pixel centers, matching vaegan_tpu.data.nifti.resize_bilinear) — all in
// one pass per image, no Python in the loop. Exposed via a C ABI consumed with
// ctypes (which releases the GIL for the call, so a Python thread pool scales
// across cores). A batch API decodes many files with an internal thread pool.
//
// Build: make -C csrc   (produces libnifti_tpu.so)

#include <zlib.h>

#include <atomic>
#include <cmath>
#include <mutex>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

thread_local std::string g_error;

struct Header {
  int64_t shape[7];
  int ndim;
  int datatype;
  int64_t offset;
  float scl_slope, scl_inter;
  bool big_endian;
};

bool read_file(const char* path, std::vector<uint8_t>* out) {
  size_t n = std::strlen(path);
  bool gz = n > 3 && std::strcmp(path + n - 3, ".gz") == 0;
  if (gz) {
    gzFile f = gzopen(path, "rb");
    if (!f) { g_error = "cannot open file"; return false; }
    out->clear();
    uint8_t buf[1 << 16];
    int got;
    while ((got = gzread(f, buf, sizeof buf)) > 0)
      out->insert(out->end(), buf, buf + got);
    bool ok = got == 0;
    if (!ok) g_error = "gzip inflate failed";
    gzclose(f);
    return ok;
  }
  FILE* f = std::fopen(path, "rb");
  if (!f) { g_error = "cannot open file"; return false; }
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out->resize(sz);
  bool ok = std::fread(out->data(), 1, sz, f) == static_cast<size_t>(sz);
  if (!ok) g_error = "short read";
  std::fclose(f);
  return ok;
}

uint16_t bswap16(uint16_t v) { return __builtin_bswap16(v); }
uint32_t bswap32(uint32_t v) { return __builtin_bswap32(v); }

template <typename T>
T load_le(const uint8_t* p, bool be);

template <> int16_t load_le<int16_t>(const uint8_t* p, bool be) {
  uint16_t v; std::memcpy(&v, p, 2); if (be) v = bswap16(v);
  int16_t r; std::memcpy(&r, &v, 2); return r;
}
template <> int32_t load_le<int32_t>(const uint8_t* p, bool be) {
  uint32_t v; std::memcpy(&v, p, 4); if (be) v = bswap32(v);
  int32_t r; std::memcpy(&r, &v, 4); return r;
}
template <> float load_le<float>(const uint8_t* p, bool be) {
  uint32_t v; std::memcpy(&v, p, 4); if (be) v = bswap32(v);
  float r; std::memcpy(&r, &v, 4); return r;
}

bool parse_header(const std::vector<uint8_t>& raw, Header* h) {
  if (raw.size() < 348) { g_error = "truncated header"; return false; }
  int32_t sz = load_le<int32_t>(raw.data(), false);
  h->big_endian = false;
  if (sz != 348) {
    sz = load_le<int32_t>(raw.data(), true);
    if (sz != 348) { g_error = "not a NIfTI-1 file"; return false; }
    h->big_endian = true;
  }
  if (std::memcmp(raw.data() + 344, "ni1", 3) == 0) {
    // detached .hdr/.img pair: voxels are in a separate .img we don't open
    g_error = "detached NIfTI-1 pair ('ni1' magic) unsupported; use single-file .nii";
    return false;
  }
  if (std::memcmp(raw.data() + 344, "n+1", 3) != 0) {
    g_error = "bad magic"; return false;
  }
  int16_t ndim = load_le<int16_t>(raw.data() + 40, h->big_endian);
  if (ndim < 1 || ndim > 7) { g_error = "bad ndim"; return false; }
  h->ndim = ndim;
  for (int i = 0; i < 7; ++i) {
    int16_t d = (i < ndim) ? load_le<int16_t>(raw.data() + 42 + 2 * i, h->big_endian) : 1;
    h->shape[i] = d > 0 ? d : 1;
  }
  h->datatype = load_le<int16_t>(raw.data() + 70, h->big_endian);
  float vox = load_le<float>(raw.data() + 108, h->big_endian);
  // guard the float->int64 cast: a hostile/corrupt vox_offset beyond any real
  // file size would be UB to cast and nonsense anyway
  if (!(vox < 1e15f)) { g_error = "bad vox_offset"; return false; }
  h->offset = vox >= 348.f ? static_cast<int64_t>(vox) : 348;
  h->scl_slope = load_le<float>(raw.data() + 112, h->big_endian);
  h->scl_inter = load_le<float>(raw.data() + 116, h->big_endian);
  return true;
}

template <typename T>
void convert(const uint8_t* src, float* dst, int64_t n, bool be) {
  for (int64_t i = 0; i < n; ++i) {
    T v;
    std::memcpy(&v, src + i * sizeof(T), sizeof(T));
    if (be) {
      if (sizeof(T) == 2) { uint16_t u; std::memcpy(&u, &v, 2); u = bswap16(u); std::memcpy(&v, &u, 2); }
      if (sizeof(T) == 4) { uint32_t u; std::memcpy(&u, &v, 4); u = bswap32(u); std::memcpy(&v, &u, 4); }
      if (sizeof(T) == 8) { uint64_t u; std::memcpy(&u, &v, 8); u = __builtin_bswap64(u); std::memcpy(&v, &u, 8); }
    }
    dst[i] = static_cast<float>(v);
  }
}

// Decode to a (h, w) float32 image. NIfTI data is Fortran-order: element (x, y)
// lives at x + y * dim0. We emit row-major with rows = dim0 (x) to match the
// numpy `reshape(order="F")` view the python path (and nibabel) produces.
bool decode(const char* path, std::vector<float>* img, int64_t* h, int64_t* w) {
  std::vector<uint8_t> raw;
  if (!read_file(path, &raw)) return false;
  Header hd;
  if (!parse_header(raw, &hd)) return false;
  // squeeze singleton dims (np.squeeze parity: removing size-1 dims preserves the
  // Fortran layout of the remaining dims); exactly two must remain. Compute n
  // from the two surviving dims (a 7-dim product of int16 extents can overflow).
  std::vector<int64_t> dims;
  for (int i = 0; i < 7; ++i)
    if (hd.shape[i] > 1) dims.push_back(hd.shape[i]);
  if (dims.size() != 2) { g_error = "not a 2-D image after squeezing"; return false; }
  int64_t dim0 = dims[0], dim1 = dims[1];
  int64_t n = dim0 * dim1;
  size_t esize;
  switch (hd.datatype) {
    case 2: esize = 1; break;   case 4: esize = 2; break;
    case 8: esize = 4; break;   case 16: esize = 4; break;
    case 64: esize = 8; break;  case 256: esize = 1; break;
    case 512: esize = 2; break; case 768: esize = 4; break;
    default: g_error = "unsupported datatype"; return false;
  }
  if (raw.size() < static_cast<size_t>(hd.offset) + n * esize) {
    g_error = "truncated voxel data"; return false;
  }
  const uint8_t* src = raw.data() + hd.offset;
  std::vector<float> flat(n);
  switch (hd.datatype) {
    case 2:   convert<uint8_t>(src, flat.data(), n, hd.big_endian); break;
    case 4:   convert<int16_t>(src, flat.data(), n, hd.big_endian); break;
    case 8:   convert<int32_t>(src, flat.data(), n, hd.big_endian); break;
    case 16:  convert<float>(src, flat.data(), n, hd.big_endian); break;
    case 64:  convert<double>(src, flat.data(), n, hd.big_endian); break;
    case 256: convert<int8_t>(src, flat.data(), n, hd.big_endian); break;
    case 512: convert<uint16_t>(src, flat.data(), n, hd.big_endian); break;
    case 768: convert<uint32_t>(src, flat.data(), n, hd.big_endian); break;
  }
  if (std::isfinite(hd.scl_slope) && hd.scl_slope != 0.f && hd.scl_slope != 1.f) {
    float inter = std::isfinite(hd.scl_inter) ? hd.scl_inter : 0.f;
    for (auto& v : flat) v = v * hd.scl_slope + inter;
  } else if (hd.scl_slope == 1.f && std::isfinite(hd.scl_inter) && hd.scl_inter != 0.f) {
    for (auto& v : flat) v += hd.scl_inter;
  }
  // Fortran (x fastest) -> row-major (rows = x): transpose
  img->resize(n);
  for (int64_t y = 0; y < dim1; ++y)
    for (int64_t x = 0; x < dim0; ++x)
      (*img)[x * dim1 + y] = flat[x + y * dim0];
  *h = dim0;
  *w = dim1;
  return true;
}

void minmax_normalize(std::vector<float>& img) {
  float lo = img[0], hi = img[0];
  for (float v : img) { lo = std::min(lo, v); hi = std::max(hi, v); }
  float inv = 1.f / std::max(hi - lo, 1e-12f);
  for (auto& v : img) v = (v - lo) * inv;
}

void resize_bilinear(const float* src, int64_t h, int64_t w,
                     float* dst, int64_t oh, int64_t ow) {
  if (h == oh && w == ow) { std::memcpy(dst, src, sizeof(float) * h * w); return; }
  float sy = static_cast<float>(h) / oh, sx = static_cast<float>(w) / ow;
  for (int64_t oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    fy = std::fmin(std::fmax(fy, 0.f), static_cast<float>(h - 1));
    int64_t y0 = static_cast<int64_t>(fy);
    int64_t y1 = std::min(y0 + 1, h - 1);
    float wy = fy - y0;
    for (int64_t ox = 0; ox < ow; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      fx = std::fmin(std::fmax(fx, 0.f), static_cast<float>(w - 1));
      int64_t x0 = static_cast<int64_t>(fx);
      int64_t x1 = std::min(x0 + 1, w - 1);
      float wx = fx - x0;
      float top = src[y0 * w + x0] * (1 - wx) + src[y0 * w + x1] * wx;
      float bot = src[y1 * w + x0] * (1 - wx) + src[y1 * w + x1] * wx;
      dst[oy * ow + ox] = top * (1 - wy) + bot * wy;
    }
  }
}

}  // namespace

extern "C" {

const char* nifti_last_error() { return g_error.c_str(); }

// Decode one image: -> out (out_h * out_w float32, row-major). Returns 0 on ok.
int nifti_decode_resize(const char* path, float* out, int out_h, int out_w,
                        int normalize) {
  std::vector<float> img;
  int64_t h, w;
  if (!decode(path, &img, &h, &w)) return 1;
  if (normalize) minmax_normalize(img);
  resize_bilinear(img.data(), h, w, out, out_h, out_w);
  return 0;
}

// Decode a batch of `count` files into out (count * out_h * out_w), using
// `threads` worker threads (0 = hardware concurrency). Returns 0 if ALL decoded.
int nifti_decode_batch(const char** paths, int count, float* out, int out_h,
                       int out_w, int normalize, int threads) {
  if (threads <= 0) threads = static_cast<int>(std::thread::hardware_concurrency());
  threads = std::max(1, std::min(threads, count));
  std::atomic<int> next(0), failures(0);
  std::mutex err_mu;
  std::string batch_error;  // g_error is thread_local: surface workers' messages
  auto worker = [&] {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= count) return;
      if (nifti_decode_resize(paths[i], out + static_cast<int64_t>(i) * out_h * out_w,
                              out_h, out_w, normalize) != 0) {
        failures.fetch_add(1);
        std::lock_guard<std::mutex> lk(err_mu);
        if (!batch_error.empty()) batch_error += "; ";
        batch_error += std::string(paths[i]) + ": " + g_error;
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  if (failures.load() != 0) {
    g_error = batch_error;  // propagate to the caller's thread-local
    return 1;
  }
  return 0;
}

}  // extern "C"

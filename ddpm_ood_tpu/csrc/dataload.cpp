// Native data-loading core: file decode + deterministic transform chain.
//
// TPU-native counterpart of the reference's data pipeline, whose heavy lifting
// lives in native code it merely imports (MONAI CacheDataset/ThreadDataLoader
// over nibabel/PIL/numpy C loops — reference
// src/data/get_train_and_val_dataloader.py:67-138).  Here the whole per-item
// path — .npy / NIfTI-1(.gz) decode, channel-first normalization, center crop,
// endpoint-aligned linear resize, min-max intensity scale, deterministic flips
// — is one C++ call, and a whole cache-fill is one OpenMP-parallel batch call.
// Python binding: ddpm_ood_tpu/data/_native.py (ctypes; no pybind11 in image).
//
// Semantics mirror ddpm_ood_tpu/data/transforms.py (itself the parity port of
// the reference MONAI chain) exactly:
//   load  -> ensure_channel_first(+grayscale modality select)
//         -> center_spatial_crop(roi) -> resize(image_size^S)
//         -> scale_intensity[0,1] -> vflip/hflip
// Resize matches scipy.ndimage.zoom(order=1, grid_mode=False): output index i
// maps to input coordinate i*(in-1)/(out-1) (multilinear, endpoint-aligned);
// intensity scale matches NumPy-2 weak-scalar float32 arithmetic bit-for-bit.

#include <zlib.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

namespace {

enum ErrCode : int64_t {
  OK = 0,
  ERR_IO = -1,      // unreadable / truncated file
  ERR_FORMAT = -2,  // unsupported or malformed npy/nifti content
  ERR_RANK = -3,    // rank incompatible with spatial_dim
  ERR_SHAPE = -5,   // batch item shape mismatch
  ERR_ARGS = -6,    // bad call arguments
};

struct Arr {
  std::vector<float> data;  // C-order
  std::vector<int64_t> shape;
  int64_t size() const {
    int64_t n = 1;
    for (int64_t s : shape) n *= s;
    return n;
  }
};

bool read_whole_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  if (sz < 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(sz));
  size_t got = sz ? std::fread(out.data(), 1, out.size(), f) : 0;
  std::fclose(f);
  return got == out.size();
}

// Incremental gzip/plain-file reader: decompresses (or reads) only as many
// bytes as the caller asks for.  Lets the NIfTI path stop after modality 0
// when the transform would discard the rest (the reference's BraTS
// 4-modality -> 1 Lambdad select) — skipping up to 3/4 of the inflate work.
struct ByteSource {
  std::vector<uint8_t> comp;  // gz: whole compressed file
  std::vector<uint8_t> out;   // decoded bytes so far
  z_stream strm;
  FILE* f = nullptr;  // plain-file mode
  bool gz = false, inited = false, done = false, failed = false;

  ~ByteSource() {
    if (inited) inflateEnd(&strm);
    if (f) std::fclose(f);
  }

  bool open(const char* path, bool is_gz) {
    gz = is_gz;
    if (!gz) {
      f = std::fopen(path, "rb");
      return f != nullptr;
    }
    if (!read_whole_file(path, comp) || comp.size() < 18) return false;
    std::memset(&strm, 0, sizeof(strm));
    if (inflateInit2(&strm, 16 + MAX_WBITS) != Z_OK) return false;
    strm.next_in = comp.data();
    strm.avail_in = static_cast<uInt>(comp.size());
    inited = true;
    return true;
  }

  // grow out to >= want decoded bytes (or EOF); false on hard error
  bool ensure(size_t want) {
    if (failed) return false;
    if (!gz) {
      while (out.size() < want && !done) {
        size_t old = out.size();
        size_t chunk = std::max<size_t>(want - old, size_t(1) << 20);
        out.resize(old + chunk);
        size_t got = std::fread(out.data() + old, 1, chunk, f);
        out.resize(old + got);
        if (got < chunk) done = true;
      }
      return out.size() >= want;  // EOF short of `want` is a hard error
    }
    while (out.size() < want && !done) {
      size_t old = out.size();
      size_t chunk = std::max<size_t>(want - old, size_t(1) << 20);
      out.resize(old + chunk);
      strm.next_out = out.data() + old;
      strm.avail_out = static_cast<uInt>(chunk);
      int rc = inflate(&strm, Z_NO_FLUSH);
      out.resize(old + (chunk - strm.avail_out));
      if (rc == Z_STREAM_END) {
        // multi-member archives (bgzip-style concatenated gzip, which
        // nibabel/Python gzip read transparently): reset and keep inflating
        if (strm.avail_in > 0 && inflateReset(&strm) == Z_OK) {
          continue;
        }
        done = true;
      } else if (rc != Z_OK) {
        failed = out.size() < want;
        done = true;
      }
    }
    return out.size() >= want;
  }
};

bool ends_with(const std::string& s, const char* suf) {
  size_t n = std::strlen(suf);
  return s.size() >= n && s.compare(s.size() - n, n, suf) == 0;
}

// ---- element decode: (code, swap) -> float ---------------------------------

// dtype codes shared by the npy and nifti decoders
enum DType { U8, I8, I16, U16, I32, U32, I64, U64, F32, F64, BAD };

int64_t dtype_itemsize(DType t) {
  switch (t) {
    case U8:
    case I8:
      return 1;
    case I16:
    case U16:
      return 2;
    case I32:
    case U32:
    case F32:
      return 4;
    case I64:
    case U64:
    case F64:
      return 8;
    default:
      return 0;
  }
}

template <typename T>
T load_swapped(const uint8_t* p, bool swap) {
  T v;
  if (!swap) {
    std::memcpy(&v, p, sizeof(T));
    return v;
  }
  uint8_t tmp[sizeof(T)];
  for (size_t i = 0; i < sizeof(T); ++i) tmp[i] = p[sizeof(T) - 1 - i];
  std::memcpy(&v, tmp, sizeof(T));
  return v;
}

float decode_elem(const uint8_t* p, DType t, bool swap) {
  switch (t) {
    case U8:
      return static_cast<float>(*p);
    case I8:
      return static_cast<float>(*reinterpret_cast<const int8_t*>(p));
    case I16:
      return static_cast<float>(load_swapped<int16_t>(p, swap));
    case U16:
      return static_cast<float>(load_swapped<uint16_t>(p, swap));
    case I32:
      return static_cast<float>(load_swapped<int32_t>(p, swap));
    case U32:
      return static_cast<float>(load_swapped<uint32_t>(p, swap));
    case I64:
      return static_cast<float>(load_swapped<int64_t>(p, swap));
    case U64:
      return static_cast<float>(load_swapped<uint64_t>(p, swap));
    case F32: {
      float v = load_swapped<float>(p, swap);
      return v;
    }
    case F64:
      return static_cast<float>(load_swapped<double>(p, swap));
    default:
      return 0.0f;
  }
}

template <typename T>
void convert_contig(const uint8_t* raw, bool swap, int64_t n, float* out) {
  if (!swap) {
    const T* src = reinterpret_cast<const T*>(raw);
    for (int64_t k = 0; k < n; ++k) out[k] = static_cast<float>(src[k]);
  } else {
    for (int64_t k = 0; k < n; ++k)
      out[k] = static_cast<float>(load_swapped<T>(raw + k * sizeof(T), true));
  }
}

void convert_dispatch(const uint8_t* raw, DType dt, bool swap, int64_t n, float* out) {
  switch (dt) {
    case U8:
      return convert_contig<uint8_t>(raw, false, n, out);
    case I8:
      return convert_contig<int8_t>(raw, false, n, out);
    case I16:
      return convert_contig<int16_t>(raw, swap, n, out);
    case U16:
      return convert_contig<uint16_t>(raw, swap, n, out);
    case I32:
      return convert_contig<int32_t>(raw, swap, n, out);
    case U32:
      return convert_contig<uint32_t>(raw, swap, n, out);
    case I64:
      return convert_contig<int64_t>(raw, swap, n, out);
    case U64:
      return convert_contig<uint64_t>(raw, swap, n, out);
    case F32:
      return convert_contig<float>(raw, swap, n, out);
    case F64:
      return convert_contig<double>(raw, swap, n, out);
    default:
      break;
  }
}

// Convert a raw buffer (C or Fortran order) to a C-order float array.
int64_t raw_to_float(const uint8_t* raw, int64_t raw_len, DType dt, bool swap,
                     bool fortran, const std::vector<int64_t>& shape, Arr& out) {
  int64_t isz = dtype_itemsize(dt);
  if (isz == 0) return ERR_FORMAT;
  // overflow-guarded element count: a corrupted header claiming a huge shape
  // must come back as ERR_FORMAT, not wrap int64 past the raw_len check and
  // then throw (uncatchable across the extern "C"/OpenMP boundary)
  const int64_t kMax = std::numeric_limits<int64_t>::max();
  int64_t n = 1;
  for (int64_t s : shape) {
    if (s <= 0) return ERR_FORMAT;
    if (n > kMax / s) return ERR_FORMAT;
    n *= s;
  }
  if (n > kMax / isz) return ERR_FORMAT;
  if (raw_len < n * isz) return ERR_IO;
  out.shape = shape;
  out.data.resize(static_cast<size_t>(n));
  int ndim = static_cast<int>(shape.size());
  if (!fortran || ndim <= 1) {
    convert_dispatch(raw, dt, swap, n, out.data.data());
    return OK;
  }
  // Fortran -> C: convert sequentially first (vectorizable tight loop), then
  // permute with nested loops (rank <= 4), reading sequentially from the
  // converted buffer and writing strided — memory-bound, no per-element math.
  std::vector<float> seq(static_cast<size_t>(n));
  convert_dispatch(raw, dt, swap, n, seq.data());
  int64_t s4[4] = {1, 1, 1, 1};
  for (int d = 0; d < ndim; ++d) s4[d] = shape[d];
  const int64_t X = s4[0], Y = s4[1], Z = s4[2], T = s4[3];
  // fortran linear index = x + X*(y + Y*(z + Z*t)); iterate in that order
  float* dst = out.data.data();
  const float* src = seq.data();
  int64_t k = 0;
  for (int64_t t = 0; t < T; ++t)
    for (int64_t z = 0; z < Z; ++z)
      for (int64_t y = 0; y < Y; ++y)
        for (int64_t x = 0; x < X; ++x)
          dst[((x * Y + y) * Z + z) * T + t] = src[k++];
  return OK;
}

// ---- .npy ------------------------------------------------------------------

DType npy_descr_dtype(const std::string& descr, bool& swap) {
  if (descr.size() < 2) return BAD;
  char bo = descr[0];
  std::string code = descr.substr(1);
  bool big = (bo == '>');
  bool has_bo = (bo == '<' || bo == '>' || bo == '|' || bo == '=');
  if (!has_bo) {
    code = descr;
    big = false;
  }
  // host is little-endian on every supported platform here
  swap = big;
  if (code == "u1") return U8;
  if (code == "i1") return I8;
  if (code == "i2") return I16;
  if (code == "u2") return U16;
  if (code == "i4") return I32;
  if (code == "u4") return U32;
  if (code == "i8") return I64;
  if (code == "u8") return U64;
  if (code == "f4") return F32;
  if (code == "f8") return F64;
  return BAD;
}

int64_t parse_npy(const std::vector<uint8_t>& buf, Arr& out) {
  static const uint8_t MAGIC[6] = {0x93, 'N', 'U', 'M', 'P', 'Y'};
  if (buf.size() < 10 || std::memcmp(buf.data(), MAGIC, 6) != 0) return ERR_FORMAT;
  int major = buf[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = buf[8] | (buf[9] << 8);
    hoff = 10;
  } else if (major == 2 || major == 3) {
    if (buf.size() < 12) return ERR_FORMAT;
    hlen = static_cast<size_t>(buf[8]) | (static_cast<size_t>(buf[9]) << 8) |
           (static_cast<size_t>(buf[10]) << 16) | (static_cast<size_t>(buf[11]) << 24);
    hoff = 12;
  } else {
    return ERR_FORMAT;
  }
  if (buf.size() < hoff + hlen) return ERR_IO;
  std::string hdr(reinterpret_cast<const char*>(buf.data() + hoff), hlen);

  auto find_value = [&](const char* key) -> std::string {
    size_t k = hdr.find(key);
    if (k == std::string::npos) return "";
    size_t c = hdr.find(':', k);
    if (c == std::string::npos) return "";
    size_t e = c + 1;
    // value runs to the matching ',' at depth 0 or '}' (tuples carry parens)
    int depth = 0;
    size_t start = e;
    while (e < hdr.size()) {
      char ch = hdr[e];
      if (ch == '(' || ch == '[') depth++;
      if (ch == ')' || ch == ']') depth--;
      if (depth == 0 && (ch == ',' || ch == '}')) {
        // a ',' directly after a ')' or at depth 0 ends the value — but a
        // tuple's internal commas are at depth>0, so this is correct
        if (ch == ',' && depth == 0 && e > start) break;
        if (ch == '}') break;
      }
      ++e;
    }
    std::string v = hdr.substr(start, e - start);
    // trim whitespace and quotes
    size_t a = v.find_first_not_of(" \t'\"");
    size_t b = v.find_last_not_of(" \t'\"");
    if (a == std::string::npos) return "";
    return v.substr(a, b - a + 1);
  };

  std::string descr = find_value("'descr'");
  std::string fortran = find_value("'fortran_order'");
  std::string shape_s = find_value("'shape'");
  if (descr.empty() || shape_s.empty()) return ERR_FORMAT;
  bool swap = false;
  DType dt = npy_descr_dtype(descr, swap);
  if (dt == BAD) return ERR_FORMAT;
  bool is_fortran = fortran.find("True") != std::string::npos;

  std::vector<int64_t> shape;
  {
    const char* p = shape_s.c_str();
    while (*p) {
      if (*p >= '0' && *p <= '9') {
        char* end;
        shape.push_back(std::strtoll(p, &end, 10));
        p = end;
      } else {
        ++p;
      }
    }
  }
  if (shape.empty()) return ERR_FORMAT;  // 0-d arrays are not images
  if (shape.size() > 4) return ERR_RANK;
  return raw_to_float(buf.data() + hoff + hlen,
                      static_cast<int64_t>(buf.size() - hoff - hlen), dt, swap,
                      is_fortran, shape, out);
}

// ---- NIfTI-1 ---------------------------------------------------------------
// Mirrors ddpm_ood_tpu/data/nifti.py:load_nifti (which replaces the
// reference's nibabel path): header at 0..348, dims/datatype/scl/vox_offset,
// data Fortran-ordered, logical shape (X, Y, Z[, T]), slope/inter applied.

DType nifti_dtype(int code) {
  switch (code) {
    case 2:
      return U8;
    case 4:
      return I16;
    case 8:
      return I32;
    case 16:
      return F32;
    case 64:
      return F64;
    case 256:
      return I8;
    case 512:
      return U16;
    case 768:
      return U32;
    case 1024:
      return I64;
    case 1280:
      return U64;
    default:
      return BAD;
  }
}

// Load a NIfTI volume from `path`, decoding only the bytes the transform
// chain will keep.  When `grayscale` and the volume is (X, Y, Z, T) with a
// channel-like T (the BraTS 4-modality case), modality 0 is the FIRST
// contiguous X*Y*Z chunk of the Fortran-ordered stream — so decompression
// stops there and the logical shape returned is (X, Y, Z), which
// ensure_channel_first then unsqueezes to the identical (1, X, Y, Z) result.
int64_t load_nifti(const char* path, bool is_gz, int64_t S, bool grayscale,
                   Arr& out) {
  ByteSource src;
  if (!src.open(path, is_gz)) return ERR_IO;
  if (!src.ensure(348)) return ERR_IO;
  const uint8_t* hdr = src.out.data();
  auto rd_i32 = [&](size_t off, bool sw) { return load_swapped<int32_t>(hdr + off, sw); };
  auto rd_i16 = [&](size_t off, bool sw) { return load_swapped<int16_t>(hdr + off, sw); };
  auto rd_f32 = [&](size_t off, bool sw) { return load_swapped<float>(hdr + off, sw); };
  bool swap = false;
  if (rd_i32(0, false) != 348) {
    if (rd_i32(0, true) != 348) return ERR_FORMAT;
    swap = true;
  }
  if (!(hdr[344] == 'n' && (hdr[345] == '+' || hdr[345] == 'i'))) return ERR_FORMAT;
  int ndim = rd_i16(40, swap);
  if (ndim < 1 || ndim > 4) return ERR_RANK;  // transforms support rank <= 4
  std::vector<int64_t> shape;
  for (int d = 0; d < ndim; ++d) shape.push_back(rd_i16(42 + 2 * d, swap));
  int datatype = rd_i16(70, swap);
  float scl_slope = rd_f32(112, swap);
  float scl_inter = rd_f32(116, swap);
  int64_t vox_offset = static_cast<int64_t>(rd_f32(108, swap));
  DType dt = nifti_dtype(datatype);
  if (dt == BAD) return ERR_FORMAT;
  if (vox_offset < 348) return ERR_IO;

  // modality-0 early stop (mirrors ensure_channel_first's moveaxis+select)
  auto chanlike = [](int64_t c) { return c == 1 || c == 3 || c == 4; };
  std::vector<int64_t> keep_shape = shape;
  if (grayscale && ndim == static_cast<int>(S) + 1 && chanlike(shape.back()) &&
      !chanlike(shape.front())) {
    keep_shape.pop_back();
  }
  int64_t n_keep = 1;
  for (int64_t s : keep_shape) {
    if (s <= 0) return ERR_FORMAT;
    n_keep *= s;
  }
  int64_t need = vox_offset + n_keep * dtype_itemsize(dt);
  if (!src.ensure(static_cast<size_t>(need))) return ERR_IO;
  // re-acquire: ensure() may have reallocated
  int64_t rc = raw_to_float(src.out.data() + vox_offset,
                            static_cast<int64_t>(src.out.size()) - vox_offset, dt,
                            swap, /*fortran=*/true, keep_shape, out);
  if (rc != OK) return rc;
  // nifti.py: apply only when slope not in {0, 1} or inter != 0; slope 0 -> 1
  double slope = static_cast<double>(scl_slope), inter = static_cast<double>(scl_inter);
  if ((slope != 0.0 && slope != 1.0) || inter != 0.0) {
    float slope_eff = (scl_slope != 0.0f) ? scl_slope : 1.0f;
    for (float& v : out.data) v = v * slope_eff + scl_inter;
  }
  return OK;
}

// ---- transform chain -------------------------------------------------------

// EnsureChannelFirstd + Lambdad parity (transforms.py:ensure_channel_first)
int64_t ensure_channel_first(Arr& a, int64_t S, bool grayscale) {
  int64_t nd = static_cast<int64_t>(a.shape.size());
  if (nd == S) {
    a.shape.insert(a.shape.begin(), 1);
  } else if (nd == S + 1) {
    auto chanlike = [](int64_t c) { return c == 1 || c == 3 || c == 4; };
    if (chanlike(a.shape.back()) && !chanlike(a.shape.front())) {
      // channel-last raster -> channel-first (np.moveaxis(x, -1, 0))
      int64_t C = a.shape.back();
      int64_t spatial = a.size() / C;
      std::vector<float> moved(a.data.size());
      for (int64_t s = 0; s < spatial; ++s)
        for (int64_t c = 0; c < C; ++c) moved[c * spatial + s] = a.data[s * C + c];
      a.data.swap(moved);
      std::vector<int64_t> ns;
      ns.push_back(C);
      for (int64_t d = 0; d + 1 < nd; ++d) ns.push_back(a.shape[d]);
      a.shape = ns;
    }
    // else: already channel-first
  } else {
    return ERR_RANK;
  }
  if (grayscale && a.shape[0] > 1) {  // select modality 0 (BraTS quirk)
    int64_t per = a.size() / a.shape[0];
    a.data.resize(static_cast<size_t>(per));
    a.shape[0] = 1;
  }
  return OK;
}

void center_crop(Arr& a, const int64_t* roi, int64_t roi_n) {
  int64_t nd = static_cast<int64_t>(a.shape.size());
  int64_t S = nd - 1;
  int64_t start[4] = {0, 0, 0, 0}, len[4];
  len[0] = a.shape[0];
  bool any = false;
  for (int64_t d = 0; d < S; ++d) {
    int64_t dim = a.shape[d + 1];
    int64_t r = (d < roi_n) ? roi[d] : -1;
    if (r < 0 || r >= dim) {
      len[d + 1] = dim;
    } else {
      start[d + 1] = std::max<int64_t>((dim - r) / 2, 0);
      len[d + 1] = r;
      any = true;
    }
  }
  if (!any) return;
  // pad unused trailing dims to 1 for a uniform 4-d copy loop
  int64_t s4[4] = {1, 1, 1, 1}, st4[4] = {0, 0, 0, 0}, ln4[4] = {1, 1, 1, 1};
  for (int64_t d = 0; d < nd; ++d) {
    s4[d] = a.shape[d];
    st4[d] = start[d];
    ln4[d] = len[d];
  }
  std::vector<float> out(static_cast<size_t>(ln4[0] * ln4[1] * ln4[2] * ln4[3]));
  size_t k = 0;
  for (int64_t c = 0; c < ln4[0]; ++c)
    for (int64_t i = 0; i < ln4[1]; ++i)
      for (int64_t j = 0; j < ln4[2]; ++j) {
        const float* src = a.data.data() +
                           (((c + st4[0]) * s4[1] + (i + st4[1])) * s4[2] + (j + st4[2])) * s4[3] +
                           st4[3];
        std::memcpy(out.data() + k, src, sizeof(float) * ln4[3]);
        k += ln4[3];
      }
  a.data.swap(out);
  for (int64_t d = 0; d < nd; ++d) a.shape[d] = len[d];
}

// scipy.ndimage.zoom(order=1, grid_mode=False) parity: pos = i*(in-1)/(out-1)
double zoom_factor(int64_t in, int64_t out) {
  return (out > 1) ? static_cast<double>(in - 1) / static_cast<double>(out - 1) : 0.0;
}

void lerp_axis_pos(double pos, int64_t in, int64_t& i0, int64_t& i1, double& w1) {
  if (pos <= 0.0) {
    i0 = i1 = 0;
    w1 = 0.0;
    return;
  }
  if (pos >= static_cast<double>(in - 1)) {
    i0 = i1 = in - 1;
    w1 = 0.0;
    return;
  }
  i0 = static_cast<int64_t>(pos);
  i1 = i0 + 1;
  w1 = pos - static_cast<double>(i0);
}

void resize_linear(Arr& a, int64_t target, int64_t S) {
  bool same = true;
  for (int64_t d = 0; d < S; ++d) same = same && (a.shape[d + 1] == target);
  if (same) return;
  int64_t C = a.shape[0];
  if (S == 2) {
    int64_t H = a.shape[1], W = a.shape[2];
    double zy = zoom_factor(H, target), zx = zoom_factor(W, target);
    std::vector<float> out(static_cast<size_t>(C * target * target));
    for (int64_t c = 0; c < C; ++c) {
      const float* src = a.data.data() + c * H * W;
      float* dst = out.data() + c * target * target;
      for (int64_t i = 0; i < target; ++i) {
        int64_t y0, y1;
        double wy;
        lerp_axis_pos(i * zy, H, y0, y1, wy);
        for (int64_t j = 0; j < target; ++j) {
          int64_t x0, x1;
          double wx;
          lerp_axis_pos(j * zx, W, x0, x1, wx);
          double v = (1 - wy) * ((1 - wx) * src[y0 * W + x0] + wx * src[y0 * W + x1]) +
                     wy * ((1 - wx) * src[y1 * W + x0] + wx * src[y1 * W + x1]);
          dst[i * target + j] = static_cast<float>(v);
        }
      }
    }
    a.data.swap(out);
    a.shape = {C, target, target};
  } else {  // S == 3
    int64_t X = a.shape[1], Y = a.shape[2], Z = a.shape[3];
    double zx = zoom_factor(X, target), zy = zoom_factor(Y, target), zz = zoom_factor(Z, target);
    std::vector<float> out(static_cast<size_t>(C * target * target * target));
    for (int64_t c = 0; c < C; ++c) {
      const float* src = a.data.data() + c * X * Y * Z;
      float* dst = out.data() + c * target * target * target;
      for (int64_t i = 0; i < target; ++i) {
        int64_t x0, x1;
        double wx;
        lerp_axis_pos(i * zx, X, x0, x1, wx);
        for (int64_t j = 0; j < target; ++j) {
          int64_t y0, y1;
          double wy;
          lerp_axis_pos(j * zy, Y, y0, y1, wy);
          for (int64_t k = 0; k < target; ++k) {
            int64_t z0, z1;
            double wz;
            lerp_axis_pos(k * zz, Z, z0, z1, wz);
            auto at = [&](int64_t x, int64_t y, int64_t z) {
              return static_cast<double>(src[(x * Y + y) * Z + z]);
            };
            double v000 = at(x0, y0, z0), v001 = at(x0, y0, z1);
            double v010 = at(x0, y1, z0), v011 = at(x0, y1, z1);
            double v100 = at(x1, y0, z0), v101 = at(x1, y0, z1);
            double v110 = at(x1, y1, z0), v111 = at(x1, y1, z1);
            double v = (1 - wx) * ((1 - wy) * ((1 - wz) * v000 + wz * v001) +
                                   wy * ((1 - wz) * v010 + wz * v011)) +
                       wx * ((1 - wy) * ((1 - wz) * v100 + wz * v101) +
                             wy * ((1 - wz) * v110 + wz * v111));
            dst[(i * target + j) * target + k] = static_cast<float>(v);
          }
        }
      }
    }
    a.data.swap(out);
    a.shape = {C, target, target, target};
  }
}

// ScaleIntensityd parity: float32 arithmetic (NumPy-2 weak-scalar semantics).
// NaN inputs poison min/max in NumPy (x.min() is NaN -> every output element
// is NaN); std::min/max would silently skip them, so track NaN explicitly.
void scale_intensity(Arr& a) {
  if (a.data.empty()) return;
  float lo = a.data[0], hi = a.data[0];
  bool has_nan = false;
  for (float v : a.data) {
    has_nan = has_nan || std::isnan(v);
    lo = std::min(lo, v);
    hi = std::max(hi, v);
  }
  if (has_nan) {
    std::fill(a.data.begin(), a.data.end(),
              std::numeric_limits<float>::quiet_NaN());
    return;
  }
  if (static_cast<double>(hi) - static_cast<double>(lo) < 1e-12) {
    std::fill(a.data.begin(), a.data.end(), 0.0f);
    return;
  }
  float range = hi - lo;
  for (float& v : a.data) v = (v - lo) / range;
}

void flip_spatial(Arr& a, int64_t axis) {  // axis: 0-based spatial axis
  int64_t nd = static_cast<int64_t>(a.shape.size());
  int64_t s4[4] = {1, 1, 1, 1};
  for (int64_t d = 0; d < nd; ++d) s4[d] = a.shape[d];
  int64_t f = axis + 1;  // array axis
  std::vector<float> out(a.data.size());
  for (int64_t c = 0; c < s4[0]; ++c)
    for (int64_t i = 0; i < s4[1]; ++i)
      for (int64_t j = 0; j < s4[2]; ++j)
        for (int64_t k = 0; k < s4[3]; ++k) {
          int64_t src_idx[4] = {c, i, j, k};
          src_idx[f] = s4[f] - 1 - src_idx[f];
          out[((c * s4[1] + i) * s4[2] + j) * s4[3] + k] =
              a.data[((src_idx[0] * s4[1] + src_idx[1]) * s4[2] + src_idx[2]) * s4[3] +
                     src_idx[3]];
        }
  a.data.swap(out);
}

int64_t transform_one_impl(const char* path, int64_t spatial_dim, int64_t is_grayscale,
                           const int64_t* roi, int64_t roi_n, int64_t image_size,
                           int64_t vflip, int64_t hflip, Arr& a) {
  if (spatial_dim != 2 && spatial_dim != 3) return ERR_ARGS;
  std::string p(path);
  int64_t rc;
  if (ends_with(p, ".npy")) {
    std::vector<uint8_t> buf;
    if (!read_whole_file(path, buf)) return ERR_IO;
    rc = parse_npy(buf, a);
  } else if (ends_with(p, ".nii") || ends_with(p, ".nii.gz")) {
    rc = load_nifti(path, ends_with(p, ".gz"), spatial_dim, is_grayscale != 0, a);
  } else {
    return ERR_FORMAT;  // png/jpg stay on the Python/PIL path
  }
  if (rc != OK) return rc;
  rc = ensure_channel_first(a, spatial_dim, is_grayscale != 0);
  if (rc != OK) return rc;
  if (roi_n > 0) center_crop(a, roi, roi_n);
  if (image_size > 0) resize_linear(a, image_size, spatial_dim);
  scale_intensity(a);
  if (vflip) flip_spatial(a, 0);
  if (hflip) flip_spatial(a, 1);
  return OK;
}

// Exception firewall: a C++ exception must never escape the extern "C" (or
// OpenMP) boundary — bad_alloc on a legitimately huge volume, length_error on
// a hostile header, etc. all become ERR_FORMAT for the Python fallback.
int64_t transform_one(const char* path, int64_t spatial_dim, int64_t is_grayscale,
                      const int64_t* roi, int64_t roi_n, int64_t image_size,
                      int64_t vflip, int64_t hflip, Arr& a) {
  try {
    return transform_one_impl(path, spatial_dim, is_grayscale, roi, roi_n,
                              image_size, vflip, hflip, a);
  } catch (...) {
    return ERR_FORMAT;
  }
}

}  // namespace

extern "C" {

// Decode + transform one item.  Returns 0 on success (data in `out`,
// logical shape in shape_out[0..3], trailing dims 1); a positive value =
// required float count when `cap` is too small (shape_out still filled);
// negative = error code.
int64_t dl_item(const char* path, int64_t spatial_dim, int64_t is_grayscale,
                const int64_t* roi, int64_t roi_n, int64_t image_size,
                int64_t vflip, int64_t hflip, float* out, int64_t cap,
                int64_t* shape_out) {
  Arr a;
  int64_t rc = transform_one(path, spatial_dim, is_grayscale, roi, roi_n, image_size,
                             vflip, hflip, a);
  if (rc != OK) return rc;
  for (int d = 0; d < 4; ++d)
    shape_out[d] = (d < static_cast<int>(a.shape.size())) ? a.shape[d] : 1;
  int64_t n = a.size();
  if (n > cap) return n;
  std::memcpy(out, a.data.data(), sizeof(float) * static_cast<size_t>(n));
  return OK;
}

// Decode + transform a batch in parallel.  `out` must hold n*item_floats
// floats; every item must produce exactly expect_shape (4 entries, trailing
// dims 1) or its errs[i] is set to ERR_SHAPE.  An item whose errs[i] is
// preset to DL_SKIP (-100) is skipped (its out row is assumed already
// filled by the caller — the shape-probe item) and reported as OK.
// Returns the number of failed items (0 = clean); per-item status in errs.
int64_t dl_batch(const char** paths, int64_t n, int64_t spatial_dim,
                 int64_t is_grayscale, const int64_t* roi, int64_t roi_n,
                 int64_t image_size, int64_t vflip, int64_t hflip, float* out,
                 int64_t item_floats, const int64_t* expect_shape, int64_t* errs,
                 int64_t num_threads) {
  const int64_t DL_SKIP = -100;
  int64_t failed = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic) num_threads(static_cast<int>(num_threads > 0 ? num_threads : 1)) reduction(+ : failed)
#endif
  for (int64_t i = 0; i < n; ++i) {
    if (errs[i] == DL_SKIP) {
      errs[i] = OK;
      continue;
    }
    Arr a;
    int64_t rc = transform_one(paths[i], spatial_dim, is_grayscale, roi, roi_n,
                               image_size, vflip, hflip, a);
    if (rc == OK) {
      int64_t sh[4] = {1, 1, 1, 1};
      for (int d = 0; d < static_cast<int>(a.shape.size()); ++d) sh[d] = a.shape[d];
      bool match = true;
      for (int d = 0; d < 4; ++d) match = match && (sh[d] == expect_shape[d]);
      if (!match || a.size() > item_floats) {
        rc = ERR_SHAPE;
      } else {
        std::memcpy(out + i * item_floats, a.data.data(),
                    sizeof(float) * static_cast<size_t>(a.size()));
      }
    }
    errs[i] = rc;
    if (rc != OK) failed += 1;
  }
  return failed;
}

}  // extern "C"

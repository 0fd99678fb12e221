// bimio — native IO runtime for bicubic_interpolation_model_tpu.
//
// Fills the role libvips (sharp) and pngjs play in the reference: PNG
// decode/encode to raw RGBA8 and the 12-byte-header float32 tensor files
// (data_generator.js DataSaver format). Exposed to Python via ctypes
// (runtime/native.py). Only depends on zlib.
//
// PNG support: 8/16-bit, color types gray(0)/RGB(2)/palette(3)/gray+A(4)/
// RGBA(6), non-interlaced. 16-bit is reduced to 8 by taking the high byte.
// Interlaced (Adam7) images return an error and the Python layer falls back
// to PIL.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <new>
#include <vector>
#include <zlib.h>

// Dimension sanity bounds: reject anything a real image would never hit
// before any size arithmetic, so (stride+1)*h / w*h*4 cannot wrap size_t
// and crafted headers cannot trigger undersized allocations.
static const uint32_t kMaxDim = 1u << 20;          // 1M px per axis
static const uint64_t kMaxPixels = 1ull << 28;     // 256 MPix budget

extern "C" {

static uint32_t rd32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

void bim_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

static int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// returns 0 on success; *out is malloc'd RGBA8 (w*h*4)
static int decode_png_impl(const uint8_t* buf, size_t len, uint8_t** out,
                           uint32_t* out_w, uint32_t* out_h) {
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || memcmp(buf, sig, 8) != 0) return -1;

  uint32_t w = 0, h = 0;
  int bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> plte;       // rgb triples
  std::vector<uint8_t> trns;       // palette alpha

  size_t pos = 8;
  while (pos + 8 <= len) {
    uint32_t clen = rd32(buf + pos);
    const uint8_t* ctype = buf + pos + 4;
    const uint8_t* cdata = buf + pos + 8;
    if (pos + 12 + clen > len) return -2;
    if (!memcmp(ctype, "IHDR", 4)) {
      if (clen < 13) return -3;
      w = rd32(cdata);
      h = rd32(cdata + 4);
      bit_depth = cdata[8];
      color_type = cdata[9];
      interlace = cdata[12];
    } else if (!memcmp(ctype, "PLTE", 4)) {
      plte.assign(cdata, cdata + clen);
    } else if (!memcmp(ctype, "tRNS", 4)) {
      trns.assign(cdata, cdata + clen);
    } else if (!memcmp(ctype, "IDAT", 4)) {
      idat.insert(idat.end(), cdata, cdata + clen);
    } else if (!memcmp(ctype, "IEND", 4)) {
      break;
    }
    pos += 12 + clen;
  }
  if (!w || !h || idat.empty()) return -4;
  if (w > kMaxDim || h > kMaxDim || uint64_t(w) * h > kMaxPixels) return -12;
  if (interlace != 0) return -5;  // Adam7 unsupported → caller falls back
  if (bit_depth != 8 && bit_depth != 16) return -6;

  int src_ch;
  switch (color_type) {
    case 0: src_ch = 1; break;
    case 2: src_ch = 3; break;
    case 3: src_ch = 1; break;
    case 4: src_ch = 2; break;
    case 6: src_ch = 4; break;
    default: return -7;
  }
  if (color_type == 3 && bit_depth != 8) return -6;

  const int bytes_per_sample = bit_depth / 8;
  const size_t bpp = size_t(src_ch) * bytes_per_sample;
  const size_t stride = size_t(w) * bpp;
  const size_t raw_size = (stride + 1) * h;

  std::vector<uint8_t> raw(raw_size);
  uLongf dst_len = raw_size;
  if (uncompress(raw.data(), &dst_len, idat.data(), idat.size()) != Z_OK ||
      dst_len != raw_size)
    return -8;

  // de-filter in place into `img`
  std::vector<uint8_t> img(stride * h);
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    ++src;
    uint8_t* dst = img.data() + y * stride;
    switch (filter) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:
        for (size_t i = 0; i < stride; ++i)
          dst[i] = src[i] + (i >= bpp ? dst[i - bpp] : 0);
        break;
      case 2:
        for (size_t i = 0; i < stride; ++i)
          dst[i] = src[i] + (prev ? prev[i] : 0);
        break;
      case 3:
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? dst[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          dst[i] = src[i] + uint8_t((a + b) >> 1);
        }
        break;
      case 4:
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? dst[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
          dst[i] = src[i] + uint8_t(paeth(a, b, c));
        }
        break;
      default:
        return -9;
    }
    prev = dst;
  }

  // expand to RGBA8
  uint8_t* rgba = (uint8_t*)malloc(size_t(w) * h * 4);
  if (!rgba) return -10;
  for (uint32_t y = 0; y < h; ++y) {
    const uint8_t* s = img.data() + y * stride;
    uint8_t* d = rgba + size_t(y) * w * 4;
    for (uint32_t x = 0; x < w; ++x) {
      uint8_t r, g, b, a = 255;
      const uint8_t* px = s + size_t(x) * bpp;
      switch (color_type) {
        case 0:
          r = g = b = px[0];
          break;
        case 2:
          r = px[0];
          g = px[bytes_per_sample];
          b = px[2 * bytes_per_sample];
          break;
        case 3: {
          uint8_t idx = px[0];
          if (size_t(idx) * 3 + 2 >= plte.size()) { free(rgba); return -11; }
          r = plte[idx * 3];
          g = plte[idx * 3 + 1];
          b = plte[idx * 3 + 2];
          if (idx < trns.size()) a = trns[idx];
          break;
        }
        case 4:
          r = g = b = px[0];
          a = px[bytes_per_sample];
          break;
        default:  // 6
          r = px[0];
          g = px[bytes_per_sample];
          b = px[2 * bytes_per_sample];
          a = px[3 * bytes_per_sample];
      }
      d[x * 4] = r;
      d[x * 4 + 1] = g;
      d[x * 4 + 2] = b;
      d[x * 4 + 3] = a;
    }
  }
  *out = rgba;
  *out_w = w;
  *out_h = h;
  return 0;
}

// Exceptions (std::bad_alloc on hostile sizes, anything else) must not cross
// the extern "C" / ctypes boundary — they would abort the host process.
int bim_decode_png(const uint8_t* buf, size_t len, uint8_t** out,
                   uint32_t* out_w, uint32_t* out_h) {
  try {
    return decode_png_impl(buf, len, out, out_w, out_h);
  } catch (...) {
    return -13;
  }
}

int bim_decode_png_file(const char* path, uint8_t** out, uint32_t* w,
                        uint32_t* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return -100;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  if (n < 0 || fseek(f, 0, SEEK_SET) != 0) { fclose(f); return -102; }
  int rc;
  try {
    std::vector<uint8_t> buf(static_cast<size_t>(n));
    if (fread(buf.data(), 1, size_t(n), f) != size_t(n)) {
      fclose(f);
      return -101;
    }
    fclose(f);
    rc = bim_decode_png(buf.data(), buf.size(), out, w, h);
  } catch (...) {
    fclose(f);
    return -13;
  }
  return rc;
}

// ---------------------------------------------------------------------------
// PNG encode (RGBA8, filter 0, one zlib stream)
// ---------------------------------------------------------------------------

static void wr32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24);
  v.push_back(x >> 16);
  v.push_back(x >> 8);
  v.push_back(x);
}

static void chunk(std::vector<uint8_t>& v, const char* type,
                  const uint8_t* data, size_t n) {
  wr32(v, uint32_t(n));
  size_t start = v.size();
  v.insert(v.end(), type, type + 4);
  if (n) v.insert(v.end(), data, data + n);
  uLong crc = crc32(0, v.data() + start, uInt(n + 4));
  wr32(v, uint32_t(crc));
}

int bim_encode_png(const uint8_t* rgba, uint32_t w, uint32_t h, uint8_t** out,
                   size_t* out_len) {
  std::vector<uint8_t> raw((size_t(w) * 4 + 1) * h);
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + y * (size_t(w) * 4 + 1);
    row[0] = 0;  // filter none
    memcpy(row + 1, rgba + size_t(y) * w * 4, size_t(w) * 4);
  }
  uLongf comp_cap = compressBound(raw.size());
  std::vector<uint8_t> comp(comp_cap);
  if (compress2(comp.data(), &comp_cap, raw.data(), raw.size(), 6) != Z_OK)
    return -1;

  std::vector<uint8_t> png;
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  png.insert(png.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = w >> 16; ihdr[2] = w >> 8; ihdr[3] = w;
  ihdr[4] = h >> 24; ihdr[5] = h >> 16; ihdr[6] = h >> 8; ihdr[7] = h;
  ihdr[8] = 8;   // bit depth
  ihdr[9] = 6;   // RGBA
  ihdr[10] = ihdr[11] = ihdr[12] = 0;
  chunk(png, "IHDR", ihdr, 13);
  chunk(png, "IDAT", comp.data(), comp_cap);
  chunk(png, "IEND", nullptr, 0);

  uint8_t* res = (uint8_t*)malloc(png.size());
  if (!res) return -2;
  memcpy(res, png.data(), png.size());
  *out = res;
  *out_len = png.size();
  return 0;
}

int bim_encode_png_file(const char* path, const uint8_t* rgba, uint32_t w,
                        uint32_t h) {
  uint8_t* data = nullptr;
  size_t n = 0;
  int rc = bim_encode_png(rgba, w, h, &data, &n);
  if (rc) return rc;
  FILE* f = fopen(path, "wb");
  if (!f) { free(data); return -100; }
  size_t written = fwrite(data, 1, n, f);
  fclose(f);
  free(data);
  return written == n ? 0 : -101;
}

// ---------------------------------------------------------------------------
// tensor .bin files: 12-byte LE header (H, W, C uint32) + float32 data
// ---------------------------------------------------------------------------

int bim_read_tensor(const char* path, float** data, uint32_t* h, uint32_t* w,
                    uint32_t* c) {
  FILE* f = fopen(path, "rb");
  if (!f) return -100;
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  if (fsize < 12 || fseek(f, 0, SEEK_SET) != 0) { fclose(f); return -4; }
  uint32_t hdr[3];
  if (fread(hdr, 4, 3, f) != 3) { fclose(f); return -1; }
  // A corrupt header must not drive the allocation: the element count has to
  // match the actual file size exactly (12-byte header + n float32s).
  uint64_t n64 = uint64_t(hdr[0]) * hdr[1] * hdr[2];
  if (n64 == 0 || n64 > (uint64_t(fsize) - 12) / 4 ||
      uint64_t(fsize) != 12 + n64 * 4) {
    fclose(f);
    return -4;
  }
  size_t n = size_t(n64);
  float* buf = (float*)malloc(n * 4);
  if (!buf) { fclose(f); return -2; }
  if (fread(buf, 4, n, f) != n) { free(buf); fclose(f); return -3; }
  fclose(f);
  *data = buf;
  *h = hdr[0];
  *w = hdr[1];
  *c = hdr[2];
  return 0;
}

int bim_write_tensor(const char* path, const float* data, uint32_t h,
                     uint32_t w, uint32_t c) {
  FILE* f = fopen(path, "wb");
  if (!f) return -100;
  uint32_t hdr[3] = {h, w, c};
  size_t n = size_t(h) * w * c;
  int ok = fwrite(hdr, 4, 3, f) == 3 && fwrite(data, 4, n, f) == n;
  fclose(f);
  return ok ? 0 : -1;
}

}  // extern "C"

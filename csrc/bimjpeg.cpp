// bimjpeg — from-scratch baseline JPEG decoder for the bimio native IO
// runtime. Fills the remaining sharp/libvips role the reference relies on
// (version3.0 uses sharp for all image IO, which decodes JPEG natively;
// bimio previously covered PNG only and JPEG fell back to PIL).
//
// Scope: baseline & extended-sequential Huffman JPEG (SOF0/SOF1),
// 1- or 3-component (grayscale / YCbCr), arbitrary sampling factors
// (4:4:4, 4:2:2, 4:2:0, 4:1:1, ...), restart intervals. Progressive
// (SOF2) and arithmetic coding return an error and the Python layer falls
// back to PIL. Implemented from the ITU T.81 spec: canonical Huffman from
// BITS/HUFFVAL, byte-stuffed bit reader, zigzag dequant, separable float
// IDCT, box chroma upsampling, BT.601 YCbCr->RGB. Output is RGBA8.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kMaxDimJ = 1u << 16;       // JPEG dims are 16-bit anyway
constexpr uint64_t kMaxPixelsJ = 1ull << 28;  // same 256 MPix budget as PNG

const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct HuffTable {
  // canonical decode: for each code length l (1..16), the smallest code
  // value, the largest+1, and the index of its first symbol in vals
  int32_t mincode[17], maxcode[17], valptr[17];
  uint8_t vals[256];
  bool present = false;
};

struct Component {
  int id = 0, h = 1, v = 1, tq = 0;
  int td = 0, ta = 0;
  int dc_pred = 0;
  int bw = 0, bh = 0;            // plane size in blocks
  std::vector<int16_t> coef;     // unused (sequential decode is streaming)
  std::vector<uint8_t> plane;    // bw*8 x bh*8 samples
};

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint32_t bits = 0;
  int nbits = 0;
  bool saw_marker = false;

  explicit BitReader(const uint8_t* s, const uint8_t* e) : p(s), end(e) {}

  // refill one byte, handling 0xFF00 stuffing; at a real marker, feed
  // zero bits (spec behavior for truncated entropy segments)
  void refill() {
    while (nbits <= 24) {
      if (saw_marker || p >= end) {
        bits |= 0;  // pad with zeros
        nbits += 8;
        continue;
      }
      uint8_t b = *p++;
      if (b == 0xFF) {
        if (p < end && *p == 0x00) {
          ++p;  // stuffed byte
        } else {
          saw_marker = true;  // stop before the marker; pad zeros
          --p;
          bits |= 0;
          nbits += 8;
          continue;
        }
      }
      bits |= uint32_t(b) << (24 - nbits);
      nbits += 8;
    }
  }
  int get(int n) {
    if (n == 0) return 0;
    if (nbits < n) refill();
    int v = int(bits >> (32 - n));
    bits <<= n;
    nbits -= n;
    return v;
  }
  int peek16() {
    if (nbits < 16) refill();
    return int(bits >> 16);
  }
  void skip(int n) {
    bits <<= n;
    nbits -= n;
  }
  void align_restart() {  // consume RSTn marker at a restart boundary
    bits = 0;
    nbits = 0;
    saw_marker = false;
    // skip fill bytes then the 2-byte marker
    while (p < end && *p == 0xFF && p + 1 < end &&
           (p[1] >= 0xD0 && p[1] <= 0xD7)) {
      p += 2;
      return;
    }
    // tolerate missing RST (some encoders): nothing to do
  }
};

int huff_decode(BitReader& br, const HuffTable& t) {
  int code = 0;
  int v16 = br.peek16();
  for (int l = 1; l <= 16; ++l) {
    code = v16 >> (16 - l);
    if (t.maxcode[l] >= 0 && code <= t.maxcode[l]) {
      br.skip(l);
      int idx = t.valptr[l] + code - t.mincode[l];
      if (idx < 0 || idx > 255) return -1;
      return t.vals[idx];
    }
  }
  return -1;
}

// receive+extend: n-bit value -> signed coefficient (T.81 F.2.2.1)
inline int extend(int v, int n) {
  return (n && v < (1 << (n - 1))) ? v - (1 << n) + 1 : v;
}

// separable float IDCT, direct from the DCT-III definition with
// precomputed cos table — clarity over speed (decode is not a hot path;
// the resize kernels are).
struct IdctTables {
  float c[8][8];
  IdctTables() {
    for (int x = 0; x < 8; ++x)
      for (int u = 0; u < 8; ++u)
        c[x][u] = float((u == 0 ? 0.35355339059f : 0.5f) *
                        std::cos((2 * x + 1) * u * M_PI / 16.0));
  }
};
const IdctTables kIdct;

void idct8x8(const int32_t in[64], uint8_t out[64]) {
  float tmp[64];
  for (int y = 0; y < 8; ++y)
    for (int x = 0; x < 8; ++x) {
      float s = 0;
      for (int u = 0; u < 8; ++u) s += kIdct.c[x][u] * in[y * 8 + u];
      tmp[y * 8 + x] = s;
    }
  for (int x = 0; x < 8; ++x)
    for (int y = 0; y < 8; ++y) {
      float s = 0;
      for (int v = 0; v < 8; ++v) s += kIdct.c[y][v] * tmp[v * 8 + x];
      int p = int(lrintf(s)) + 128;
      out[y * 8 + x] = uint8_t(p < 0 ? 0 : p > 255 ? 255 : p);
    }
}

inline uint8_t clamp_u8(int v) {
  return uint8_t(v < 0 ? 0 : v > 255 ? 255 : v);
}

// Chroma plane → full resolution. Factor-2 axes use the triangular
// ("fancy") filter libjpeg uses — out[2i] = (3·in[i] + in[i−1] + 1)>>2,
// out[2i+1] = (3·in[i] + in[i+1] + 2)>>2 with edge replication — so
// 4:2:0/4:2:2 decodes match libjpeg/PIL closely; other ratios fall back
// to nearest. Indices clamp to the valid sample extent (MCU pad columns
// hold filter-unfriendly replicated data).
std::vector<uint8_t> upsample_chroma(const std::vector<uint8_t>& plane,
                                     size_t stride, int in_w, int in_h,
                                     int ratio_h, int ratio_v, int out_w,
                                     int out_h) {
  auto at = [&](const std::vector<uint8_t>& v, size_t s, int w, int h,
                int x, int y) -> int {
    x = x < 0 ? 0 : x >= w ? w - 1 : x;
    y = y < 0 ? 0 : y >= h ? h - 1 : y;
    return v[size_t(y) * s + x];
  };
  // horizontal pass
  std::vector<uint8_t> horiz(size_t(in_h) * out_w);
  for (int y = 0; y < in_h; ++y)
    for (int x = 0; x < out_w; ++x) {
      int val;
      if (ratio_h == 1) {
        val = at(plane, stride, in_w, in_h, x, y);
      } else if (ratio_h == 2) {
        int i = x >> 1;
        int near = at(plane, stride, in_w, in_h, i, y);
        int far = at(plane, stride, in_w, in_h, (x & 1) ? i + 1 : i - 1, y);
        val = (3 * near + far + ((x & 1) ? 2 : 1)) >> 2;
      } else {
        val = at(plane, stride, in_w, in_h, x * in_w / out_w, y);
      }
      horiz[size_t(y) * out_w + x] = uint8_t(val);
    }
  if (ratio_v == 1 && in_h == out_h) return horiz;
  std::vector<uint8_t> full(size_t(out_h) * out_w);
  for (int y = 0; y < out_h; ++y)
    for (int x = 0; x < out_w; ++x) {
      int val;
      if (ratio_v == 2) {
        int j = y >> 1;
        int near = at(horiz, out_w, out_w, in_h, x, j);
        int far = at(horiz, out_w, out_w, in_h, x, (y & 1) ? j + 1 : j - 1);
        val = (3 * near + far + ((y & 1) ? 2 : 1)) >> 2;
      } else {
        val = at(horiz, out_w, out_w, in_h, x, y * in_h / out_h);
      }
      full[size_t(y) * out_w + x] = uint8_t(val);
    }
  return full;
}

int rd16(const uint8_t* p) { return (p[0] << 8) | p[1]; }

struct Decoder {
  const uint8_t* buf;
  size_t len;
  uint16_t qt[4][64] = {};
  HuffTable hdc[4], hac[4];
  Component comp[3];
  int ncomp = 0, width = 0, height = 0;
  int hmax = 1, vmax = 1;
  int restart_interval = 0;

  int decode(uint8_t** out, uint32_t* w, uint32_t* h);
  int scan(const uint8_t* p, const uint8_t* end);
};

int Decoder::scan(const uint8_t* p, const uint8_t* end) {
  int mcux = (width * 1 + 8 * hmax - 1) / (8 * hmax);
  int mcuy = (height * 1 + 8 * vmax - 1) / (8 * vmax);
  for (int i = 0; i < ncomp; ++i) {
    Component& c = comp[i];
    c.bw = mcux * c.h;
    c.bh = mcuy * c.v;
    c.plane.assign(size_t(c.bw) * 8 * c.bh * 8, 128);
    c.dc_pred = 0;
  }
  BitReader br(p, end);
  int32_t blk[64];
  uint8_t px[64];
  int mcu_count = 0;
  for (int my = 0; my < mcuy; ++my) {
    for (int mx = 0; mx < mcux; ++mx) {
      if (restart_interval && mcu_count &&
          mcu_count % restart_interval == 0) {
        br.align_restart();
        for (int i = 0; i < ncomp; ++i) comp[i].dc_pred = 0;
      }
      ++mcu_count;
      for (int i = 0; i < ncomp; ++i) {
        Component& c = comp[i];
        const HuffTable& tdc = hdc[c.td];
        const HuffTable& tac = hac[c.ta];
        const uint16_t* q = qt[c.tq];
        for (int by = 0; by < c.v; ++by) {
          for (int bx = 0; bx < c.h; ++bx) {
            memset(blk, 0, sizeof(blk));
            int s = huff_decode(br, tdc);
            if (s < 0 || s > 15) return -1;
            int diff = extend(br.get(s), s);
            c.dc_pred += diff;
            blk[0] = c.dc_pred * q[0];
            for (int k = 1; k < 64;) {
              int rs = huff_decode(br, tac);
              if (rs < 0) return -1;
              int r = rs >> 4, sz = rs & 15;
              if (sz == 0) {
                if (r == 15) { k += 16; continue; }  // ZRL
                break;                               // EOB
              }
              k += r;
              if (k > 63) return -1;
              int v = extend(br.get(sz), sz);
              blk[kZigzag[k]] = v * q[k];
              ++k;
            }
            idct8x8(blk, px);
            int ox = (mx * c.h + bx) * 8, oy = (my * c.v + by) * 8;
            size_t stride = size_t(c.bw) * 8;
            for (int yy = 0; yy < 8; ++yy)
              memcpy(&c.plane[(oy + yy) * stride + ox], &px[yy * 8], 8);
          }
        }
      }
    }
  }
  return 0;
}

int Decoder::decode(uint8_t** out, uint32_t* w, uint32_t* h) {
  const uint8_t* p = buf;
  const uint8_t* end = buf + len;
  if (len < 4 || p[0] != 0xFF || p[1] != 0xD8) return -1;  // SOI
  p += 2;
  bool have_sof = false;
  while (p + 4 <= end) {
    if (p[0] != 0xFF) return -1;
    uint8_t m = p[1];
    p += 2;
    if (m == 0xD8 || (m >= 0xD0 && m <= 0xD7)) continue;  // SOI/RSTn
    if (m == 0xD9) break;                                 // EOI
    if (p + 2 > end) return -1;
    int seg = rd16(p);
    if (seg < 2 || p + seg > end) return -1;
    const uint8_t* q = p + 2;
    int avail = seg - 2;
    switch (m) {
      case 0xC0:   // SOF0 baseline
      case 0xC1: { // SOF1 extended sequential (same entropy coding)
        if (avail < 6) return -1;
        if (q[0] != 8) return -1;  // sample precision
        height = rd16(q + 1);
        width = rd16(q + 3);
        ncomp = q[5];
        if (width == 0 || height == 0 || width > int(kMaxDimJ) ||
            height > int(kMaxDimJ) ||
            uint64_t(width) * height > kMaxPixelsJ)
          return -1;
        if (ncomp != 1 && ncomp != 3) return -1;
        if (avail < 6 + 3 * ncomp) return -1;
        for (int i = 0; i < ncomp; ++i) {
          comp[i].id = q[6 + 3 * i];
          comp[i].h = q[7 + 3 * i] >> 4;
          comp[i].v = q[7 + 3 * i] & 15;
          comp[i].tq = q[8 + 3 * i];
          if (comp[i].h < 1 || comp[i].h > 4 || comp[i].v < 1 ||
              comp[i].v > 4 || comp[i].tq > 3)
            return -1;
          if (comp[i].h > hmax) hmax = comp[i].h;
          if (comp[i].v > vmax) vmax = comp[i].v;
        }
        have_sof = true;
        break;
      }
      case 0xC2:  // progressive — not supported, caller falls back
      case 0xC3: case 0xC5: case 0xC6: case 0xC7: case 0xC9:
      case 0xCA: case 0xCB: case 0xCD: case 0xCE: case 0xCF:
        return -2;
      case 0xC4: {  // DHT (possibly several tables in one segment)
        while (avail >= 17) {
          int tc = q[0] >> 4, th = q[0] & 15;
          if (tc > 1 || th > 3) return -1;
          HuffTable& t = tc ? hac[th] : hdc[th];
          int total = 0;
          for (int l = 1; l <= 16; ++l) total += q[l];
          if (total > 256 || avail < 17 + total) return -1;
          memcpy(t.vals, q + 17, total);
          int code = 0, k = 0;
          for (int l = 1; l <= 16; ++l) {
            t.valptr[l] = k;
            t.mincode[l] = code;
            code += q[l];
            k += q[l];
            t.maxcode[l] = q[l] ? code - 1 : -1;
            code <<= 1;
          }
          t.present = true;
          q += 17 + total;
          avail -= 17 + total;
        }
        break;
      }
      case 0xDB: {  // DQT
        while (avail >= 65) {
          int prec = q[0] >> 4, id = q[0] & 15;
          if (id > 3) return -1;
          int n = prec ? 129 : 65;
          if (avail < n) return -1;
          for (int k = 0; k < 64; ++k)
            qt[id][k] = prec ? rd16(q + 1 + 2 * k) : q[1 + k];
          q += n;
          avail -= n;
        }
        break;
      }
      case 0xDD:  // DRI
        if (avail < 2) return -1;
        restart_interval = rd16(q);
        break;
      case 0xDA: {  // SOS
        if (!have_sof || avail < 1) return -1;
        int ns = q[0];
        if (ns != ncomp || avail < 1 + 2 * ns + 3) return -1;
        for (int i = 0; i < ns; ++i) {
          int cid = q[1 + 2 * i];
          int tt = q[2 + 2 * i];
          for (int j = 0; j < ncomp; ++j)
            if (comp[j].id == cid) {
              comp[j].td = tt >> 4;
              comp[j].ta = tt & 15;
            }
        }
        for (int i = 0; i < ncomp; ++i)
          if (!hdc[comp[i].td].present || !hac[comp[i].ta].present)
            return -1;
        if (scan(p + seg, end) != 0) return -1;
        // ---- color convert + upsample into RGBA ----
        size_t npx = size_t(width) * height;
        uint8_t* rgba = (uint8_t*)malloc(npx * 4);
        if (!rgba) return -1;
        if (ncomp == 1) {
          const Component& Y = comp[0];
          size_t ys = size_t(Y.bw) * 8;
          for (int yy = 0; yy < height; ++yy)
            for (int xx = 0; xx < width; ++xx) {
              uint8_t g = Y.plane[yy * ys + xx];
              uint8_t* o = rgba + (size_t(yy) * width + xx) * 4;
              o[0] = o[1] = o[2] = g;
              o[3] = 255;
            }
        } else {
          const Component &Y = comp[0], &Cb = comp[1], &Cr = comp[2];
          size_t ys = size_t(Y.bw) * 8;
          auto full = [&](const Component& c) {
            int in_w = (width * c.h + hmax - 1) / hmax;
            int in_h = (height * c.v + vmax - 1) / vmax;
            return upsample_chroma(c.plane, size_t(c.bw) * 8, in_w, in_h,
                                   hmax / c.h, vmax / c.v, width, height);
          };
          std::vector<uint8_t> cbf = full(Cb), crf = full(Cr);
          for (int yy = 0; yy < height; ++yy) {
            for (int xx = 0; xx < width; ++xx) {
              int yv = Y.plane[size_t(yy) * ys + xx];
              size_t ci = size_t(yy) * width + xx;
              int cb = cbf[ci] - 128;
              int cr = crf[ci] - 128;
              uint8_t* o = rgba + ci * 4;
              // BT.601 fixed point (x65536)
              o[0] = clamp_u8(yv + ((91881 * cr) >> 16));
              o[1] = clamp_u8(yv - ((22554 * cb + 46802 * cr) >> 16));
              o[2] = clamp_u8(yv + ((116130 * cb) >> 16));
              o[3] = 255;
            }
          }
        }
        *out = rgba;
        *w = width;
        *h = height;
        return 0;
      }
      default:
        break;  // APPn, COM, unknown: skip
    }
    p += seg;
  }
  return -1;
}

}  // namespace

extern "C" {

// returns 0 on success, -2 for unsupported-but-valid (progressive etc.,
// caller should fall back), -1 for corrupt input. *out is malloc'd RGBA8.
int bim_decode_jpeg(const uint8_t* buf, size_t len, uint8_t** out,
                    uint32_t* w, uint32_t* h) {
  Decoder d;
  d.buf = buf;
  d.len = len;
  return d.decode(out, w, h);
}

int bim_decode_jpeg_file(const char* path, uint8_t** out, uint32_t* w,
                         uint32_t* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0 || n > (1l << 30)) {
    fclose(f);
    return -1;
  }
  std::vector<uint8_t> buf(static_cast<size_t>(n), 0);
  size_t got = fread(buf.data(), 1, size_t(n), f);
  fclose(f);
  if (got != size_t(n)) return -1;
  return bim_decode_jpeg(buf.data(), got, out, w, h);
}

}  // extern "C"

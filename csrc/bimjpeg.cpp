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
    // skip 0xFF fill bytes (T.81 B.1.1.2 allows any number before a marker)
    while (p + 1 < end && *p == 0xFF && p[1] == 0xFF) ++p;
    // then consume the 2-byte RSTn marker if present
    if (p + 1 < end && *p == 0xFF && p[1] >= 0xD0 && p[1] <= 0xD7) {
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
        // Luma must carry the max sampling factors: the color-convert loop
        // indexes Y.plane at full resolution (ys = Y.bw*8 covers the image
        // only when comp[0] is the densest plane). Anything else (legal per
        // T.81 but produced by no mainstream encoder) goes to the PIL
        // fallback rather than reading past the Y plane allocation.
        if (ncomp == 3 && (comp[0].h != hmax || comp[0].v != vmax)) return -2;
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
          int td = tt >> 4, ta = tt & 15;
          if (td > 3 || ta > 3) return -1;  // hdc[4]/hac[4] bounds
          for (int j = 0; j < ncomp; ++j)
            if (comp[j].id == cid) {
              comp[j].td = td;
              comp[j].ta = ta;
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

// ===========================================================================
// Encoder: baseline sequential 4:4:4 (or grayscale), Annex-K quant tables
// scaled by the conventional IJG quality mapping, Annex-K Huffman tables.
// Fills sharp/libvips' JPEG-encode role (SURVEY §2.4). From the T.81 spec,
// like the decoder above.
// ===========================================================================

const uint8_t kQLumaStd[64] = {
    16, 11, 10, 16, 24,  40,  51,  61,  12, 12, 14, 19, 26,  58,  60,  55,
    14, 13, 16, 24, 40,  57,  69,  56,  14, 17, 22, 29, 51,  87,  80,  62,
    18, 22, 37, 56, 68,  109, 103, 77,  24, 35, 55, 64, 81,  104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99};

const uint8_t kQChromaStd[64] = {
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99};

// Annex K Huffman table specs (BITS[1..16] then HUFFVAL)
const uint8_t kBitsDcL[17] = {0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0};
const uint8_t kValsDc[12] = {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11};
const uint8_t kBitsDcC[17] = {0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0};
const uint8_t kBitsAcL[17] = {0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d};
const uint8_t kValsAcL[162] = {
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};
const uint8_t kBitsAcC[17] = {0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77};
const uint8_t kValsAcC[162] = {
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa};

struct EncHuff {
  uint16_t code[256];
  uint8_t size[256];
};

// canonical codes from BITS/HUFFVAL (T.81 C.2) into symbol-indexed tables
void build_enc_huff(const uint8_t* bits, const uint8_t* vals, int nvals,
                    EncHuff* t) {
  std::memset(t->size, 0, sizeof(t->size));
  uint16_t code = 0;
  int k = 0;
  for (int l = 1; l <= 16; ++l) {
    for (int i = 0; i < bits[l] && k < nvals; ++i, ++k) {
      t->code[vals[k]] = code++;
      t->size[vals[k]] = uint8_t(l);
    }
    code <<= 1;
  }
}

struct BitWriter {
  std::vector<uint8_t>& out;
  uint32_t acc = 0;
  int nbits = 0;

  explicit BitWriter(std::vector<uint8_t>& o) : out(o) {}

  void put(uint32_t bits, int n) {
    acc = (acc << n) | (bits & ((1u << n) - 1));
    nbits += n;
    while (nbits >= 8) {
      uint8_t b = uint8_t(acc >> (nbits - 8));
      out.push_back(b);
      if (b == 0xFF) out.push_back(0x00);  // byte stuffing
      nbits -= 8;
    }
  }

  void flush() {
    if (nbits > 0) put(0x7F, 7 - ((nbits + 7) % 8) + 1);  // pad with 1s
  }
};

// separable float FDCT (the inverse of the decoder's IDCT basis)
void fdct8x8(const float in[64], float out[64]) {
  static float c[8][8];
  static bool init = false;
  if (!init) {
    for (int u = 0; u < 8; ++u)
      for (int x = 0; x < 8; ++x)
        c[u][x] = float((u == 0 ? std::sqrt(0.125) : 0.5) *
                        std::cos((2 * x + 1) * u * 3.14159265358979323846 /
                                 16.0));
    init = true;
  }
  float tmp[64];
  for (int u = 0; u < 8; ++u)
    for (int x = 0; x < 8; ++x) {
      float s = 0;
      for (int k = 0; k < 8; ++k) s += c[u][k] * in[x * 8 + k];
      tmp[x * 8 + u] = s;
    }
  for (int v = 0; v < 8; ++v)
    for (int u = 0; u < 8; ++u) {
      float s = 0;
      for (int k = 0; k < 8; ++k) s += c[v][k] * tmp[k * 8 + u];
      out[v * 8 + u] = s;
    }
}

int bit_length(int v) {
  int n = 0;
  while (v) {
    ++n;
    v >>= 1;
  }
  return n;
}

void encode_block(BitWriter& bw, const float* block, const uint16_t* qtab,
                  const EncHuff& dc, const EncHuff& ac, int* dc_pred) {
  float f[64], coef[64];
  std::memcpy(f, block, sizeof(f));
  fdct8x8(f, coef);
  int q[64];
  for (int i = 0; i < 64; ++i) {
    float v = coef[kZigzag[i]] / float(qtab[kZigzag[i]]);
    q[i] = int(std::lround(v));
  }
  // DC
  int diff = q[0] - *dc_pred;
  *dc_pred = q[0];
  int mag = diff < 0 ? -diff : diff;
  int n = bit_length(mag);
  bw.put(dc.code[n], dc.size[n]);
  if (n) bw.put(diff < 0 ? uint32_t(diff + ((1 << n) - 1)) : uint32_t(diff), n);
  // AC: run-length of zeros + magnitude categories
  int run = 0;
  for (int i = 1; i < 64; ++i) {
    if (q[i] == 0) {
      ++run;
      continue;
    }
    while (run > 15) {
      bw.put(ac.code[0xF0], ac.size[0xF0]);  // ZRL
      run -= 16;
    }
    int m = q[i] < 0 ? -q[i] : q[i];
    int nn = bit_length(m);
    int sym = (run << 4) | nn;
    bw.put(ac.code[sym], ac.size[sym]);
    bw.put(q[i] < 0 ? uint32_t(q[i] + ((1 << nn) - 1)) : uint32_t(q[i]), nn);
    run = 0;
  }
  if (run) bw.put(ac.code[0x00], ac.size[0x00]);  // EOB
}

void put_marker_u16(std::vector<uint8_t>& o, uint16_t v) {
  o.push_back(uint8_t(v >> 8));
  o.push_back(uint8_t(v));
}

int encode_jpeg(const uint8_t* rgba, uint32_t w, uint32_t h, int quality,
                int gray, uint8_t** out, size_t* out_len) {
  if (!rgba || !out || !out_len || w == 0 || h == 0 || w >= kMaxDimJ ||
      h >= kMaxDimJ || uint64_t(w) * h > kMaxPixelsJ)
    return -1;
  if (quality < 1) quality = 1;
  if (quality > 100) quality = 100;
  // conventional IJG quality → scale mapping
  int scale = quality < 50 ? 5000 / quality : 200 - 2 * quality;
  uint16_t qL[64], qC[64];
  for (int i = 0; i < 64; ++i) {
    int l = (kQLumaStd[i] * scale + 50) / 100;
    int c = (kQChromaStd[i] * scale + 50) / 100;
    qL[i] = uint16_t(l < 1 ? 1 : (l > 255 ? 255 : l));
    qC[i] = uint16_t(c < 1 ? 1 : (c > 255 ? 255 : c));
  }
  EncHuff dcL, acL, dcC, acC;
  build_enc_huff(kBitsDcL, kValsDc, 12, &dcL);
  build_enc_huff(kBitsAcL, kValsAcL, 162, &acL);
  build_enc_huff(kBitsDcC, kValsDc, 12, &dcC);
  build_enc_huff(kBitsAcC, kValsAcC, 162, &acC);

  std::vector<uint8_t> o;
  o.reserve(size_t(w) * h / 2 + 1024);
  auto seg = [&](uint8_t marker, std::initializer_list<uint8_t> body) {
    o.push_back(0xFF);
    o.push_back(marker);
    put_marker_u16(o, uint16_t(body.size() + 2));
    o.insert(o.end(), body);
  };
  o.push_back(0xFF);
  o.push_back(0xD8);  // SOI
  seg(0xE0, {'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0});
  // DQT (8-bit precision)
  auto dqt = [&](int id, const uint16_t* q) {
    o.push_back(0xFF);
    o.push_back(0xDB);
    put_marker_u16(o, 67);
    o.push_back(uint8_t(id));
    for (int i = 0; i < 64; ++i) o.push_back(uint8_t(q[kZigzag[i]]));
  };
  dqt(0, qL);
  if (!gray) dqt(1, qC);
  // SOF0
  int ncomp = gray ? 1 : 3;
  o.push_back(0xFF);
  o.push_back(0xC0);
  put_marker_u16(o, uint16_t(8 + 3 * ncomp));
  o.push_back(8);
  put_marker_u16(o, uint16_t(h));
  put_marker_u16(o, uint16_t(w));
  o.push_back(uint8_t(ncomp));
  for (int i = 0; i < ncomp; ++i) {
    o.push_back(uint8_t(i + 1));
    o.push_back(0x11);  // 4:4:4 — no subsampling, quality over size
    o.push_back(i == 0 ? 0 : 1);
  }
  // DHT
  auto dht = [&](int cls, int id, const uint8_t* bits, const uint8_t* vals,
                 int nvals) {
    o.push_back(0xFF);
    o.push_back(0xC4);
    put_marker_u16(o, uint16_t(2 + 17 + nvals));
    o.push_back(uint8_t((cls << 4) | id));
    for (int l = 1; l <= 16; ++l) o.push_back(bits[l]);
    o.insert(o.end(), vals, vals + nvals);
  };
  dht(0, 0, kBitsDcL, kValsDc, 12);
  dht(1, 0, kBitsAcL, kValsAcL, 162);
  if (!gray) {
    dht(0, 1, kBitsDcC, kValsDc, 12);
    dht(1, 1, kBitsAcC, kValsAcC, 162);
  }
  // SOS
  o.push_back(0xFF);
  o.push_back(0xDA);
  put_marker_u16(o, uint16_t(6 + 2 * ncomp));
  o.push_back(uint8_t(ncomp));
  for (int i = 0; i < ncomp; ++i) {
    o.push_back(uint8_t(i + 1));
    o.push_back(i == 0 ? 0x00 : 0x11);
  }
  o.push_back(0);
  o.push_back(63);
  o.push_back(0);

  BitWriter bw(o);
  int pred[3] = {0, 0, 0};
  float blk[3][64];
  for (uint32_t by = 0; by < h; by += 8) {
    for (uint32_t bx = 0; bx < w; bx += 8) {
      for (int yy = 0; yy < 8; ++yy) {
        uint32_t sy = by + yy < h ? by + yy : h - 1;  // edge replicate
        for (int xx = 0; xx < 8; ++xx) {
          uint32_t sx = bx + xx < w ? bx + xx : w - 1;
          const uint8_t* p = rgba + (size_t(sy) * w + sx) * 4;
          if (gray) {
            blk[0][yy * 8 + xx] = float(p[0]) - 128.0f;
          } else {
            float r = p[0], g = p[1], b = p[2];
            blk[0][yy * 8 + xx] =
                0.299f * r + 0.587f * g + 0.114f * b - 128.0f;
            blk[1][yy * 8 + xx] = -0.168736f * r - 0.331264f * g + 0.5f * b;
            blk[2][yy * 8 + xx] = 0.5f * r - 0.418688f * g - 0.081312f * b;
          }
        }
      }
      encode_block(bw, blk[0], qL, dcL, acL, &pred[0]);
      if (!gray) {
        encode_block(bw, blk[1], qC, dcC, acC, &pred[1]);
        encode_block(bw, blk[2], qC, dcC, acC, &pred[2]);
      }
    }
  }
  bw.flush();
  o.push_back(0xFF);
  o.push_back(0xD9);  // EOI

  uint8_t* buf = (uint8_t*)malloc(o.size());
  if (!buf) return -1;
  std::memcpy(buf, o.data(), o.size());
  *out = buf;
  *out_len = o.size();
  return 0;
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

// Encode RGBA8 to baseline 4:4:4 JPEG (gray!=0 → single-component from the
// R channel). Returns 0 on success; *out is malloc'd.
int bim_encode_jpeg(const uint8_t* rgba, uint32_t w, uint32_t h, int quality,
                    int gray, uint8_t** out, size_t* out_len) {
  return encode_jpeg(rgba, w, h, quality, gray, out, out_len);
}

int bim_encode_jpeg_file(const char* path, const uint8_t* rgba, uint32_t w,
                         uint32_t h, int quality, int gray) {
  uint8_t* data = nullptr;
  size_t n = 0;
  if (encode_jpeg(rgba, w, h, quality, gray, &data, &n) != 0) return -1;
  FILE* f = fopen(path, "wb");
  if (!f) {
    free(data);
    return -1;
  }
  size_t put = fwrite(data, 1, n, f);
  free(data);
  return (fclose(f) == 0 && put == n) ? 0 : -1;
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

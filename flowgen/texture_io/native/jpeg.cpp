// Minimal baseline JPEG decoder for the flowgen native texture loader.
//
// The reference's texture databases are overwhelmingly JPEG, decoded at
// startup through CImg (TextureCollection ctor, DataGenerator.cpp:117-149).
// This is an original implementation of the baseline sequential DCT process
// (ITU T.81 annexes B/F): SOF0 frames, 8-bit precision, Huffman entropy
// coding, 1 or 3 components with arbitrary (<=2x2) sampling factors,
// restart markers. Progressive/arithmetic/12-bit streams return failure and
// the Python caller falls back to PIL for the batch.
//
// Decode path per block: Huffman DC diff + AC run/length -> dequantize in
// zigzag order -> separable float IDCT -> component plane; chroma planes are
// upsampled by pixel replication and converted via JFIF YCbCr.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "jpeg.h"

namespace {

const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct HuffTable {
  bool valid = false;
  // Canonical code bookkeeping per length (F.2.2.3 DECODE procedure).
  int32_t mincode[17];
  int32_t maxcode[17];
  int32_t valptr[17];
  uint8_t vals[256];
};

struct Component {
  int id = 0, h = 1, v = 1, tq = 0, td = 0, ta = 0;
  int dc_pred = 0;
  int bw = 0, bh = 0;  // plane dims in blocks
  std::vector<uint8_t> plane;
};

struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint32_t acc = 0;
  int nbits = 0;
  bool bad = false;

  BitReader(const uint8_t* data, const uint8_t* e) : p(data), end(e) {}

  // Returns false at a marker (0xFF non-stuffing) or end of data.
  bool fill() {
    while (nbits <= 24) {
      if (p >= end) return nbits > 0;
      uint8_t b = *p;
      if (b == 0xFF) {
        if (p + 1 >= end) return nbits > 0;
        uint8_t m = p[1];
        if (m == 0x00) {
          p += 2;
        } else {
          // Marker: stop feeding (caller handles RSTn via sync()).
          return nbits > 0;
        }
      } else {
        p += 1;
      }
      acc = (acc << 8) | b;
      nbits += 8;
    }
    return true;
  }

  int bits(int n) {
    if (n == 0) return 0;
    if (nbits < n && !fill() && nbits < n) {
      // Past the end: pad with zeros (tolerates truncated final byte).
      acc <<= (n - nbits);
      nbits = n;
      bad = true;
    }
    if (nbits < n) {
      acc <<= (n - nbits);
      nbits = n;
      bad = true;
    }
    int v = (acc >> (nbits - n)) & ((1u << n) - 1);
    nbits -= n;
    return v;
  }

  // Re-align at a restart marker; returns false if none is present.
  bool restart_sync() {
    acc = 0;
    nbits = 0;
    if (p + 1 < end && p[0] == 0xFF && p[1] >= 0xD0 && p[1] <= 0xD7) {
      p += 2;
      return true;
    }
    return false;
  }
};

int huff_decode(BitReader& br, const HuffTable& t) {
  int code = 0;
  for (int l = 1; l <= 16; ++l) {
    code = (code << 1) | br.bits(1);
    if (t.maxcode[l] >= 0 && code <= t.maxcode[l]) {
      int idx = t.valptr[l] + code - t.mincode[l];
      if (idx < 0 || idx > 255) return -1;
      return t.vals[idx];
    }
  }
  return -1;
}

int extend(int v, int t) {
  if (t == 0) return 0;
  return v < (1 << (t - 1)) ? v - (1 << t) + 1 : v;
}

void idct8x8(const float in[64], float out[64]) {
  static float c[8][8];
  static bool init = false;
  if (!init) {
    for (int u = 0; u < 8; ++u) {
      float cu = u == 0 ? 0.353553390593f : 0.5f;  // sqrt(1/8), sqrt(2/8)
      for (int x = 0; x < 8; ++x)
        c[u][x] = cu * std::cos((2 * x + 1) * u * 0.19634954084936207f);
    }
    init = true;
  }
  float tmp[64];
  for (int y = 0; y < 8; ++y) {  // rows: 1-D IDCT over u
    for (int x = 0; x < 8; ++x) {
      float s = 0;
      for (int u = 0; u < 8; ++u) s += c[u][x] * in[y * 8 + u];
      tmp[y * 8 + x] = s;
    }
  }
  for (int x = 0; x < 8; ++x) {  // cols: 1-D IDCT over v
    for (int y = 0; y < 8; ++y) {
      float s = 0;
      for (int v = 0; v < 8; ++v) s += c[v][y] * tmp[v * 8 + x];
      out[y * 8 + x] = s;
    }
  }
}

inline uint8_t clamp_u8(float v) {
  return v < 0.f ? 0 : (v > 255.f ? 255 : (uint8_t)(v + 0.5f));
}

}  // namespace

bool fg_decode_jpeg(const uint8_t* data, size_t len, int* out_w, int* out_h,
                    std::vector<uint8_t>* rgb) {
  if (len < 4 || data[0] != 0xFF || data[1] != 0xD8) return false;

  uint16_t qt[4][64] = {};
  bool qt_ok[4] = {};
  HuffTable hdc[4], hac[4];
  Component comp[3];
  int ncomp = 0, W = 0, H = 0, restart_interval = 0;
  size_t pos = 2;
  size_t scan_pos = 0;

  while (pos + 4 <= len) {
    if (data[pos] != 0xFF) return false;
    uint8_t marker = data[pos + 1];
    if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) {
      pos += 2;
      continue;
    }
    size_t seg = ((size_t)data[pos + 2] << 8) | data[pos + 3];
    if (seg < 2 || pos + 2 + seg > len) return false;
    const uint8_t* pl = data + pos + 4;
    size_t pn = seg - 2;

    if (marker == 0xDB) {  // DQT
      size_t i = 0;
      while (i < pn) {
        int pq = pl[i] >> 4, tq = pl[i] & 15;
        i += 1;
        if (tq > 3 || i + (pq ? 128 : 64) > pn) return false;
        for (int k = 0; k < 64; ++k)
          qt[tq][k] = pq ? ((pl[i + 2 * k] << 8) | pl[i + 2 * k + 1])
                         : pl[i + k];
        qt_ok[tq] = true;
        i += pq ? 128 : 64;
      }
    } else if (marker == 0xC4) {  // DHT
      size_t i = 0;
      while (i + 17 <= pn) {
        int tc = pl[i] >> 4, th = pl[i] & 15;
        if (tc > 1 || th > 3) return false;
        HuffTable& t = tc ? hac[th] : hdc[th];
        int total = 0, code = 0, k = 0;
        for (int l = 1; l <= 16; ++l) total += pl[i + l];
        if (total > 256 || i + 17 + total > pn) return false;
        for (int l = 1; l <= 16; ++l) {
          int n = pl[i + l];
          t.valptr[l] = k;
          t.mincode[l] = code;
          t.maxcode[l] = n ? code + n - 1 : -1;
          code = (code + n) << 1;
          k += n;
        }
        memcpy(t.vals, pl + i + 17, total);
        t.valid = true;
        i += 17 + total;
      }
    } else if (marker == 0xC0 || marker == 0xC1) {  // SOF0/1 (baseline)
      if (pn < 6 || pl[0] != 8) return false;
      H = (pl[1] << 8) | pl[2];
      W = (pl[3] << 8) | pl[4];
      ncomp = pl[5];
      if (W <= 0 || H <= 0 || (ncomp != 1 && ncomp != 3) ||
          pn < 6 + 3 * (size_t)ncomp)
        return false;
      for (int ci = 0; ci < ncomp; ++ci) {
        comp[ci].id = pl[6 + 3 * ci];
        comp[ci].h = pl[7 + 3 * ci] >> 4;
        comp[ci].v = pl[7 + 3 * ci] & 15;
        comp[ci].tq = pl[8 + 3 * ci];
        if (comp[ci].h < 1 || comp[ci].h > 2 || comp[ci].v < 1 ||
            comp[ci].v > 2 || comp[ci].tq > 3)
          return false;
      }
    } else if (marker >= 0xC2 && marker <= 0xCF && marker != 0xC4 &&
               marker != 0xC8 && marker != 0xCC) {
      return false;  // progressive / arithmetic / hierarchical
    } else if (marker == 0xDD) {  // DRI
      if (pn < 2) return false;
      restart_interval = (pl[0] << 8) | pl[1];
    } else if (marker == 0xDA) {  // SOS
      if (W == 0 || pn < 1 + 2 * (size_t)pl[0] + 3) return false;
      int ns = pl[0];
      if (ns != ncomp) return false;
      for (int si = 0; si < ns; ++si) {
        int cid = pl[1 + 2 * si];
        int tabs = pl[2 + 2 * si];
        for (int ci = 0; ci < ncomp; ++ci) {
          if (comp[ci].id == cid) {
            comp[ci].td = tabs >> 4;
            comp[ci].ta = tabs & 15;
          }
        }
      }
      scan_pos = pos + 2 + seg;
      break;
    }
    // APPn / COM / others: skip.
    pos += 2 + seg;
  }
  if (!scan_pos || W == 0) return false;

  int hmax = 1, vmax = 1;
  for (int ci = 0; ci < ncomp; ++ci) {
    hmax = comp[ci].h > hmax ? comp[ci].h : hmax;
    vmax = comp[ci].v > vmax ? comp[ci].v : vmax;
  }
  int mcux = (W + 8 * hmax - 1) / (8 * hmax);
  int mcuy = (H + 8 * vmax - 1) / (8 * vmax);
  for (int ci = 0; ci < ncomp; ++ci) {
    if (!qt_ok[comp[ci].tq] || !hdc[comp[ci].td].valid ||
        !hac[comp[ci].ta].valid)
      return false;
    comp[ci].bw = mcux * comp[ci].h;
    comp[ci].bh = mcuy * comp[ci].v;
    comp[ci].plane.assign((size_t)comp[ci].bw * comp[ci].bh * 64, 0);
  }

  BitReader br(data + scan_pos, data + len);
  int mcu_count = 0;
  float blk[64], px[64];

  for (int my = 0; my < mcuy; ++my) {
    for (int mx = 0; mx < mcux; ++mx) {
      if (restart_interval && mcu_count == restart_interval) {
        if (!br.restart_sync()) return false;
        for (int ci = 0; ci < ncomp; ++ci) comp[ci].dc_pred = 0;
        mcu_count = 0;
      }
      for (int ci = 0; ci < ncomp; ++ci) {
        Component& c = comp[ci];
        const uint16_t* q = qt[c.tq];
        for (int by = 0; by < c.v; ++by) {
          for (int bx = 0; bx < c.h; ++bx) {
            memset(blk, 0, sizeof(blk));
            int t = huff_decode(br, hdc[c.td]);
            if (t < 0 || t > 11) return false;
            c.dc_pred += extend(br.bits(t), t);
            blk[0] = (float)c.dc_pred * q[0];
            for (int k = 1; k < 64;) {
              int rs = huff_decode(br, hac[c.ta]);
              if (rs < 0) return false;
              int r = rs >> 4, s = rs & 15;
              if (s == 0) {
                if (r == 15) {
                  k += 16;  // ZRL
                  continue;
                }
                break;  // EOB
              }
              k += r;
              if (k > 63) return false;
              blk[kZigzag[k]] = (float)extend(br.bits(s), s) * q[k];
              ++k;
            }
            idct8x8(blk, px);
            // Store into the component plane (level shift +128).
            int ox = (mx * c.h + bx) * 8;
            int oy = (my * c.v + by) * 8;
            size_t stride = (size_t)c.bw * 8;
            for (int y = 0; y < 8; ++y) {
              uint8_t* row = &c.plane[(oy + y) * stride + ox];
              for (int x = 0; x < 8; ++x)
                row[x] = clamp_u8(px[y * 8 + x] + 128.0f);
            }
          }
        }
      }
      ++mcu_count;
    }
  }
  if (br.bad) return false;

  rgb->resize((size_t)W * H * 3);
  if (ncomp == 1) {
    size_t stride = (size_t)comp[0].bw * 8;
    for (int y = 0; y < H; ++y)
      for (int x = 0; x < W; ++x) {
        uint8_t g = comp[0].plane[y * stride + x];
        uint8_t* o = &(*rgb)[((size_t)y * W + x) * 3];
        o[0] = o[1] = o[2] = g;
      }
  } else {
    size_t ys = (size_t)comp[0].bw * 8;
    size_t cbs = (size_t)comp[1].bw * 8;
    size_t crs = (size_t)comp[2].bw * 8;
    int cbx = hmax / comp[1].h, cby = vmax / comp[1].v;
    int crx = hmax / comp[2].h, cry = vmax / comp[2].v;
    for (int y = 0; y < H; ++y) {
      for (int x = 0; x < W; ++x) {
        float Y = comp[0].plane[y * ys + x];
        float Cb = comp[1].plane[(y / cby) * cbs + (x / cbx)] - 128.0f;
        float Cr = comp[2].plane[(y / cry) * crs + (x / crx)] - 128.0f;
        uint8_t* o = &(*rgb)[((size_t)y * W + x) * 3];
        o[0] = clamp_u8(Y + 1.402f * Cr);
        o[1] = clamp_u8(Y - 0.344136f * Cb - 0.714136f * Cr);
        o[2] = clamp_u8(Y + 1.772f * Cb);
      }
    }
  }
  *out_w = W;
  *out_h = H;
  return true;
}

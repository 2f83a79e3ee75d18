// Baseline JPEG decoder (see jpeg.h). Written from the ITU-T.81 spec:
// canonical Huffman decode, per-MCU block scan with restart intervals,
// separable float IDCT, triangular (bilinear) chroma upsampling, JFIF
// YCbCr->RGB. Measured accuracy vs libjpeg (via PIL): within ±2/255 at
// 4:4:4, 4:2:2, and 4:2:0 (IDCT/colour-convert rounding differs); exact
// on grayscale.

#include "jpeg.h"

#include <cmath>
#include <cstring>

namespace vmjpeg {
namespace {

const int kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct HuffTable {
  // canonical decode: per code length l (1..16), the smallest code value
  // and the index of its first symbol
  int32_t mincode[17];
  int32_t maxcode[17];  // -1 when no codes of this length
  int32_t valptr[17];
  uint8_t values[256];
  // 8-bit lookahead: symbol + code length for codes of <= 8 bits
  uint8_t lut_sym[256];
  uint8_t lut_len[256];  // 0 => not covered, fall back to length walk
  bool present = false;
};

struct Component {
  int id = 0, h = 1, v = 1, tq = 0;
  int td = 0, ta = 0;          // Huffman table selectors (from SOS)
  int dc_pred = 0;
  int plane_w = 0, plane_h = 0;
  std::vector<uint8_t> plane;  // decoded samples at native resolution
};

class Decoder {
 public:
  Decoder(const uint8_t* data, size_t len) : data_(data), len_(len) {}

  bool run(std::vector<uint8_t>* out, int* w, int* h, std::string* err);

 private:
  const uint8_t* data_;
  size_t len_;
  size_t pos_ = 0;

  uint16_t qt_[4][64] = {};
  HuffTable huff_dc_[4], huff_ac_[4];
  Component comp_[4];
  int ncomp_ = 0, width_ = 0, height_ = 0;
  int hmax_ = 1, vmax_ = 1;
  int restart_interval_ = 0;

  // entropy-coded bit reader (handles 0xFF00 stuffing): MSB-first
  // accumulator — next bit is bit (bitcnt_-1) of bitbuf_
  uint32_t bitbuf_ = 0;
  int bitcnt_ = 0;
  bool hit_marker_ = false;

  std::string error_;

  // Header reads are bounded by limit_ (the current segment end, itself
  // clamped to len_). A read past the limit sets overrun_ and yields 0;
  // run() checks overrun_ after every segment parser, so no parser can
  // walk past its declared segment or the input buffer.
  size_t limit_ = 0;
  bool overrun_ = false;

  bool fail(const std::string& msg) {
    if (error_.empty()) error_ = msg;
    return false;
  }
  bool need(size_t n) { return pos_ + n <= len_; }
  int u8() {
    if (pos_ >= limit_) {
      overrun_ = true;
      return 0;
    }
    return data_[pos_++];
  }
  int u16() {
    if (pos_ + 2 > limit_) {
      overrun_ = true;
      pos_ = limit_;
      return 0;
    }
    int v = (data_[pos_] << 8) | data_[pos_ + 1];
    pos_ += 2;
    return v;
  }

  bool parse_dqt(size_t seg_end);
  bool parse_dht(size_t seg_end);
  bool parse_sof0(size_t seg_end);
  bool parse_sos();
  bool decode_scan();
  bool decode_block(Component& c, float* block);
  void fill_bits();
  int read_bits(int n);
  int huff_decode(const HuffTable& t);
  void idct_to_plane(Component& c, const float* block, int bx, int by);
};

// top up the accumulator to >= 25 bits (zero-padded past markers/EOF,
// which is safe for baseline scans: trailing pad bits are never used by a
// well-formed stream, and malformed ones fail Huffman lookup)
void Decoder::fill_bits() {
  while (bitcnt_ <= 24) {
    int b = 0;
    if (!hit_marker_ && pos_ < len_) {
      b = data_[pos_++];
      if (b == 0xFF) {
        if (pos_ < len_ && data_[pos_] == 0x00) {
          ++pos_;  // stuffed byte
        } else {
          hit_marker_ = true;  // real marker: leave it, pad with zeros
          --pos_;
          b = 0;
        }
      }
    }
    bitbuf_ = (bitbuf_ << 8) | uint32_t(b);
    bitcnt_ += 8;
  }
}

int Decoder::read_bits(int n) {
  if (n == 0) return 0;
  fill_bits();
  bitcnt_ -= n;
  return (bitbuf_ >> bitcnt_) & ((1u << n) - 1);
}

int Decoder::huff_decode(const HuffTable& t) {
  fill_bits();
  int peek8 = (bitbuf_ >> (bitcnt_ - 8)) & 0xFF;
  if (t.lut_len[peek8]) {
    bitcnt_ -= t.lut_len[peek8];
    return t.lut_sym[peek8];
  }
  int peek16 = (bitbuf_ >> (bitcnt_ - 16)) & 0xFFFF;
  for (int l = 9; l <= 16; ++l) {
    int code = peek16 >> (16 - l);
    if (t.maxcode[l] >= 0 && code <= t.maxcode[l]) {
      bitcnt_ -= l;
      return t.values[t.valptr[l] + code - t.mincode[l]];
    }
  }
  return -1;
}

inline int extend(int v, int s) {
  return (s && v < (1 << (s - 1))) ? v - (1 << s) + 1 : v;
}

bool Decoder::parse_dqt(size_t seg_end) {
  while (pos_ < seg_end) {
    int pq_tq = u8();
    int pq = pq_tq >> 4, tq = pq_tq & 15;
    if (tq > 3) return fail("bad DQT id");
    for (int i = 0; i < 64; ++i)
      qt_[tq][kZigzag[i]] = pq ? u16() : u8();
  }
  return true;
}

bool Decoder::parse_dht(size_t seg_end) {
  while (pos_ < seg_end) {
    int tc_th = u8();
    int tc = tc_th >> 4, th = tc_th & 15;
    if (tc > 1 || th > 3) return fail("bad DHT id");
    HuffTable& t = tc ? huff_ac_[th] : huff_dc_[th];
    uint8_t counts[17];
    int total = 0;
    for (int l = 1; l <= 16; ++l) {
      counts[l] = u8();
      total += counts[l];
    }
    if (total > 256 || !need(total)) return fail("bad DHT counts");
    for (int i = 0; i < total; ++i) t.values[i] = u8();
    memset(t.lut_len, 0, sizeof(t.lut_len));
    int code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
      // canonical code space check: counts that overflow 2^l codes at
      // length l would index past the lookahead LUT / values array
      if (code + counts[l] > (1 << l)) return fail("bad DHT code space");
      t.valptr[l] = k;
      t.mincode[l] = code;
      if (l <= 8) {
        for (int i = 0; i < counts[l]; ++i) {
          int prefix = (code + i) << (8 - l);
          for (int j = 0; j < (1 << (8 - l)); ++j) {
            t.lut_sym[prefix + j] = t.values[k + i];
            t.lut_len[prefix + j] = uint8_t(l);
          }
        }
      }
      code += counts[l];
      k += counts[l];
      t.maxcode[l] = counts[l] ? code - 1 : -1;
      code <<= 1;
    }
    t.present = true;
  }
  return true;
}

bool Decoder::parse_sof0(size_t seg_end) {
  (void)seg_end;
  int prec = u8();
  if (prec != 8) return fail("only 8-bit precision supported");
  height_ = u16();
  width_ = u16();
  ncomp_ = u8();
  if (height_ <= 0 || width_ <= 0) return fail("bad dimensions");
  if (ncomp_ != 1 && ncomp_ != 3) return fail("only 1/3 components supported");
  for (int i = 0; i < ncomp_; ++i) {
    comp_[i].id = u8();
    int hv = u8();
    comp_[i].h = hv >> 4;
    comp_[i].v = hv & 15;
    comp_[i].tq = u8();
    if (comp_[i].h < 1 || comp_[i].h > 4 || comp_[i].v < 1 || comp_[i].v > 4)
      return fail("bad sampling factors");
    if (comp_[i].tq > 3) return fail("bad quant table selector");
    hmax_ = std::max(hmax_, comp_[i].h);
    vmax_ = std::max(vmax_, comp_[i].v);
  }
  return true;
}

bool Decoder::parse_sos() {
  int ns = u8();
  if (ns != ncomp_) return fail("scan/frame component mismatch");
  for (int i = 0; i < ns; ++i) {
    int cs = u8(), tdta = u8();
    bool found = false;
    for (int j = 0; j < ncomp_; ++j) {
      if (comp_[j].id == cs) {
        comp_[j].td = tdta >> 4;
        comp_[j].ta = tdta & 15;
        if (comp_[j].td > 3 || comp_[j].ta > 3)
          return fail("bad Huffman table selector");
        found = true;
      }
    }
    if (!found) return fail("unknown scan component");
  }
  u8(); u8(); u8();  // Ss, Se, Ah/Al (fixed for baseline; bounded reads)
  return true;
}

bool Decoder::decode_block(Component& c, float* block) {
  const HuffTable& dc = huff_dc_[c.td];
  const HuffTable& ac = huff_ac_[c.ta];
  if (!dc.present || !ac.present) return fail("missing Huffman table");
  const uint16_t* q = qt_[c.tq];

  int s = huff_decode(dc);
  if (s < 0) return fail("bad DC code");
  // Baseline DC magnitude categories are 0..11 (ITU-T.81 table F.1); a
  // file-controlled Huffman table can emit any 0..255 symbol, and s > 16
  // would make read_bits shift by a negative count (UB).
  if (s > 11) return fail("bad DC size");
  int diff = extend(read_bits(s), s);
  c.dc_pred += diff;
  for (int i = 0; i < 64; ++i) block[i] = 0.f;
  block[0] = float(c.dc_pred) * q[0];

  for (int k = 1; k < 64;) {
    int rs = huff_decode(ac);
    if (rs < 0) return fail("bad AC code");
    int r = rs >> 4, sz = rs & 15;
    if (sz == 0) {
      if (r == 15) {
        k += 16;  // ZRL
        continue;
      }
      break;  // EOB
    }
    k += r;
    if (k > 63) return fail("AC run past block end");
    int zz = kZigzag[k];
    block[zz] = float(extend(read_bits(sz), sz)) * q[zz];
    ++k;
  }
  return true;
}

void Decoder::idct_to_plane(Component& c, const float* block, int bx, int by) {
  // separable IDCT: ctab[f][x] = C(f) * cos((2x+1) f pi / 16)
  static float ctab[8][8];
  static bool init = false;
  if (!init) {
    for (int f = 0; f < 8; ++f)
      for (int x = 0; x < 8; ++x)
        ctab[f][x] = float((f == 0 ? std::sqrt(0.5) : 1.0) *
                           std::cos((2 * x + 1) * f * M_PI / 16.0));
    init = true;
  }
  // bounding box of nonzero coefficients — natural JPEG blocks are sparse
  // (often DC-only), so limiting both passes to it is a big win
  int rmax = 0, cmax = 0;
  for (int r = 0; r < 8; ++r) {
    for (int cc = 0; cc < 8; ++cc) {
      if (block[r * 8 + cc] != 0.f) {
        if (r > rmax) rmax = r;
        if (cc > cmax) cmax = cc;
      }
    }
  }
  if (rmax == 0 && cmax == 0) {  // DC-only: flat block
    float v = block[0] * 0.125f + 128.f;
    uint8_t u = v <= 0.f ? 0 : v >= 255.f ? 255 : uint8_t(v + 0.5f);
    for (int y = 0; y < 8; ++y) {
      int py = by * 8 + y;
      if (py >= c.plane_h) break;
      uint8_t* row = c.plane.data() + size_t(py) * c.plane_w;
      for (int x = 0; x < 8; ++x) {
        int px = bx * 8 + x;
        if (px >= c.plane_w) break;
        row[px] = u;
      }
    }
    return;
  }
  float tmp[8][8];
  for (int r = 0; r <= rmax; ++r) {
    for (int x = 0; x < 8; ++x) {
      float acc = 0.f;
      for (int cc = 0; cc <= cmax; ++cc)
        acc += ctab[cc][x] * block[r * 8 + cc];
      tmp[r][x] = acc;
    }
  }
  for (int y = 0; y < 8; ++y) {
    int py = by * 8 + y;
    if (py >= c.plane_h) break;
    uint8_t* row = c.plane.data() + size_t(py) * c.plane_w;
    for (int x = 0; x < 8; ++x) {
      int px = bx * 8 + x;
      if (px >= c.plane_w) break;
      float acc = 0.f;
      for (int r = 0; r <= rmax; ++r) acc += ctab[r][y] * tmp[r][x];
      float v = 0.25f * acc + 128.f;
      row[px] = v <= 0.f ? 0 : v >= 255.f ? 255 : uint8_t(v + 0.5f);
    }
  }
}

bool Decoder::decode_scan() {
  int mcux = (width_ + 8 * hmax_ - 1) / (8 * hmax_);
  int mcuy = (height_ + 8 * vmax_ - 1) / (8 * vmax_);
  for (int i = 0; i < ncomp_; ++i) {
    Component& c = comp_[i];
    c.plane_w = mcux * 8 * c.h;
    c.plane_h = mcuy * 8 * c.v;
    c.plane.assign(size_t(c.plane_w) * c.plane_h, 128);
    c.dc_pred = 0;
  }
  float block[64];
  int mcus_until_restart = restart_interval_;
  for (int my = 0; my < mcuy; ++my) {
    for (int mx = 0; mx < mcux; ++mx) {
      if (restart_interval_ && mcus_until_restart == 0) {
        // byte-align and consume RSTn
        bitcnt_ = 0;
        bitbuf_ = 0;
        hit_marker_ = false;
        // tolerate an unconsumed bit-padding byte before the marker
        for (int skip = 0; skip < 2 && need(2) && data_[pos_] != 0xFF; ++skip)
          ++pos_;
        if (!need(2) || data_[pos_] != 0xFF || (data_[pos_ + 1] & 0xF8) != 0xD0)
          return fail("missing restart marker");
        pos_ += 2;
        for (int i = 0; i < ncomp_; ++i) comp_[i].dc_pred = 0;
        mcus_until_restart = restart_interval_;
      }
      for (int i = 0; i < ncomp_; ++i) {
        Component& c = comp_[i];
        for (int v = 0; v < c.v; ++v) {
          for (int h = 0; h < c.h; ++h) {
            if (!decode_block(c, block)) return false;
            idct_to_plane(c, block, mx * c.h + h, my * c.v + v);
          }
        }
      }
      if (restart_interval_) --mcus_until_restart;
    }
  }
  return true;
}

bool Decoder::run(std::vector<uint8_t>* out, int* w, int* h,
                  std::string* err) {
  auto finish_fail = [&](const std::string& fallback) {
    if (err) *err = error_.empty() ? fallback : error_;
    return false;
  };
  if (len_ < 4 || data_[0] != 0xFF || data_[1] != 0xD8)
    return finish_fail("not a JPEG (no SOI)");
  pos_ = 2;
  limit_ = len_;
  bool got_sof = false, got_scan = false;
  while (pos_ + 4 <= len_ && !got_scan) {
    if (u8() != 0xFF) return finish_fail("marker sync lost");
    int marker = u8();
    while (marker == 0xFF && pos_ < len_) marker = u8();  // fill bytes
    if (marker == 0xD9) break;  // EOI
    if (!need(2)) return finish_fail("truncated segment");
    int seg_len = u16();
    if (seg_len < 2) return finish_fail("bad segment length");
    size_t seg_end = pos_ + seg_len - 2;
    if (seg_end > len_) return finish_fail("segment overruns file");
    limit_ = seg_end;  // every parser read below is clamped to its segment
    switch (marker) {
      case 0xDB:
        if (!parse_dqt(seg_end)) return finish_fail("bad DQT");
        break;
      case 0xC4:
        if (!parse_dht(seg_end)) return finish_fail("bad DHT");
        break;
      case 0xC0:
      case 0xC1:  // extended sequential, same decode path
        if (!parse_sof0(seg_end)) return finish_fail("bad SOF");
        got_sof = true;
        break;
      case 0xC2:
        return finish_fail("progressive JPEG not supported (baseline only)");
      case 0xC3:
      case 0xC5:
      case 0xC6:
      case 0xC7:
      case 0xC9:
      case 0xCA:
      case 0xCB:
      case 0xCD:
      case 0xCE:
      case 0xCF:
        return finish_fail("unsupported SOF type");
      case 0xDD:
        restart_interval_ = u16();
        seg_end = pos_;  // already consumed
        break;
      case 0xDA:
        if (!got_sof) return finish_fail("SOS before SOF");
        if (!parse_sos() || overrun_) return finish_fail("bad SOS");
        limit_ = len_;
        bitcnt_ = 0;
        bitbuf_ = 0;
        hit_marker_ = false;
        if (!decode_scan()) return finish_fail("entropy decode failed");
        got_scan = true;
        continue;
      default:
        break;  // APPn / COM / others: skip
    }
    if (overrun_) return finish_fail("truncated segment");
    limit_ = len_;
    pos_ = seg_end;
  }
  if (!got_scan) return finish_fail("no scan data");

  *w = width_;
  *h = height_;
  out->resize(size_t(width_) * height_ * 3);
  uint8_t* rgb = out->data();
  if (ncomp_ == 1) {
    const Component& cy = comp_[0];
    for (int y = 0; y < height_; ++y) {
      const uint8_t* row = cy.plane.data() + size_t(y) * cy.plane_w;
      for (int x = 0; x < width_; ++x) {
        uint8_t v = row[x];
        rgb[0] = rgb[1] = rgb[2] = v;
        rgb += 3;
      }
    }
    return true;
  }
  // Subsampled chroma is upsampled with a centered triangular (bilinear)
  // filter — the same 3/4-1/4 weighting as libjpeg's default "fancy"
  // upsampler, so 4:2:0/4:2:2 output tracks libjpeg to within rounding.
  struct Sampler {
    std::vector<int> x0, x1;
    std::vector<float> wx;
    const Component* c;
    int vmax;
    void init(const Component& comp, int width, int hmax, int vm) {
      c = &comp;
      vmax = vm;
      x0.resize(width);
      x1.resize(width);
      wx.resize(width);
      float sxf = float(comp.h) / hmax;
      for (int x = 0; x < width; ++x) {
        float fx = (x + 0.5f) * sxf - 0.5f;
        if (fx < 0) fx = 0;
        float lim = float(comp.plane_w - 1);
        if (fx > lim) fx = lim;
        x0[x] = int(fx);
        x1[x] = x0[x] + 1 < comp.plane_w ? x0[x] + 1 : comp.plane_w - 1;
        wx[x] = fx - x0[x];
      }
    }
    // bilinear sample at output (x, fy-rows r0/r1 with weight wy)
    inline float at(const uint8_t* r0, const uint8_t* r1, float wy,
                    int x) const {
      float top = r0[x0[x]] + (r0[x1[x]] - r0[x0[x]]) * wx[x];
      float bot = r1[x0[x]] + (r1[x1[x]] - r1[x0[x]]) * wx[x];
      return top + (bot - top) * wy;
    }
    void rows(int y, const uint8_t** r0, const uint8_t** r1,
              float* wy) const {
      float fy = (y + 0.5f) * c->v / vmax - 0.5f;
      if (fy < 0) fy = 0;
      float lim = float(c->plane_h - 1);
      if (fy > lim) fy = lim;
      int y0 = int(fy);
      int y1 = y0 + 1 < c->plane_h ? y0 + 1 : c->plane_h - 1;
      *wy = fy - y0;
      *r0 = c->plane.data() + size_t(y0) * c->plane_w;
      *r1 = c->plane.data() + size_t(y1) * c->plane_w;
    }
  };
  Sampler sy_, sb_, sr_;
  sy_.init(comp_[0], width_, hmax_, vmax_);
  sb_.init(comp_[1], width_, hmax_, vmax_);
  sr_.init(comp_[2], width_, hmax_, vmax_);
  for (int y = 0; y < height_; ++y) {
    const uint8_t *y0r, *y1r, *b0r, *b1r, *r0r, *r1r;
    float ywy, bwy, rwy;
    sy_.rows(y, &y0r, &y1r, &ywy);
    sb_.rows(y, &b0r, &b1r, &bwy);
    sr_.rows(y, &r0r, &r1r, &rwy);
    for (int x = 0; x < width_; ++x) {
      float Y = sy_.at(y0r, y1r, ywy, x);
      float Cb = sb_.at(b0r, b1r, bwy, x) - 128.f;
      float Cr = sr_.at(r0r, r1r, rwy, x) - 128.f;
      float r = Y + 1.40200f * Cr;
      float g = Y - 0.34414f * Cb - 0.71414f * Cr;
      float b = Y + 1.77200f * Cb;
      rgb[0] = r <= 0 ? 0 : r >= 255 ? 255 : uint8_t(r + 0.5f);
      rgb[1] = g <= 0 ? 0 : g >= 255 ? 255 : uint8_t(g + 0.5f);
      rgb[2] = b <= 0 ? 0 : b >= 255 ? 255 : uint8_t(b + 0.5f);
      rgb += 3;
    }
  }
  return true;
}

}  // namespace

bool decode_rgb(const uint8_t* data, size_t len, std::vector<uint8_t>* out,
                int* width, int* height, std::string* err) {
  Decoder d(data, len);
  return d.run(out, width, height, err);
}

}  // namespace vmjpeg

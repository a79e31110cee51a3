// Shorten (v2) decoder — native fast path for WSJ0 .wv1/.wv2 ingestion.
//
// Mirrors the semantics of convtasnet_tpu/data/shorten.py (the reference
// implementation of record, implemented from the published format: Robinson,
// "SHORTEN: simple lossless and near-lossless waveform compression", CUED
// tech report 156, 1994). The reference repo reaches these files only by
// compiling the external sph2pipe tool (tools/Makefile:9-11); here decode is
// in-process. The Python decoder stays as the always-available fallback and
// as the oracle the native path is tested against (tests/test_native.py).
//
// Exposed C ABI (ctypes, convtasnet_tpu/data/native.py):
//   shorten_probe(data, nbytes, &nchan, &ftype)            -> 0 | -err
//   shorten_decode(data, nbytes, out, max_frames, &nchan, &ftype)
//       -> frames decoded per channel (out: int32, interleaved) | -err
//
// Error codes: -1 bad magic/version, -2 unsupported feature, -3 truncated
// bitstream, -5 corrupt stream.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int FN_DIFF0 = 0, FN_DIFF1 = 1, FN_DIFF2 = 2, FN_DIFF3 = 3;
constexpr int FN_QUIT = 4, FN_BLOCKSIZE = 5, FN_BITSHIFT = 6, FN_QLPC = 7,
              FN_ZERO = 8, FN_VERBATIM = 9;
constexpr int FNSIZE = 2, ENERGYSIZE = 3, BITSHIFTSIZE = 2, ULONGSIZE = 2,
              LPCQSIZE = 2, LPCQUANT = 5, XBYTESIZE = 7,
              VERBATIM_CKSIZE_SIZE = 5, VERBATIM_BYTE_SIZE = 8, NWRAP = 3;
constexpr int64_t LPCQOFFSET_V2 = 1 << (LPCQUANT - 1);

constexpr int TYPE_S8 = 1, TYPE_U8 = 2, TYPE_S16HL = 3, TYPE_U16HL = 4,
              TYPE_S16LH = 5, TYPE_U16LH = 6;

bool supported_type(int64_t t) { return t >= TYPE_S8 && t <= TYPE_U16LH; }
bool signed_type(int64_t t) {
  return t == TYPE_S8 || t == TYPE_S16HL || t == TYPE_S16LH;
}

// floor division / floor shift (Python // and >> semantics on negatives)
inline int64_t floor_div(int64_t a, int64_t b) {
  int64_t q = a / b, r = a % b;
  return (r != 0 && ((r < 0) != (b < 0))) ? q - 1 : q;
}
inline int64_t rounded_shift_down(int64_t x, int n) {
  if (n == 0) return x;
  return ((x >> (n - 1)) + 1) >> 1;  // arithmetic shift = floor
}

struct BitReader {
  const uint8_t* data;
  int64_t len, pos = 0;
  uint32_t word = 0;
  int nbits = 0;
  bool error = false;  // sticky: exhausted or corrupt

  BitReader(const uint8_t* d, int64_t n) : data(d), len(n) {}

  void fill() {
    if (pos >= len) {
      error = true;
      word = 0;
      nbits = 32;  // let the caller terminate; error flag is checked
      return;
    }
    uint32_t w = 0;
    for (int i = 0; i < 4; i++) {
      w = (w << 8) | (pos < len ? data[pos] : 0);
      pos++;
    }
    word = w;
    nbits = 32;
  }

  int64_t uvar(int k) {
    // unary prefix: zeros then a terminating 1
    int64_t result = 0;
    for (;;) {
      if (error) return 0;
      if (nbits == 0) fill();
      uint32_t chunk = nbits == 32 ? word
                                   : (word & ((1u << nbits) - 1));
      if (chunk == 0) {
        result += nbits;
        nbits = 0;
        if (result > (int64_t)1 << 40) { error = true; return 0; }
        continue;
      }
      int top = 32 - __builtin_clz(chunk);  // position of highest set bit
      result += nbits - top;
      nbits = top - 1;  // consume zeros and the terminating 1
      break;
    }
    int64_t value = 0;
    int need = k;
    while (need > 0) {
      if (error) return 0;
      if (nbits == 0) fill();
      int take = need < nbits ? need : nbits;
      value = (value << take) |
              ((word >> (nbits - take)) & ((take == 32) ? 0xFFFFFFFFu
                                                        : ((1u << take) - 1)));
      nbits -= take;
      need -= take;
    }
    return (result << k) | value;
  }

  int64_t var(int k) {
    int64_t u = uvar(k + 1);
    return (u & 1) ? -(u >> 1) - 1 : (u >> 1);
  }

  int64_t ulong() {
    int64_t nbit = uvar(ULONGSIZE);
    if (nbit > 40) { error = true; return 0; }
    return uvar((int)nbit);
  }
};

struct Header {
  int64_t ftype, nchan, blocksize, maxnlpc, nmean;
  BitReader br;
};

// Parse magic + header fields; returns 0 or a negative error code.
int parse_header(const uint8_t* data, int64_t nbytes, Header* h) {
  if (nbytes < 9 || memcmp(data, "ajkg", 4) != 0) return -1;
  if (data[4] != '2') return -1;  // shorten v2 only (WSJ0 distribution)
  h->br = BitReader(data + 5, nbytes - 5);
  BitReader& br = h->br;
  h->ftype = br.ulong();
  if (!supported_type(h->ftype)) return -2;
  h->nchan = br.ulong();
  if (h->nchan <= 0 || h->nchan > 64) return -5;
  h->blocksize = br.ulong();
  h->maxnlpc = br.ulong();
  h->nmean = br.ulong();
  int64_t nskip = br.ulong();
  if (nskip < 0 || nskip > nbytes) return -5;
  for (int64_t i = 0; i < nskip; i++) br.uvar(XBYTESIZE);
  if (br.error) return -3;
  return 0;
}

}  // namespace

extern "C" {

int64_t shorten_probe(const uint8_t* data, int64_t nbytes, int32_t* nchan_out,
                      int32_t* ftype_out) {
  Header h{0, 0, 0, 0, 0, BitReader(nullptr, 0)};
  int rc = parse_header(data, nbytes, &h);
  if (rc != 0) return rc;
  *nchan_out = (int32_t)h.nchan;
  *ftype_out = (int32_t)h.ftype;
  return 0;
}

int64_t shorten_decode(const uint8_t* data, int64_t nbytes, int32_t* out,
                       int64_t max_frames, int32_t* nchan_out,
                       int32_t* ftype_out) {
  Header h{0, 0, 0, 0, 0, BitReader(nullptr, 0)};
  int rc = parse_header(data, nbytes, &h);
  if (rc != 0) return rc;
  *nchan_out = (int32_t)h.nchan;
  *ftype_out = (int32_t)h.ftype;

  BitReader& br = h.br;
  const int64_t nchan = h.nchan;
  int64_t blocksize = h.blocksize;
  const int64_t nmean = h.nmean;
  const int64_t nwrap = std::max<int64_t>(NWRAP, h.maxnlpc);
  if (blocksize <= 0 || blocksize > (1 << 20) || nwrap > (1 << 12)) return -5;

  const int64_t default_offset =
      signed_type(h.ftype) ? 0 : (h.ftype == TYPE_U8 ? 0x80 : 0x8000);
  // wrap history (pre-bitshift domain) and running-mean offsets per channel
  std::vector<std::vector<int64_t>> hist(nchan,
                                         std::vector<int64_t>(nwrap, 0));
  std::vector<std::vector<int64_t>> offsets(
      nchan, std::vector<int64_t>(std::max<int64_t>(nmean, 1),
                                  default_offset));
  std::vector<int64_t> count(nchan, 0);
  std::vector<int64_t> block;
  std::vector<int64_t> qlpc, hbuf;

  int bitshift = 0;
  int64_t chan = 0;
  for (;;) {
    int64_t cmd = br.uvar(FNSIZE);
    if (br.error) return -3;
    if (cmd == FN_QUIT) break;
    if (cmd == FN_BLOCKSIZE) {
      blocksize = br.ulong();
      if (blocksize <= 0 || blocksize > (1 << 20)) return -5;
      continue;
    }
    if (cmd == FN_BITSHIFT) {
      bitshift = (int)br.uvar(BITSHIFTSIZE);
      if (bitshift > 31) return -5;
      continue;
    }
    if (cmd == FN_VERBATIM) {
      int64_t n = br.uvar(VERBATIM_CKSIZE_SIZE);
      for (int64_t i = 0; i < n; i++) br.uvar(VERBATIM_BYTE_SIZE);
      continue;
    }
    if (cmd != FN_DIFF0 && cmd != FN_DIFF1 && cmd != FN_DIFF2 &&
        cmd != FN_DIFF3 && cmd != FN_QLPC && cmd != FN_ZERO)
      return -5;

    // channel running offset (v2 rounding)
    int64_t coffset;
    if (nmean == 0) {
      coffset = offsets[chan][0];
    } else {
      int64_t total = nmean / 2;
      for (int64_t v : offsets[chan]) total += v;
      coffset = rounded_shift_down(floor_div(total, nmean), bitshift);
    }

    std::vector<int64_t>& hc = hist[chan];
    block.assign(blocksize, 0);
    if (cmd == FN_ZERO) {
      // zeros already assigned
    } else if (cmd == FN_QLPC) {
      int energy = (int)br.uvar(ENERGYSIZE);
      int64_t nlpc = br.uvar(LPCQSIZE);
      if (nlpc < 0 || nlpc > nwrap) return -5;
      qlpc.resize(nlpc);
      for (int64_t j = 0; j < nlpc; j++) qlpc[j] = br.var(LPCQUANT);
      // predict in the offset-removed domain; hbuf[0] = x[-1]
      hbuf.resize(nlpc);
      for (int64_t j = 0; j < nlpc; j++)
        hbuf[j] = hc[nwrap - 1 - j] - coffset;
      for (int64_t i = 0; i < blocksize; i++) {
        int64_t s = LPCQOFFSET_V2;
        for (int64_t j = 0; j < nlpc; j++) s += qlpc[j] * hbuf[j];
        int64_t v = br.var(energy) + (s >> LPCQUANT);
        block[i] = v + coffset;
        if (nlpc) {
          for (int64_t j = nlpc - 1; j > 0; j--) hbuf[j] = hbuf[j - 1];
          hbuf[0] = v;
        }
      }
    } else {
      int energy = (int)br.uvar(ENERGYSIZE);
      int64_t p1 = nwrap >= 1 ? hc[nwrap - 1] : 0;
      int64_t p2 = nwrap >= 2 ? hc[nwrap - 2] : 0;
      int64_t p3 = nwrap >= 3 ? hc[nwrap - 3] : 0;
      if (cmd == FN_DIFF0) {
        for (int64_t i = 0; i < blocksize; i++)
          block[i] = br.var(energy) + coffset;
      } else if (cmd == FN_DIFF1) {
        for (int64_t i = 0; i < blocksize; i++) {
          p1 = br.var(energy) + p1;
          block[i] = p1;
        }
      } else if (cmd == FN_DIFF2) {
        for (int64_t i = 0; i < blocksize; i++) {
          int64_t v = br.var(energy) + 2 * p1 - p2;
          block[i] = v;
          p2 = p1;
          p1 = v;
        }
      } else {  // FN_DIFF3
        for (int64_t i = 0; i < blocksize; i++) {
          int64_t v = br.var(energy) + 3 * (p1 - p2) + p3;
          block[i] = v;
          p3 = p2;
          p2 = p1;
          p1 = v;
        }
      }
    }
    if (br.error) return -3;

    // running mean update (pre-bitshift domain, scaled up)
    if (nmean > 0) {
      int64_t s = blocksize / 2;
      for (int64_t v : block) s += v;
      std::vector<int64_t>& oc = offsets[chan];
      for (size_t j = 0; j + 1 < oc.size(); j++) oc[j] = oc[j + 1];
      oc.back() = floor_div(s, blocksize) << bitshift;
    }

    // wrap history keeps pre-bitshift values
    if (nwrap > 0) {
      if (blocksize >= nwrap) {
        for (int64_t j = 0; j < nwrap; j++)
          hc[j] = block[blocksize - nwrap + j];
      } else {
        for (int64_t j = 0; j < nwrap - blocksize; j++)
          hc[j] = hc[j + blocksize];
        for (int64_t j = 0; j < blocksize; j++)
          hc[nwrap - blocksize + j] = block[j];
      }
    }

    // emit (interleaved), clipped to capacity; shift applies on output
    int64_t take = std::min(blocksize, max_frames - count[chan]);
    for (int64_t i = 0; i < take; i++)
      out[(count[chan] + i) * nchan + chan] =
          (int32_t)(block[i] << bitshift);
    count[chan] += take;

    chan = (chan + 1) % nchan;
    if (chan == 0) {
      bool full = true;
      for (int64_t c = 0; c < nchan; c++)
        if (count[c] < max_frames) { full = false; break; }
      if (full) break;
    }
  }

  int64_t n = max_frames;
  for (int64_t c = 0; c < nchan; c++) n = std::min(n, count[c]);
  return n;
}

}  // extern "C"

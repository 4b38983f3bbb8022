// Bit-parallel multi-pattern scan (host fast path).
//
// The reference's fastest exact engine is the multiword shift-and scan
// (shift_and.cc:218-254) and its k-error generalization is the Wu-Manber
// row stack (shift_and_inexact.cc:265-330).  This is that machine, built
// from the framework's dense [P, Lmax, alpha] accept table so IUPAC
// wildcard classes need no special casing: U[c] bit b is simply "pattern
// position b accepts alphabet code c".
//
// Substitution-only rows (the ConvScanner contract is k-MISMATCH; indel
// candidates go through the Sellers DP):
//   R0' = ((R0 << 1) | S) & U[c]
//   Ri' = (((Ri << 1) | S) & U[c]) | (R(i-1)_old << 1) | S        i >= 1
// where R(i-1)_old is row i-1 BEFORE this character's update.  Rows are
// monotone (Ri <= R(i+1)), so the lowest row whose end bit fires is the
// exact mismatch count.  Carry bleed across word boundaries lands only on
// pattern start bits, which S sets unconditionally, so the multiword
// shift needs no per-pattern masking (same argument as the reference's
// concatenated-pattern layout).  With poison_eos, an EOS character clears
// every row: no window may straddle an entry boundary (the semantics of
// conv_weights' poison row).
//
// Hits are emitted as (end_position, bit_index, mismatches); the Python
// wrapper maps bit_index -> pattern and orders by (window_start, pattern).

#include <cstdint>
#include <cstring>

namespace {
constexpr int32_t kMaxWords = 64;  // 4096 concatenated pattern chars
}

extern "C" {

// Returns the TOTAL hit count (callers retry with a larger cap when the
// return exceeds cap - the scan is cheap enough to re-run), or -1 when
// nwords exceeds the compiled state budget.
// codes:   [n] uint8 text codes
// u:       [alpha][nwords] uint64 accept masks
// s,e:     [nwords] start-bit / end-bit masks
// rows:    caller scratch, (k+1)*nwords uint64 (zeroed here)
// out_end/out_bit/out_mism: [cap] hit buffers
int64_t sat_shift_and_scan(const uint8_t* codes, int64_t n,
                           const uint64_t* u, int32_t alpha, int32_t nwords,
                           const uint64_t* s, const uint64_t* e,
                           int32_t k, int32_t poison_eos, int32_t eos_code,
                           uint64_t* rows,
                           int64_t* out_end, int32_t* out_bit,
                           int32_t* out_mism, int64_t cap) {
  if (nwords > kMaxWords || nwords <= 0) return -1;
  const int32_t nr = k + 1;
  std::memset(rows, 0, sizeof(uint64_t) * (size_t)nr * nwords);
  uint64_t oldprev[kMaxWords];  // row i-1 before its update this char
  uint64_t tmp[kMaxWords];      // row i before its update this char
  int64_t nhits = 0;
  for (int64_t t = 0; t < n; ++t) {
    const uint8_t c = codes[t];
    if (poison_eos && (int32_t)c == eos_code) {
      std::memset(rows, 0, sizeof(uint64_t) * (size_t)nr * nwords);
      continue;
    }
    const uint64_t* uc = u + (size_t)c * nwords;
    uint64_t any_end = 0;
    for (int32_t i = 0; i < nr; ++i) {
      uint64_t* ri = rows + (size_t)i * nwords;
      std::memcpy(tmp, ri, sizeof(uint64_t) * nwords);
      uint64_t ca = 0, cb = 0;
      for (int32_t w = 0; w < nwords; ++w) {
        const uint64_t sha = (tmp[w] << 1) | ca;
        ca = tmp[w] >> 63;
        uint64_t val = (sha | s[w]) & uc[w];
        if (i > 0) {
          const uint64_t shb = (oldprev[w] << 1) | cb;
          cb = oldprev[w] >> 63;
          val |= shb | s[w];
        }
        ri[w] = val;
        any_end |= val & e[w];
      }
      std::memcpy(oldprev, tmp, sizeof(uint64_t) * nwords);
    }
    if (any_end) {
      for (int32_t w = 0; w < nwords; ++w) {
        uint64_t bits = rows[(size_t)(nr - 1) * nwords + w] & e[w];
        while (bits) {
          const int32_t b = __builtin_ctzll(bits);
          bits &= bits - 1;
          int32_t mism = nr - 1;
          for (int32_t i = 0; i < nr - 1; ++i) {
            if (rows[(size_t)i * nwords + w] & (1ULL << b)) { mism = i; break; }
          }
          if (nhits < cap) {
            out_end[nhits] = t + 1;
            out_bit[nhits] = w * 64 + b;
            out_mism[nhits] = mism;
          }
          ++nhits;
        }
      }
    }
  }
  return nhits;
}

}  // extern "C"

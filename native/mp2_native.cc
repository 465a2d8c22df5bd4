// mp2-tpu native host kernels.
//
// The reference implements its byte-oriented witness-generation hot loops in
// Rust (keccak over MPT nodes, storage-key derivation; SURVEY.md §7 hard
// part 4).  This library is the C++ equivalent for the TPU build's host
// side: batched keccak-256 plus Goldilocks scalar helpers, exposed with a
// plain C ABI consumed via ctypes (no pybind11 in this environment).
//
// Build: see native/build.py (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>

namespace {

constexpr int kRounds = 24;

constexpr uint64_t kRC[kRounds] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};

constexpr int kRot[5][5] = {{0, 36, 3, 41, 18},
                            {1, 44, 10, 45, 2},
                            {62, 6, 43, 15, 61},
                            {28, 55, 25, 21, 56},
                            {27, 20, 39, 8, 14}};

inline uint64_t rotl(uint64_t x, int n) {
  return n == 0 ? x : (x << n) | (x >> (64 - n));
}

void keccak_f1600(uint64_t a[25]) {
  for (int r = 0; r < kRounds; ++r) {
    uint64_t c[5], d[5], b[25];
    for (int x = 0; x < 5; ++x)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; ++x)
      d[x] = c[(x + 4) % 5] ^ rotl(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) a[x + 5 * y] ^= d[x];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl(a[x + 5 * y], kRot[x][y]);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        a[x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] &
                                       b[(x + 2) % 5 + 5 * y]);
    a[0] ^= kRC[r];
  }
}

void keccak256_one(const uint8_t* data, uint64_t len, uint8_t* out) {
  constexpr uint64_t kRate = 136;
  uint64_t state[25];
  std::memset(state, 0, sizeof(state));
  // absorb full blocks
  while (len >= kRate) {
    for (int i = 0; i < 17; ++i) {
      uint64_t lane;
      std::memcpy(&lane, data + 8 * i, 8);
      state[i] ^= lane;
    }
    keccak_f1600(state);
    data += kRate;
    len -= kRate;
  }
  // final padded block
  uint8_t block[kRate];
  std::memset(block, 0, kRate);
  std::memcpy(block, data, len);
  block[len] ^= 0x01;
  block[kRate - 1] ^= 0x80;
  for (int i = 0; i < 17; ++i) {
    uint64_t lane;
    std::memcpy(&lane, block + 8 * i, 8);
    state[i] ^= lane;
  }
  keccak_f1600(state);
  std::memcpy(out, state, 32);
}

}  // namespace

extern "C" {

void mp2_keccak256(const uint8_t* data, uint64_t len, uint8_t* out32) {
  keccak256_one(data, len, out32);
}

// Batched: inputs concatenated, offsets[i]..offsets[i+1] per item.
void mp2_keccak256_batch(const uint8_t* data, const uint64_t* offsets,
                         uint64_t count, uint8_t* out) {
  for (uint64_t i = 0; i < count; ++i) {
    keccak256_one(data + offsets[i], offsets[i + 1] - offsets[i],
                  out + 32 * i);
  }
}

// Goldilocks helpers (p = 2^64 - 2^32 + 1) for host-side golden paths.
static constexpr uint64_t kP = 0xffffffff00000001ULL;

uint64_t mp2_gl_mul(uint64_t a, uint64_t b) {
  __uint128_t prod = (__uint128_t)a * b;
  uint64_t lo = (uint64_t)prod;
  uint64_t hi = (uint64_t)(prod >> 64);
  uint64_t hi_lo = hi & 0xffffffffULL;
  uint64_t hi_hi = hi >> 32;
  uint64_t t = (hi_lo << 32) - hi_lo;
  uint64_t s = lo + t;
  if (s < lo) s += 0xffffffffULL;
  uint64_t s2 = s - hi_hi;
  if (s < hi_hi) s2 -= 0xffffffffULL;
  if (s2 >= kP) s2 -= kP;
  return s2;
}

void mp2_gl_mul_batch(const uint64_t* a, const uint64_t* b, uint64_t n,
                      uint64_t* out) {
  for (uint64_t i = 0; i < n; ++i) out[i] = mp2_gl_mul(a[i], b[i]);
}

}  // extern "C"

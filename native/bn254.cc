// BN254 Groth16 backend (host-side, CPU by nature — the role of the
// reference's gnark bridge, groth16-framework/src + gnark-utils/lib).
//
// Design notes: correctness over speed.  The pairing is the TATE pairing
// e(P, psi(Q)) computed by a generic Miller loop over the group order r
// with affine line functions in E(Fq12) (psi embeds the D-twist G2' into
// E(Fq12) via (x w^2, y w^3), w^6 = xi = 9+i), followed by a full
// square-and-multiply final exponentiation by (q^12-1)/r.  This avoids
// every optimal-ate/Frobenius subtlety; bilinearity + non-degeneracy are
// all Groth16 needs, and proofs are verified by the same library.
// The CRS is generated in-process from caller-provided entropy (dev-grade
// trusted setup, like gnark's test setup; production needs a ceremony).
//
// Exposed C API (ctypes): selftest, and a Groth16 wrap over the
// "squaring-chain binding" R1CS: given public inputs p_0..p_{n-1} and the
// claimed commitment c:  x_0 = 1;  x_{i+1} = x_i * x_i + p_i;  c == x_n.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// ---------------------------------------------------------------------------
// 256-bit Montgomery fields (generic)
// ---------------------------------------------------------------------------

struct U256 {
  u64 l[4];
  bool operator==(const U256 &o) const {
    return !memcmp(l, o.l, sizeof(l));
  }
};

static U256 u256_zero() { U256 z{}; return z; }

static bool geq(const U256 &a, const U256 &b) {
  for (int i = 3; i >= 0; i--) {
    if (a.l[i] != b.l[i]) return a.l[i] > b.l[i];
  }
  return true;
}

static U256 add_nored(const U256 &a, const U256 &b, u64 *carry) {
  U256 r;
  u128 c = 0;
  for (int i = 0; i < 4; i++) {
    u128 s = (u128)a.l[i] + b.l[i] + (u64)c;
    r.l[i] = (u64)s;
    c = s >> 64;
  }
  *carry = (u64)c;
  return r;
}

static U256 sub_nored(const U256 &a, const U256 &b, u64 *borrow) {
  U256 r;
  u64 br = 0;
  for (int i = 0; i < 4; i++) {
    u128 d = (u128)a.l[i] - b.l[i] - br;
    r.l[i] = (u64)d;
    br = (d >> 64) ? 1 : 0;
  }
  *borrow = br;
  return r;
}

struct FieldParams {
  U256 mod;
  U256 r2;      // R^2 mod p (R = 2^256)
  U256 one_m;   // R mod p (Montgomery 1)
  u64 ninv;     // -p^{-1} mod 2^64
};

static u64 inv64(u64 a) {  // a^{-1} mod 2^64 (a odd), Newton iteration
  u64 x = a;
  for (int i = 0; i < 5; i++) x *= 2 - a * x;
  return x;
}

// CIOS Montgomery multiplication
static U256 mont_mul(const U256 &a, const U256 &b, const FieldParams &F) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    u128 c = 0;
    for (int j = 0; j < 4; j++) {
      u128 s = (u128)t[j] + (u128)a.l[i] * b.l[j] + (u64)c;
      t[j] = (u64)s;
      c = s >> 64;
    }
    u128 s = (u128)t[4] + (u64)c;
    t[4] = (u64)s;
    t[5] = (u64)(s >> 64);
    u64 m = t[0] * F.ninv;
    c = ((u128)t[0] + (u128)m * F.mod.l[0]) >> 64;
    for (int j = 1; j < 4; j++) {
      u128 s2 = (u128)t[j] + (u128)m * F.mod.l[j] + (u64)c;
      t[j - 1] = (u64)s2;
      c = s2 >> 64;
    }
    s = (u128)t[4] + (u64)c;
    t[3] = (u64)s;
    t[4] = t[5] + (u64)(s >> 64);
  }
  U256 r{{t[0], t[1], t[2], t[3]}};
  if (t[4] || geq(r, F.mod)) {
    u64 br;
    r = sub_nored(r, F.mod, &br);
  }
  return r;
}

static U256 f_add(const U256 &a, const U256 &b, const FieldParams &F) {
  u64 c;
  U256 r = add_nored(a, b, &c);
  if (c || geq(r, F.mod)) {
    u64 br;
    r = sub_nored(r, F.mod, &br);
  }
  return r;
}

static U256 f_sub(const U256 &a, const U256 &b, const FieldParams &F) {
  u64 br;
  U256 r = sub_nored(a, b, &br);
  if (br) {
    u64 c;
    r = add_nored(r, F.mod, &c);
  }
  return r;
}

static U256 f_neg(const U256 &a, const FieldParams &F) {
  return f_sub(u256_zero(), a, F);
}

static U256 to_mont(const U256 &a, const FieldParams &F) {
  return mont_mul(a, F.r2, F);
}

static U256 from_mont(const U256 &a, const FieldParams &F) {
  U256 one{{1, 0, 0, 0}};
  return mont_mul(a, one, F);
}

static U256 f_pow(const U256 &a, const U256 &e, const FieldParams &F) {
  U256 r = F.one_m, base = a;
  for (int i = 0; i < 256; i++) {
    if ((e.l[i / 64] >> (i % 64)) & 1) r = mont_mul(r, base, F);
    base = mont_mul(base, base, F);
  }
  return r;
}

static U256 f_inv(const U256 &a, const FieldParams &F) {
  U256 e = F.mod;
  u64 br;
  U256 two{{2, 0, 0, 0}};
  e = sub_nored(e, two, &br);
  return f_pow(a, e, F);
}

static FieldParams make_field(const U256 &mod) {
  FieldParams F;
  F.mod = mod;
  F.ninv = (u64)(0 - inv64(mod.l[0]));
  // R mod p: compute 2^256 mod p by repeated doubling of 1
  U256 r{{1, 0, 0, 0}};
  for (int i = 0; i < 256; i++) r = f_add(r, r, F);  // uses only mod
  F.one_m = r;
  // R^2 mod p
  U256 r2 = r;
  for (int i = 0; i < 256; i++) r2 = f_add(r2, r2, F);
  F.r2 = r2;
  return F;
}

// BN254 moduli
static const U256 Q_MOD{{0x3c208c16d87cfd47ULL, 0x97816a916871ca8dULL,
                         0xb85045b68181585dULL, 0x30644e72e131a029ULL}};
static const U256 R_MOD{{0x43e1f593f0000001ULL, 0x2833e84879b97091ULL,
                         0xb85045b68181585dULL, 0x30644e72e131a029ULL}};

static FieldParams FQ;  // base field
static FieldParams FR;  // scalar field

// ---------------------------------------------------------------------------
// Fq2 / Fq6 / Fq12 tower
// ---------------------------------------------------------------------------

struct Fq2 {
  U256 c0, c1;  // c0 + c1 i, i^2 = -1
};

static Fq2 fq2_zero() { return Fq2{u256_zero(), u256_zero()}; }
static Fq2 fq2_one() { return Fq2{FQ.one_m, u256_zero()}; }

static Fq2 fq2_add(const Fq2 &a, const Fq2 &b) {
  return Fq2{f_add(a.c0, b.c0, FQ), f_add(a.c1, b.c1, FQ)};
}
static Fq2 fq2_sub(const Fq2 &a, const Fq2 &b) {
  return Fq2{f_sub(a.c0, b.c0, FQ), f_sub(a.c1, b.c1, FQ)};
}
static Fq2 fq2_mul(const Fq2 &a, const Fq2 &b) {
  U256 t0 = mont_mul(a.c0, b.c0, FQ);
  U256 t1 = mont_mul(a.c1, b.c1, FQ);
  U256 s = mont_mul(f_add(a.c0, a.c1, FQ), f_add(b.c0, b.c1, FQ), FQ);
  return Fq2{f_sub(t0, t1, FQ), f_sub(f_sub(s, t0, FQ), t1, FQ)};
}
static Fq2 fq2_neg(const Fq2 &a) { return Fq2{f_neg(a.c0, FQ), f_neg(a.c1, FQ)}; }
static Fq2 fq2_inv(const Fq2 &a) {
  // (c0 - c1 i) / (c0^2 + c1^2)
  U256 n = f_add(mont_mul(a.c0, a.c0, FQ), mont_mul(a.c1, a.c1, FQ), FQ);
  U256 ninv = f_inv(n, FQ);
  return Fq2{mont_mul(a.c0, ninv, FQ), f_neg(mont_mul(a.c1, ninv, FQ), FQ)};
}
static bool fq2_is_zero(const Fq2 &a) {
  return a.c0 == u256_zero() && a.c1 == u256_zero();
}

// Fq6 = Fq2[v]/(v^3 - xi), xi = 9 + i
struct Fq6 {
  Fq2 c0, c1, c2;
};
static Fq2 XI;  // set at init (Montgomery form)

static Fq2 mul_xi(const Fq2 &a) { return fq2_mul(a, XI); }

static Fq6 fq6_zero() { return Fq6{fq2_zero(), fq2_zero(), fq2_zero()}; }
static Fq6 fq6_one() { return Fq6{fq2_one(), fq2_zero(), fq2_zero()}; }
static Fq6 fq6_add(const Fq6 &a, const Fq6 &b) {
  return Fq6{fq2_add(a.c0, b.c0), fq2_add(a.c1, b.c1), fq2_add(a.c2, b.c2)};
}
static Fq6 fq6_sub(const Fq6 &a, const Fq6 &b) {
  return Fq6{fq2_sub(a.c0, b.c0), fq2_sub(a.c1, b.c1), fq2_sub(a.c2, b.c2)};
}
static Fq6 fq6_neg(const Fq6 &a) {
  return Fq6{fq2_neg(a.c0), fq2_neg(a.c1), fq2_neg(a.c2)};
}
static Fq6 fq6_mul(const Fq6 &a, const Fq6 &b) {
  Fq2 t0 = fq2_mul(a.c0, b.c0);
  Fq2 t1 = fq2_mul(a.c1, b.c1);
  Fq2 t2 = fq2_mul(a.c2, b.c2);
  Fq2 c0 = fq2_add(
      t0, mul_xi(fq2_sub(
              fq2_sub(fq2_mul(fq2_add(a.c1, a.c2), fq2_add(b.c1, b.c2)), t1),
              t2)));
  Fq2 c1 = fq2_add(
      fq2_sub(fq2_sub(fq2_mul(fq2_add(a.c0, a.c1), fq2_add(b.c0, b.c1)), t0),
              t1),
      mul_xi(t2));
  Fq2 c2 = fq2_add(
      fq2_sub(fq2_sub(fq2_mul(fq2_add(a.c0, a.c2), fq2_add(b.c0, b.c2)), t0),
              t2),
      t1);
  return Fq6{c0, c1, c2};
}
static Fq6 fq6_mul_v(const Fq6 &a) {  // * v
  return Fq6{mul_xi(a.c2), a.c0, a.c1};
}
static Fq6 fq6_inv(const Fq6 &a) {
  Fq2 c0 = fq2_sub(fq2_mul(a.c0, a.c0), mul_xi(fq2_mul(a.c1, a.c2)));
  Fq2 c1 = fq2_sub(mul_xi(fq2_mul(a.c2, a.c2)), fq2_mul(a.c0, a.c1));
  Fq2 c2 = fq2_sub(fq2_mul(a.c1, a.c1), fq2_mul(a.c0, a.c2));
  Fq2 t = fq2_add(
      fq2_add(fq2_mul(a.c0, c0), mul_xi(fq2_mul(a.c2, c1))),
      mul_xi(fq2_mul(a.c1, c2)));
  Fq2 tinv = fq2_inv(t);
  return Fq6{fq2_mul(c0, tinv), fq2_mul(c1, tinv), fq2_mul(c2, tinv)};
}

// Fq12 = Fq6[w]/(w^2 - v)
struct Fq12 {
  Fq6 c0, c1;
};
static Fq12 fq12_zero() { return Fq12{fq6_zero(), fq6_zero()}; }
static Fq12 fq12_one() { return Fq12{fq6_one(), fq6_zero()}; }
static Fq12 fq12_add(const Fq12 &a, const Fq12 &b) {
  return Fq12{fq6_add(a.c0, b.c0), fq6_add(a.c1, b.c1)};
}
static Fq12 fq12_sub(const Fq12 &a, const Fq12 &b) {
  return Fq12{fq6_sub(a.c0, b.c0), fq6_sub(a.c1, b.c1)};
}
static Fq12 fq12_neg(const Fq12 &a) { return Fq12{fq6_neg(a.c0), fq6_neg(a.c1)}; }
static Fq12 fq12_mul(const Fq12 &a, const Fq12 &b) {
  Fq6 t0 = fq6_mul(a.c0, b.c0);
  Fq6 t1 = fq6_mul(a.c1, b.c1);
  Fq6 c0 = fq6_add(t0, fq6_mul_v(t1));
  Fq6 c1 = fq6_sub(fq6_sub(fq6_mul(fq6_add(a.c0, a.c1), fq6_add(b.c0, b.c1)), t0), t1);
  return Fq12{c0, c1};
}
static Fq12 fq12_inv(const Fq12 &a) {
  Fq6 t = fq6_sub(fq6_mul(a.c0, a.c0), fq6_mul_v(fq6_mul(a.c1, a.c1)));
  Fq6 tinv = fq6_inv(t);
  return Fq12{fq6_mul(a.c0, tinv), fq6_neg(fq6_mul(a.c1, tinv))};
}
static bool fq12_is_zero(const Fq12 &a) {
  return fq2_is_zero(a.c0.c0) && fq2_is_zero(a.c0.c1) && fq2_is_zero(a.c0.c2) &&
         fq2_is_zero(a.c1.c0) && fq2_is_zero(a.c1.c1) && fq2_is_zero(a.c1.c2);
}
static bool fq12_eq(const Fq12 &a, const Fq12 &b) {
  return fq12_is_zero(fq12_sub(a, b));
}

// embed Fq and Fq2 into Fq12
static Fq12 fq12_from_fq(const U256 &a) {
  Fq12 r = fq12_zero();
  r.c0.c0.c0 = a;
  return r;
}
static Fq12 fq12_from_fq2_w2(const Fq2 &a) {  // a * w^2  (w^2 = v)
  Fq12 r = fq12_zero();
  r.c0.c1 = a;  // v coefficient of c0
  return r;
}
static Fq12 fq12_from_fq2_w3(const Fq2 &a) {  // a * w^3  (w^3 = v w)
  Fq12 r = fq12_zero();
  r.c1.c1 = a;  // v coefficient of c1
  return r;
}

// ---------------------------------------------------------------------------
// curve points: E: y^2 = x^3 + 3 over Fq; G2': y^2 = x^3 + 3/xi over Fq2
// affine with infinity flag
// ---------------------------------------------------------------------------

struct G1 {
  U256 x, y;
  bool inf;
};
struct G2 {
  Fq2 x, y;
  bool inf;
};
struct E12 {  // point on E(Fq12)
  Fq12 x, y;
  bool inf;
};

static G1 g1_zero() { return G1{u256_zero(), u256_zero(), true}; }

static G1 g1_add(const G1 &p, const G1 &q) {
  if (p.inf) return q;
  if (q.inf) return p;
  U256 lam;
  if (p.x == q.x) {
    if (f_add(p.y, q.y, FQ) == u256_zero()) return g1_zero();
    // 3x^2 / 2y
    U256 x2 = mont_mul(p.x, p.x, FQ);
    U256 num = f_add(f_add(x2, x2, FQ), x2, FQ);
    lam = mont_mul(num, f_inv(f_add(p.y, p.y, FQ), FQ), FQ);
  } else {
    lam = mont_mul(f_sub(q.y, p.y, FQ), f_inv(f_sub(q.x, p.x, FQ), FQ), FQ);
  }
  U256 x3 = f_sub(f_sub(mont_mul(lam, lam, FQ), p.x, FQ), q.x, FQ);
  U256 y3 = f_sub(mont_mul(lam, f_sub(p.x, x3, FQ), FQ), p.y, FQ);
  return G1{x3, y3, false};
}

static G1 g1_neg(const G1 &p) {
  if (p.inf) return p;
  return G1{p.x, f_neg(p.y, FQ), false};
}

static G1 g1_mul(const G1 &p, const U256 &k) {
  G1 r = g1_zero(), base = p;
  for (int i = 0; i < 256; i++) {
    if ((k.l[i / 64] >> (i % 64)) & 1) r = g1_add(r, base);
    base = g1_add(base, base);
  }
  return r;
}

static G2 g2_zero() { return G2{fq2_zero(), fq2_zero(), true}; }

static G2 g2_add(const G2 &p, const G2 &q) {
  if (p.inf) return q;
  if (q.inf) return p;
  Fq2 lam;
  if (fq2_is_zero(fq2_sub(p.x, q.x))) {
    if (fq2_is_zero(fq2_add(p.y, q.y))) return g2_zero();
    Fq2 x2 = fq2_mul(p.x, p.x);
    Fq2 num = fq2_add(fq2_add(x2, x2), x2);
    lam = fq2_mul(num, fq2_inv(fq2_add(p.y, p.y)));
  } else {
    lam = fq2_mul(fq2_sub(q.y, p.y), fq2_inv(fq2_sub(q.x, p.x)));
  }
  Fq2 x3 = fq2_sub(fq2_sub(fq2_mul(lam, lam), p.x), q.x);
  Fq2 y3 = fq2_sub(fq2_mul(lam, fq2_sub(p.x, x3)), p.y);
  return G2{x3, y3, false};
}

static G2 g2_mul(const G2 &p, const U256 &k) {
  G2 r = g2_zero(), base = p;
  for (int i = 0; i < 256; i++) {
    if ((k.l[i / 64] >> (i % 64)) & 1) r = g2_add(r, base);
    base = g2_add(base, base);
  }
  return r;
}


// ---------------------------------------------------------------------------
// fast group arithmetic: Jacobian coordinates, fixed-base windows, Pippenger
// (the affine ops above pay one field inversion per add — fine for the
// pairing's Miller loop, catastrophic for 100k-wire CRS/MSM work)
// ---------------------------------------------------------------------------

static G1 G1_GEN;
static G2 G2_GEN;

struct JG1 {
  U256 X, Y, Z;  // Z == 0 => infinity
};
static JG1 jg1_inf() { return JG1{FQ.one_m, FQ.one_m, u256_zero()}; }
static bool jg1_is_inf(const JG1 &p) { return p.Z == u256_zero(); }
static JG1 jg1_from(const G1 &p) {
  if (p.inf) return jg1_inf();
  return JG1{p.x, p.y, FQ.one_m};
}
static G1 jg1_to(const JG1 &p) {
  if (jg1_is_inf(p)) return g1_zero();
  U256 zi = f_inv(p.Z, FQ);
  U256 zi2 = mont_mul(zi, zi, FQ);
  return G1{mont_mul(p.X, zi2, FQ),
            mont_mul(p.Y, mont_mul(zi2, zi, FQ), FQ), false};
}
static JG1 jg1_dbl(const JG1 &p) {
  if (jg1_is_inf(p)) return p;
  U256 A = mont_mul(p.X, p.X, FQ);
  U256 B = mont_mul(p.Y, p.Y, FQ);
  U256 C = mont_mul(B, B, FQ);
  U256 t = f_add(p.X, B, FQ);
  U256 D = f_sub(f_sub(mont_mul(t, t, FQ), A, FQ), C, FQ);
  D = f_add(D, D, FQ);
  U256 E = f_add(f_add(A, A, FQ), A, FQ);
  U256 F = mont_mul(E, E, FQ);
  U256 X3 = f_sub(F, f_add(D, D, FQ), FQ);
  U256 C8 = f_add(C, C, FQ); C8 = f_add(C8, C8, FQ); C8 = f_add(C8, C8, FQ);
  U256 Y3 = f_sub(mont_mul(E, f_sub(D, X3, FQ), FQ), C8, FQ);
  U256 Z3 = mont_mul(f_add(p.Y, p.Y, FQ), p.Z, FQ);
  return JG1{X3, Y3, Z3};
}
static JG1 jg1_add_mixed(const JG1 &p, const G1 &q) {
  if (q.inf) return p;
  if (jg1_is_inf(p)) return jg1_from(q);
  U256 Z1Z1 = mont_mul(p.Z, p.Z, FQ);
  U256 U2 = mont_mul(q.x, Z1Z1, FQ);
  U256 S2 = mont_mul(mont_mul(q.y, p.Z, FQ), Z1Z1, FQ);
  U256 H = f_sub(U2, p.X, FQ);
  U256 rr = f_sub(S2, p.Y, FQ);
  if (H == u256_zero()) {
    if (rr == u256_zero()) return jg1_dbl(p);
    return jg1_inf();
  }
  rr = f_add(rr, rr, FQ);
  U256 HH = mont_mul(H, H, FQ);
  U256 I = f_add(HH, HH, FQ); I = f_add(I, I, FQ);
  U256 J = mont_mul(H, I, FQ);
  U256 V = mont_mul(p.X, I, FQ);
  U256 X3 = f_sub(f_sub(mont_mul(rr, rr, FQ), J, FQ), f_add(V, V, FQ), FQ);
  U256 YJ = mont_mul(p.Y, J, FQ);
  U256 Y3 = f_sub(mont_mul(rr, f_sub(V, X3, FQ), FQ), f_add(YJ, YJ, FQ), FQ);
  U256 t = f_add(p.Z, H, FQ);
  U256 Z3 = f_sub(f_sub(mont_mul(t, t, FQ), Z1Z1, FQ), HH, FQ);
  return JG1{X3, Y3, Z3};
}
static JG1 jg1_add(const JG1 &p, const JG1 &q) {
  if (jg1_is_inf(p)) return q;
  if (jg1_is_inf(q)) return p;
  U256 Z1Z1 = mont_mul(p.Z, p.Z, FQ);
  U256 Z2Z2 = mont_mul(q.Z, q.Z, FQ);
  U256 U1 = mont_mul(p.X, Z2Z2, FQ);
  U256 U2 = mont_mul(q.X, Z1Z1, FQ);
  U256 S1 = mont_mul(mont_mul(p.Y, q.Z, FQ), Z2Z2, FQ);
  U256 S2 = mont_mul(mont_mul(q.Y, p.Z, FQ), Z1Z1, FQ);
  U256 H = f_sub(U2, U1, FQ);
  U256 rr = f_sub(S2, S1, FQ);
  if (H == u256_zero()) {
    if (rr == u256_zero()) return jg1_dbl(p);
    return jg1_inf();
  }
  U256 H2 = f_add(H, H, FQ);
  U256 I = mont_mul(H2, H2, FQ);
  U256 J = mont_mul(H, I, FQ);
  rr = f_add(rr, rr, FQ);
  U256 V = mont_mul(U1, I, FQ);
  U256 X3 = f_sub(f_sub(mont_mul(rr, rr, FQ), J, FQ), f_add(V, V, FQ), FQ);
  U256 SJ = mont_mul(S1, J, FQ);
  U256 Y3 = f_sub(mont_mul(rr, f_sub(V, X3, FQ), FQ), f_add(SJ, SJ, FQ), FQ);
  U256 t = f_add(p.Z, q.Z, FQ);
  U256 Z3 = mont_mul(f_sub(f_sub(mont_mul(t, t, FQ), Z1Z1, FQ), Z2Z2, FQ), H,
                     FQ);
  return JG1{X3, Y3, Z3};
}

// --- G2 Jacobian (same formulas over Fq2)
struct JG2 {
  Fq2 X, Y, Z;
};
static JG2 jg2_inf() { return JG2{fq2_one(), fq2_one(), fq2_zero()}; }
static bool jg2_is_inf(const JG2 &p) { return fq2_is_zero(p.Z); }
static JG2 jg2_from(const G2 &p) {
  if (p.inf) return jg2_inf();
  return JG2{p.x, p.y, fq2_one()};
}
static G2 jg2_to(const JG2 &p) {
  if (jg2_is_inf(p)) return g2_zero();
  Fq2 zi = fq2_inv(p.Z);
  Fq2 zi2 = fq2_mul(zi, zi);
  return G2{fq2_mul(p.X, zi2), fq2_mul(p.Y, fq2_mul(zi2, zi)), false};
}
static JG2 jg2_dbl(const JG2 &p) {
  if (jg2_is_inf(p)) return p;
  Fq2 A = fq2_mul(p.X, p.X);
  Fq2 B = fq2_mul(p.Y, p.Y);
  Fq2 C = fq2_mul(B, B);
  Fq2 t = fq2_add(p.X, B);
  Fq2 D = fq2_sub(fq2_sub(fq2_mul(t, t), A), C);
  D = fq2_add(D, D);
  Fq2 E = fq2_add(fq2_add(A, A), A);
  Fq2 F = fq2_mul(E, E);
  Fq2 X3 = fq2_sub(F, fq2_add(D, D));
  Fq2 C8 = fq2_add(C, C); C8 = fq2_add(C8, C8); C8 = fq2_add(C8, C8);
  Fq2 Y3 = fq2_sub(fq2_mul(E, fq2_sub(D, X3)), C8);
  Fq2 Z3 = fq2_mul(fq2_add(p.Y, p.Y), p.Z);
  return JG2{X3, Y3, Z3};
}
static JG2 jg2_add_mixed(const JG2 &p, const G2 &q) {
  if (q.inf) return p;
  if (jg2_is_inf(p)) return jg2_from(q);
  Fq2 Z1Z1 = fq2_mul(p.Z, p.Z);
  Fq2 U2 = fq2_mul(q.x, Z1Z1);
  Fq2 S2 = fq2_mul(fq2_mul(q.y, p.Z), Z1Z1);
  Fq2 H = fq2_sub(U2, p.X);
  Fq2 rr = fq2_sub(S2, p.Y);
  if (fq2_is_zero(H)) {
    if (fq2_is_zero(rr)) return jg2_dbl(p);
    return jg2_inf();
  }
  rr = fq2_add(rr, rr);
  Fq2 HH = fq2_mul(H, H);
  Fq2 I = fq2_add(HH, HH); I = fq2_add(I, I);
  Fq2 J = fq2_mul(H, I);
  Fq2 V = fq2_mul(p.X, I);
  Fq2 X3 = fq2_sub(fq2_sub(fq2_mul(rr, rr), J), fq2_add(V, V));
  Fq2 YJ = fq2_mul(p.Y, J);
  Fq2 Y3 = fq2_sub(fq2_mul(rr, fq2_sub(V, X3)), fq2_add(YJ, YJ));
  Fq2 t = fq2_add(p.Z, H);
  Fq2 Z3 = fq2_sub(fq2_sub(fq2_mul(t, t), Z1Z1), HH);
  return JG2{X3, Y3, Z3};
}
static JG2 jg2_add(const JG2 &p, const JG2 &q) {
  if (jg2_is_inf(p)) return q;
  if (jg2_is_inf(q)) return p;
  Fq2 Z1Z1 = fq2_mul(p.Z, p.Z);
  Fq2 Z2Z2 = fq2_mul(q.Z, q.Z);
  Fq2 U1 = fq2_mul(p.X, Z2Z2);
  Fq2 U2 = fq2_mul(q.X, Z1Z1);
  Fq2 S1 = fq2_mul(fq2_mul(p.Y, q.Z), Z2Z2);
  Fq2 S2 = fq2_mul(fq2_mul(q.Y, p.Z), Z1Z1);
  Fq2 H = fq2_sub(U2, U1);
  Fq2 rr = fq2_sub(S2, S1);
  if (fq2_is_zero(H)) {
    if (fq2_is_zero(rr)) return jg2_dbl(p);
    return jg2_inf();
  }
  Fq2 H2 = fq2_add(H, H);
  Fq2 I = fq2_mul(H2, H2);
  Fq2 J = fq2_mul(H, I);
  rr = fq2_add(rr, rr);
  Fq2 V = fq2_mul(U1, I);
  Fq2 X3 = fq2_sub(fq2_sub(fq2_mul(rr, rr), J), fq2_add(V, V));
  Fq2 SJ = fq2_mul(S1, J);
  Fq2 Y3 = fq2_sub(fq2_mul(rr, fq2_sub(V, X3)), fq2_add(SJ, SJ));
  Fq2 t = fq2_add(p.Z, q.Z);
  Fq2 Z3 = fq2_mul(fq2_sub(fq2_sub(fq2_mul(t, t), Z1Z1), Z2Z2), H);
  return JG2{X3, Y3, Z3};
}

// --- fixed-base 4-bit windowed tables for the generators (CRS generation)
static std::vector<G1> FB1_TAB;  // 64 windows x 15 entries
static std::vector<G2> FB2_TAB;
static void fb_build() {
  if (!FB1_TAB.empty()) return;
  FB1_TAB.resize(64 * 15);
  FB2_TAB.resize(64 * 15);
  G1 c1 = G1_GEN;
  G2 c2 = G2_GEN;
  for (int w = 0; w < 64; w++) {
    G1 a1 = c1;
    G2 a2 = c2;
    for (int k = 1; k <= 15; k++) {
      FB1_TAB[w * 15 + (k - 1)] = a1;
      FB2_TAB[w * 15 + (k - 1)] = a2;
      if (k < 15) {
        a1 = g1_add(a1, c1);
        a2 = g2_add(a2, c2);
      }
    }
    c1 = g1_add(a1, c1);  // 16 * c1
    c2 = g2_add(a2, c2);
  }
}
static G1 g1_mul_gen(const U256 &k) {  // k canonical
  JG1 acc = jg1_inf();
  for (int w = 0; w < 64; w++) {
    int nib = (int)((k.l[w / 16] >> ((w % 16) * 4)) & 0xF);
    if (nib) acc = jg1_add_mixed(acc, FB1_TAB[w * 15 + (nib - 1)]);
  }
  return jg1_to(acc);
}
static G2 g2_mul_gen(const U256 &k) {
  JG2 acc = jg2_inf();
  for (int w = 0; w < 64; w++) {
    int nib = (int)((k.l[w / 16] >> ((w % 16) * 4)) & 0xF);
    if (nib) acc = jg2_add_mixed(acc, FB2_TAB[w * 15 + (nib - 1)]);
  }
  return jg2_to(acc);
}

// --- Pippenger multi-scalar multiplication (scalars canonical).
// Windows are independent (total = sum_w 2^{wc} S_w), so the bucket
// accumulation parallelizes across threads; the serial recombination is
// nwin*c doublings — negligible.  Deterministic: per-window partials are
// combined in a fixed order regardless of scheduling.
static G1 g1_msm(const std::vector<G1> &pts, const std::vector<U256> &scal) {
  size_t n = pts.size();
  if (n == 0) return g1_zero();
  int c = 3;
  while ((1u << (c + 3)) < n && c < 16) c++;
  int nwin = (256 + c - 1) / c;
  std::vector<JG1> partial(nwin);

  auto window_sum = [&](int w) {
    std::vector<JG1> buckets((size_t)1 << c, jg1_inf());
    int lo = w * c;
    for (size_t i = 0; i < n; i++) {
      if (pts[i].inf) continue;
      // extract c bits starting at lo
      u64 idx = 0;
      for (int b = 0; b < c; b++) {
        int bit = lo + b;
        if (bit < 256 && ((scal[i].l[bit / 64] >> (bit % 64)) & 1))
          idx |= (u64)1 << b;
      }
      if (idx) buckets[idx] = jg1_add_mixed(buckets[idx], pts[i]);
    }
    JG1 running = jg1_inf(), acc = jg1_inf();
    for (size_t b = buckets.size() - 1; b >= 1; b--) {
      running = jg1_add(running, buckets[b]);
      acc = jg1_add(acc, running);
    }
    partial[w] = acc;
  };

  unsigned nthreads = std::thread::hardware_concurrency();
  if (nthreads > (unsigned)nwin) nthreads = (unsigned)nwin;
  if (nthreads > 1 && n >= 64) {
    std::vector<std::thread> ts;
    std::atomic<int> next(0);
    for (unsigned t = 0; t < nthreads; t++)
      ts.emplace_back([&] {
        for (int w; (w = next.fetch_add(1)) < nwin;) window_sum(w);
      });
    for (auto &t : ts) t.join();
  } else {
    for (int w = 0; w < nwin; w++) window_sum(w);
  }

  JG1 total = jg1_inf();
  for (int w = nwin - 1; w >= 0; w--) {
    if (!jg1_is_inf(total))
      for (int i = 0; i < c; i++) total = jg1_dbl(total);
    total = jg1_add(total, partial[w]);
  }
  return jg1_to(total);
}
static G2 g2_msm(const std::vector<G2> &pts, const std::vector<U256> &scal) {
  size_t n = pts.size();
  if (n == 0) return g2_zero();
  int c = 3;
  while ((1u << (c + 3)) < n && c < 16) c++;
  int nwin = (256 + c - 1) / c;
  std::vector<JG2> partial(nwin);

  auto window_sum = [&](int w) {
    std::vector<JG2> buckets((size_t)1 << c, jg2_inf());
    int lo = w * c;
    for (size_t i = 0; i < n; i++) {
      if (pts[i].inf) continue;
      u64 idx = 0;
      for (int b = 0; b < c; b++) {
        int bit = lo + b;
        if (bit < 256 && ((scal[i].l[bit / 64] >> (bit % 64)) & 1))
          idx |= (u64)1 << b;
      }
      if (idx) buckets[idx] = jg2_add_mixed(buckets[idx], pts[i]);
    }
    JG2 running = jg2_inf(), acc = jg2_inf();
    for (size_t b = buckets.size() - 1; b >= 1; b--) {
      running = jg2_add(running, buckets[b]);
      acc = jg2_add(acc, running);
    }
    partial[w] = acc;
  };

  unsigned nthreads = std::thread::hardware_concurrency();
  if (nthreads > (unsigned)nwin) nthreads = (unsigned)nwin;
  if (nthreads > 1 && n >= 64) {
    std::vector<std::thread> ts;
    std::atomic<int> next(0);
    for (unsigned t = 0; t < nthreads; t++)
      ts.emplace_back([&] {
        for (int w; (w = next.fetch_add(1)) < nwin;) window_sum(w);
      });
    for (auto &t : ts) t.join();
  } else {
    for (int w = 0; w < nwin; w++) window_sum(w);
  }

  JG2 total = jg2_inf();
  for (int w = nwin - 1; w >= 0; w--) {
    if (!jg2_is_inf(total))
      for (int i = 0; i < c; i++) total = jg2_dbl(total);
    total = jg2_add(total, partial[w]);
  }
  return jg2_to(total);
}

// twist embedding G2' -> E(Fq12): (x, y) -> (x w^2, y w^3)
static E12 psi(const G2 &q) {
  if (q.inf) return E12{fq12_zero(), fq12_zero(), true};
  return E12{fq12_from_fq2_w2(q.x), fq12_from_fq2_w3(q.y), false};
}

// ---------------------------------------------------------------------------
// Tate pairing: Miller loop over r with P in G1 (embedded), eval at Q12
// ---------------------------------------------------------------------------

struct LineEval {
  Fq12 val;  // line function evaluated at Q
};

// line through A, B (or tangent if A==B) evaluated at point T=(xq, yq) in Fq12
static Fq12 line_eval(const E12 &a, const E12 &b, const Fq12 &xq, const Fq12 &yq) {
  if (a.inf || b.inf) {
    // vertical through the finite one: x - x0
    const E12 &f = a.inf ? b : a;
    if (f.inf) return fq12_one();
    return fq12_sub(xq, f.x);
  }
  if (fq12_eq(a.x, b.x) && !fq12_eq(a.y, b.y)) {
    return fq12_sub(xq, a.x);  // vertical
  }
  Fq12 lam;
  if (fq12_eq(a.x, b.x)) {
    Fq12 x2 = fq12_mul(a.x, a.x);
    Fq12 num = fq12_add(fq12_add(x2, x2), x2);
    lam = fq12_mul(num, fq12_inv(fq12_add(a.y, a.y)));
  } else {
    lam = fq12_mul(fq12_sub(b.y, a.y), fq12_inv(fq12_sub(b.x, a.x)));
  }
  // l(x,y) = (y - y_a) - lam (x - x_a)
  return fq12_sub(fq12_sub(yq, a.y), fq12_mul(lam, fq12_sub(xq, a.x)));
}

static E12 e12_add(const E12 &p, const E12 &q) {
  if (p.inf) return q;
  if (q.inf) return p;
  Fq12 lam;
  if (fq12_eq(p.x, q.x)) {
    if (fq12_is_zero(fq12_add(p.y, q.y)))
      return E12{fq12_zero(), fq12_zero(), true};
    Fq12 x2 = fq12_mul(p.x, p.x);
    Fq12 num = fq12_add(fq12_add(x2, x2), x2);
    lam = fq12_mul(num, fq12_inv(fq12_add(p.y, p.y)));
  } else {
    lam = fq12_mul(fq12_sub(q.y, p.y), fq12_inv(fq12_sub(q.x, p.x)));
  }
  Fq12 x3 = fq12_sub(fq12_sub(fq12_mul(lam, lam), p.x), q.x);
  Fq12 y3 = fq12_sub(fq12_mul(lam, fq12_sub(p.x, x3)), p.y);
  return E12{x3, y3, false};
}

// big exponent for the final exponentiation: (q^12 - 1) / r, little-endian u64s
static std::vector<u64> FINAL_EXP;

static std::vector<u64> big_from(const U256 &a) {
  return {a.l[0], a.l[1], a.l[2], a.l[3]};
}

static void big_trim(std::vector<u64> &a) {
  while (a.size() > 1 && a.back() == 0) a.pop_back();
}

static std::vector<u64> big_mul(const std::vector<u64> &a,
                                const std::vector<u64> &b) {
  std::vector<u64> r(a.size() + b.size(), 0);
  for (size_t i = 0; i < a.size(); i++) {
    u128 c = 0;
    for (size_t j = 0; j < b.size(); j++) {
      u128 s = (u128)r[i + j] + (u128)a[i] * b[j] + (u64)c;
      r[i + j] = (u64)s;
      c = s >> 64;
    }
    size_t k = i + b.size();
    while (c) {
      u128 s = (u128)r[k] + (u64)c;
      r[k] = (u64)s;
      c = s >> 64;
      k++;
    }
  }
  big_trim(r);
  return r;
}

static void big_sub_inplace(std::vector<u64> &a, const std::vector<u64> &b) {
  u64 br = 0;
  for (size_t i = 0; i < a.size(); i++) {
    u128 d = (u128)a[i] - (i < b.size() ? b[i] : 0) - br;
    a[i] = (u64)d;
    br = (d >> 64) ? 1 : 0;
  }
  big_trim(a);
}

static int big_cmp(const std::vector<u64> &a, const std::vector<u64> &b) {
  size_t n = a.size() > b.size() ? a.size() : b.size();
  for (size_t i = n; i-- > 0;) {
    u64 av = i < a.size() ? a[i] : 0, bv = i < b.size() ? b[i] : 0;
    if (av != bv) return av > bv ? 1 : -1;
  }
  return 0;
}

// a / b via binary long division (b fits whatever size)
static std::vector<u64> big_div(std::vector<u64> a, const std::vector<u64> &b) {
  std::vector<u64> q((a.size() ? a.size() : 1), 0);
  int bits = (int)a.size() * 64;
  std::vector<u64> rem(1, 0);
  for (int i = bits - 1; i >= 0; i--) {
    // rem = rem*2 + bit
    u64 carry = 0;
    for (size_t j = 0; j < rem.size(); j++) {
      u64 nc = rem[j] >> 63;
      rem[j] = (rem[j] << 1) | carry;
      carry = nc;
    }
    if (carry) rem.push_back(1);
    if ((a[i / 64] >> (i % 64)) & 1) rem[0] |= 1;
    if (big_cmp(rem, b) >= 0) {
      big_sub_inplace(rem, b);
      q[i / 64] |= (1ULL << (i % 64));
    }
  }
  big_trim(q);
  return q;
}

static Fq12 fq12_pow_big(const Fq12 &a, const std::vector<u64> &e) {
  Fq12 r = fq12_one(), base = a;
  for (size_t i = 0; i < e.size() * 64; i++) {
    if ((e[i / 64] >> (i % 64)) & 1) r = fq12_mul(r, base);
    base = fq12_mul(base, base);
  }
  return r;
}

static Fq12 pairing(const G1 &p, const G2 &q) {
  if (p.inf || q.inf) return fq12_one();
  E12 qe = psi(q);
  E12 pe{fq12_from_fq(p.x), fq12_from_fq(p.y), false};
  Fq12 f = fq12_one();
  E12 t = pe;
  // bits of r, high to low, SKIPPING the leading one (T = P covers it);
  // r has 254 bits, so start below bit 253
  for (int i = 252; i >= 0; i--) {
    f = fq12_mul(fq12_mul(f, f), line_eval(t, t, qe.x, qe.y));
    E12 t2 = e12_add(t, t);
    if (!t2.inf) {
      // divide by vertical at 2T
      f = fq12_mul(f, fq12_inv(fq12_sub(qe.x, t2.x)));
    }
    t = t2;
    if ((R_MOD.l[i / 64] >> (i % 64)) & 1) {
      f = fq12_mul(f, line_eval(t, pe, qe.x, qe.y));
      E12 tn = e12_add(t, pe);
      if (!tn.inf) {
        f = fq12_mul(f, fq12_inv(fq12_sub(qe.x, tn.x)));
      }
      t = tn;
    }
  }
  // t should now be infinity (r * P = O)
  return fq12_pow_big(f, FINAL_EXP);
}

// ---------------------------------------------------------------------------
// Fr FFT (2-adicity 28, generator 5)
// ---------------------------------------------------------------------------

static U256 fr_from_u64(u64 v) {
  U256 a{{v, 0, 0, 0}};
  return to_mont(a, FR);
}

static U256 fr_root_of_unity(int log_n) {
  // 5^((r-1)/2^log_n)
  U256 five = fr_from_u64(5);
  U256 e = R_MOD;
  u64 br;
  U256 one{{1, 0, 0, 0}};
  e = sub_nored(e, one, &br);
  // e >>= log_n
  for (int s = 0; s < log_n; s++) {
    for (int i = 0; i < 4; i++) {
      e.l[i] >>= 1;
      if (i < 3) e.l[i] |= (e.l[i + 1] & 1) << 63;
    }
  }
  return f_pow(five, e, FR);
}

static void fr_fft(std::vector<U256> &a, bool inverse) {
  size_t n = a.size();
  int log_n = 0;
  while ((size_t(1) << log_n) < n) log_n++;
  // bit reverse
  for (size_t i = 0; i < n; i++) {
    size_t j = 0;
    for (int b = 0; b < log_n; b++) j |= ((i >> b) & 1) << (log_n - 1 - b);
    if (j > i) std::swap(a[i], a[j]);
  }
  for (int s = 1; s <= log_n; s++) {
    size_t m = size_t(1) << s;
    U256 wm = fr_root_of_unity(s);
    if (inverse) wm = f_inv(wm, FR);
    for (size_t k = 0; k < n; k += m) {
      U256 w = FR.one_m;
      for (size_t j = 0; j < m / 2; j++) {
        U256 t = mont_mul(w, a[k + j + m / 2], FR);
        U256 u = a[k + j];
        a[k + j] = f_add(u, t, FR);
        a[k + j + m / 2] = f_sub(u, t, FR);
        w = mont_mul(w, wm, FR);
      }
    }
  }
  if (inverse) {
    U256 ninv = f_inv(fr_from_u64((u64)n), FR);
    for (auto &x : a) x = mont_mul(x, ninv, FR);
  }
}

// ---------------------------------------------------------------------------
// Groth16 over the squaring-chain binding R1CS
// ---------------------------------------------------------------------------
//
// Witness layout: w = (1, p_0..p_{n-1}, c, x_1..x_{n-1})   [x_n == c]
// Constraints (m = n): for i in 0..n-1:  x_i * x_i = x_{i+1} - p_i
//   i.e. A row: {x_i}, B row: {x_i}, C row: {x_{i+1}, -?}  ... rearranged:
//   x_i * x_i + p_i = x_{i+1}  ->  A={x_i}, B={x_i}, C={x_{i+1} - p_i}
//   with x_0 = 1 (the constant wire) and x_n = c (public).

struct SparseTerm {
  int wire;
  U256 coeff;  // Montgomery Fr
};
typedef std::vector<SparseTerm> Row;

// Zero-copy CSR view over caller-owned arrays (raw, non-Montgomery
// coefficients): the 100M-row production verifier statement cannot afford
// the vector<Row> copy, so setup/prove consume this view directly and
// convert coefficients to Montgomery on the fly (one extra mont_mul per
// term use).
struct CSRView {
  const long long *ptr = nullptr;
  const int *wire = nullptr;
  const u64 *coef = nullptr;
};

struct R1CS {
  int num_wires;   // including constant wire 0
  int num_public;  // wires 1..num_public are public
  std::vector<Row> A, B, C;
  CSRView csrA, csrB, csrC;
  long long csr_rows = -1;  // >= 0 => CSR mode (A/B/C vectors unused)

  long long rows() const {
    return csr_rows >= 0 ? csr_rows : (long long)A.size();
  }
  bool csr() const { return csr_rows >= 0; }
  // visit matrix m (0=A,1=B,2=C) row i: f(wire, coeff_montgomery)
  template <typename F>
  void for_terms(int m, long long i, F f) const {
    if (csr()) {
      const CSRView &v = m == 0 ? csrA : (m == 1 ? csrB : csrC);
      for (long long j = v.ptr[i]; j < v.ptr[i + 1]; j++) {
        U256 c{{v.coef[4 * j], v.coef[4 * j + 1], v.coef[4 * j + 2],
                v.coef[4 * j + 3]}};
        f(v.wire[j], to_mont(c, FR));
      }
    } else {
      const std::vector<Row> &mm = m == 0 ? A : (m == 1 ? B : C);
      for (const auto &t : mm[i]) f(t.wire, t.coeff);
    }
  }
  U256 eval(int m, long long i, const std::vector<U256> &w) const {
    U256 acc = u256_zero();
    for_terms(m, i, [&](int wi, const U256 &c) {
      acc = f_add(acc, mont_mul(c, w[wi], FR), FR);
    });
    return acc;
  }
};

static R1CS binding_r1cs(int n) {
  R1CS r;
  r.num_public = n + 1;              // p_0..p_{n-1}, c
  r.num_wires = 1 + (n + 1) + (n - 1);  // 1, publics, x_1..x_{n-1}
  U256 one = FR.one_m;
  U256 negone = f_neg(one, FR);
  auto xwire = [&](int i) {  // wire index of x_i
    if (i == 0) return 0;          // constant 1
    if (i == n) return 1 + n;      // c (last public)
    return 1 + (n + 1) + (i - 1);  // aux
  };
  for (int i = 0; i < n; i++) {
    r.A.push_back({{xwire(i), one}});
    r.B.push_back({{xwire(i), one}});
    r.C.push_back({{xwire(i + 1), one}, {1 + i, negone}});  // x_{i+1} - p_i
  }
  return r;
}

struct ProvingKey {
  G1 alpha1, beta1, delta1;
  G2 beta2, gamma2, delta2;
  std::vector<G1> a_query;   // [A_i(tau)]1
  std::vector<G1> b1_query;  // [B_i(tau)]1
  std::vector<G2> b2_query;  // [B_i(tau)]2
  std::vector<G1> l_query;   // [(beta A_i + alpha B_i + C_i)/delta]1, aux only
  std::vector<G1> h_query;   // [tau^i t(tau)/delta]1
  int num_public, num_wires, domain;
};
struct VerifyingKey {
  G1 alpha1;
  G2 beta2, gamma2, delta2;
  std::vector<G1> ic;  // [(beta A_i + alpha B_i + C_i)/gamma]1, wires 0..pub
};

// deterministic toy entropy (dev-grade CRS)
static U256 fr_rand(u64 *seed) {
  U256 a;
  for (int i = 0; i < 4; i++) {
    *seed = *seed * 6364136223846793005ULL + 1442695040888963407ULL;
    a.l[i] = *seed;
  }
  a.l[3] &= 0x0FFFFFFFFFFFFFFFULL;  // < r
  return to_mont(a, FR);
}

static U256 eval_row(const Row &row, const std::vector<U256> &w) {
  U256 acc = u256_zero();
  for (auto &t : row) acc = f_add(acc, mont_mul(t.coeff, w[t.wire], FR), FR);
  return acc;
}

static void setup(const R1CS &r, u64 seed, ProvingKey &pk, VerifyingKey &vk) {
  int m = 1;
  while (m < r.rows()) m <<= 1;
  u64 s = seed;
  U256 alpha = fr_rand(&s), beta = fr_rand(&s), gamma = fr_rand(&s),
       delta = fr_rand(&s), tau = fr_rand(&s);

  // Lagrange basis at tau over the size-m domain:
  // L_j(tau) = (tau^m - 1) * w^j / (m * (tau - w^j))
  U256 taum = FR.one_m;
  {
    U256 e{{(u64)m, 0, 0, 0}};
    U256 base = tau;
    u64 mm = m;
    U256 acc = FR.one_m;
    while (mm) {
      if (mm & 1) acc = mont_mul(acc, base, FR);
      base = mont_mul(base, base, FR);
      mm >>= 1;
    }
    taum = acc;
  }
  U256 zt = f_sub(taum, FR.one_m, FR);  // t(tau) = tau^m - 1
  int log_m = 0;
  while ((1 << log_m) < m) log_m++;
  U256 wgen = fr_root_of_unity(log_m);
  U256 minv = f_inv(fr_from_u64((u64)m), FR);
  // L_j(tau) for all j: chunked + threaded, with Montgomery batch
  // inversion per chunk (one f_inv per 4096 denominators)
  std::vector<U256> lag(m);
  {
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    std::atomic<int> next(0);
    const int CHUNK = 4096;
    auto worker = [&] {
      std::vector<U256> den(CHUNK), pre(CHUNK);
      for (int base; (base = next.fetch_add(CHUNK)) < m;) {
        int end = base + CHUNK < m ? base + CHUNK : m;
        int len = end - base;
        U256 e{{(u64)base, 0, 0, 0}};
        U256 wj = f_pow(wgen, e, FR);
        for (int i = 0; i < len; i++) {
          den[i] = f_sub(tau, wj, FR);
          lag[base + i] = wj;  // stash w^j
          wj = mont_mul(wj, wgen, FR);
        }
        // batch invert den[0..len)
        U256 acc = FR.one_m;
        for (int i = 0; i < len; i++) {
          pre[i] = acc;
          acc = mont_mul(acc, den[i], FR);
        }
        U256 inv = f_inv(acc, FR);
        for (int i = len - 1; i >= 0; i--) {
          U256 di = mont_mul(inv, pre[i], FR);
          inv = mont_mul(inv, den[i], FR);
          U256 num = mont_mul(zt, lag[base + i], FR);
          lag[base + i] = mont_mul(mont_mul(num, di, FR), minv, FR);
        }
      }
    };
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nthreads; t++) ts.emplace_back(worker);
    for (auto &t : ts) t.join();
  }

  int nw = r.num_wires;
  std::vector<U256> At(nw, u256_zero()), Bt(nw, u256_zero()),
      Ct(nw, u256_zero());
  for (long long j = 0; j < r.rows(); j++) {
    r.for_terms(0, j, [&](int wi, const U256 &c) {
      At[wi] = f_add(At[wi], mont_mul(c, lag[j], FR), FR);
    });
    r.for_terms(1, j, [&](int wi, const U256 &c) {
      Bt[wi] = f_add(Bt[wi], mont_mul(c, lag[j], FR), FR);
    });
    r.for_terms(2, j, [&](int wi, const U256 &c) {
      Ct[wi] = f_add(Ct[wi], mont_mul(c, lag[j], FR), FR);
    });
  }
  // lag is only consumed by the accumulation above: release its 32B*m
  // (4.3 GB at the 2^27 production domain) before the CRS point tables
  // are allocated — the production run OOMed at 119 GB without the
  // progressive frees in setup/prove.
  std::vector<U256>().swap(lag);

  U256 ginv = f_inv(gamma, FR), dinv = f_inv(delta, FR);
  fb_build();
  pk.alpha1 = g1_mul_gen(from_mont(alpha, FR));
  pk.beta1 = g1_mul_gen(from_mont(beta, FR));
  pk.delta1 = g1_mul_gen(from_mont(delta, FR));
  pk.beta2 = g2_mul_gen(from_mont(beta, FR));
  pk.gamma2 = g2_mul_gen(from_mont(gamma, FR));
  pk.delta2 = g2_mul_gen(from_mont(delta, FR));
  pk.num_public = r.num_public;
  pk.num_wires = nw;
  pk.domain = m;
  vk.alpha1 = pk.alpha1;
  vk.beta2 = pk.beta2;
  vk.gamma2 = pk.gamma2;
  vk.delta2 = pk.delta2;

  // per-wire CRS points: independent fixed-base muls — parallelize in
  // fixed-size chunks (deterministic layout; threads write disjoint slots)
  pk.a_query.resize(nw);
  pk.b1_query.resize(nw);
  pk.b2_query.resize(nw);
  int n_pub = r.num_public + 1;
  vk.ic.resize(n_pub);
  pk.l_query.resize(nw - n_pub);
  {
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    std::atomic<int> next(0);
    const int CHUNK = 1024;
    auto worker = [&] {
      for (int base; (base = next.fetch_add(CHUNK)) < nw;) {
        int end = base + CHUNK < nw ? base + CHUNK : nw;
        for (int i = base; i < end; i++) {
          pk.a_query[i] = g1_mul_gen(from_mont(At[i], FR));
          pk.b1_query[i] = g1_mul_gen(from_mont(Bt[i], FR));
          pk.b2_query[i] = g2_mul_gen(from_mont(Bt[i], FR));
          U256 k = f_add(
              f_add(mont_mul(beta, At[i], FR), mont_mul(alpha, Bt[i], FR), FR),
              Ct[i], FR);
          if (i < n_pub) {
            vk.ic[i] = g1_mul_gen(from_mont(mont_mul(k, ginv, FR), FR));
          } else {
            pk.l_query[i - n_pub] =
                g1_mul_gen(from_mont(mont_mul(k, dinv, FR), FR));
          }
        }
      }
    };
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nthreads; t++) ts.emplace_back(worker);
    for (auto &t : ts) t.join();
  }
  // At/Bt/Ct (3 * 32B * n_wires = 9.8 GB at production) are consumed by
  // the per-wire loop above — free before the h_query table
  std::vector<U256>().swap(At);
  std::vector<U256>().swap(Bt);
  std::vector<U256>().swap(Ct);
  // h_query: [tau^i t(tau)/delta]1 for i < m-1 — tau^i per chunk via one
  // f_pow at the chunk base, then sequential multiplies inside the chunk
  pk.h_query.resize(m);
  {
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    std::atomic<int> next(0);
    const int CHUNK = 1024;
    auto worker = [&] {
      for (int base; (base = next.fetch_add(CHUNK)) < m;) {
        int end = base + CHUNK < m ? base + CHUNK : m;
        U256 e{{(u64)base, 0, 0, 0}};
        U256 pow = f_pow(tau, e, FR);
        for (int i = base; i < end; i++) {
          U256 k = mont_mul(mont_mul(pow, zt, FR), dinv, FR);
          pk.h_query[i] = g1_mul_gen(from_mont(k, FR));
          pow = mont_mul(pow, tau, FR);
        }
      }
    };
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nthreads; t++) ts.emplace_back(worker);
    for (auto &t : ts) t.join();
  }
}

struct Groth16Proof {
  G1 a, c;
  G2 b;
};

static Groth16Proof prove(const R1CS &r, ProvingKey &pk,
                          const std::vector<U256> &w, u64 seed) {
  // pk is consumed progressively: each query table is freed right after
  // its one MSM (the tables total ~42 GB at the production shape).
  int m = pk.domain;
  u64 s = seed ^ 0x9e3779b97f4a7c15ULL;
  U256 rr = fr_rand(&s), ss = fr_rand(&s);

  // H(x) = (A(x) B(x) - C(x)) / t(x) via coset FFT
  std::vector<U256> av(m, u256_zero()), bv(m, u256_zero()), cv(m, u256_zero());
  {
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    std::atomic<long long> next(0);
    const long long CHUNK = 8192;
    long long nrows = r.rows();
    auto worker = [&] {
      for (long long base; (base = next.fetch_add(CHUNK)) < nrows;) {
        long long end = base + CHUNK < nrows ? base + CHUNK : nrows;
        for (long long j = base; j < end; j++) {
          av[j] = r.eval(0, j, w);
          bv[j] = r.eval(1, j, w);
          cv[j] = r.eval(2, j, w);
        }
      }
    };
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nthreads; t++) ts.emplace_back(worker);
    for (auto &t : ts) t.join();
  }
  fr_fft(av, true);  // -> coefficients
  fr_fft(bv, true);
  fr_fft(cv, true);
  // evaluate on coset g*H, g = multiplicative generator 5
  U256 g = fr_from_u64(5);
  U256 gp = FR.one_m;
  for (int i = 0; i < m; i++) {
    av[i] = mont_mul(av[i], gp, FR);
    bv[i] = mont_mul(bv[i], gp, FR);
    cv[i] = mont_mul(cv[i], gp, FR);
    gp = mont_mul(gp, g, FR);
  }
  fr_fft(av, false);
  fr_fft(bv, false);
  fr_fft(cv, false);
  // t on coset: g^m - 1 (constant)
  U256 gm = FR.one_m;
  {
    u64 mm = m;
    U256 base = g;
    while (mm) {
      if (mm & 1) gm = mont_mul(gm, base, FR);
      base = mont_mul(base, base, FR);
      mm >>= 1;
    }
  }
  U256 tinv = f_inv(f_sub(gm, FR.one_m, FR), FR);
  std::vector<U256> hv(m);
  for (int i = 0; i < m; i++) {
    hv[i] = mont_mul(f_sub(mont_mul(av[i], bv[i], FR), cv[i], FR), tinv, FR);
  }
  // av/bv/cv (3 * 4.3 GB at m = 2^27) end their life here
  std::vector<U256>().swap(av);
  std::vector<U256>().swap(bv);
  std::vector<U256>().swap(cv);
  fr_fft(hv, true);
  // un-coset: divide coefficient i by g^i
  U256 gi = FR.one_m;
  U256 ginv_c = f_inv(g, FR);
  for (int i = 0; i < m; i++) {
    hv[i] = mont_mul(hv[i], gi, FR);
    gi = mont_mul(gi, ginv_c, FR);
  }

  // canonical witness scalars once
  std::vector<U256> wc(pk.num_wires);
  for (int i = 0; i < pk.num_wires; i++) wc[i] = from_mont(w[i], FR);
  // A = alpha + sum w_i A_i(tau) + r delta
  G1 A = g1_add(pk.alpha1, g1_msm(pk.a_query, wc));
  A = g1_add(A, g1_mul(pk.delta1, from_mont(rr, FR)));
  std::vector<G1>().swap(pk.a_query);
  // B2 = beta + sum w_i B_i(tau) + s delta ; B1 likewise in G1
  G2 B = g2_add(pk.beta2, g2_msm(pk.b2_query, wc));
  B = g2_add(B, g2_mul(pk.delta2, from_mont(ss, FR)));
  std::vector<G2>().swap(pk.b2_query);
  G1 B1 = g1_add(pk.beta1, g1_msm(pk.b1_query, wc));
  B1 = g1_add(B1, g1_mul(pk.delta1, from_mont(ss, FR)));
  std::vector<G1>().swap(pk.b1_query);
  // C = sum_aux w_i L_i + sum h_i H_i + s A + r B1 - r s delta
  std::vector<U256> waux(wc.begin() + pk.num_public + 1, wc.end());
  std::vector<U256>().swap(wc);
  G1 C = g1_msm(pk.l_query, waux);
  std::vector<G1>().swap(pk.l_query);
  std::vector<U256>().swap(waux);
  // reuse hv as the canonical-scalar buffer instead of a second 4.3 GB
  // copy (hc in the original)
  for (int i = 0; i < m; i++) hv[i] = from_mont(hv[i], FR);
  C = g1_add(C, g1_msm(pk.h_query, hv));
  std::vector<G1>().swap(pk.h_query);
  std::vector<U256>().swap(hv);
  C = g1_add(C, g1_mul(A, from_mont(ss, FR)));
  C = g1_add(C, g1_mul(B1, from_mont(rr, FR)));
  C = g1_add(C, g1_neg(g1_mul(pk.delta1, from_mont(mont_mul(rr, ss, FR), FR))));
  return Groth16Proof{A, C, B};
}

static bool verify(const VerifyingKey &vk, const Groth16Proof &pf,
                   const std::vector<U256> &pub) {  // pub WITHOUT the 1 wire
  G1 ic = vk.ic[0];
  for (size_t i = 0; i < pub.size(); i++)
    ic = g1_add(ic, g1_mul(vk.ic[i + 1], from_mont(pub[i], FR)));
  // e(A, B) == e(alpha, beta) e(ic, gamma) e(C, delta)
  Fq12 lhs = pairing(pf.a, pf.b);
  Fq12 rhs = fq12_mul(
      fq12_mul(pairing(vk.alpha1, vk.beta2), pairing(ic, vk.gamma2)),
      pairing(pf.c, vk.delta2));
  return fq12_eq(lhs, rhs);
}

// ---------------------------------------------------------------------------
// init + C API
// ---------------------------------------------------------------------------

static bool INIT_DONE = false;

static void bn254_init() {
  if (INIT_DONE) return;
  FQ = make_field(Q_MOD);
  FR = make_field(R_MOD);
  XI = Fq2{to_mont(U256{{9, 0, 0, 0}}, FQ), FQ.one_m};
  // generators: G1 = (1, 2); G2 = canonical BN254 generator
  G1_GEN = G1{to_mont(U256{{1, 0, 0, 0}}, FQ), to_mont(U256{{2, 0, 0, 0}}, FQ),
              false};
  U256 g2x0{{0x46debd5cd992f6edULL, 0x674322d4f75edaddULL,
             0x426a00665e5c4479ULL, 0x1800deef121f1e76ULL}};
  U256 g2x1{{0x97e485b7aef312c2ULL, 0xf1aa493335a9e712ULL,
             0x7260bfb731fb5d25ULL, 0x198e9393920d483aULL}};
  U256 g2y0{{0x4ce6cc0166fa7daaULL, 0xe3d1e7690c43d37bULL,
             0x4aab71808dcb408fULL, 0x12c85ea5db8c6debULL}};
  U256 g2y1{{0x55acdadcd122975bULL, 0xbc4b313370b38ef3ULL,
             0xec9e99ad690c3395ULL, 0x090689d0585ff075ULL}};
  G2_GEN = G2{Fq2{to_mont(g2x0, FQ), to_mont(g2x1, FQ)},
              Fq2{to_mont(g2y0, FQ), to_mont(g2y1, FQ)}, false};
  // final exponent (q^12 - 1)/r
  std::vector<u64> q12{1};
  for (int i = 0; i < 12; i++) q12 = big_mul(q12, big_from(Q_MOD));
  std::vector<u64> one{1};
  big_sub_inplace(q12, one);
  FINAL_EXP = big_div(q12, big_from(R_MOD));
  INIT_DONE = true;
}

extern "C" {

// 0 = all good
int bn254_selftest() {
  bn254_init();
  // group sanity: r * G == O
  if (!g1_mul(G1_GEN, R_MOD).inf) return 1;
  if (!g2_mul(G2_GEN, R_MOD).inf) return 2;
  // bilinearity: e(aG1, bG2) == e(bG1, aG2) == e(G1, G2)^(ab)
  U256 a{{3, 0, 0, 0}}, b{{5, 0, 0, 0}}, ab{{15, 0, 0, 0}};
  Fq12 e1 = pairing(g1_mul(G1_GEN, a), g2_mul(G2_GEN, b));
  Fq12 e2 = pairing(g1_mul(G1_GEN, b), g2_mul(G2_GEN, a));
  Fq12 e3 = pairing(g1_mul(G1_GEN, ab), G2_GEN);
  if (!fq12_eq(e1, e2)) return 3;
  if (!fq12_eq(e1, e3)) return 4;
  // non-degeneracy
  if (fq12_eq(pairing(G1_GEN, G2_GEN), fq12_one())) return 5;
  return 0;
}

// Groth16 roundtrip over the binding R1CS:
//   pubs: n u64 values (Goldilocks field elements of the revelation PIs)
//   out_commit: receives the chain commitment c (4 u64 limbs, canonical Fr)
// returns 0 on prove+verify success, negative on failure
int bn254_wrap_roundtrip(const u64 *pubs, int n, u64 *out_commit,
                         u64 seed, int tamper) {
  bn254_init();
  R1CS r = binding_r1cs(n);
  // witness: compute the squaring chain
  std::vector<U256> w(r.num_wires, u256_zero());
  w[0] = FR.one_m;
  U256 x = FR.one_m;
  for (int i = 0; i < n; i++) {
    w[1 + i] = fr_from_u64(pubs[i]);
    U256 nx = f_add(mont_mul(x, x, FR), w[1 + i], FR);
    if (i < n - 1) {
      w[1 + (n + 1) + i] = nx;
    } else {
      w[1 + n] = nx;  // c
    }
    x = nx;
  }
  U256 c_can = from_mont(w[1 + n], FR);
  for (int i = 0; i < 4; i++) out_commit[i] = c_can.l[i];

  ProvingKey pk;
  VerifyingKey vk;
  setup(r, seed, pk, vk);
  Groth16Proof pf = prove(r, pk, w, seed + 1);
  std::vector<U256> pub(w.begin() + 1, w.begin() + 1 + r.num_public);
  if (tamper) {
    pub[0] = f_add(pub[0], FR.one_m, FR);
    return verify(vk, pf, pub) ? -2 : 1;  // 1 = correctly rejected
  }
  return verify(vk, pf, pub) ? 0 : -1;
}

// Generic R1CS Groth16 roundtrip: matrices in CSR form (ptr/wire/coeff),
// coefficients and witness as 4 canonical u64 limbs each.
// Returns 0 = prove+verify ok, 1 = tamper correctly rejected,
// negative = failure.
int bn254_groth16_r1cs(
    long long n_constraints, long long n_wires, long long n_public,
    const long long *aptr, const int *awire, const u64 *acoef,
    const long long *bptr, const int *bwire, const u64 *bcoef,
    const long long *cptr, const int *cwire, const u64 *ccoef,
    const u64 *witness, u64 seed, int tamper) {
  bn254_init();
  R1CS r;
  r.num_wires = (int)n_wires;
  r.num_public = (int)n_public;
  auto load = [&](const long long *ptr, const int *wire, const u64 *coef,
                  std::vector<Row> &out) {
    out.resize(n_constraints);
    for (long long i = 0; i < n_constraints; i++) {
      for (long long j = ptr[i]; j < ptr[i + 1]; j++) {
        U256 c{{coef[4 * j], coef[4 * j + 1], coef[4 * j + 2],
                coef[4 * j + 3]}};
        out[i].push_back({wire[j], to_mont(c, FR)});
      }
    }
  };
  load(aptr, awire, acoef, r.A);
  load(bptr, bwire, bcoef, r.B);
  load(cptr, cwire, ccoef, r.C);
  std::vector<U256> w(n_wires);
  for (long long i = 0; i < n_wires; i++) {
    U256 v{{witness[4 * i], witness[4 * i + 1], witness[4 * i + 2],
            witness[4 * i + 3]}};
    w[i] = to_mont(v, FR);
  }
  // witness sanity: every row satisfied
  for (long long i = 0; i < n_constraints; i++) {
    U256 av = eval_row(r.A[i], w);
    U256 bv = eval_row(r.B[i], w);
    U256 cv = eval_row(r.C[i], w);
    if (!(mont_mul(av, bv, FR) == cv)) return -10;
  }
  ProvingKey pk;
  VerifyingKey vk;
  setup(r, seed, pk, vk);
  Groth16Proof pf = prove(r, pk, w, seed + 1);
  std::vector<U256> pub(w.begin() + 1, w.begin() + 1 + r.num_public);
  if (tamper) {
    pub[0] = f_add(pub[0], FR.one_m, FR);
    return verify(vk, pf, pub) ? -2 : 1;
  }
  return verify(vk, pf, pub) ? 0 : -1;
}

// Zero-copy variant for very large statements (the ~100M-row production
// TP2-verifier R1CS): the CSR arrays are consumed IN PLACE (no vector<Row>
// materialization — coefficients convert to Montgomery per use), the
// witness-satisfaction pre-check is threaded, and everything else runs the
// same setup/prove/verify pipeline through the R1CS view.
int bn254_groth16_csr(
    long long n_constraints, long long n_wires, long long n_public,
    const long long *aptr, const int *awire, const u64 *acoef,
    const long long *bptr, const int *bwire, const u64 *bcoef,
    const long long *cptr, const int *cwire, const u64 *ccoef,
    const u64 *witness, u64 seed, int tamper) {
  bn254_init();
  R1CS r;
  r.num_wires = (int)n_wires;
  r.num_public = (int)n_public;
  r.csr_rows = n_constraints;
  r.csrA = CSRView{aptr, awire, acoef};
  r.csrB = CSRView{bptr, bwire, bcoef};
  r.csrC = CSRView{cptr, cwire, ccoef};
  std::vector<U256> w(n_wires);
  for (long long i = 0; i < n_wires; i++) {
    U256 v{{witness[4 * i], witness[4 * i + 1], witness[4 * i + 2],
            witness[4 * i + 3]}};
    w[i] = to_mont(v, FR);
  }
  // threaded witness sanity
  std::atomic<long long> bad(-1);
  {
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    std::atomic<long long> next(0);
    const long long CHUNK = 8192;
    auto worker = [&] {
      for (long long base;
           (base = next.fetch_add(CHUNK)) < n_constraints && bad.load() < 0;) {
        long long end =
            base + CHUNK < n_constraints ? base + CHUNK : n_constraints;
        for (long long i = base; i < end; i++) {
          U256 av = r.eval(0, i, w);
          U256 bv = r.eval(1, i, w);
          U256 cv = r.eval(2, i, w);
          if (!(mont_mul(av, bv, FR) == cv)) {
            bad.store(i);
            return;
          }
        }
      }
    };
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nthreads; t++) ts.emplace_back(worker);
    for (auto &t : ts) t.join();
  }
  if (bad.load() >= 0) return -10;
  ProvingKey pk;
  VerifyingKey vk;
  setup(r, seed, pk, vk);
  Groth16Proof pf = prove(r, pk, w, seed + 1);
  std::vector<U256> pub(w.begin() + 1, w.begin() + 1 + r.num_public);
  if (tamper) {
    pub[0] = f_add(pub[0], FR.one_m, FR);
    return verify(vk, pf, pub) ? -2 : 1;
  }
  return verify(vk, pf, pub) ? 0 : -1;
}

// Threaded witness-satisfaction check over CSR views (no setup/prove):
// backs R1CS.check() for spill-mode statements where the Python per-row
// replay would cost hours.  Returns -1 when every row is satisfied, else
// the index of the first detected failing row.
long long bn254_r1cs_check_csr(
    long long n_constraints, long long n_wires,
    const long long *aptr, const int *awire, const u64 *acoef,
    const long long *bptr, const int *bwire, const u64 *bcoef,
    const long long *cptr, const int *cwire, const u64 *ccoef,
    const u64 *witness) {
  bn254_init();
  R1CS r;
  r.num_wires = (int)n_wires;
  r.csr_rows = n_constraints;
  r.csrA = CSRView{aptr, awire, acoef};
  r.csrB = CSRView{bptr, bwire, bcoef};
  r.csrC = CSRView{cptr, cwire, ccoef};
  std::vector<U256> w(n_wires);
  for (long long i = 0; i < n_wires; i++) {
    U256 v{{witness[4 * i], witness[4 * i + 1], witness[4 * i + 2],
            witness[4 * i + 3]}};
    w[i] = to_mont(v, FR);
  }
  std::atomic<long long> bad(-1);
  {
    unsigned nthreads = std::thread::hardware_concurrency();
    if (nthreads == 0) nthreads = 1;
    std::atomic<long long> next(0);
    const long long CHUNK = 8192;
    auto worker = [&] {
      for (long long base;
           (base = next.fetch_add(CHUNK)) < n_constraints && bad.load() < 0;) {
        long long end =
            base + CHUNK < n_constraints ? base + CHUNK : n_constraints;
        for (long long i = base; i < end; i++) {
          U256 av = r.eval(0, i, w);
          U256 bv = r.eval(1, i, w);
          U256 cv = r.eval(2, i, w);
          if (!(mont_mul(av, bv, FR) == cv)) {
            bad.store(i);
            return;
          }
        }
      }
    };
    std::vector<std::thread> ts;
    for (unsigned t = 0; t < nthreads; t++) ts.emplace_back(worker);
    for (auto &t : ts) t.join();
  }
  return bad.load();
}

// Variant of bn254_groth16_r1cs exporting the verifying key and proof in
// canonical (non-Montgomery) affine coordinates for Solidity verifier
// generation:
//   out_vk layout : alpha1(x,y) | beta2(x0,x1,y0,y1) | gamma2(4) |
//                   delta2(4) | ic[(n_public+1) * (x,y)]     (4 limbs each)
//   out_proof     : A(x,y) | B(x0,x1,y0,y1) | C(x,y)
int bn254_groth16_r1cs_export(
    long long n_constraints, long long n_wires, long long n_public,
    const long long *aptr, const int *awire, const u64 *acoef,
    const long long *bptr, const int *bwire, const u64 *bcoef,
    const long long *cptr, const int *cwire, const u64 *ccoef,
    const u64 *witness, u64 seed, u64 *out_vk, u64 *out_proof) {
  bn254_init();
  R1CS r;
  r.num_wires = (int)n_wires;
  r.num_public = (int)n_public;
  auto load = [&](const long long *ptr, const int *wire, const u64 *coef,
                  std::vector<Row> &out) {
    out.resize(n_constraints);
    for (long long i = 0; i < n_constraints; i++) {
      for (long long j = ptr[i]; j < ptr[i + 1]; j++) {
        U256 c{{coef[4 * j], coef[4 * j + 1], coef[4 * j + 2],
                coef[4 * j + 3]}};
        out[i].push_back({wire[j], to_mont(c, FR)});
      }
    }
  };
  load(aptr, awire, acoef, r.A);
  load(bptr, bwire, bcoef, r.B);
  load(cptr, cwire, ccoef, r.C);
  std::vector<U256> w(n_wires);
  for (long long i = 0; i < n_wires; i++) {
    U256 v{{witness[4 * i], witness[4 * i + 1], witness[4 * i + 2],
            witness[4 * i + 3]}};
    w[i] = to_mont(v, FR);
  }
  ProvingKey pk;
  VerifyingKey vk;
  setup(r, seed, pk, vk);
  Groth16Proof pf = prove(r, pk, w, seed + 1);
  std::vector<U256> pub(w.begin() + 1, w.begin() + 1 + r.num_public);
  if (!verify(vk, pf, pub)) return -1;
  u64 *o = out_vk;
  auto put_fq = [&](const U256 &m) {
    U256 c = from_mont(m, FQ);
    for (int i = 0; i < 4; i++) *o++ = c.l[i];
  };
  auto put_g1 = [&](const G1 &p) { put_fq(p.x); put_fq(p.y); };
  auto put_g2 = [&](const G2 &p) {
    put_fq(p.x.c0); put_fq(p.x.c1); put_fq(p.y.c0); put_fq(p.y.c1);
  };
  put_g1(vk.alpha1);
  put_g2(vk.beta2);
  put_g2(vk.gamma2);
  put_g2(vk.delta2);
  for (auto &p : vk.ic) put_g1(p);
  o = out_proof;
  put_g1(pf.a);
  put_g2(pf.b);
  put_g1(pf.c);
  return 0;
}

// ---------------------------------------------------------------------------
// EVM precompile semantics (EIP-196/197) for the in-process contract
// executor (mp2_tpu/evm): canonical little-endian u64 limbs per 256-bit
// word, points validated like the on-chain precompiles (coordinates < q,
// on curve, (0,0) = infinity, G2 additionally subgroup-checked).
// ---------------------------------------------------------------------------

static bool load_fq(const u64 *w, U256 *out) {
  U256 v{{w[0], w[1], w[2], w[3]}};
  if (geq(v, Q_MOD)) return false;
  *out = to_mont(v, FQ);
  return true;
}

static bool g1_on_curve(const G1 &p) {
  // y^2 == x^3 + 3
  U256 lhs = mont_mul(p.y, p.y, FQ);
  U256 x3 = mont_mul(mont_mul(p.x, p.x, FQ), p.x, FQ);
  U256 b = to_mont(U256{{3, 0, 0, 0}}, FQ);
  return lhs == f_add(x3, b, FQ);
}

static bool load_g1(const u64 *w, G1 *out) {
  U256 x{{w[0], w[1], w[2], w[3]}}, y{{w[4], w[5], w[6], w[7]}};
  if (x == u256_zero() && y == u256_zero()) {
    *out = g1_zero();
    return true;
  }
  if (!load_fq(w, &out->x) || !load_fq(w + 4, &out->y)) return false;
  out->inf = false;
  return g1_on_curve(*out);
}

static void store_g1(const G1 &p, u64 *w) {
  if (p.inf) {
    for (int i = 0; i < 8; i++) w[i] = 0;
    return;
  }
  U256 x = from_mont(p.x, FQ), y = from_mont(p.y, FQ);
  for (int i = 0; i < 4; i++) w[i] = x.l[i];
  for (int i = 0; i < 4; i++) w[4 + i] = y.l[i];
}

static bool g2_on_curve(const G2 &p) {
  // y^2 == x^3 + 3/(9+u)
  Fq2 lhs = fq2_mul(p.y, p.y);
  Fq2 x3 = fq2_mul(fq2_mul(p.x, p.x), p.x);
  Fq2 b2 = fq2_mul(Fq2{to_mont(U256{{3, 0, 0, 0}}, FQ), u256_zero()},
                   fq2_inv(XI));
  Fq2 d = fq2_sub(lhs, fq2_add(x3, b2));
  return fq2_is_zero(d);
}

// EVM G2 word order: (x_imag, x_real, y_imag, y_real)
static bool load_g2_evm(const u64 *w, G2 *out) {
  bool all_zero = true;
  for (int i = 0; i < 16; i++) all_zero &= (w[i] == 0);
  if (all_zero) {
    *out = g2_zero();
    return true;
  }
  if (!load_fq(w, &out->x.c1) || !load_fq(w + 4, &out->x.c0) ||
      !load_fq(w + 8, &out->y.c1) || !load_fq(w + 12, &out->y.c0))
    return false;
  out->inf = false;
  if (!g2_on_curve(*out)) return false;
  // subgroup check: r * Q == O (EIP-197 requires order-r points)
  return g2_mul(*out, R_MOD).inf;
}

// ecAdd (0x06): in = x1,y1,x2,y2 (32 limbs... 16 u64), out = x,y (8 u64)
int bn254_ec_add(const u64 *in, u64 *out) {
  bn254_init();
  G1 a, b;
  if (!load_g1(in, &a) || !load_g1(in + 8, &b)) return -1;
  store_g1(g1_add(a, b), out);
  return 0;
}

// ecMul (0x07): in = x,y,s (12 u64; s NOT reduced mod r, per EVM), out = x,y
int bn254_ec_mul(const u64 *in, u64 *out) {
  bn254_init();
  G1 p;
  if (!load_g1(in, &p)) return -1;
  U256 s{{in[8], in[9], in[10], in[11]}};
  store_g1(g1_mul(p, s), out);
  return 0;
}

// ecPairing (0x08): k pairs of (G1: 8 u64, G2: 16 u64).  Returns 1 if the
// pairing product is the identity, 0 if not, negative on invalid input.
// Uses the Tate pairing; product == 1 is equivalent under any
// non-degenerate bilinear pairing on the same groups (they differ by a
// fixed exponent coprime to r), so this matches the on-chain
// optimal-ate check.
int bn254_pairing_prod(const u64 *in, int k) {
  bn254_init();
  Fq12 acc = fq12_one();
  for (int i = 0; i < k; i++) {
    G1 p;
    G2 q;
    if (!load_g1(in + 24 * i, &p)) return -1;
    if (!load_g2_evm(in + 24 * i + 8, &q)) return -2;
    if (p.inf || q.inf) continue;
    acc = fq12_mul(acc, pairing(p, q));
  }
  return fq12_eq(acc, fq12_one()) ? 1 : 0;
}

}  // extern "C"

// hostfield — native host-side prime-field arithmetic + golden NTT.
//
// This is the TPU framework's native host backend: the role CGBN's GMP/MPZ
// backend plays in the reference (/root/reference/include/cgbn/cgbn_mpz.h,
// impl_mpz.cc — used for host-side twiddle precompute, big-num.cu:122-145),
// re-implemented from scratch for up-to-256-bit fields as 4x64-bit limbs
// with __int128 products and CIOS Montgomery multiplication (the same
// algorithm family as core/core_mont.cu:29-77, restructured for scalar
// host execution).
//
// Used by ntt_tpu.hostlib via ctypes as (a) a fast oracle for large-n
// bit-exactness checks where the pure-Python model is too slow, and (b) a
// twiddle/root table generator.
//
// All values are little-endian uint64[4]; arrays are element-major
// (element i at data[4*i..4*i+3]). Inputs/outputs are canonical (< p)
// standard-form values unless a function says Montgomery.

#include <cstdint>
#include <cstring>

typedef unsigned __int128 u128;
typedef uint64_t u64;

namespace {

struct Fe { u64 w[4]; };

inline Fe fe_load(const u64* p) { Fe r; std::memcpy(r.w, p, 32); return r; }
inline void fe_store(u64* p, const Fe& x) { std::memcpy(p, x.w, 32); }
inline Fe fe_zero() { Fe r{{0, 0, 0, 0}}; return r; }

inline bool fe_ge(const Fe& a, const Fe& b) {
  for (int i = 3; i >= 0; --i) {
    if (a.w[i] != b.w[i]) return a.w[i] > b.w[i];
  }
  return true;
}

inline Fe fe_sub_raw(const Fe& a, const Fe& b) {  // assumes a >= b
  Fe r;
  u64 borrow = 0;
  for (int i = 0; i < 4; ++i) {
    u128 d = (u128)a.w[i] - b.w[i] - borrow;
    r.w[i] = (u64)d;
    borrow = (u64)((d >> 64) & 1);
  }
  return r;
}

inline Fe fe_add_mod(const Fe& a, const Fe& b, const Fe& p) {
  Fe r;
  u64 carry = 0;
  for (int i = 0; i < 4; ++i) {
    u128 s = (u128)a.w[i] + b.w[i] + carry;
    r.w[i] = (u64)s;
    carry = (u64)(s >> 64);
  }
  if (carry || fe_ge(r, p)) r = fe_sub_raw(r, p);
  return r;
}

inline Fe fe_sub_mod(const Fe& a, const Fe& b, const Fe& p) {
  if (fe_ge(a, b)) return fe_sub_raw(a, b);
  Fe t = fe_sub_raw(b, a);
  return fe_sub_raw(p, t);
}

// -p^{-1} mod 2^64 by Newton iteration (host analog of CGBN
// ubinary_inverse, arith/math.cu:50-58).
inline u64 np0_of(const Fe& p) {
  u64 x = p.w[0];
  u64 inv = 1;
  for (int i = 0; i < 7; ++i) inv *= 2 - x * inv;
  return (u64)(0 - inv);
}

struct Ctx {
  Fe p;
  u64 np0;
  Fe r2;     // R^2 mod p, R = 2^256
  Fe one_m;  // R mod p (Montgomery form of 1)
};

// CIOS Montgomery multiply: 4x64 limbs, 128-bit partial products.
inline Fe mont_mul(const Fe& a, const Fe& b, const Ctx& c) {
  u64 t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; ++i) {
    u64 carry = 0;
    for (int j = 0; j < 4; ++j) {
      u128 s = (u128)a.w[i] * b.w[j] + t[j] + carry;
      t[j] = (u64)s;
      carry = (u64)(s >> 64);
    }
    u128 s = (u128)t[4] + carry;
    t[4] = (u64)s;
    t[5] += (u64)(s >> 64);

    u64 m = t[0] * c.np0;
    u128 s2 = (u128)m * c.p.w[0] + t[0];
    carry = (u64)(s2 >> 64);
    for (int j = 1; j < 4; ++j) {
      u128 sj = (u128)m * c.p.w[j] + t[j] + carry;
      t[j - 1] = (u64)sj;
      carry = (u64)(sj >> 64);
    }
    s2 = (u128)t[4] + carry;
    t[3] = (u64)s2;
    t[4] = t[5] + (u64)(s2 >> 64);
    t[5] = 0;
  }
  Fe r{{t[0], t[1], t[2], t[3]}};
  if (t[4] || fe_ge(r, c.p)) r = fe_sub_raw(r, c.p);
  return r;
}

inline Fe to_mont(const Fe& a, const Ctx& c) { return mont_mul(a, c.r2, c); }
inline Fe from_mont(const Fe& a, const Ctx& c) {
  Fe one{{1, 0, 0, 0}};
  return mont_mul(a, one, c);
}

// x^e mod p for a 256-bit exponent; x standard form in/out.
inline Fe pow_mod(const Fe& x, const Fe& e, const Ctx& c) {
  Fe base = to_mont(x, c);
  Fe acc = c.one_m;
  for (int i = 0; i < 4; ++i) {
    u64 word = e.w[i];
    for (int b = 0; b < 64; ++b) {
      if ((word >> b) & 1) acc = mont_mul(acc, base, c);
      base = mont_mul(base, base, c);
    }
  }
  return from_mont(acc, c);
}

Ctx make_ctx(const u64* p_words) {
  Ctx c;
  c.p = fe_load(p_words);
  c.np0 = np0_of(c.p);
  // R mod p by doubling 1 256 times; R^2 by squaring via repeated doubling
  Fe r = {{1, 0, 0, 0}};
  // reduce 1 (already < p for p > 1)
  for (int i = 0; i < 256; ++i) r = fe_add_mod(r, r, c.p);
  c.one_m = r;  // 2^256 mod p
  // R^2 mod p: double R another 256 times? No — that gives 2^512 mod p.
  Fe r2 = r;
  for (int i = 0; i < 256; ++i) r2 = fe_add_mod(r2, r2, c.p);
  c.r2 = r2;  // 2^512 mod p = R^2 mod p
  return c;
}

inline Fe sub_one(const Fe& a) {  // a - 1 for a >= 1
  Fe one{{1, 0, 0, 0}};
  return fe_sub_raw(a, one);
}

inline Fe shr(const Fe& a, int k) {  // logical shift right by k < 64*4
  Fe r = fe_zero();
  int words = k / 64, bits = k % 64;
  for (int i = 0; i + words < 4; ++i) {
    u64 lo = a.w[i + words] >> bits;
    u64 hi = (bits && i + words + 1 < 4) ? (a.w[i + words + 1] << (64 - bits))
                                         : 0;
    r.w[i] = lo | hi;
  }
  return r;
}

}  // namespace

extern "C" {

// Plain modular product elementwise: out = a*b mod p (standard form).
void hf_mul_mod_vec(const u64* p, const u64* a, const u64* b, u64 n,
                    u64* out) {
  Ctx c = make_ctx(p);
  for (u64 i = 0; i < n; ++i) {
    Fe am = to_mont(fe_load(a + 4 * i), c);
    Fe r = mont_mul(am, fe_load(b + 4 * i), c);  // a*R * b * R^-1 = a*b
    fe_store(out + 4 * i, r);
  }
}

// x^e mod p (standard form), single element.
void hf_pow_mod(const u64* p, const u64* x, const u64* e, u64* out) {
  Ctx c = make_ctx(p);
  fe_store(out, pow_mod(fe_load(x), fe_load(e), c));
}

// Powers base^0..base^{count-1} mod p (twiddle tables). ``mont_bits`` = 0
// gives standard form; otherwise each output is scaled by 2^mont_bits mod
// p, i.e. the Montgomery form for a caller-chosen radix (the device limb
// layer uses R = 2^(16*n_halves), which differs from this backend's
// internal 2^256).
void hf_powers(const u64* p, const u64* base, u64 count, u64 mont_bits,
               u64* out) {
  Ctx c = make_ctx(p);
  Fe bm = to_mont(fe_load(base), c);
  Fe acc = c.one_m;
  // scale = mont(2^mont_bits): mont_mul(acc, scale) = x * 2^mont_bits * R
  Fe two{{2, 0, 0, 0}};
  Fe scale = c.one_m;
  if (mont_bits) {
    Fe e = fe_zero();
    e.w[0] = mont_bits;
    scale = to_mont(pow_mod(two, e, c), c);
  }
  for (u64 i = 0; i < count; ++i) {
    Fe v = mont_bits ? mont_mul(acc, scale, c) : acc;  // x*2^k*R
    fe_store(out + 4 * i, from_mont(v, c));
    acc = mont_mul(acc, bm, c);
  }
}

// Golden natural-order NTT, identical semantics to the reference NTT()
// (/root/reference/src/GZKP-NTT.cu:30-48): bit-reverse + radix-2 DIT with
// per-stage twiddle gap = g^((p-1)/(2*stride)). If inverse != 0, uses
// g^{-1} = g^(p-2) and scales by n^{-1}. data/out: n elements, standard
// form, canonical.
void hf_ntt(const u64* p_words, const u64* data, u64 n, const u64* g_words,
            int inverse, u64* out) {
  Ctx c = make_ctx(p_words);
  Fe g = fe_load(g_words);
  if (inverse) {
    Fe pm2 = sub_one(sub_one(c.p));
    g = pow_mod(g, pm2, c);  // Fermat inverse
  }
  // copy input in Montgomery form with bit-reversal
  int log_n = 0;
  while ((u64(1) << log_n) < n) ++log_n;
  Fe* d = new Fe[n];
  for (u64 i = 0; i < n; ++i) {
    u64 r = 0;
    for (int b = 0; b < log_n; ++b) r = (r << 1) | ((i >> b) & 1);
    d[r] = to_mont(fe_load(data + 4 * i), c);
  }
  Fe pm1 = sub_one(c.p);
  for (int s = 0; s < log_n; ++s) {
    u64 stride = u64(1) << s;
    Fe exp = shr(pm1, s + 1);  // (p-1)/(2*stride)
    Fe gap = to_mont(pow_mod(g, exp, c), c);
    for (u64 start = 0; start < n; start += 2 * stride) {
      Fe w = c.one_m;
      for (u64 off = 0; off < stride; ++off) {
        Fe a = d[start + off];
        Fe b = mont_mul(w, d[start + off + stride], c);
        d[start + off] = fe_add_mod(a, b, c.p);
        d[start + off + stride] = fe_sub_mod(a, b, c.p);
        w = mont_mul(gap, w, c);
      }
    }
  }
  if (inverse) {
    // scale by n^{-1}
    Fe nfe = fe_zero();
    nfe.w[0] = n;
    Fe pm2 = sub_one(sub_one(c.p));
    Fe ninv = to_mont(pow_mod(nfe, pm2, c), c);
    for (u64 i = 0; i < n; ++i) d[i] = mont_mul(d[i], ninv, c);
  }
  for (u64 i = 0; i < n; ++i) fe_store(out + 4 * i, from_mont(d[i], c));
  delete[] d;
}

}  // extern "C"

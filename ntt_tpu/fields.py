"""Prime-field specifications for the TPU-native NTT framework.

This is the TPU-first equivalent of the reference's field layer:

- the small Proth prime ``P = 469762049 = 7*2^26 + 1`` with generator 3 that
  the reference hard-codes (``/root/reference/src/GZKP-NTT.cu:7-8``), and
- 256-bit ZKP scalar fields (BN254 Fr, BLS12-381 Fr) that the reference
  handles through the vendored CGBN library
  (``/root/reference/include/cgbn/cgbn.h:85-512``).

A :class:`Field` carries everything the limb layer (``ntt_tpu.limbs``) needs
to run Montgomery arithmetic with 16-bit half-limbs planned onto 32-bit
unsigned integer lanes: the modulus split into half-limbs, ``np0 = -p^{-1}
mod 2^16`` (the half-limb analog of CGBN's ``-ubinary_inverse(n0)``,
``/root/reference/include/cgbn/impl_cuda.cu:1008``), and the Montgomery
constants R mod p and R^2 mod p.

All members are plain Python ints resolved at trace time; no device work
happens here.
"""

from __future__ import annotations

import dataclasses
import functools

HALF_BITS = 16
HALF_MASK = (1 << HALF_BITS) - 1
WORD_BITS = 32


def pow_mod(base: int, exp: int, p: int) -> int:
    """Host-exact modular exponentiation (reference ``qpow``,
    GZKP-NTT.cu:10-17)."""
    return pow(base % p, exp, p)


def inv_mod(x: int, p: int) -> int:
    """Modular inverse via Fermat (reference ``inv``, GZKP-NTT.cu:19-22)."""
    return pow(x % p, p - 2, p)


def _inv_2adic(x: int, bits: int) -> int:
    """Inverse of odd x modulo 2^bits by Newton iteration (the host analog of
    CGBN ``ubinary_inverse``, /root/reference/include/cgbn/arith/math.cu:50-58).
    """
    assert x & 1
    inv = 1
    for _ in range(bits.bit_length() + 1):
        inv = (inv * (2 - x * inv)) % (1 << bits)
    return inv % (1 << bits)


@dataclasses.dataclass(frozen=True)
class Field:
    """A prime field with a 2^two_adicity root of unity, plus derived
    Montgomery constants for the planned 16-bit-half-limb representation."""

    name: str
    p: int
    generator: int  # multiplicative generator of F_p^* (or at least of the
    # 2-Sylow subgroup; verified by tests via root_of_unity order checks)
    two_adicity: int

    # ---- derived ----------------------------------------------------------
    @functools.cached_property
    def bits(self) -> int:
        return self.p.bit_length()

    @functools.cached_property
    def n_words(self) -> int:
        """Number of 32-bit words per element (CGBN LIMBS analog)."""
        return (self.bits + WORD_BITS - 1) // WORD_BITS

    @functools.cached_property
    def n_halves(self) -> int:
        """Number of 16-bit half-limbs per element."""
        return 2 * self.n_words

    @functools.cached_property
    def mont_bits(self) -> int:
        return HALF_BITS * self.n_halves

    @functools.cached_property
    def R(self) -> int:
        """Montgomery radix R = 2^(16 * n_halves) mod p."""
        return (1 << self.mont_bits) % self.p

    @functools.cached_property
    def R2(self) -> int:
        """R^2 mod p — multiplier for to-Montgomery conversion."""
        return (self.R * self.R) % self.p

    @functools.cached_property
    def R_inv(self) -> int:
        return inv_mod(1 << self.mont_bits, self.p)

    @functools.cached_property
    def np0(self) -> int:
        """-p^{-1} mod 2^16 (CIOS per-iteration quotient constant)."""
        return (-_inv_2adic(self.p, HALF_BITS)) & HALF_MASK

    @functools.cached_property
    def p_halves(self) -> tuple:
        return tuple(self.int_to_halves(self.p))

    # ---- conversions -------------------------------------------------------
    def int_to_halves(self, x: int) -> list:
        return [(x >> (HALF_BITS * i)) & HALF_MASK for i in range(self.n_halves)]

    def int_to_words(self, x: int) -> list:
        return [(x >> (WORD_BITS * i)) & 0xFFFFFFFF for i in range(self.n_words)]

    def words_to_int(self, words) -> int:
        return sum(int(w) << (WORD_BITS * i) for i, w in enumerate(words))

    def to_mont_int(self, x: int) -> int:
        return (x * (1 << self.mont_bits)) % self.p

    def from_mont_int(self, x: int) -> int:
        return (x * self.R_inv) % self.p

    # ---- roots of unity ----------------------------------------------------
    def root_of_unity(self, n: int) -> int:
        """Primitive n-th root of unity ω_n = g^((p-1)/n).

        Matches the reference convention where every twiddle is derived as
        ``qpow(root, (P-1)/(2*stride))`` from the generator
        (GZKP-NTT.cu:38-40).
        """
        assert n & (n - 1) == 0, "n must be a power of two"
        assert n.bit_length() - 1 <= self.two_adicity, (
            f"{self.name}: n=2^{n.bit_length()-1} exceeds two-adicity "
            f"{self.two_adicity}"
        )
        return pow_mod(self.generator, (self.p - 1) // n, self.p)

    def inv_root_of_unity(self, n: int) -> int:
        return inv_mod(self.root_of_unity(n), self.p)

    def validate(self) -> None:
        """Debug-mode value checks — the TPU-native analog of CGBN's error
        taxonomy (modulus must be odd etc., /root/reference/include/cgbn/
        cgbn.h:30-43)."""
        assert self.p & 1, f"{self.name}: modulus must be odd for Montgomery"
        assert self.p > 3
        assert (self.p - 1) % (1 << self.two_adicity) == 0
        w = self.root_of_unity(1 << self.two_adicity)
        # ω must have order exactly 2^two_adicity.
        assert pow_mod(w, 1 << self.two_adicity, self.p) == 1
        assert pow_mod(w, 1 << (self.two_adicity - 1), self.p) == self.p - 1


# ---------------------------------------------------------------------------
# Field instances
# ---------------------------------------------------------------------------

#: The reference's small Proth prime: P = 7*2^26 + 1 with generator 3
#: (/root/reference/src/GZKP-NTT.cu:7-8 — the in-source comment "29*2^57+1"
#: is wrong; 469762049 = 7*2^26 + 1, giving two-adicity 26, which is exactly
#: why the reference's largest transform is 2^26).
SMALL = Field(name="small-proth", p=469762049, generator=3, two_adicity=26)

#: BN254 (alt_bn128) scalar field Fr — reference handles 256-bit fields via
#: CGBN (/root/reference/src/big-num.cu:11-12, BITS=256).
BN254_FR = Field(
    name="bn254-fr",
    p=21888242871839275222246405745257275088548364400416034343698204186575808495617,
    generator=5,
    two_adicity=28,
)

#: BLS12-381 scalar field Fr.
BLS12_381_FR = Field(
    name="bls12-381-fr",
    p=52435875175126190479447740508185965837690552500527637822603658699938581184513,
    generator=7,
    two_adicity=32,
)

#: Goldilocks prime 2^64 - 2^32 + 1 (common ZKP small field; two-adicity 32,
#: generator 7). Not in the reference, but a natural 2-word citizen of the
#: same limb layer.
GOLDILOCKS = Field(
    name="goldilocks",
    p=(1 << 64) - (1 << 32) + 1,
    generator=7,
    two_adicity=32,
)

FIELDS = {f.name: f for f in (SMALL, BN254_FR, BLS12_381_FR, GOLDILOCKS)}


def get_field(name: str) -> Field:
    try:
        return FIELDS[name]
    except KeyError:
        raise ValueError(
            f"unknown field {name!r}; available: {sorted(FIELDS)}") from None

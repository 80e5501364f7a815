"""ctypes loader for the native host field library (csrc/hostfield.cpp).

The native lib is the framework's host backend — the role CGBN's GMP/MPZ
backend plays in the reference (SURVEY.md §2.2) — providing a fast exact
oracle (golden NTT, Montgomery ops, twiddle tables) for large sizes where
the pure-Python model in ``ntt_tpu.oracle`` is too slow.

Builds on first use via ``make hostlib`` (plain g++, no external deps);
falls back gracefully: ``available()`` returns False and callers should use
the Python oracle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..fields import Field

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "libhostfield.so")

_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_REPO, "csrc", "hostfield.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, src],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.hf_ntt.argtypes = [u64p, u64p, ctypes.c_uint64, u64p, ctypes.c_int,
                           u64p]
    lib.hf_powers.argtypes = [u64p, u64p, ctypes.c_uint64, ctypes.c_uint64,
                              u64p]
    lib.hf_mul_mod_vec.argtypes = [u64p, u64p, u64p, ctypes.c_uint64, u64p]
    lib.hf_pow_mod.argtypes = [u64p, u64p, u64p, u64p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fe(x: int) -> np.ndarray:
    return np.asarray([(x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
                       for i in range(4)], dtype=np.uint64)


def _ints_to_arr(vals) -> np.ndarray:
    out = np.empty((len(vals), 4), dtype=np.uint64)
    for i, v in enumerate(vals):
        for w in range(4):
            out[i, w] = (v >> (64 * w)) & 0xFFFFFFFFFFFFFFFF
    return out


def _arr_to_ints(a: np.ndarray) -> list:
    a = a.reshape(-1, 4)
    return [int(a[i, 0]) | (int(a[i, 1]) << 64) | (int(a[i, 2]) << 128)
            | (int(a[i, 3]) << 192) for i in range(a.shape[0])]


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def ntt(data: list, field: Field, inverse: bool = False) -> list:
    """Golden NTT via the native lib — same semantics as
    ``oracle.ntt_golden`` / ``oracle.intt_golden``."""
    lib = _load()
    assert lib is not None, "hostfield library unavailable"
    assert field.bits <= 256
    n = len(data)
    inp = _ints_to_arr(data)
    out = np.empty_like(inp)
    p = _fe(field.p)
    g = _fe(field.generator)
    lib.hf_ntt(_p64(p), _p64(inp), n, _p64(g), 1 if inverse else 0,
               _p64(out))
    return _arr_to_ints(out)


def ntt_np(data: np.ndarray, field: Field, inverse: bool = False
           ) -> np.ndarray:
    """Golden NTT on np.uint64[n, 4] limb rows (no Python-int round trip —
    the fast exact oracle for data-sized verification at 2^20+)."""
    lib = _load()
    assert lib is not None, "hostfield library unavailable"
    assert field.bits <= 256, \
        f"hostfield elements are fixed 4x64 — field {field.name} too wide"
    inp = np.ascontiguousarray(data, dtype=np.uint64)
    n = inp.shape[0]
    out = np.empty_like(inp)
    p = _fe(field.p)
    g = _fe(field.generator)
    lib.hf_ntt(_p64(p), _p64(inp), n, _p64(g), 1 if inverse else 0,
               _p64(out))
    return out


def host_planes(want_rows: np.ndarray, n_words: int) -> np.ndarray:
    """np.uint64[n, 4] hostlib rows -> np.uint32[W, n] device word planes
    (little-endian limbs, mirrors powers_np)."""
    n = want_rows.shape[0]
    words = want_rows.view(np.uint32).reshape(n, 8)
    return np.ascontiguousarray(words[:, :n_words].T)


def full_compare(y_mont, want_rows: np.ndarray, field: Field,
                 chunk_log: int = 18) -> bool:
    """Bit-exact compare of EVERY output position vs the host oracle —
    the reference's all-elements check (GZKP-NTT.cu:1627-1631).

    ``y_mont`` is the on-device Montgomery-form result uint32[W, n];
    ``want_rows`` the hostlib standard-form uint64[n, 4]. One jitted
    slice+from_mont program is reused for every chunk (a static chunk
    size keeps it a single compile); the compare itself is a numpy
    plane equality — no Python-int round trip, so 2^22 x 256-bit costs
    ~16 x 8MB fetches, not minutes of int conversion."""
    import jax

    from .. import limbs

    n = int(y_mont.shape[1])
    want = host_planes(want_rows, field.n_words)
    c = min(n, 1 << chunk_log)
    sl = jax.jit(lambda v, s: limbs.from_mont(
        jax.lax.dynamic_slice_in_dim(v, s, c, axis=1), field))
    for lo in range(0, n, c):
        got = np.asarray(sl(y_mont, lo))
        if not np.array_equal(got, want[:, lo:lo + c]):
            return False
    return True


def mul_mod_vec_np(a: np.ndarray, b: np.ndarray, field: Field
                   ) -> np.ndarray:
    """Elementwise a*b mod p on np.uint64[n, 4] limb rows."""
    lib = _load()
    assert lib is not None, "hostfield library unavailable"
    assert field.bits <= 256, \
        f"hostfield elements are fixed 4x64 — field {field.name} too wide"
    aa = np.ascontiguousarray(a, dtype=np.uint64)
    ba = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty_like(aa)
    p = _fe(field.p)
    lib.hf_mul_mod_vec(_p64(p), _p64(aa), _p64(ba), aa.shape[0], _p64(out))
    return out


def ramp_np(n: int) -> np.ndarray:
    """The de-facto reference vector 0..n-1 as np.uint64[n, 4] limb rows."""
    out = np.zeros((n, 4), dtype=np.uint64)
    out[:, 0] = np.arange(n, dtype=np.uint64)
    return out


def powers_np(base: int, count: int, field: Field,
              mont_form: bool = False) -> np.ndarray:
    """Powers base^0..base^{count-1} as word planes np.uint32[W, count] —
    no Python-int round trip (fast path for data-sized twiddle tables)."""
    lib = _load()
    assert lib is not None, "hostfield library unavailable"
    out = np.empty((count, 4), dtype=np.uint64)
    p, b = _fe(field.p), _fe(base % field.p)
    lib.hf_powers(_p64(p), _p64(b), count,
                  field.mont_bits if mont_form else 0, _p64(out))
    words = out.view(np.uint32).reshape(count, 8)  # little-endian limbs
    return np.ascontiguousarray(words[:, : field.n_words].T)


def powers(base: int, count: int, field: Field,
           mont_form: bool = False) -> list:
    """Powers base^0..base^{count-1}; ``mont_form=True`` returns them in the
    *field's* Montgomery form (radix 2^field.mont_bits, matching the device
    limb layer)."""
    lib = _load()
    assert lib is not None, "hostfield library unavailable"
    out = np.empty((count, 4), dtype=np.uint64)
    p, b = _fe(field.p), _fe(base % field.p)
    lib.hf_powers(_p64(p), _p64(b), count,
                  field.mont_bits if mont_form else 0, _p64(out))
    return _arr_to_ints(out)


def pow_mod(x: int, e: int, field: Field) -> int:
    lib = _load()
    assert lib is not None, "hostfield library unavailable"
    out = np.empty(4, dtype=np.uint64)
    p, xa, ea = _fe(field.p), _fe(x % field.p), _fe(e)
    lib.hf_pow_mod(_p64(p), _p64(xa), _p64(ea), _p64(out))
    return _arr_to_ints(out)[0]


def mul_mod_vec(a: list, b: list, field: Field) -> list:
    """Elementwise a*b mod p (standard form)."""
    lib = _load()
    assert lib is not None, "hostfield library unavailable"
    aa, ba = _ints_to_arr(a), _ints_to_arr(b)
    out = np.empty_like(aa)
    p = _fe(field.p)
    lib.hf_mul_mod_vec(_p64(p), _p64(aa), _p64(ba), len(a), _p64(out))
    return _arr_to_ints(out)

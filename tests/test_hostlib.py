"""Native host field library (csrc/hostfield.cpp) vs the Python oracle.

The native lib is the host backend analog of the reference's CGBN GMP/MPZ
path (SURVEY.md §2.2); these tests pin it to the same golden semantics.
"""

import pytest

from ntt_tpu import fields, hostlib, oracle

pytestmark = pytest.mark.skipif(
    not hostlib.available(), reason="hostfield .so unavailable (no g++?)")

FIELDS = [fields.SMALL, fields.BN254_FR, fields.BLS12_381_FR,
          fields.GOLDILOCKS]


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_native_ntt_matches_oracle(field):
    n = 128
    x = [(3 * i * i + 11) % field.p for i in range(n)]
    assert hostlib.ntt(x, field) == oracle.ntt_golden(x, field)
    assert hostlib.ntt(x, field, inverse=True) == oracle.intt_golden(x, field)


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_native_roundtrip_large(field):
    n = 1 << 12  # too slow for the python oracle at every field; native is fast
    x = oracle.ramp(n, field)
    y = hostlib.ntt(x, field)
    assert hostlib.ntt(y, field, inverse=True) == x


@pytest.mark.parametrize("field", FIELDS, ids=lambda f: f.name)
def test_native_powers_and_pow(field):
    p = field.p
    assert hostlib.powers(field.generator, 16, field) == [
        pow(field.generator, i, p) for i in range(16)]
    assert hostlib.powers(7, 8, field, mont_form=True) == [
        field.to_mont_int(pow(7, i, p)) for i in range(8)]
    assert hostlib.pow_mod(5, p - 2, field) == pow(5, p - 2, p)


def test_native_mul_mod_vec():
    f = fields.BLS12_381_FR
    a = [f.p - 1, 2, 12345, 0]
    b = [f.p - 1, f.p - 2, 99999, 7]
    assert hostlib.mul_mod_vec(a, b, f) == [x * y % f.p for x, y in zip(a, b)]


def test_device_twiddles_match_native():
    """Cross-backend bit-exactness: device twiddle masters == native table."""
    import numpy as np
    from ntt_tpu.transforms.core import twiddle_master
    f = fields.BN254_FR
    m = 64
    master = twiddle_master(f, m, inverse=False)  # [W, m/2] mont form
    w = f.root_of_unity(m)
    native = hostlib.powers(w, m // 2, f, mont_form=True)
    got = [sum(int(master[k, j]) << (32 * k) for k in range(f.n_words))
           for j in range(m // 2)]
    assert got == native


@pytest.mark.parametrize("field", [fields.BLS12_381_FR, fields.SMALL],
                         ids=lambda f: f.name)
def test_sweep_full_compare(field):
    """hostlib.full_compare (the SWEEP_VERIFY=full / healthcheck --deep
    path): every-position compare of a device run vs the hostlib oracle
    (the reference checks all elements, GZKP-NTT.cu:1627-1631), streamed
    in static-size chunks. Round 5 moved it from tools/sweep.py into the
    package so the --deep gate shares it."""
    import numpy as np

    from ntt_tpu.hostlib import full_compare, host_planes

    import jax
    from ntt_tpu.api import get_runner, ramp_mont

    n = 1 << 10
    run, aux = get_runner(field, n, False, "auto", True, None)
    y = jax.jit(run)(ramp_mont(field, n), aux)
    want = hostlib.ntt_np(hostlib.ramp_np(n), field)
    # chunk smaller than n so the loop takes >1 slice
    assert full_compare(y, want, field, chunk_log=8)
    # corrupting ONE word of ONE position must be caught
    bad = want.copy()
    bad[n // 3, 0] ^= np.uint64(1)
    assert not full_compare(y, bad, field, chunk_log=8)
    # plane layout helper agrees with the powers_np convention
    planes = host_planes(want, field.n_words)
    assert planes.shape == (field.n_words, n)

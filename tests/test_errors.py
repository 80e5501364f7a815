"""Error-path checks (value-check discipline, the TPU-native analog of
CGBN's error taxonomy, /root/reference/include/cgbn/cgbn.h:30-43)."""

import pytest

import ntt_tpu as nt
from ntt_tpu import limbs


def test_unknown_field():
    with pytest.raises(ValueError, match="unknown field"):
        nt.get_field("nope")


def test_non_power_of_two():
    x = nt.from_ints(list(range(48)), nt.SMALL)
    with pytest.raises(ValueError, match="power of two"):
        nt.ntt(x, nt.SMALL)


def test_wrong_limb_count():
    x = nt.from_ints(list(range(16)), nt.SMALL)  # W=1
    with pytest.raises(ValueError, match="limb-leading"):
        nt.ntt(x, nt.BN254_FR)


def test_two_adicity_exceeded():
    f = nt.SMALL  # two-adicity 26
    with pytest.raises(AssertionError, match="two-adicity"):
        f.root_of_unity(1 << 27)


def test_unknown_algorithm():
    x = nt.from_ints(list(range(16)), nt.SMALL)
    with pytest.raises(KeyError):
        nt.ntt(x, nt.SMALL, algorithm="bogus")


def test_is_canonical():
    f = nt.SMALL
    ok = nt.from_ints([0, 1, f.p - 1], f)
    bad = nt.from_ints([f.p], f)  # = p, not canonical
    import numpy as np
    assert np.asarray(limbs.is_canonical(ok, f)).all()
    assert not np.asarray(limbs.is_canonical(bad, f)).any()


def test_field_validate():
    for f in nt.FIELDS.values():
        f.validate()


def test_ntt_debug_tripwire(monkeypatch):
    """NTT_DEBUG=1 must fire on a corrupted (non-canonical) limb — the
    runtime analog of CGBN's error monitor (VERDICT round 1 item 9)."""
    monkeypatch.setenv("NTT_DEBUG", "1")
    f = nt.SMALL
    good = nt.from_ints(list(range(16)), f)
    nt.ntt(good, f, algorithm="naive")  # clean input passes
    bad = nt.from_ints([f.p] + list(range(15)), f)  # element == p: corrupt
    with pytest.raises(Exception, match="non-canonical"):
        import jax
        y = nt.ntt(bad, f, algorithm="naive")
        jax.block_until_ready(y)

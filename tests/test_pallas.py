"""Pallas VMEM-fused kernel path (interpret mode on CPU).

Exercises the same kernel code the TPU runs (kernels/vmem_ntt.py) via the
Pallas interpreter, bit-exact vs the Python oracle — SURVEY.md §7's
"minimum end-to-end slice" discipline applied to the kernel layer.
"""

import pytest

import ntt_tpu as nt
from ntt_tpu import oracle


def run_pallas(field, n):
    x = oracle.ramp(n, field)
    X = nt.from_ints(x, field)
    golden = oracle.ntt_golden(x, field)
    y = nt.to_ints(nt.ntt(X, field, algorithm="pallas"), field)
    assert y == golden, f"{field.name} n={n} pallas forward"
    rt = nt.to_ints(
        nt.intt(nt.from_ints(golden, field), field, algorithm="pallas"),
        field)
    assert rt == x, f"{field.name} n={n} pallas roundtrip"


@pytest.mark.parametrize("log_n", [3, 6, 9])
def test_pallas_small_field(log_n):
    run_pallas(nt.SMALL, 1 << log_n)


def test_pallas_bn254():
    run_pallas(nt.BN254_FR, 32)


def test_pallas_goldilocks():
    # 2^10 forces the recursive four-step split over the kernel base
    run_pallas(nt.GOLDILOCKS, 1 << 10)


def run_algo(field, n, algo):
    x = oracle.ramp(n, field)
    golden = oracle.ntt_golden(x, field)
    y = nt.to_ints(nt.ntt(nt.from_ints(x, field), field, algorithm=algo),
                   field)
    assert y == golden, f"{field.name} n={n} {algo}"


@pytest.mark.parametrize("log_n", [8, 9, 11])
def test_pallas_fused_small_field(log_n):
    """Fully-fused level kernel (stages + twiddle + transposed store)."""
    run_algo(nt.SMALL, 1 << log_n, "pallas_fused")


def test_pallas_fused_roundtrip_bn254():
    f, n = nt.BN254_FR, 32
    x = oracle.ramp(n, f)
    y = nt.ntt(nt.from_ints(x, f), f, algorithm="pallas_fused")
    rt = nt.to_ints(nt.intt(y, f, algorithm="pallas_fused"), f)
    assert rt == x

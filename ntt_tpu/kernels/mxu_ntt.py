"""Pallas kernel: fused MXU base-NTT (digit matmul + reduction in VMEM).

The XLA version of the MXU path (transforms/mxu.py) materializes the int32
digit-product planes Z[(2D-1)*m, B] in HBM — ~9x the data size — between
the matmul and the Montgomery reduction. This kernel fuses the whole base
transform per batch tile in VMEM:

    load x tile  ->  extract int8 digits  ->  MXU int8 matmul against the
    resident DFT convolution matrix  ->  rebase digit sums to half planes
    ->  CIOS Montgomery wide-reduce  ->  store canonical words

so HBM sees only the input and output word planes (plus one read of the
convolution matrix, which stays VMEM-resident across the whole grid).

This is the production fusion the reference approximates with its
shared-memory staging of CGBN limbs (/root/reference/src/big-num.cu:199-204:
limbs staged into shared memory around the Montgomery butterfly) — on TPU
the staging target is VMEM and the multiplier is the MXU.

Arithmetic is shared with the XLA path: ``digits.extract_digits`` /
``digits.recompose_reduce`` trace into the kernel unchanged (single
bit-exactness surface).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import digits
from ..fields import Field, get_field
from .specs import assert_block_legal, pallas_interpret

import os

DEFAULT_BATCH_TILE = int(os.environ.get("NTT_MXU_BT", "256"))

#: scoped-VMEM budget the tile solver fills (Mosaic limit 16MB; leave
#: headroom for Mosaic's own temporaries)
VMEM_BUDGET = 14 << 20

#: 256-bit MULTI-level kernels exceed the 16MB default scoped limit (the
#: AOT compile measured m=128 BLS at 18.19MB for Bt=64); v5e has 128MB
#: physical VMEM, so those kernels raise the Mosaic cap (harmless for
#: kernels under it) and budget against this instead. Env-tunable for
#: the chip A/B (a higher cap can trade against pipelining headroom).
VMEM_LIMIT_MULTI_MB = int(os.environ.get("NTT_VMEM_LIMIT_MB", "64"))
VMEM_BUDGET_MULTI_WIDE = (VMEM_LIMIT_MULTI_MB - 8) << 20

#: NTT_DIMSEM=parallel marks the (batch-tile) grid dimension parallel for
#: Mosaic — every kernel here writes disjoint output blocks per grid step,
#: so the semantics are valid; whether it changes the pipeline schedule on
#: the real chip is an A/B experiment (VERDICT r2 weak #3 candidates)
DIMSEM = os.environ.get("NTT_DIMSEM", "")


def compiler_params(n_grid: int = 1, vmem_limit_mb: int | None = None):
    """pltpu.CompilerParams for the disjoint-output batch grids;
    ``vmem_limit_mb`` raises the Mosaic scoped-VMEM cap (256-bit
    multi-level kernels). None -> Mosaic defaults."""
    kw = {}
    if DIMSEM == "parallel":
        kw["dimension_semantics"] = ("parallel",) * n_grid
    if vmem_limit_mb:
        kw["vmem_limit_bytes"] = vmem_limit_mb << 20
    return pltpu.CompilerParams(**kw) if kw else None


def vmem_batch_tile(field: Field, m: int, B: int, has_tw: bool = False,
                    multi: bool = False) -> int:
    """Largest power-of-two batch tile whose kernel working set (resident
    conv matrices + int32 Z + digit planes + double-buffered word tiles)
    fits the VMEM budget — makes m=64 bases (and the multi-level
    sub-NTT kernels, ``multi=True``) usable for 256-bit fields."""
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    W = field.n_words
    budget = VMEM_BUDGET
    if multi:
        # matrices are the small per-level bases (<= BASE); the Z plane
        # at any inner level is E*BASE*(m/BASE)*Bt*4 = E*m*Bt*4
        from ..transforms.mxu import BASE, base_sizes
        mat = sum(E * sz * D * sz for sz in base_sizes(m) if sz > 1)
    else:
        mat = E * m * D * m
    streams = 2 + (1 if has_tw else 0)  # in + out (+ twiddle), x2 buffered
    per_bt = E * m * 4 + D * m + streams * 2 * W * m * 4
    if multi and field.n_halves > 8 and m > BASE:
        # 256-bit MULTI-LEVEL peel (m > BASE; must mirror the
        # multi_vmem_limit_mb gate at the pallas_call): the plain model
        # under-counts the live halves-plane temporaries (recompose +
        # CIOS across two in-kernel levels). Calibrated against the
        # AOT-compiled footprint: m=128 BLS Bt=64 -> 18.19MB actual vs
        # 7.1MB modeled (x2.6); x4 for safety. Budget follows the
        # raised Mosaic cap. m == BASE wide kernels keep the proven
        # round-2 model + default cap.
        per_bt *= 4
        budget = VMEM_BUDGET_MULTI_WIDE
    bt = min(DEFAULT_BATCH_TILE, B)
    while bt > 8 and mat + bt * per_bt > budget:
        bt //= 2
    return max(1, bt)


def multi_vmem_limit_mb(field: Field) -> int | None:
    """Raised Mosaic VMEM cap for 256-bit multi-level kernels; None keeps
    the Mosaic default (the chip-proven narrow-field configuration)."""
    return VMEM_LIMIT_MULTI_MB if field.n_halves > 8 else None


def kernel_vmem_limit_mb(field: Field, m: int) -> int | None:
    """Mosaic scoped-VMEM cap for a wide-field kernel of transform
    length ``m``: 256-bit kernels above the default radix-32 base need
    the raised cap — both the multi-level peels (m > BASE) and the m=64
    bases under ``NTT_MXU_BASE_LOG=6``, whose folded conv matrix alone
    is 5.6MB and whose deep-twiddle variant measured 16.20MB scoped at
    Bt=256 (206KB over the 16MB Mosaic default — the round-4 radix-64
    probe's compile OOM at 2^22, TPU_CAMPAIGN_r4/base64_sweep.log).
    Narrow fields and radix-32 wide kernels keep the chip-proven
    default."""
    return VMEM_LIMIT_MULTI_MB if field.n_halves > 8 and m > 32 else None


def _kernel(*refs, field: Field, m: int, zmax_bits: int):
    from .. import limbs
    if digits.fold_active(field):
        x_ref, a_ref, f_ref, o_ref = refs
    else:
        x_ref, a_ref, o_ref = refs
        f_ref = None
    x = x_ref[:]                                   # [W, m, Bt]
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    Bt = x.shape[2]
    d = digits.extract_digits(x, field)            # [D, m, Bt] int8
    Z = jax.lax.dot_general(
        a_ref[:], d.reshape(D * m, Bt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)          # [E*m, Bt]
    # single-level kernel: the unrolled CIOS compiles fine and runs 2.45x
    # faster on chip (TPU_CAMPAIGN_r3/cios_unrolled.log)
    with limbs.fori_limb_loops(enabled=False):
        o_ref[:] = digits.recompose_reduce(
            Z.reshape(E, m, Bt), field, zmax_bits,
            fold_mat=f_ref[:] if f_ref is not None else None)


@functools.lru_cache(maxsize=None)
def _build(field_name: str, m: int, Bt: int, interpret: bool,
           f_shape=None):
    field = get_field(field_name)
    W = field.n_words
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    zmax_bits = (m * D * digits.DIGIT_MASK ** 2).bit_length()
    kern = functools.partial(_kernel, field=field, m=m, zmax_bits=zmax_bits)

    def call(x, A, F=None):
        B = x.shape[2]
        assert_block_legal((W, m, Bt), (W, m, B), "base_ntt_mxu x")
        assert_block_legal((E * m, D * m), (E * m, D * m), "base_ntt_mxu A")
        in_specs = [
            pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E * m, D * m), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = (x, A)
        if f_shape is not None:
            in_specs.append(pl.BlockSpec(f_shape, lambda j: (0, 0),
                                         memory_space=pltpu.VMEM))
            args += (F,)
        return pl.pallas_call(
            kern,
            grid=(B // Bt,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            interpret=interpret,
            compiler_params=compiler_params(
                vmem_limit_mb=kernel_vmem_limit_mb(field, m)),
        )(*args)

    return call


def base_ntt_mxu_pallas(x, field: Field, inverse: bool,
                        batch_tile: int | None = None, A=None, F=None):
    """m-point NTT along axis 1 of uint32[W, m, B] as one fused Pallas
    kernel (m <= 64; Montgomery form in/out). Pass the conv matrix ``A``
    (and, under digits.FOLD, the fold matrix ``F``) explicitly when
    calling under an outer jit (avoids constant embedding)."""
    W, m, B = x.shape
    if m == 1:
        return x
    if A is None:
        from ..transforms.mxu import _base_matrix
        A = _base_matrix(field, m, inverse)
    if F is None and digits.fold_active(field):
        from ..transforms.mxu import _fold_matrix
        F = _fold_matrix(field, m)
    Bt = batch_tile or vmem_batch_tile(field, m, B)
    assert B % Bt == 0, f"batch {B} must be divisible by tile {Bt}"
    interpret = pallas_interpret()
    f_shape = tuple(F.shape) if F is not None else None
    return _build(field.name, m, Bt, interpret, f_shape)(x, A, F)

"""Pallas kernel: fused multi-stage sub-NTT in VMEM.

The TPU equivalent of the reference's shared-memory stage-batched kernels —
bellperson ``FIELD_radix_fft_revised`` (/root/reference/src/GZKP-NTT.cu:
391-464) and the GZKP tile kernel (GZKP-NTT.cu:115-165): instead of one HBM
round trip per radix-2 stage (the ``naive`` ladder, GZKP-NTT.cu:59-113), a
whole batch tile is DMA'd to VMEM once and ALL log2(m) butterfly stages run
on the VPU against VMEM, with a small per-stage twiddle table held resident
(the pq[] table analog, GZKP-NTT.cu:487-511).

Layout: ``uint32[W, m, Bt]`` — the transform axis m lives on sublanes, the
batch tile Bt on the 128 lanes, so every butterfly is a full-width VPU op
and stage pairing is a static sublane reindex (no gather: the bit-reversal
permutation is applied by the caller as one XLA pass, mirroring the
reference's separate ``rearrange`` kernel, GZKP-NTT.cu:50-57).

The in-kernel field arithmetic IS ``ntt_tpu.limbs`` — the limb ops are pure
jnp on uint32 and trace into the kernel unchanged, so the Pallas and XLA
paths share one arithmetic implementation (one bit-exactness surface).

Prefetch overlap: the reference's parallel-load variant dedicates half of
each block to double-buffering the next round's twiddles
(/root/reference/src/parallel-load.cu:129-185). Here that overlap comes
from Pallas's pipelined grid: blocked BlockSpecs automatically
double-buffer the next tile's DMA against the current tile's compute.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import limbs
from ..fields import Field, get_field
from ..transforms.core import bit_reverse_axis1, twiddle_master
from .mxu_ntt import compiler_params, multi_vmem_limit_mb
from .specs import assert_block_legal, pallas_interpret

DEFAULT_BATCH_TILE = 128


def _stage_twiddles(field: Field, m: int, inverse: bool) -> list:
    """One uint32[W, m/2, 1] array per stage: the stage-s (s = 2^i) twiddles
    expanded to one entry per butterfly, laid out sublane-major to match the
    data tile (m on sublanes) so the in-kernel reshape [W, g, s, 1] is a pure
    sublane regroup — no lane<->sublane movement (Mosaic constraint)."""
    master = twiddle_master(field, m, inverse)  # [W, m/2]
    W, h = master.shape
    log_m = m.bit_length() - 1
    out = []
    s = 1
    for i in range(log_m):
        step = h // s
        stage = master[:, ::step][:, :s]            # [W, s]
        expanded = np.tile(stage, (1, h // s))[:, :h]  # [W, m/2]
        out.append(expanded.reshape(W, h, 1))
        s <<= 1
    return out


def _stages_body(x, tw_refs, field: Field, m: int):
    """All log2(m) DIT butterfly stages on a VMEM tile [W, m, Bt]."""
    W, _, Bt = x.shape
    log_m = m.bit_length() - 1
    s = 1
    for i in range(log_m):
        g = m // (2 * s)
        xr = x.reshape(W, g, 2, s, Bt)
        a = xr[:, :, 0]
        b = xr[:, :, 1]
        if i > 0:  # stage 0 twiddles are identically 1
            tw = tw_refs[i][:].reshape(W, g, s, 1)  # per-butterfly twiddles
            b = limbs.mont_mul(b, tw, field)
        lo = limbs.add_mod(a, b, field)
        hi = limbs.sub_mod(a, b, field)
        x = jnp.stack([lo, hi], axis=2).reshape(W, m, Bt)
        s <<= 1
    return x


def _kernel(*refs, field: Field, m: int):
    x_ref, tw_refs, o_ref = refs[0], refs[1:-1], refs[-1]
    with limbs.fori_limb_loops():
        o_ref[:] = _stages_body(x_ref[:], tw_refs, field, m)


def _kernel_fused(*refs, field: Field, m: int, has_tw: bool,
                  transpose_out: bool):
    """Stages + optional decomposition twiddle + optional transposed store
    — one fused four-step level on the VPU path (the analog of
    kernels/mxu_level.py for butterfly-ladder base transforms)."""
    if has_tw:
        x_ref, tw_refs, t_ref, o_ref = refs[0], refs[1:-2], refs[-2], refs[-1]
    else:
        x_ref, tw_refs, t_ref, o_ref = refs[0], refs[1:-1], None, refs[-1]
    with limbs.fori_limb_loops():
        y = _stages_body(x_ref[:], tw_refs, field, m)
        if t_ref is not None:
            y = limbs.mont_mul(y, t_ref[:], field)
    o_ref[:] = jnp.swapaxes(y, 1, 2) if transpose_out else y


@functools.lru_cache(maxsize=None)
def _build(field_name: str, m: int, Bt: int, interpret: bool):
    field = get_field(field_name)
    W = field.n_words
    log_m = m.bit_length() - 1
    kern = functools.partial(_kernel, field=field, m=m)
    tw_specs = [
        pl.BlockSpec((W, m // 2, 1), lambda j: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(log_m)
    ]

    def call(x, stage_tws):
        B = x.shape[2]
        assert_block_legal((W, m, Bt), (W, m, B), "vmem_ntt x")
        assert_block_legal((W, m // 2, 1), (W, m // 2, 1), "vmem_ntt tw")
        return pl.pallas_call(
            kern,
            grid=(B // Bt,),
            in_specs=[
                pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM),
                *tw_specs,
            ],
            out_specs=pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            interpret=interpret,
            # 256-bit ladder stages overflow the default scoped-VMEM cap
            # in compiler temporaries (AOT-found; tiny data tiles) — same
            # raised cap as the 256-bit multi-level MXU kernels
            compiler_params=compiler_params(
                vmem_limit_mb=multi_vmem_limit_mb(field)),
        )(x, *stage_tws)

    return call


@functools.lru_cache(maxsize=None)
def _build_fused(field_name: str, m: int, B: int, Bt: int, has_tw: bool,
                 transpose_out: bool, interpret: bool):
    field = get_field(field_name)
    W = field.n_words
    log_m = m.bit_length() - 1
    kern = functools.partial(_kernel_fused, field=field, m=m, has_tw=has_tw,
                             transpose_out=transpose_out)
    in_specs = [pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec((W, m // 2, 1), lambda j: (0, 0, 0),
                              memory_space=pltpu.VMEM)
                 for _ in range(log_m)]
    if has_tw:
        in_specs.append(pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                     memory_space=pltpu.VMEM))
    if transpose_out:
        out_spec = pl.BlockSpec((W, Bt, m), lambda j: (0, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (W, B, m)
    else:
        out_spec = pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                memory_space=pltpu.VMEM)
        out_shape = (W, m, B)

    def call(x, stage_tws, T3=None):
        args = (x, *stage_tws) + ((T3,) if has_tw else ())
        return pl.pallas_call(
            kern,
            grid=(B // Bt,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
            interpret=interpret,
            compiler_params=compiler_params(
                vmem_limit_mb=multi_vmem_limit_mb(field)),
        )(*args)

    return call


def fused_stage_level(x, field: Field, inverse: bool, T3=None,
                      transpose_out: bool = True,
                      batch_tile: int | None = None):
    """One fused four-step level on uint32[W, m, B] with the butterfly
    ladder as base: bit-reverse (XLA pass) + all stages in VMEM + optional
    full-resolution twiddle T3 [W, m, B] + optional transposed store."""
    W, m, B = x.shape
    if m == 1:
        return jnp.swapaxes(x, 1, 2) if transpose_out else x
    Bt = batch_tile or min(DEFAULT_BATCH_TILE, B)
    assert B % Bt == 0
    interpret = pallas_interpret()
    stage_tws = [jnp.asarray(t) for t in _stage_twiddles(field, m, inverse)]
    x = bit_reverse_axis1(x)
    call = _build_fused(field.name, m, B, Bt, T3 is not None, transpose_out,
                        interpret)
    return call(x, stage_tws, T3) if T3 is not None else call(x, stage_tws)


def ntt_along_axis_pallas(x, field: Field, inverse: bool = False,
                          batch_tile: int | None = None):
    """Natural-order NTT along axis 1 of uint32[W, m, B] (Montgomery in/out,
    no 1/n scaling) with all stages fused in one VMEM-resident Pallas kernel.

    Falls back to interpret mode off-TPU so CPU tests exercise the same
    kernel code path.
    """
    W, m, B = x.shape
    if m == 1:
        return x
    Bt = batch_tile or min(DEFAULT_BATCH_TILE, B)
    assert B % Bt == 0, f"batch {B} must be divisible by tile {Bt}"
    interpret = pallas_interpret()
    stage_tws = [jnp.asarray(t) for t in _stage_twiddles(field, m, inverse)]
    x = bit_reverse_axis1(x)
    return _build(field.name, m, Bt, interpret)(x, stage_tws)

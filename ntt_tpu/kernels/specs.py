"""Build-time Mosaic BlockSpec legality checks.

The Pallas CPU interpreter does not enforce TPU (Mosaic) tiling rules, so
a kernel whose BlockSpecs are illegal on TPU can pass the entire CPU test
suite and then die at lowering on the real chip (this shipped once: the
round-2 deep-level twiddle block ``(W, m, 8)`` over a 256-column array —
see VERDICT round 2, weak #1). Every kernel builder calls
:func:`assert_block_legal` on each of its BlockSpecs so the violation is
a CPU-side test failure instead of a TPU-only crash.

Mosaic rule (quoting the lowering error): the last two dimensions of a
block shape must be divisible by (8, 128) respectively, **or equal to the
corresponding dimension of the overall array**. Leading dimensions are
unconstrained.
"""

from __future__ import annotations

import os

SUBLANE = 8
LANE = 128


def pallas_interpret() -> bool:
    """Shared interpret-mode decision for every Pallas call site: the
    interpreter off-TPU (same kernel code CPU-tested / TPU-compiled),
    EXCEPT under ``NTT_FORCE_MOSAIC=1``, which forces the real Mosaic
    lowering path so that ``jax.export(..., platforms=['tpu'])`` on a
    CPU-only host exercises the full TPU lowering (tests/test_lowering.py
    — catches the a54494f bug class without a chip). Read live so tests
    can flip it per-case."""
    if os.environ.get("NTT_FORCE_MOSAIC") == "1":
        return False
    import jax
    return jax.default_backend() != "tpu"


def block_legal(block_shape, array_shape) -> bool:
    """True iff the (block, array) pair satisfies Mosaic's last-two-dims
    tiling rule. Rank-0/1 blocks are always scalar/vector-legal here (the
    kernels in this package never use them for tiled operands)."""
    if len(block_shape) != len(array_shape):
        return False
    if len(block_shape) < 2:
        return True
    reqs = (SUBLANE, LANE)
    for dim in (-2, -1):
        b, a = block_shape[dim], array_shape[dim]
        if b % reqs[dim] != 0 and b != a:
            return False
    return True


def assert_block_legal(block_shape, array_shape, what: str) -> None:
    """Raise at kernel-build (trace) time when a BlockSpec would fail
    Mosaic lowering — runs on every backend, including the CPU
    interpreter, so CPU tests catch TPU-only tiling bugs."""
    if not block_legal(tuple(block_shape), tuple(array_shape)):
        raise ValueError(
            f"Mosaic-illegal BlockSpec for {what}: block {tuple(block_shape)}"
            f" over array {tuple(array_shape)} — the last two block dims"
            f" must be divisible by ({SUBLANE}, {LANE}) or equal the"
            f" array dims")

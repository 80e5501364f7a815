"""Pallas remote-DMA all-to-all for the distributed four-step transpose.

The pod-scale analog of the reference's parallel-load overlap trick
(/root/reference/src/parallel-load.cu:129-185: half the block prefetches
the next round's data while the other half computes): instead of one
monolithic XLA `all_to_all`, each device STARTS one async remote DMA per
peer — every chunk is routed by the ICI hardware concurrently — and only
then waits, so all D-1 transfers overlap each other (and any compute the
scheduler places between start and wait).

SPMD structure (the canonical offset-symmetric pattern from the public
JAX distributed-Pallas tutorial, SNIPPETS.md [2]): at loop offset ``o``
device ``me`` sends the row block destined for peer ``t = (me+o) % D``
directly into t's output at column block ``me`` — by symmetry the
transfer arriving at ``me`` with semaphore index ``o`` is the one from
``(me-o) % D``, so starting D ops then waiting D ops is deadlock-free
with no central coordinator.

Semantics match ``jax.lax.all_to_all(C, axis, split_axis=1,
concat_axis=2, tiled=True)`` bit-exactly (tested on the CPU mesh via the
TPU interpret mode, tests/test_parallel.py)::

    out[:, i1l, s*n2_loc + j] = C_on_device_s[:, me*n1_loc + i1l, j]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .specs import pallas_interpret


def _a2a_kernel(c_ref, o_ref, send_sem, recv_sem, *, axis: str, D: int):
    me = lax.axis_index(axis)

    # Barrier: every device signals every peer once (including itself) and
    # waits for D arrivals — no remote write may start before its target
    # has entered the kernel (buffer-liveness hazard).
    barrier = pltpu.get_barrier_semaphore()
    for d in range(D):
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=(jnp.int32(d),),
            device_id_type=pltpu.DeviceIdType.MESH)
    pltpu.semaphore_wait(barrier, D)

    # Both refs are FLAT [W, n1*n2_loc]: each peer's rows-block is one
    # contiguous lane range of length ``chunk`` = n1_loc*n2_loc, so every
    # DMA slice is a lane slice at a 128-aligned offset/extent — Mosaic
    # rejects any sliced memref whose lane extent is not a multiple of
    # 128 (the original [:, :, ds(me*n2_loc, n2_loc)] column slice and a
    # 4-D leading-dim variant both fail compile at small shards; caught
    # by the AOT TPU compile, tools/tpucompile.py).
    chunk = c_ref.shape[1] // D
    ops = []
    for o in range(D):
        t = lax.rem(me + o, D)  # target peer at this offset
        copy = pltpu.make_async_remote_copy(
            src_ref=c_ref.at[:, pl.ds(t * chunk, chunk)],
            dst_ref=o_ref.at[:, pl.ds(me * chunk, chunk)],
            send_sem=send_sem.at[o],
            recv_sem=recv_sem.at[o],
            device_id=(t,),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        copy.start()
        ops.append(copy)
    for copy in ops:
        # wait(): local send done + the symmetric incoming chunk landed
        copy.wait()


@functools.lru_cache(maxsize=None)
def _build(axis: str, D: int, W: int, flat: int, interpret: bool):
    kern = functools.partial(_a2a_kernel, axis=axis, D=D)
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((W, flat), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((D,)),
                        pltpu.SemaphoreType.DMA((D,))],
        compiler_params=pltpu.CompilerParams(collective_id=7),
        interpret=(pltpu.InterpretParams() if interpret else False),
    )


def a2a_transpose(C, axis: str, D: int):
    """Inside shard_map: C uint32[W, n1, n2_loc] per device -> the
    four-step exchange output uint32[W, n1/D, n2_loc*D], bit-identical to
    the tiled XLA all_to_all (split_axis=1, concat_axis=2).

    The kernel moves contiguous flat peer chunks (lane slices at
    128-aligned offsets); the reshapes to/from that layout live OUTSIDE
    the kernel, in XLA, where any relayout is legal. Mosaic's DMA slicer
    requires chunk = (n1/D)*(n2/D) to be a multiple of 128, i.e.
    n >= 128*D^2 — every production scale qualifies; tiny test shards
    run under the interpreter only."""
    W, n1, n2_loc = C.shape
    n1_loc = n1 // D
    chunk = n1_loc * n2_loc
    interpret = pallas_interpret()
    if not interpret and chunk % 128:
        raise ValueError(
            f"exchange='pallas' needs per-peer chunks of a multiple of "
            f"128 lanes (Mosaic DMA slice alignment); got "
            f"(n1/D)*(n2/D) = {chunk} — use n >= 128*D^2 or the "
            f"all_to_all/ring exchange")
    c2 = C.reshape(W, n1 * n2_loc)
    y2 = _build(axis, D, W, n1 * n2_loc, interpret)(c2)
    # y2[:, s*chunk + i1l*n2_loc + j] = C_on_device_s[:, me*n1_loc+i1l, j]
    y4 = y2.reshape(W, D, n1_loc, n2_loc)
    return jnp.moveaxis(y4, 1, 2).reshape(W, n1_loc, D * n2_loc)

"""Multi-chip four-step NTT: shard_map + one all-to-all over the mesh.

This is the pod-scale dimension the reference does not have (SURVEY.md §2.3:
"no distributed backend of any kind"). The single-chip four-step transform
(ntt_tpu.transforms.fourstep) maps onto a 1-D device mesh as:

    input  A[i1, i2]   sharded on i2   (columns distributed)
    1. column NTTs over i1             -> fully local
    2. decomposition-twiddle multiply  -> local (device-dependent part is a
                                          rank-1 correction generated from
                                          the device index, see below)
    3. all-to-all                      -> THE one collective: the four-step
                                          transpose rides ICI as a single
                                          jax.lax.all_to_all (the TPU-native
                                          realization of SSIP stage 2's
                                          mirrored-pair exchange,
                                          /root/reference/src/GZKP-NTT.cu:
                                          1437-1447)
    4. local transpose + row NTTs      -> fully local
    output D'[k2, k1]  sharded on k1

Twiddle correction under sharding: T[k1, i2] = ω^{k1·i2} with i2 = off +
j, off = device_index * n2_local, factors as

    T = ω^{k1·j} (static, identical on every device)  ∘  (ω^{off})^{k1}

The per-device column vector (ω^{off})^{k1} is generated on device by
log-doubling from a base selected out of a tiny static table by the traced
device index, so no data-sized twiddle is ever materialized on host or
communicated.

Limbs stay limb-major and unsharded (the W axis is tiny); coefficients are
sharded — each device holds contiguous columns of every limb plane, so the
all-to-all moves contiguous blocks (BASELINE.json north star).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import limbs
from ..fields import Field
from ..transforms.core import (host_powers, ntt_along_axis, power_matrix,
                               split_log)

AXIS = "ntt"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    """1-D mesh over `axis`. For a non-power-of-two device count the mesh
    is factored as (replica, axis) with the axis dimension the largest
    power of two dividing the count — the transform parallelism needs
    n2 % axis_size == 0, and extra devices become a replica/data axis."""
    devices = jax.devices() if devices is None else devices
    d = len(devices)
    ntt_size = d & (-d)  # largest power of two dividing d
    if ntt_size == d:
        return Mesh(np.asarray(devices), (axis,))
    return Mesh(np.asarray(devices).reshape(d // ntt_size, ntt_size),
                ("replica", axis))


def _axis_size(mesh: Mesh, axis: str = AXIS) -> int:
    return mesh.shape[axis]


def exchange_options(n: int, mesh: Mesh) -> dict:
    """Which transpose exchanges are eligible at this (n, mesh), and why.

    The Pallas remote-DMA all-to-all has a scale contract (Mosaic DMA
    slices must be 128-lane aligned, so the per-peer chunk
    (n1/D)*(n2/D) must be a multiple of 128 — n >= 128*D^2 on a 1-D
    mesh); previously it lived only in a kernels/exchange.py docstring
    and an ineligible request surfaced as a trace-time error. This
    reports each exchange's eligibility up front so callers can see
    what scale would unlock the overlapped-DMA path instead of
    silently defaulting to all_to_all.

    Returns {exchange_name: {"eligible": bool, "why": str}}.
    """
    D = _axis_size(mesh)
    n1, n2 = split_log(n)
    # the shard contract (make_dist_ntt) is n1 % D == n2 % D == 0; check
    # it here too so the eligibility bit (and the floor-division chunk)
    # can't silently be wrong on a mesh that doesn't divide the split
    # (ADVICE round 4)
    divides = n1 % D == 0 and n2 % D == 0
    chunk = (n1 // D) * (n2 // D) if divides else 0
    one_d = len(mesh.axis_names) == 1
    if not one_d:
        why = (f"needs a 1-D mesh (got axes {mesh.axis_names}): the "
               "remote-DMA kernel addresses peers by single-coordinate "
               "device id and shares one barrier across the axis")
    elif not divides:
        why = (f"mesh size D={D} must divide both split factors "
               f"(n1={n1}, n2={n2}) — the four-step shard layout itself "
               "is ineligible here, not just the pallas exchange")
    elif chunk % 128 or chunk == 0:
        need = 128 * D * D
        n2x = (f"2^{need.bit_length() - 1}" if need & (need - 1) == 0
               else str(need))
        why = (f"per-peer chunk (n1/D)*(n2/D) = {chunk} is not a "
               f"multiple of 128 (Mosaic DMA slice alignment): needs "
               f"n >= 128*D^2 = {need} ({n2x}) at D={D}")
    else:
        why = "remote-DMA a2a: all peer chunks in flight concurrently"
    return {
        "all_to_all": {"eligible": True,
                       "why": "monolithic XLA collective, any mesh"},
        "ring": {"eligible": True,
                 "why": f"{D - 1} ppermute steps, any mesh"},
        "pallas": {"eligible": (one_d and divides and chunk > 0
                                and chunk % 128 == 0),
                   "why": why},
    }


def shard_for_ntt(x, field: Field, mesh: Mesh, axis: str = AXIS):
    """Place a replicated/host uint32[W, n] array into the distributed
    four-step layout: uint32[W, n1, n2] with i2 (axis 2) sharded."""
    W, n = x.shape
    n1, n2 = split_log(n)
    xm = x.reshape(W, n1, n2)
    return jax.device_put(xm, NamedSharding(mesh, P(None, None, axis)))


def unshard(y) -> jnp.ndarray:
    """Gather a distributed output [W, n2, n1] back to a flat natural-order
    host-side [W, n] array (X[k2*n1 + k1] = y[:, k2, k1])."""
    W = y.shape[0]
    return jax.device_get(y).reshape(W, -1)


def _axis_fn(algorithm: str):
    """Local per-device sub-NTT implementation (the 'base transform' of
    the distributed four-step): jnp stage ladder, Pallas VMEM kernel, or
    the MXU digit-matmul paths. Returns ``fn(x, field, inverse, mats)``;
    the MXU variants consume ``mats`` — conv matrices plumbed through
    shard_map as replicated ARGUMENTS (the aux protocol): embedding the
    MB-scale 256-bit matrices as trace constants bloats/OOMs compiles,
    which is what kept the round-2 distributed 256-bit path off the MXU
    (VERDICT round 2, weak #5)."""
    if algorithm == "jnp":
        # recurse above the ladder sweet spot (m=1024+ ladders fall off an
        # XLA relayout cliff; see fourstep.BASE_MAX) — twiddles generated
        # on device inside shard_map
        from ..transforms.fourstep import (BASE_MAX, _base_jnp,
                                           ntt_axis_fourstep)
        return lambda x, field, inverse, mats=None: ntt_axis_fourstep(
            x, field, inverse, _base_jnp, BASE_MAX)
    if algorithm == "pallas":
        # per-field cap, not a literal: wide (16-half) fields run the
        # ladder at m<=64 — larger unrolled VMEM stage kernels overflow
        # the scoped-VMEM budget / compile impractically slowly
        # (fourstep.pallas_base_max note)
        from ..transforms.fourstep import (_base_pallas, ntt_axis_fourstep,
                                           pallas_base_max)
        return lambda x, field, inverse, mats=None: ntt_axis_fourstep(
            x, field, inverse, _base_pallas,
            base_max=pallas_base_max(field))
    if algorithm == "mxu":
        from ..transforms.mxu import ntt_axis_mxu
        return lambda x, field, inverse, mats=None: ntt_axis_mxu(
            x, field, inverse=inverse, mats=mats)
    if algorithm == "mxu_sub":
        # the production path as the per-device sub-NTT: whole multi-
        # level sub-transforms per Pallas kernel, any field width
        # (decomposition twiddles are device-generated inside the trace;
        # conv matrices arrive via ``mats``)
        from ..transforms.mxu import ntt_mxu_sub
        return lambda x, field, inverse, mats=None: ntt_mxu_sub(
            x, field, inverse, tws=None, mats=mats)
    raise ValueError(f"unknown local algorithm {algorithm!r}")


def _local_mats(algorithm: str, field: Field, n1: int, n2: int, inverse):
    """Conv matrices every local transform size needs, as a (sizes,
    arrays) pair for replicated shard_map arguments. None for non-MXU
    algorithms."""
    if algorithm not in ("mxu", "mxu_sub"):
        return None
    from ..transforms.mxu import base_mats, sub_mats
    md = {}
    for sz in {n1, n2}:
        md.update(sub_mats(field, sz, inverse) if algorithm == "mxu_sub"
                  else base_mats(field, sz, inverse))
    sizes = tuple(sorted(md))
    return sizes, tuple(md[s] for s in sizes)


def _device_scalar(table, field: Field):
    """Select this device's entry from a static [W, D] Montgomery table ->
    [W, 1, 1] broadcastable scalar."""
    idx = jax.lax.axis_index(AXIS)
    return jax.lax.dynamic_slice_in_dim(table, idx, 1, axis=1)[:, :, None]


def _ring_transpose(C, n1: int, n2: int, n2_loc: int):
    """The four-step transpose as D-1 neighbor ppermute steps instead of
    one monolithic all_to_all: device d picks its n1-chunk out of each
    buffer revolution and places it at the source's column block. On a
    ring interconnect this exposes per-step overlap opportunities (the
    XLA-collective analog of a Pallas make_async_remote_copy ring,
    SNIPPETS.md pattern [2]); on a 1-hop-all-to-all fabric the single
    collective is usually better — hence an option, not the default."""
    D = n2 // n2_loc  # static axis size
    me = jax.lax.axis_index(AXIS)
    W = C.shape[0]
    n1_loc = n1 // D
    out = jnp.zeros((W, n1_loc, n2), dtype=C.dtype)
    perm = [(i, (i + 1) % D) for i in range(D)]

    def body(s, carry):
        buf, out = carry
        src = (me - s) % D
        take = jax.lax.dynamic_slice_in_dim(buf, me * n1_loc, n1_loc, axis=1)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, take, src * n2_loc, axis=2)
        buf = jax.lax.ppermute(buf, AXIS, perm)
        return buf, out

    _, out = jax.lax.fori_loop(0, D, body, (C, out))
    return out


def _local_step(xb, idx_base, coset, mats, field: Field, n1: int, n2: int,
                n2_loc: int, omega: int, inverse: bool, n_inv: int | None,
                algorithm: str = "jnp", exchange: str = "all_to_all"):
    """Per-device body (inside shard_map). xb: uint32[W, n1, n2_loc].

    ``coset``: None, or (local_table [W, n1, n2_loc], device_base [W, D]) —
    the coset power c^{index} factored as a replicated local table times a
    device-dependent scalar (forward: index = i1*n2 + off + j over inputs;
    inverse: index over outputs with c^{-1}). Applied pre-transform on the
    forward pass and post-transform on the inverse pass (BASELINE.json
    config 4 at pod scale).

    ``mats``: None, or {size: conv matrix} for the MXU local algorithms —
    replicated shard_map arguments, never trace constants."""
    ntt_axis = _axis_fn(algorithm)
    if coset is not None and not inverse:
        xb = limbs.mont_mul(xb, coset[0], field)
        xb = limbs.mont_mul(xb, _device_scalar(coset[1], field), field)
    # 1. column NTTs over i1 (local)
    B = ntt_axis(xb, field, inverse, mats)

    # 2. decomposition twiddle: static part ω^{k1·j} ...
    Ts = power_matrix(field, omega, n1, n2_loc)
    C = limbs.mont_mul(B, Ts, field)
    # ... times the device-dependent rank-1 part (ω^{off})^{k1}:
    # idx_base[:, d] = ω^{d·n2_loc} in Montgomery form (static table),
    # selected by the traced device index, then powered along k1 by
    # log-doubling.
    idx = jax.lax.axis_index(AXIS)
    base = jax.lax.dynamic_slice_in_dim(idx_base, idx, 1, axis=1)  # [W, 1]
    col = limbs.const_planes(field.R, field, 2) + jnp.zeros(
        (field.n_words, 1, 1), jnp.uint32)  # [W, 1(=k1), 1] value 1
    mult = base[:, :, None]  # [W, 1, 1]
    k = 1
    while k < n1:
        grow = min(k, n1 - k)
        col = jnp.concatenate(
            [col, limbs.mont_mul(col[:, :grow], mult, field)], axis=1)
        if 2 * k < n1:
            mult = limbs.mont_sqr(mult, field)
        k *= 2
    C = limbs.mont_mul(C, col, field)  # broadcast over axis 2

    # 3. the transpose collective: [W, n1, n2_loc] -> [W, n1_loc, n2]
    if exchange == "ring":
        Ca = _ring_transpose(C, n1, n2, n2_loc)
    elif exchange == "pallas":
        # Pallas remote-DMA a2a: all peer chunks in flight concurrently
        # (kernels/exchange.py — the pod-scale parallel-load equivalent)
        from ..kernels.exchange import a2a_transpose
        Ca = a2a_transpose(C, AXIS, n2 // n2_loc)
    else:
        Ca = jax.lax.all_to_all(C, AXIS, split_axis=1, concat_axis=2,
                                tiled=True)

    # 4. local transpose + row NTTs over i2
    Ct = jnp.transpose(Ca, (0, 2, 1))  # [W, n2, n1_loc]
    D = ntt_axis(Ct, field, inverse, mats)

    if n_inv is not None:
        c = limbs.const_planes(field.to_mont_int(n_inv), field, 2)
        D = limbs.mont_mul(D, c, field)
    if coset is not None and inverse:
        D = limbs.mont_mul(D, coset[0], field)
        D = limbs.mont_mul(D, _device_scalar(coset[1], field), field)
    return D


def make_dist_ntt(field: Field, n: int, mesh: Mesh, inverse: bool = False,
                  mont_io: bool = True, algorithm: str = "jnp",
                  coset_shift: int | None = None,
                  exchange: str = "all_to_all", donate: bool = False):
    """Build a jitted distributed NTT for (field, n, mesh).

    Takes uint32[W, n1, n2] sharded P(None, None, 'ntt') (see
    :func:`shard_for_ntt`), returns uint32[W, n2, n1] sharded
    P(None, None, 'ntt') holding X[k2*n1 + k1] at [:, k2, k1].
    Montgomery-form I/O by default; ``mont_io=False`` adds conversion
    passes. ``coset_shift`` evaluates on the coset shift·<ω_n> (the inverse
    transform interpolates from that coset, including the 1/n scaling).
    ``donate=True`` gives XLA the (sharded) input buffer for in-place
    reuse — per-chip peak HBM matters most exactly at pod-scale sizes
    (the single-buffer discipline of the reference SSIP,
    /root/reference/src/GZKP-NTT.cu:1452-1558).
    """
    from ..fields import inv_mod
    from ..transforms.core import host_powers_fast

    n1, n2 = split_log(n)
    D = _axis_size(mesh)
    if exchange == "pallas":
        # Fail at BUILD time with the eligibility report (the Mosaic
        # chunk-alignment contract otherwise surfaces as a trace-time
        # error on first call — see exchange_options). The mesh-shape
        # constraint holds even under the interpreter: on a factored
        # (replica, ntt) mesh the kernel would mis-address peers and
        # replica groups would collide on the shared barrier
        # (collective_id=7; ADVICE round 2, medium). The 128-lane chunk
        # alignment is Mosaic-only, so interpreted (CPU) runs skip it.
        from ..kernels.specs import pallas_interpret
        opt = exchange_options(n, mesh)["pallas"]
        if len(mesh.axis_names) != 1 or (
                not opt["eligible"] and not pallas_interpret()):
            raise ValueError(
                f"exchange='pallas' unavailable at n={n}, "
                f"D={_axis_size(mesh)}: {opt['why']}; use "
                "exchange='all_to_all' or 'ring'")
    assert n2 % D == 0, f"n2={n2} must be divisible by '{AXIS}' axis size {D}"
    n2_loc = n2 // D
    n1_loc = n1 // D
    omega = field.inv_root_of_unity(n) if inverse else field.root_of_unity(n)
    # static per-device base table: ω^{d·n2_loc}, d < D
    idx_base = jnp.asarray(host_powers(field, pow(omega, n2_loc, field.p), D))
    n_inv = inv_mod(n, field.p) if inverse else None

    coset = None
    if coset_shift is not None:
        if not inverse:
            # pre-multiply inputs by c^{i1*n2 + off + j}: local table
            # c^{i1*n2 + j} (identical on every device) x device scalar
            # c^{d*n2_loc}
            c = coset_shift % field.p
            pw = host_powers_fast(field, c, (n1 - 1) * n2 + n2_loc)
            idxm = (np.arange(n1)[:, None] * n2 + np.arange(n2_loc)[None, :])
            local = jnp.asarray(np.ascontiguousarray(pw[:, idxm]))
            dev = jnp.asarray(host_powers_fast(
                field, pow(c, n2_loc, field.p), D))
        else:
            # post-multiply outputs [W, k2, k1_loc] by ci^{k2*n1 + off + k1}
            ci = inv_mod(coset_shift, field.p)
            pw = host_powers_fast(field, ci, (n2 - 1) * n1 + n1_loc)
            idxm = (np.arange(n2)[:, None] * n1 + np.arange(n1_loc)[None, :])
            local = jnp.asarray(np.ascontiguousarray(pw[:, idxm]))
            dev = jnp.asarray(host_powers_fast(
                field, pow(ci, n1_loc, field.p), D))
        coset = (local, dev)

    body = functools.partial(
        _local_step, field=field, n1=n1, n2=n2, n2_loc=n2_loc,
        omega=omega, inverse=inverse, n_inv=n_inv, algorithm=algorithm,
        exchange=exchange)

    lm = _local_mats(algorithm, field, n1, n2, inverse)
    mat_sizes, mat_args = lm if lm else ((), ())
    n_mats = len(mat_args)

    spec = P(None, None, AXIS)
    mat_specs = (P(None, None),) * n_mats  # replicated conv matrices
    coset_specs = (P(None, None, None), P(None, None)) if coset else ()

    def wrapped(xb, tb, *rest):
        ms = rest[:n_mats]
        cs = rest[n_mats:]
        mats = dict(zip(mat_sizes, ms)) if n_mats else None
        return body(xb, tb, cs if cs else None, mats)

    mapped = jax.shard_map(
        wrapped,
        mesh=mesh, in_specs=(spec, P(None, None)) + mat_specs + coset_specs,
        out_specs=spec,
        check_vma=False,
    )

    def run(x, *rest):
        if not mont_io:
            x = limbs.to_mont(x, field)
        y = mapped(x, *rest)
        if not mont_io:
            y = limbs.from_mont(y, field)
        return y

    # tables enter the jit as ARGUMENTS at call time (closing over them
    # would embed device constants — the exact compile bloat the aux
    # protocol exists to avoid, api.get_runner)
    jitted = jax.jit(run, donate_argnums=(0,) if donate else ())
    rest_args = (idx_base,) + mat_args + (tuple(coset) if coset else ())
    return lambda x: jitted(x, *rest_args)


_dist_cache: dict = {}


def _get(field: Field, n: int, mesh: Mesh, inverse: bool, mont_io: bool,
         algorithm: str = "jnp", exchange: str = "all_to_all"):
    # Mesh is hashable by value (devices + axis names), so keying on the
    # mesh itself can't alias two configs the way id() could after GC reuse.
    key = (field.name, n, mesh, inverse, mont_io, algorithm, exchange)
    if key not in _dist_cache:
        _dist_cache[key] = make_dist_ntt(field, n, mesh, inverse, mont_io,
                                         algorithm, exchange=exchange)
    return _dist_cache[key]


def dist_ntt(x_sharded, field: Field, mesh: Mesh, n: int,
             mont_io: bool = True, algorithm: str = "jnp",
             exchange: str = "all_to_all"):
    return _get(field, n, mesh, False, mont_io, algorithm,
                exchange)(x_sharded)


def dist_intt(x_sharded, field: Field, mesh: Mesh, n: int,
              mont_io: bool = True, algorithm: str = "jnp",
              exchange: str = "all_to_all"):
    return _get(field, n, mesh, True, mont_io, algorithm,
                exchange)(x_sharded)


def dist_lde(x_sharded, field: Field, mesh: Mesh, n: int, blowup: int = 4,
             shift: int | None = None, algorithm: str = "jnp"):
    """Distributed low-degree extension (BASELINE config 4 at pod scale):
    interpolate the n sharded evaluations, zero-pad the coefficients to
    blowup*n, and evaluate on the coset domain — the inter-stage re-layout
    is one GSPMD resharding.

    Input: uint32[W, n1, n2] Montgomery form sharded P(None, None, 'ntt')
    (see shard_for_ntt for size n). Output: the coset evaluations in the
    same distributed four-step layout for size N = blowup*n, i.e.
    uint32[W, N2, N1] sharded on the last axis, value X[k2*N1 + k1].
    """
    shift = field.generator if shift is None else shift
    N = blowup * n
    W = field.n_words
    n1p, n2p = split_log(N)
    D = _axis_size(mesh)
    assert n2p % D == 0

    coeffs = _get(field, n, mesh, True, True, algorithm)(x_sharded)
    # coeffs: [W, n2, n1] sharded on k1, natural order when flattened

    spec = NamedSharding(mesh, P(None, None, AXIS))

    def expand(y):
        flat = y.reshape(W, n)
        padded = jnp.concatenate(
            [flat, jnp.zeros((W, N - n), dtype=jnp.uint32)], axis=1)
        return padded.reshape(W, n1p, n2p)

    expanded = jax.jit(expand, out_shardings=spec)(coeffs)
    fwd = make_dist_ntt(field, N, mesh, inverse=False, mont_io=True,
                        algorithm=algorithm, coset_shift=shift)
    return fwd(expanded)

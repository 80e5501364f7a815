"""Component micro-benchmarks on the live backend.

Times each building block of the flagship transform in isolation with the
same in-graph chained-repeat protocol as bench.py, to attribute wall-clock
between MXU matmul, VPU Montgomery ops, reduction, and relayout.

Usage: python tools/microbench.py [logn] [field]
       python tools/microbench.py knockout [logn] [field] [m]

``knockout`` runs the fused-level isolation experiment (VERDICT r2 item
4): the production kernel truncated after each pipeline stage, timed on
the same tile session, so the per-stage deltas attribute the kernel's
time between HBM stream, digit extract, MXU matmul, Montgomery reduce,
and twiddle — locating the stall by measurement.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def _sync(y):
    """Fetch ONE element to host (device-side slice first — fetching the
    full array through the axon tunnel costs ~100ms+ and swamps timings)."""
    leaf = jax.tree.leaves(y)[0]
    np.asarray(jax.jit(lambda v: v.ravel()[:1])(leaf))


_floor = [0.0]  # measured dispatch round-trip (tunnel latency), subtracted


#: target in-graph work per timed call: must dwarf the ±~100ms tunnel
#: floor jitter or every cheap op measures as noise (negative values seen
#: with fixed chain=32)
_TARGET_S = 1.5


def _measure(make_looped, args, probe_chain=32, reps=5):
    """Two-phase: estimate per-iter with a probe chain, then re-time with
    a chain sized for ~_TARGET_S of work; median over reps. ``args`` are
    passed to the jitted loop as ARGUMENTS (closing over data-sized
    arrays would embed them as constants — docs/DESIGN.md)."""
    looped = make_looped(probe_chain)
    _sync(looped(*args))  # compile + first
    t0 = time.time()
    _sync(looped(*args))
    est = max((time.time() - t0 - _floor[0]) / probe_chain, 1e-6)
    chain = int(min(8192, max(probe_chain, _TARGET_S / est)))
    if chain != probe_chain:
        looped = make_looped(chain)
        _sync(looped(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        _sync(looped(*args))
        ts.append((time.time() - t0 - _floor[0]) / chain)
    return float(np.median(ts))


def timeit(name, fn, x, chain=32, reps=5):
    """Time fn per-iteration, floor-subtracted, with auto-scaled chain."""
    per = _measure(lambda c: jax.jit(
        lambda v: jax.lax.fori_loop(0, c, lambda i, z: fn(z), v)),
        (x,), probe_chain=chain, reps=reps)
    print(f"{name:38s} {per*1e3:9.3f} ms")
    return per


def calibrate_floor(x):
    tiny = jax.jit(lambda v: v + np.uint32(1))
    y = tiny(x)
    _sync(y)
    samples = []
    for _ in range(9):
        t0 = time.time()
        _sync(tiny(x))
        samples.append(time.time() - t0)
    _floor[0] = float(np.median(samples))
    print(f"# dispatch floor: {_floor[0]*1e3:.1f} ms "
          f"(spread {min(samples)*1e3:.0f}-{max(samples)*1e3:.0f})")


def knockout():
    log_n = int(sys.argv[2]) if len(sys.argv) > 2 else 18
    field_name = sys.argv[3] if len(sys.argv) > 3 else "bls12-381-fr"
    import ntt_tpu as nt
    from ntt_tpu import limbs
    from ntt_tpu.kernels.mxu_level import PROBE_STAGES, fused_level_probe
    from ntt_tpu.transforms import mxu
    from ntt_tpu.transforms.core import host_power_matrix

    field = nt.get_field(field_name)
    m = int(sys.argv[4]) if len(sys.argv) > 4 else mxu.BASE
    n = 1 << log_n
    W = field.n_words
    B = n // m
    print(f"# knockout backend={jax.devices()[0].device_kind} n=2^{log_n} "
          f"field={field.name} m={m}")

    def make_input():
        i = jnp.arange(n, dtype=jnp.uint32)
        planes = [i] + [jnp.zeros(n, jnp.uint32)] * (W - 1)
        return limbs.to_mont(jnp.stack(planes, axis=0), field).reshape(
            W, m, B)

    x = jax.jit(make_input)()
    x.block_until_ready()
    calibrate_floor(x)
    A = mxu._base_matrix(field, m, False)
    T = jnp.asarray(host_power_matrix(
        field, field.root_of_unity(n), m, B))

    prev = 0.0
    for stage in PROBE_STAGES:
        def fn(v, a, t, stage=stage):
            return fused_level_probe(
                v, field, a, stage, T3=t if stage == "tw" else None)
        per = _measure(lambda c: jax.jit(
            lambda v, a, t: jax.lax.fori_loop(
                0, c, lambda i, z: (fn(z[0], z[1], z[2]), z[1], z[2]),
                (v, a, t))[0]),
            (x, A, T), probe_chain=16)
        print(f"{stage:12s} {per*1e3:9.3f} ms   (+{(per-prev)*1e3:8.3f})")
        prev = per

    # the round-5 twiddle MATRIX-FOLD level at the same geometry: the
    # level-0 production stack (m entries, rep = B/m). Its delta vs the
    # 'reduce' row is the marginal cost of streaming the stack; vs the
    # 'tw' row, the per-level saving of the fold.
    if B % m == 0 and (B // m) % 128 == 0:
        from ntt_tpu.kernels.mxu_level import fused_level_stack
        s0 = B // m
        w = field.root_of_unity(n)
        tvals = [[pow(w, k * a * s0, field.p) for k in range(m)]
                 for a in range(m)]
        As = jnp.asarray(mxu.twiddle_matrix_stack(field, m, False, tvals))
        per = _measure(lambda c: jax.jit(
            lambda v, a, t: jax.lax.fori_loop(
                0, c, lambda i, z: (fused_level_stack(
                    z[0], field, z[1], rep=s0), z[1], z[2]),
                (v, a, t))[0]),
            (x, As, T), probe_chain=16)
        print(f"{'stack':12s} {per*1e3:9.3f} ms   "
              f"(vs tw {prev*1e3:.3f})")


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "knockout":
        knockout()
        return
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    field_name = sys.argv[2] if len(sys.argv) > 2 else "bls12-381-fr"

    import ntt_tpu as nt
    from ntt_tpu import digits, limbs
    from ntt_tpu.transforms import core, mxu

    field = nt.get_field(field_name)
    n = 1 << log_n
    W = field.n_words
    print(f"# backend={jax.devices()[0].device_kind} n=2^{log_n} "
          f"field={field.name}")

    def make_input():
        i = jnp.arange(n, dtype=jnp.uint32)
        planes = [i] + [jnp.zeros(n, jnp.uint32)] * (W - 1)
        return limbs.to_mont(jnp.stack(planes, axis=0), field)

    x = jax.jit(make_input)()
    x.block_until_ready()
    calibrate_floor(x)

    m = 64
    B = n // m
    xt = x.reshape(W, m, B)

    # 1. one elementwise mont_mul over the full vector (the twiddle cost)
    timeit("mont_mul (full vector, VPU)", lambda v: limbs.mont_mul(
        v, v, field), x)

    # 2. one add_mod
    timeit("add_mod (full vector, VPU)", lambda v: limbs.add_mod(
        v, v, field), x)

    # 3. digit extraction only
    def extract(v):
        d = digits.extract_digits(v, field)
        return jnp.stack([d.astype(jnp.uint32).sum(0) & np.uint32(0xFF)] * W,
                         0) + v  # keep shape for chaining

    timeit("extract_digits (+fold, VPU)", extract, x)

    # 4. one full base-64 MXU matmul level incl. reduce
    timeit("base64 matmul level (MXU+reduce)", lambda v: mxu._base_ntt(
        v, field, False), xt)

    # 5. one radix-2 dit stage (fourstep's per-stage cost)
    master = jnp.asarray(core.twiddle_master(field, m, False))
    timeit("dit_stage s=32 over [64, B]", lambda v: core.dit_stage(
        v, 32, master[:, :32], field), xt)

    # 6. transpose/relayout cost
    timeit("moveaxis relayout", lambda v: jnp.moveaxis(
        v.reshape(W, m, B), 2, 1).reshape(W, m, B), xt)

    # 6b. mxu_chunked level attribution: the production path's per-level
    # pipeline is pallas_base -> twiddle mont_mul -> swapaxes; time each
    # piece on level-1 shapes (data-sized twiddle passed as a loop-carried
    # arg, never a closed-over constant)
    mb = mxu.BASE
    xb = x.reshape(W, mb, n // mb)
    Ab = mxu._base_matrix(field, mb, False)

    def timeit_arg(name, fn, xv, arg, chain=32, reps=5):
        per = _measure(lambda c: jax.jit(
            lambda v, a: jax.lax.fori_loop(
                0, c, lambda i, z: (fn(z[0], z[1]), z[1]), (v, a))[0]),
            (xv, arg), probe_chain=chain, reps=reps)
        print(f"{name:38s} {per*1e3:9.3f} ms")
        return per

    timeit_arg(f"pallas base{mb} (digit+MXU+reduce)",
               lambda v, a: mxu._base_ntt_pallas(v, field, False, {mb: a}),
               xb, Ab)
    from ntt_tpu.transforms.core import host_power_matrix
    Tb = jnp.asarray(host_power_matrix(
        field, field.root_of_unity(n), mb, n // mb))
    timeit_arg("twiddle mont_mul [W,32,n/32]",
               lambda v, t: limbs.mont_mul(v, t, field), xb, Tb)
    timeit("swapaxes(1,2) roundtrip",
           lambda v: jnp.swapaxes(
               jnp.swapaxes(v, 1, 2) + np.uint32(1), 1, 2), xb)

    # 7. full transforms (aux passed as args — no constant embedding)
    from ntt_tpu.api import get_runner
    for algo in ("mxu_chunked", "fourstep", "mxu_pallas"):
        run, aux = get_runner(field, n, False, algo, True, None)
        per = _measure(lambda c, run=run: jax.jit(
            lambda v, a: jax.lax.fori_loop(
                0, c, lambda i, z: run(z, a), v)),
            (x, aux), probe_chain=8)
        print(f"{'ntt ' + algo + ' (full)':38s} {per*1e3:9.3f} ms")

    # 8. raw hardware rates (roofline calibration)
    k = 2048
    a8 = jnp.ones((k, k), jnp.int8)
    t = timeit("int8 matmul 2048^3", lambda v: jax.lax.dot_general(
        v, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.int8), a8)
    print(f"  -> int8 MAC rate: {k**3 / t / 1e12:.2f} T MAC/s")
    bf = jnp.ones((k, k), jnp.bfloat16)
    t = timeit("bf16 matmul 2048^3", lambda v: jnp.dot(
        v, v, preferred_element_type=jnp.float32).astype(jnp.bfloat16), bf)
    print(f"  -> bf16 MAC rate: {k**3 / t / 1e12:.2f} T MAC/s")
    u = jnp.ones((4096, 4096), jnp.uint32)
    OPS = 64

    def vpu_chain(v):
        r = v
        for _ in range(OPS):
            r = (r * np.uint32(12345)) + v
        return r

    t = timeit("uint32 VPU chain (mul+add x64)", vpu_chain, u)
    print(f"  -> uint32 VPU rate: {u.size * OPS * 2 / t / 1e12:.2f} T op/s")


if __name__ == "__main__":
    main()

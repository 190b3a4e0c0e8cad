#!/usr/bin/env python
"""Marginal cost of each op inside the v2 rotate-round kernel.

Builds a family of kernels with the real grid/specs/schedule but the body
truncated at increasing levels, and times 10 chained invocations per
dispatch. The deltas between levels attribute per-step time to: streaming
(Z read + R write), the g matmul, exp, the penalty gather (matmul vs
select-chain), the tO matmul, and the reductions.
"""

import dataclasses
import time
from functools import partial

import numpy as np


def _sync(x):
    import jax

    np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def bench_fn(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


LEVELS = [
    "copy",        # read Z/codes, write R-shaped zeros
    "g",           # + the (K,d)x(d,T) gram matmul
    "exp",         # + the exp chain
    "pc_matmul",   # + penalty via (K,B)x(B,T) one-hot matmul
    "pc_select",   # penalty via B-pass select chain instead
    "norm",        # + column normalise (VPU)
    "tO",          # + the (K,T)x(T,B) tile-stat matmul
    "tO_runsum",   # tO via per-256-run row sums + tiny (K,16)x(16,B)
    "tO_runsumr",  # run sums via reshape(K,16,256).sum(-1)
    "full",        # + reductions (s_rd, entropy) — the production body
    "full2",       # full, tile processed as 2 independent halves
    "full4",       # full, 4 independent quarters
]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    K, d, B, T, NT = 100, 50, 10, 4096, 123
    Npt = NT * T
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    Z = jnp.asarray(rng.normal(size=(d, Npt)).astype(np.float32))
    Z = Z / jnp.linalg.norm(Z, axis=0, keepdims=True)
    Y = jnp.asarray(rng.normal(size=(K, d)).astype(np.float32))
    Y = Y / jnp.linalg.norm(Y, axis=1, keepdims=True)
    codes = jnp.asarray(
        rng.integers(0, B, size=(1, Npt)).astype(np.int32)
    )
    pen = jnp.asarray(
        rng.uniform(0.5, 2.0, size=(K, B)).astype(np.float32)
    )
    inv2sig = jnp.full((K, 1), 2.0 / 0.1, f32)

    def kernel(Y_ref, Z_ref, c_ref, pen_ref, is_ref, R_ref, acc_ref,
               accv_s, *, lvl):
        s = pl.program_id(0)

        @pl.when(s == 0)
        def _():
            accv_s[0, 0] = 0.0

        Z_t = Z_ref[:]
        if lvl == "copy":
            R_ref[:] = jnp.zeros_like(R_ref) + Z_t[0, 0]
            return
        if lvl in ("full2", "full4"):
            # independent halves/quarters: gives the scheduler freedom to
            # overlap one chunk's VPU chain with another's matmuls
            nsp = 2 if lvl == "full2" else 4
            Tc = T // nsp
            acc = None
            for h in range(nsp):
                sl = slice(h * Tc, (h + 1) * Tc)
                Z_h = Z_t[:, sl]
                gh = jnp.dot(Y_ref[:], Z_h, preferred_element_type=f32)
                eh = jnp.exp((gh - 1.0) * is_ref[:])
                ch = c_ref[0:1, sl]
                pch = jnp.zeros_like(eh)
                for b in range(B):
                    pch = pch + pen_ref[:, b][:, None] * (
                        ch == b
                    ).astype(f32)
                wh = eh * pch
                cs = jnp.sum(wh, axis=0, keepdims=True)
                Rh = wh * (1.0 / jnp.where(cs == 0.0, 1.0, cs))
                bh = jax.lax.broadcasted_iota(jnp.int32, (B, Tc), 0)
                ohh = (ch == bh).astype(f32)
                tOh = jax.lax.dot_general(
                    Rh, ohh, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32,
                )
                s_rd = 2.0 * jnp.sum(tOh) - 2.0 * jnp.sum(Rh * gh)
                R_ref[:, sl] = Rh
                acc = s_rd if acc is None else acc + s_rd
            accv_s[0, 0] = accv_s[0, 0] + acc
            return
        g = jnp.dot(Y_ref[:], Z_t, preferred_element_type=f32)
        if lvl == "g":
            R_ref[:] = g * 0.5
            return
        e = jnp.exp((g - 1.0) * is_ref[:])
        if lvl == "exp":
            R_ref[:] = e
            return
        b_iota = jax.lax.broadcasted_iota(jnp.int32, (B, T), 0)
        ohT = (c_ref[0:1, :] == b_iota).astype(f32)
        if lvl == "pc_matmul":
            pc = jnp.dot(pen_ref[:], ohT, preferred_element_type=f32)
            R_ref[:] = e * pc
            return
        if lvl == "pc_select":
            c_row = c_ref[0:1, :]
            pc = jnp.zeros_like(e)
            for b in range(B):
                pc = pc + pen_ref[:, b][:, None] * (
                    c_row == b
                ).astype(f32)
            R_ref[:] = e * pc
            return
        pc = jnp.dot(pen_ref[:], ohT, preferred_element_type=f32)
        w = e * pc
        colsum = jnp.sum(w, axis=0, keepdims=True)
        R_n = w * (1.0 / jnp.where(colsum == 0.0, 1.0, colsum))
        if lvl == "norm":
            R_ref[:] = R_n
            return
        if lvl in ("tO_runsum", "tO_runsumr"):
            msubr = 16
            Tr = T // msubr
            if lvl == "tO_runsum":
                rs = jnp.concatenate(
                    [
                        jnp.sum(
                            R_n[:, j * Tr : (j + 1) * Tr],
                            axis=1, keepdims=True,
                        )
                        for j in range(msubr)
                    ],
                    axis=1,
                )  # (K, 16)
            else:
                rs = jnp.sum(R_n.reshape(K, msubr, Tr), axis=2)
            rj = jax.lax.broadcasted_iota(jnp.int32, (msubr, B), 1)
            runb = (rj == (c_ref[0, 0] * 0)).astype(f32)  # (16, B) dummy map
            tO = jnp.dot(rs, runb, preferred_element_type=f32)
            R_ref[:] = R_n
            accv_s[0, 0] = accv_s[0, 0] + jnp.sum(tO)
            return
        tO = jax.lax.dot_general(
            R_n, ohT, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32,
        )
        if lvl == "tO":
            R_ref[:] = R_n
            accv_s[0, 0] = accv_s[0, 0] + jnp.sum(tO)
        else:  # full
            s_rd = 2.0 * jnp.sum(tO) - 2.0 * jnp.sum(R_n * g)
            sR = jnp.sum(R_n, axis=0, keepdims=True) * 0.1
            ent = -s_rd - jnp.sum(jnp.log(
                jnp.where(colsum == 0.0, 1.0, colsum)) * sR)
            R_ref[:] = R_n
            accv_s[0, 0] = accv_s[0, 0] + s_rd + ent

        @pl.when(s == pl.num_programs(0) - 1)
        def _():
            acc_ref[0, 0] = accv_s[0, 0]

    def build(lvl):
        call = pl.pallas_call(
            partial(kernel, lvl=lvl),
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((K, d), lambda s: (0, 0)),
                pl.BlockSpec((d, T), lambda s: (0, s)),
                pl.BlockSpec((1, T), lambda s: (0, s)),
                pl.BlockSpec((K, B), lambda s: (0, 0)),
                pl.BlockSpec((K, 1), lambda s: (0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((K, T), lambda s: (0, s)),
                pl.BlockSpec(
                    (1, 1), lambda s: (0, 0), memory_space=pltpu.SMEM
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K, Npt), f32),
                jax.ShapeDtypeStruct((1, 1), f32),
            ],
            scratch_shapes=[pltpu.SMEM((1, 1), f32)],
        )

        def run(Z, Y, codes, pen, inv2sig):
            acc = jnp.float32(0)
            Yv = Y
            for i in range(10):
                R, a = call(Yv, Z, codes, pen, inv2sig)
                acc = acc + a[0, 0] + R[0, 0]
                Yv = Y + acc * 1e-20
            return acc

        return jax.jit(run)

    for lvl in LEVELS:
        with jax.default_matmul_precision("float32"):
            fn = build(lvl)
            t = bench_fn(fn, Z, Y, codes, pen, inv2sig)
        per_round = t / 10.0
        print(
            f"{lvl:10s}: {per_round*1e3:7.3f} ms/pass "
            f"({per_round/NT*1e6:6.2f} us/step)",
            flush=True,
        )

    # XLA streaming baseline: R-sized read+write, 10 chained
    R0 = jnp.zeros((K, Npt), f32)

    def xla_stream(R):
        for _ in range(10):
            R = R * 1.0000001 + 0.5
        return R

    t = bench_fn(jax.jit(xla_stream), R0) / 10.0
    gbs = 2 * R0.size * 4 / t / 1e9
    print(f"xla R read+write: {t*1e3:7.3f} ms ({gbs:5.0f} GB/s)", flush=True)


def tile_sweep():
    """Streaming floor vs number of per-step DMA transfers.

    Hypothesis: each distinct per-step block transfer carries a fixed
    latency cost that does not overlap, so the production kernel's ~5
    transfers/step (Z, codes, blkO in; R, tile_O out) explain its floor.
    The chain varies a tiny SMEM scalar per call so XLA cannot CSE the
    calls and no large XLA-side traffic contaminates the measurement.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    K, d, B = 100, 50, 10
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    T = 4096
    NT = 123
    Npt = NT * T
    Z = jnp.asarray(rng.normal(size=(d, Npt)).astype(np.float32))
    codes = jnp.asarray(rng.integers(0, B, (1, Npt)).astype(np.int32))

    def make(n_in, small_out, T=T, NT=NT):
        def kernel(*refs):
            # refs: i_ref(SMEM), Z_ref, [c_ref], R_ref, [tO_ref]
            i_ref = refs[0]
            Z_ref = refs[1]
            R_ref = refs[1 + n_in]
            R_ref[:] = jnp.zeros_like(R_ref) + (
                Z_ref[0, 0] + i_ref[0, 0]
            )
            if small_out:
                refs[2 + n_in][0] = jnp.zeros(
                    (K, B), f32
                ) + Z_ref[0, 0]

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((d, T), lambda s: (0, s)),
        ]
        args = [Z]
        if n_in == 2:
            in_specs.append(pl.BlockSpec((1, T), lambda s: (0, s)))
            args.append(codes)
        out_specs = [pl.BlockSpec((K, T), lambda s: (0, s))]
        out_shape = [jax.ShapeDtypeStruct((K, Npt), f32)]
        if small_out:
            out_specs.append(pl.BlockSpec((1, K, B), lambda s: (s, 0, 0)))
            out_shape.append(jax.ShapeDtypeStruct((NT, K, B), f32))
        call = pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
        )

        def run(Z, codes):
            acc = jnp.float32(0)
            for i in range(10):
                outs = call(
                    jnp.full((1, 1), float(i), f32), *args
                )
                acc = acc + outs[0][0, 0]
            return acc

        return jax.jit(lambda Zq, c: run(Zq, c))

    for name, n_in, small_out in [
        ("1 in, 1 out", 1, False),
        ("2 in, 1 out", 2, False),
        ("2 in, 2 out", 2, True),
    ]:
        fn = make(n_in, small_out)
        t = bench_fn(fn, Z, codes) / 10.0
        print(
            f"stream [{name}]: {t*1e3:7.3f} ms/pass "
            f"({t/NT*1e6:6.2f} us/step)",
            flush=True,
        )

    # true data-moving copy at several tile widths (same total cells)
    for Tw in (2048, 4096, 8192):
        NTw = Npt // Tw

        def copy_kernel(i_ref, Z_ref, R_ref):
            Z_t = Z_ref[:] + i_ref[0, 0]
            R_ref[0:50, :] = Z_t
            R_ref[50:100, :] = Z_t

        call = pl.pallas_call(
            copy_kernel,
            grid=(NTw,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((d, Tw), lambda s: (0, s)),
            ],
            out_specs=pl.BlockSpec((K, Tw), lambda s: (0, s)),
            out_shape=jax.ShapeDtypeStruct((K, Npt), f32),
        )

        def runc(Z):
            acc = jnp.float32(0)
            for i in range(10):
                R = call(jnp.full((1, 1), float(i), f32), Z)
                acc = acc + R[0, 0]
            return acc

        t = bench_fn(jax.jit(runc), Z) / 10.0
        gbs = (d + K) * Npt * 4 / t / 1e9
        print(
            f"true copy T={Tw:5d}: {t*1e3:7.3f} ms/pass "
            f"({t/NTw*1e6:6.2f} us/step, {gbs:5.0f} GB/s)",
            flush=True,
        )


def layout_sweep():
    """2D strided blocks vs 3D contiguous tiles: is the 290 GB/s floor the
    per-row DMA descriptor overhead of (rows, T) blocks cut from (rows, N)
    arrays? A (1, rows, T) block of a (NT, rows, T) array is one
    contiguous stripe."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    K, d, T, NT = 100, 50, 4096, 123
    Npt = NT * T
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    Z2 = jnp.asarray(rng.normal(size=(d, Npt)).astype(np.float32))
    Z3 = jnp.asarray(
        rng.normal(size=(NT, d, T)).astype(np.float32)
    )

    def make(in3, out3):
        def kernel(i_ref, Z_ref, R_ref):
            Z_t = (Z_ref[0] if in3 else Z_ref[:]) + i_ref[0, 0]
            if out3:
                R_ref[0, 0:50, :] = Z_t
                R_ref[0, 50:100, :] = Z_t
            else:
                R_ref[0:50, :] = Z_t
                R_ref[50:100, :] = Z_t

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d, T), lambda s: (s, 0, 0))
            if in3
            else pl.BlockSpec((d, T), lambda s: (0, s)),
        ]
        out_spec = (
            pl.BlockSpec((1, K, T), lambda s: (s, 0, 0))
            if out3
            else pl.BlockSpec((K, T), lambda s: (0, s))
        )
        out_shape = (
            jax.ShapeDtypeStruct((NT, K, T), f32)
            if out3
            else jax.ShapeDtypeStruct((K, Npt), f32)
        )
        call = pl.pallas_call(
            kernel, grid=(NT,), in_specs=in_specs,
            out_specs=out_spec, out_shape=out_shape,
        )

        def run(Z):
            acc = jnp.float32(0)
            for i in range(10):
                R = call(jnp.full((1, 1), float(i), f32), Z)
                acc = acc + (R[0, 0, 0] if out3 else R[0, 0])
            return acc

        return jax.jit(run)

    for name, in3, out3 in [
        ("2D in, 2D out", False, False),
        ("3D in, 2D out", True, False),
        ("2D in, 3D out", False, True),
        ("3D in, 3D out", True, True),
    ]:
        fn = make(in3, out3)
        t = bench_fn(fn, Z3 if in3 else Z2) / 10.0
        gbs = (d + K) * Npt * 4 / t / 1e9
        print(
            f"copy [{name}]: {t*1e3:7.3f} ms/pass "
            f"({t/NT*1e6:6.2f} us/step, {gbs:5.0f} GB/s)",
            flush=True,
        )

    # sublane alignment: same copies with 8-aligned row counts
    def make_aligned(Kr, dr, in3, out3):
        Zn = jnp.asarray(
            rng.normal(size=(NT, dr, T) if in3 else (dr, Npt)).astype(
                np.float32
            )
        )

        def kernel(i_ref, Z_ref, R_ref):
            Z_t = (Z_ref[0] if in3 else Z_ref[:]) + i_ref[0, 0]
            half = Kr // 2
            if out3:
                R_ref[0, 0:half, :] = Z_t[0:half, :] if dr >= half else (
                    jnp.zeros((half, T), f32) + Z_t[0, 0])
                R_ref[0, half:Kr, :] = R_ref[0, 0:half, :]
            else:
                R_ref[0:half, :] = Z_t[0:half, :] if dr >= half else (
                    jnp.zeros((half, T), f32) + Z_t[0, 0])
                R_ref[half:Kr, :] = R_ref[0:half, :]

        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dr, T), lambda s: (s, 0, 0))
            if in3
            else pl.BlockSpec((dr, T), lambda s: (0, s)),
        ]
        out_spec = (
            pl.BlockSpec((1, Kr, T), lambda s: (s, 0, 0))
            if out3
            else pl.BlockSpec((Kr, T), lambda s: (0, s))
        )
        out_shape = (
            jax.ShapeDtypeStruct((NT, Kr, T), f32)
            if out3
            else jax.ShapeDtypeStruct((Kr, Npt), f32)
        )
        call = pl.pallas_call(
            kernel, grid=(NT,), in_specs=in_specs,
            out_specs=out_spec, out_shape=out_shape,
        )

        def run(Z):
            acc = jnp.float32(0)
            for i in range(10):
                R = call(jnp.full((1, 1), float(i), f32), Z)
                acc = acc + (R[0, 0, 0] if out3 else R[0, 0])
            return acc

        return jax.jit(run), Zn, (dr + Kr) * Npt * 4

    for name, Kr, dr, in3, out3 in [
        ("K=104 2D out", 104, 56, False, False),
        ("K=104 3D out", 104, 56, True, True),
        ("K=128 2D out", 128, 64, False, False),
        ("K=128 3D out", 128, 64, True, True),
    ]:
        fn, Zn, nbytes = make_aligned(Kr, dr, in3, out3)
        t = bench_fn(fn, Zn) / 10.0
        gbs = nbytes / t / 1e9
        print(
            f"copy [{name}]: {t*1e3:7.3f} ms/pass "
            f"({t/NT*1e6:6.2f} us/step, {gbs:5.0f} GB/s)",
            flush=True,
        )

    # dimension semantics: does 'parallel' unlock deeper DMA overlap?
    for sem in ("arbitrary", "parallel"):
        def kernel(i_ref, Z_ref, R_ref):
            Z_t = Z_ref[:] + i_ref[0, 0]
            R_ref[0:50, :] = Z_t
            R_ref[50:100, :] = Z_t

        call = pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((d, T), lambda s: (0, s)),
            ],
            out_specs=pl.BlockSpec((K, T), lambda s: (0, s)),
            out_shape=jax.ShapeDtypeStruct((K, Npt), f32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(sem,)
            ),
        )

        def runp(Z):
            acc = jnp.float32(0)
            for i in range(10):
                R = call(jnp.full((1, 1), float(i), f32), Z)
                acc = acc + R[0, 0]
            return acc

        t = bench_fn(jax.jit(runp), Z2) / 10.0
        gbs = (d + K) * Npt * 4 / t / 1e9
        print(
            f"copy [sem={sem:9s}]: {t*1e3:7.3f} ms/pass "
            f"({t/NT*1e6:6.2f} us/step, {gbs:5.0f} GB/s)",
            flush=True,
        )


if __name__ == "__main__":
    import sys

    if "--tiles" in sys.argv:
        tile_sweep()
    elif "--layout" in sys.argv:
        layout_sweep()
    else:
        main()

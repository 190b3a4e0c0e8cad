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
    "full",        # + reductions (s_rd, entropy) — the production body
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


if __name__ == "__main__":
    main()

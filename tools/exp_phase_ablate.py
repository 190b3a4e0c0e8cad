#!/usr/bin/env python
"""Ablate the fused permute phase's per-round pieces on the real chip.

The phase (ops/pallas_estep.pallas_permute_phase) measures ~53 ms per
round while the standalone per-round kernel (pallas_block_update_round),
whose prep is a SUPERSET (it also gathers and scatters the (K, N) R),
measures ~31 ms — so one of the phase's pieces is mis-lowering. This
tool re-builds the phase with each piece optionally replaced by a
shape-identical dummy (values wrong, timing right):

  full        the phase as shipped (1 round and 4 rounds)
  nomat       skip the natural-order materialize kernel
  noblk       blk_lay <- zeros, no blk_nat scatter
  nocode      c_lay <- contiguous slice (no gather)
  noz         Z_lay <- contiguous slice (no gather)
  nokernel    pallas kernel replaced by cheap XLA stand-ins

Usage: python tools/exp_phase_ablate.py [--cells 500000] [--rounds 4]
"""

import argparse
import time
from functools import partial

import numpy as np


def build_phase(cfg, skip, rounds):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from harmony_tpu.ops.assign import make_blocks
    from harmony_tpu.ops.pallas_estep import (
        _permute_materialize_kernel, _permute_round_kernel,
    )

    f32 = jnp.float32
    K, Np = cfg.K, cfg.Np
    nb = cfg.n_blocks
    nbp = nb + 1
    d = cfg.d
    B = cfg.B
    offsets = cfg.covariate_offsets
    sub_tile = cfg.estep_sub_tile
    chunk = sub_tile
    while chunk > 256 and nbp * B * chunk * 4 > 4608 * 2**10:
        chunk //= 2

    S = cfg.max_block_size
    nsub = max(1, -(-S // sub_tile))
    S_pad = nsub * sub_tile
    L = nb * S_pad
    T = sub_tile
    grid = (nb, 2, nsub)

    def lin(i, p, j):
        return i * nsub + j

    kernel = pl.pallas_call(
        partial(
            _permute_round_kernel, offsets=offsets, B=B, nbp=nbp,
            chunk=chunk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((K, d), lambda i, p, j: (0, 0)),
            pl.BlockSpec((d, T), lambda i, p, j: (0, lin(i, p, j))),
            pl.BlockSpec((1, T), lambda i, p, j: (0, lin(i, p, j))),
            pl.BlockSpec((1, T), lambda i, p, j: (0, lin(i, p, j))),
            pl.BlockSpec((1, T), lambda i, p, j: (0, lin(i, p, j))),
            pl.BlockSpec((K, nbp * B), lambda i, p, j: (0, 0)),
            pl.BlockSpec((K, B), lambda i, p, j: (0, 0)),
            pl.BlockSpec((K, B), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, B), lambda i, p, j: (0, 0)),
            pl.BlockSpec((K, 1), lambda i, p, j: (0, 0)),
            pl.BlockSpec((1, B), lambda i, p, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, B), lambda i, p, j: (0, 0)),
            pl.BlockSpec((K, B), lambda i, p, j: (0, 0)),
            pl.BlockSpec((nb, K, B), lambda i, p, j: (0, 0, 0)),
            pl.BlockSpec(
                (1, 2), lambda i, p, j: (0, 0), memory_space=pltpu.SMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, B), f32),
            jax.ShapeDtypeStruct((K, B), f32),
            jax.ShapeDtypeStruct((nb, K, B), f32),
            jax.ShapeDtypeStruct((1, 2), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((K, B), f32),
            pltpu.VMEM((K, B), f32),
            pltpu.VMEM((K, B), f32),
            pltpu.VMEM((K, 1), f32),
            pltpu.VMEM((K, B), f32),
            pltpu.SMEM((1, 2), f32),
        ],
    )

    def phase(Zf, Yt, E0, O0, codes, Pr_b, sigma, theta, perms):
        pad1 = lambda X: jnp.concatenate(
            [X, jnp.zeros((*X.shape[:-1], 1), X.dtype)], axis=-1
        )
        Zp = pad1(Zf)
        cp = pad1(codes)
        Prr = Pr_b[None, :]
        sig = sigma[:, None]
        th = theta[None, :]
        slot_blk = jnp.arange(L, dtype=jnp.int32) // jnp.int32(S_pad)
        pen_prev = jnp.ones((K, nbp * B), f32)
        blk_nat = jnp.full((Np,), nb, jnp.int32)
        E_c, O_c = E0, O0

        ncov = codes.shape[0]
        W = d + ncov + 1
        tbl_base = jnp.concatenate(
            [
                Zp,
                cp.astype(f32),
                jnp.zeros((1, Np + 1), f32),
            ],
            axis=0,
        )  # (W, Np+1); last row rewritten with blk per round
        tblT_base = tbl_base.T  # (Np+1, W) row-major variant

        def round_body(carry, perm_r):
            pen_prev, blk_nat, E_c, O_c = carry
            idx, mask = make_blocks(cfg, perm_r)
            if S_pad != S:
                padw = ((0, 0), (0, S_pad - S))
                idx = jnp.pad(idx, padw, constant_values=Np)
                mask = jnp.pad(mask, padw, constant_values=False)
            flat_idx = idx.reshape(-1)
            mf = mask.astype(f32).reshape(1, L)
            if "table" in skip:
                blk_row = jnp.concatenate(
                    [blk_nat, jnp.full((1,), nb, jnp.int32)]
                ).astype(f32)[None, :]
                tbl = jnp.concatenate([tbl_base[:-1], blk_row], axis=0)
                lay = tbl[:, flat_idx]  # ONE (W, L) gather
                Z_lay = lay[:d]
                c_lay = lay[d : d + ncov].astype(jnp.int32)
                blk_lay = lay[d + ncov :].astype(jnp.int32)
                E_n, O_n, pen_out, acc = kernel(
                    Yt, Z_lay, c_lay, blk_lay, mf, pen_prev, E_c, O_c,
                    Prr, sig, th,
                )
                pen_next = jnp.concatenate(
                    [
                        jnp.transpose(pen_out, (1, 0, 2)).reshape(
                            K, nb * B
                        ),
                        jnp.ones((K, B), f32),
                    ],
                    axis=1,
                )
                blk_next = (
                    jnp.zeros((Np + 1,), jnp.int32)
                    .at[flat_idx]
                    .set(slot_blk)
                )[:Np]
                return ((pen_next, blk_next, E_n, O_n), (acc[0, 0],))
            if "rowtable" in skip:
                blk_row = jnp.concatenate(
                    [blk_nat, jnp.full((1,), nb, jnp.int32)]
                ).astype(f32)[:, None]
                tblT = jnp.concatenate(
                    [tblT_base[:, :-1], blk_row], axis=1
                )
                layT = tblT[flat_idx, :]  # ONE (L, W) row gather
                lay = layT.T
                Z_lay = lay[:d]
                c_lay = lay[d : d + ncov].astype(jnp.int32)
                blk_lay = lay[d + ncov :].astype(jnp.int32)
                E_n, O_n, pen_out, acc = kernel(
                    Yt, Z_lay, c_lay, blk_lay, mf, pen_prev, E_c, O_c,
                    Prr, sig, th,
                )
                pen_next = jnp.concatenate(
                    [
                        jnp.transpose(pen_out, (1, 0, 2)).reshape(
                            K, nb * B
                        ),
                        jnp.ones((K, B), f32),
                    ],
                    axis=1,
                )
                blk_next = (
                    jnp.zeros((Np + 1,), jnp.int32)
                    .at[flat_idx]
                    .set(slot_blk)
                )[:Np]
                return ((pen_next, blk_next, E_n, O_n), (acc[0, 0],))
            if "z" in skip:
                Z_lay = jax.lax.dynamic_slice_in_dim(
                    jnp.tile(Zp, (1, (L // Zp.shape[1]) + 1)), 0, L, axis=1
                )
            else:
                Z_lay = Zp[:, flat_idx]
            if "code" in skip:
                c_lay = jnp.zeros((codes.shape[0], L), codes.dtype)
            else:
                c_lay = cp[:, flat_idx]
            if "blk" in skip:
                blk_lay = jnp.zeros((1, L), jnp.int32)
            else:
                blk_lay = jnp.concatenate(
                    [blk_nat, jnp.full((1,), nb, jnp.int32)]
                )[flat_idx][None, :]
            if "kernel" in skip:
                # honest full-array consumers so the gathers are not DCE'd
                E_n = E_c + jnp.sum(Z_lay) * 1e-20
                O_n = O_c
                pen_out = jnp.ones((nb, K, B), f32) + (
                    jnp.sum(blk_lay) + jnp.sum(c_lay)
                ).astype(f32) * 1e-20
                acc = jnp.zeros((1, 2), f32) + jnp.sum(mf) * 1e-20
            else:
                E_n, O_n, pen_out, acc = kernel(
                    Yt, Z_lay, c_lay, blk_lay, mf, pen_prev, E_c, O_c,
                    Prr, sig, th,
                )
            pen_next = jnp.concatenate(
                [
                    jnp.transpose(pen_out, (1, 0, 2)).reshape(K, nb * B),
                    jnp.ones((K, B), f32),
                ],
                axis=1,
            )
            if "blk" in skip:
                blk_next = blk_nat
            else:
                blk_next = (
                    jnp.zeros((Np + 1,), jnp.int32)
                    .at[flat_idx]
                    .set(slot_blk)
                )[:Np]
            return (
                (pen_next, blk_next, E_n, O_n),
                (acc[0, 0],),
            )

        (pen_prev, blk_nat, E_c, O_c), (accs,) = jax.lax.scan(
            round_body, (pen_prev, blk_nat, E_c, O_c), perms
        )

        if "mat" in skip:
            R_nat = jnp.zeros((K, 8), f32) + (
                jnp.sum(pen_prev[:1, :1])
                + jnp.sum(blk_nat[:1]).astype(f32)
            ) * 1e-20
            return R_nat, E_c, accs
        Npt = -(-Np // T) * T
        NT = Npt // T
        padT = lambda X: (
            X
            if X.shape[-1] == Npt
            else jnp.concatenate(
                [
                    X,
                    jnp.zeros(
                        (*X.shape[:-1], Npt - X.shape[-1]), X.dtype
                    ),
                ],
                axis=-1,
            )
        )
        valid_nat = (jnp.arange(Npt) < cfg.N).astype(f32)[None, :]
        mat = pl.pallas_call(
            partial(
                _permute_materialize_kernel,
                offsets=offsets, B=B, nbp=nbp, chunk=chunk,
            ),
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((K, d), lambda s_: (0, 0)),
                pl.BlockSpec((d, T), lambda s_: (0, s_)),
                pl.BlockSpec((codes.shape[0], T), lambda s_: (0, s_)),
                pl.BlockSpec((1, T), lambda s_: (0, s_)),
                pl.BlockSpec((1, T), lambda s_: (0, s_)),
                pl.BlockSpec((K, nbp * B), lambda s_: (0, 0)),
                pl.BlockSpec((K, 1), lambda s_: (0, 0)),
            ],
            out_specs=pl.BlockSpec((K, T), lambda s_: (0, s_)),
            out_shape=jax.ShapeDtypeStruct((K, Npt), f32),
        )
        R_nat = mat(
            Yt, padT(Zf), padT(codes), padT(blk_nat[None, :]),
            padT(valid_nat), pen_prev, sig,
        )[:, :Np]
        return R_nat, E_c, accs

    return phase


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=500_000)
    ap.add_argument("--dims", type=int, default=50)
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--nclust", type=int, default=100)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--reps", type=int, default=8)
    args, extra = ap.parse_known_args()

    import jax
    import jax.numpy as jnp

    from harmony_tpu.config import harmony_options
    from harmony_tpu.preprocess import build_design, resolve_config
    from harmony_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()

    N, d, K, B = args.cells, args.dims, args.nclust, args.batches
    rng = np.random.default_rng(0)
    design = build_design({"dataset": rng.integers(0, B, N)}, ["dataset"])
    cfg = resolve_config(
        n_cells=N, d=d, design=design, nclust=K, max_iter=3,
        early_stop=False, options=harmony_options(), verbose=False,
    )
    f32 = jnp.float32
    key = jax.random.PRNGKey(0)
    Z = jax.random.normal(key, (d, N), f32)
    Zn = Z / jnp.linalg.norm(Z, axis=0, keepdims=True)
    Yt = jax.random.normal(key, (K, d), f32)
    codes = jnp.asarray(design.codes)
    Pr_b = jnp.bincount(codes[0], length=B).astype(f32) / N
    E0 = jnp.abs(jax.random.normal(key, (K, B), f32)) * (N / (K * B))
    O0 = jnp.abs(jax.random.normal(key, (K, B), f32)) * (N / (K * B))
    sigma = jnp.full((K,), 0.1, f32)
    theta = jnp.full((B,), 2.0, f32)
    perms = jnp.stack(
        [
            jnp.asarray(rng.permutation(N).astype(np.int32))
            for _ in range(args.rounds)
        ]
    )

    def measure(name, skip):
        phase = build_phase(cfg, skip, args.rounds)

        def runner(n):
            # big operands as ARGUMENTS: closure device arrays inline
            # into the HLO as literals and blow the remote-compile
            # request size at >=2M cells (HTTP 413)
            def run(x0, Zn_, codes_, perms_):
                def f(x):
                    # thread the carry into the perms so the phase is
                    # loop-VARIANT (as plain args the whole phase is
                    # invariant w.r.t. the scan carry and XLA hoists it
                    # out of the loop entirely)
                    perms_i = perms_ + (x * 1e-30).astype(jnp.int32)
                    R_nat, E_c, accs = phase(
                        Zn_, Yt, E0, O0, codes_, Pr_b, sigma, theta,
                        perms_i,
                    )
                    return (
                        x
                        + (
                            jnp.sum(R_nat[:, :8])
                            + jnp.sum(E_c)
                            + jnp.sum(accs)
                        )
                        * 1e-20
                    )

                out = jax.lax.scan(
                    lambda c, _: (f(c), None), x0, None, length=n
                )[0]
                return out

            return jax.jit(run)

        lo_f, hi_f = runner(2), runner(args.reps)
        x0 = jnp.float32(0.0)
        float(np.asarray(lo_f(x0, Zn, codes, perms)))
        float(np.asarray(hi_f(x0, Zn, codes, perms)))
        deltas = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(np.asarray(lo_f(x0, Zn, codes, perms)))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(hi_f(x0, Zn, codes, perms)))
            t_hi = time.perf_counter() - t0
            if t_hi > t_lo:
                deltas.append((t_hi - t_lo) / (args.reps - 2))
        per = float(np.median(deltas)) if deltas else float("nan")
        print(f"{name:10s}: {per*1e3:8.2f} ms/phase", flush=True)

    only = set(a for a in extra if not a.startswith("-"))
    variants = [
        ("full", frozenset()),
        ("nomat", frozenset({"mat"})),
        ("noblk", frozenset({"blk"})),
        ("nocode", frozenset({"code"})),
        ("noz", frozenset({"z", "code", "blk"})),
        ("nokernel", frozenset({"kernel"})),
        ("table", frozenset({"table"})),
        ("rowtable", frozenset({"rowtable"})),
    ]
    for name, skip in variants:
        if only and name not in only:
            continue
        measure(name, skip)


if __name__ == "__main__":
    main()

"""Gather-lowering probe: column gather from (rows, N) vs row gather from
(N, rows), random vs block-sorted indices, at the permute schedule's
shapes. Measured traps handled per CLAUDE.md: operands passed as jit
ARGUMENTS (no inlined constants), each timed call fully synced via host
fetch, result consumed by a full reduction (strided consumers let XLA
elide gathers)."""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=3):
    out = fn(*args)
    np.asarray(out)  # sync: block_until_ready does not wait over the tunnel
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=2_000_000)
    ap.add_argument("--rows", type=int, default=53)
    ap.add_argument("--nb", type=int, default=20)
    args = ap.parse_args()
    N, R, nb = args.cells, args.rows, args.nb

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.normal(size=(R, N)).astype(np.float32))
    tblT = jnp.asarray(np.ascontiguousarray(np.asarray(tbl).T))
    perm = rng.permutation(N).astype(np.int32)
    idx_rand = jnp.asarray(perm)
    # block-sorted: ascending within each of nb contiguous windows
    S = -(-N // nb)
    srt = np.concatenate(
        [np.sort(perm[i * S : (i + 1) * S]) for i in range(nb)]
    )
    idx_sort = jnp.asarray(srt.astype(np.int32))

    col = jax.jit(lambda t, i: jnp.sum(t[:, i], dtype=jnp.float32))
    row = jax.jit(lambda t, i: jnp.sum(t[i, :], dtype=jnp.float32))
    base = jax.jit(lambda t: jnp.sum(t, dtype=jnp.float32))

    t_base = timeit(base, tbl)
    print(f"reduce-only baseline      : {t_base*1e3:8.2f} ms")
    for name, fn, t, i in (
        ("col gather, random  ", col, tbl, idx_rand),
        ("col gather, blocksort", col, tbl, idx_sort),
        ("row gather, random  ", row, tblT, idx_rand),
        ("row gather, blocksort", row, tblT, idx_sort),
    ):
        dt = timeit(fn, t, i)
        eff = (N * R * 4) / max(dt - t_base, 1e-9) / 1e9
        print(f"{name}: {dt*1e3:8.2f} ms  (~{eff:6.1f} GB/s useful)")


if __name__ == "__main__":
    main()

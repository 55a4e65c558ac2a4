"""Micro-benchmark of element-gather formulations on TPU.

The fused init scatter (apply_scatter_arrays) spends ~40ms in three
230k-element gathers; this probes which gather shapes XLA/TPU runs fast:

  plain       x[:, idx] on (2, N) u64, N = 230092 (ragged)
  pow2_perm   full-permutation gather padded to 2^18
  rowsel128   hi/lo: row-take of (C, N/128, 128) + lane select-sum
  rowsel8     same with 8-wide rows
  planes3d    the fold-prologue shape: (4, K, 2^16) gather along minor

    python benches/gather_micro.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(name, fn, *args, iters=50):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t) / iters
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 3)}),
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    rng = np.random.default_rng(0)
    N = 230092
    src = jnp.asarray(rng.integers(0, 1 << 61, (2, N), dtype=np.uint64))
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, N, N, dtype=np.int32))  # non-perm

    timed("plain perm (2,230092) u64", jax.jit(lambda s, p: s[:, p]),
          src, perm)
    timed("plain nonperm (2,230092) u64", jax.jit(lambda s, p: s[:, p]),
          src, idx)

    NP = 1 << 18
    srcp = jnp.pad(src, ((0, 0), (0, NP - N)))
    permp = jnp.asarray(np.concatenate(
        [np.asarray(perm), np.arange(N, NP)]).astype(np.int32))
    timed("pow2 full-perm (2,2^18) u64", jax.jit(lambda s, p: s[:, p]),
          srcp, permp)
    idxp = jnp.pad(idx, (0, NP - N))
    timed("pow2 nonperm (2,2^18) u64", jax.jit(lambda s, p: s[:, p]),
          srcp, idxp)

    # u32 planes
    src4 = jnp.asarray(rng.integers(0, 1 << 32, (4, NP), dtype=np.uint32))
    timed("pow2 nonperm (4,2^18) u32", jax.jit(lambda s, p: s[:, p]),
          src4, idxp)

    def rowsel(width):
        def f(s, hi, lo):
            C = s.shape[0]
            rows = jnp.take(s, hi, axis=1)           # (C, M, width)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, width), 2)
            sel = lane == lo[None, :, None]
            return jnp.where(sel, rows, 0).sum(axis=2)
        return f

    for width in (128, 8):
        s3 = srcp.reshape(2, NP // width, width)
        hi = (idxp // width).astype(np.int32)
        lo = (idxp % width).astype(np.int32)
        timed(f"rowsel{width} (2,2^18) u64", jax.jit(rowsel(width)),
              s3, hi, lo)

    # fold-prologue shape: gather along minor of (4, K, 2^16) with a 2^16
    # permutation shared across K
    K = 28
    n2 = 1 << 16
    s3d = jnp.asarray(rng.integers(0, 1 << 32, (4, K, n2), dtype=np.uint32))
    p2 = jnp.asarray(rng.permutation(n2).astype(np.int32))
    timed("planes3d perm (4,28,2^16) u32", jax.jit(lambda s, p: s[:, :, p]),
          s3d, p2)

    # one-hot matmul gather: out[m] = sum_r rows(hi)[m,r]*(lo[m]==r) via MXU?
    # (dot with one-hot over the 128 axis, f32 exact for 16-bit digits) —
    # probe whether einsum beats the select-sum
    s3 = srcp.reshape(2, NP // 128, 128)
    hi = (idxp // 128).astype(np.int32)
    lo = (idxp % 128).astype(np.int32)

    def onehot_f(s, hi, lo):
        rows = jnp.take(s, hi, axis=1)               # (2, M, 128) u64
        oh = jax.nn.one_hot(lo, 128, dtype=jnp.uint64)   # (M, 128)
        return (rows * oh[None]).sum(axis=2)

    timed("rowsel128+onehot-mul u64", jax.jit(onehot_f), s3, hi, lo)


if __name__ == "__main__":
    main()

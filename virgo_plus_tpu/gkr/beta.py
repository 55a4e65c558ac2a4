"""Equality ("beta") table construction: beta[i] = init * eq(r, bits(i)).

Reference: initBetaTable / initHalfTable (/root/reference/src/utils.cpp:8-45)
builds the 2^len table as a split-half tensor product.  Field multiplication
is exact, so the doubling construction below produces identical values; on
TPU it is log(len) vectorized steps of one mult + one sub each, fully fused
by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import gf


def beta_table(r, bit_length: int, init):
    """r: (2, >=bit_length) challenge array; init: (2,) scalar element.
    Returns (2, 2^bit_length) with entry i = init * prod_j (r_j if bit j of
    i else 1-r_j).  bit_length == 0 returns [[init]]."""
    out = init.reshape(2, 1)
    for j in range(bit_length):
        rj = r[:, j:j + 1]
        hi = gf.mul(out, rj)
        lo = gf.sub(out, hi)
        out = jnp.concatenate([lo, hi], axis=1)
    return out


def beta_tables_batched(rs, bit_length: int, inits):
    """K same-size tables in one doubling loop (the prover builds ~100
    beta tables per proof; per-table loops are op-dispatch-bound).
    rs: (2, K, >=bit_length); inits: (2, K) -> (2, K, 2^bit_length),
    bit-identical to per-table beta_table."""
    out = inits[:, :, None]
    for j in range(bit_length):
        rj = rs[:, :, j:j + 1]
        hi = gf.mul(out, rj)
        lo = gf.sub(out, hi)
        out = jnp.concatenate([lo, hi], axis=2)
    return out

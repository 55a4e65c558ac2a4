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

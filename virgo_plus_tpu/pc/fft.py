"""Radix-2 FFT / IFFT over GF((2^61-1)^2) on uint64 planes.

Reference: /root/reference/lib/virgo/src/RS_polynomial.cpp:26-220 — iterative
coefficient->evaluation transform on the 2^k roots-of-unity group, with
zero-padding expressed as block replication of the coefficient vector
(order > coef_len).  The TPU-native form turns each butterfly stage into a
reshape + one vectorized multiply + add/sub pair, with twiddle powers built
on device by doubling (log-many tensor products).

Roots of unity are passed as python-int pairs: they are static per shape, so
stage bases / inverse roots / 1/n are computed host-side (embedding long
scalar power chains in the graph blows up XLA's scheduler) and enter the
graph as constants.

Outputs are bit-identical to the reference (field ops are exact, and the
reference's l+r / l-r butterfly ordering is reproduced).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import gf


def powers(base_int, n: int):
    """base: python-int pair -> (2, n) array [1, base, base^2, ...] built by
    device-side doubling (log n vectorized muls)."""
    out = gf.ones((1,))
    cur = base_int
    while out.shape[1] < n:
        nxt = gf.mul(out, gf.full((1,), cur[0], cur[1]))
        out = jnp.concatenate([out, nxt], axis=1)
        cur = gf._py_mul(cur, cur)
    return out[:, :n]


def fft(coeffs, log_order: int, rou_int):
    """coeffs: (2, coef_len), coef_len = 2^lg_coef <= 2^log_order;
    rou_int: python-int pair, root of unity of order 2^log_order.
    Returns (2, 2^log_order) evaluations, matching
    fast_fourier_transform(coeffs, coef_len, order, rou, result)."""
    coef_len = coeffs.shape[1]
    lg_coef = coef_len.bit_length() - 1
    assert coef_len == 1 << lg_coef
    order = 1 << log_order
    assert lg_coef <= log_order

    # rot_mul[dep] = rou^(2^dep), host-side ints
    rot_mul = []
    rot = rou_int
    for _ in range(max(lg_coef, 1)):
        rot_mul.append(rot)
        rot = gf._py_mul(rot, rot)

    # init: block-replicate coefficients (RS_polynomial.cpp:54-60):
    # dst[(j << lg_coef) | i] = coef[i]
    blk = order // coef_len
    dst = jnp.tile(coeffs, (1, blk))

    for dep in range(lg_coef - 1, -1, -1):
        m = 1 << dep
        half_blk = order >> (dep + 1)
        w = powers(rot_mul[dep], half_blk)          # rou^(2^dep * k)
        pre = dst.reshape(2, half_blk, 2, m)
        e = pre[:, :, 0, :]
        o = pre[:, :, 1, :]
        t = gf.mul(w[:, :, None], o)
        dst = jnp.concatenate([gf.add(e, t), gf.sub(e, t)], axis=1)\
                 .reshape(2, order)
    return dst


def ifft(evals, rou_int):
    """Inverse FFT with coef_len == order (the only case the reference PC
    uses: RS_polynomial.cpp:159-220).  rou_int: order-n root (int pair)."""
    n = evals.shape[1]
    lg = n.bit_length() - 1
    assert n == 1 << lg
    inv_rou = gf.pow_int(rou_int, (1 << lg) - 1)   # RS_polynomial.cpp:188-207
    out = fft(evals, lg, inv_rou)
    # scale by n^{-1} = n^(p-2) in the BASE field (RS_polynomial.cpp:214)
    inv_n = gf.pow_int((n % gf.MOD, 0), gf.MOD - 2)
    return gf.mul(out, gf.full((1,), inv_n[0], inv_n[1]))

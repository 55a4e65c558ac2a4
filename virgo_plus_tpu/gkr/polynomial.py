"""Dense low-degree polynomials over GF((2^61-1)^2), batched.

Reference: /root/reference/src/polynomial.{h,cpp} (and its duplicate under
lib/virgo/src): linear..quintuple classes with +, *, and Horner eval.  The
live protocol only ever uses linear and quadratic (sumcheck messages are
degree 2); the higher degrees are provided for API completeness.  Here a
degree-d polynomial batch is simply a (2, d+1, ...) coefficient tensor
(coefficients high-to-low, matching the reference's a,b,c,... ordering)
and every op is a vectorized field expression.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import gf


def poly(coeffs):
    """Stack (2,)-shaped field scalars (high coeff first) into (2, d+1)."""
    return jnp.stack(coeffs, axis=1)


def degree(p) -> int:
    return p.shape[1] - 1


def eval_at(p, x):
    """Horner: matches polynomial.cpp's eval chains.  p: (2, d+1, ...),
    x: (2, ...) -> (2, ...)."""
    acc = p[:, 0]
    for k in range(1, p.shape[1]):
        acc = gf.add(gf.mul(acc, x), p[:, k])
    return acc


def add(p, q):
    """Pad to common degree and add coefficient-wise."""
    d = max(p.shape[1], q.shape[1])
    if p.shape[1] < d:
        p = jnp.pad(p, ((0, 0), (d - p.shape[1], 0)) +
                    ((0, 0),) * (p.ndim - 2))
    if q.shape[1] < d:
        q = jnp.pad(q, ((0, 0), (d - q.shape[1], 0)) +
                    ((0, 0),) * (q.ndim - 2))
    return gf.add(p, q)


def mul(p, q):
    """Full convolution product (e.g. quadratic * linear -> cubic,
    polynomial.cpp's operator* overloads)."""
    dp, dq = p.shape[1], q.shape[1]
    out = None
    zero_tail = dp + dq - 2
    for i in range(dp):
        for j in range(dq):
            term = gf.mul(p[:, i], q[:, j])
            pos = i + j
            padded = jnp.zeros((2, dp + dq - 1) + term.shape[1:],
                               jnp.uint64).at[:, pos].set(term)
            out = padded if out is None else gf.add(out, padded)
    return out

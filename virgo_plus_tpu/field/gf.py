"""GF((2^61-1)^2) batched arithmetic — the TPU-native field core.

The reference implements this field with inline x86-64 ``mulx`` assembly and
AVX2 4-lane packing (/root/reference/lib/virgo/src/fieldElement.cpp:340-360,
466-487).  This module re-designs it for XLA:

**Representation.** An array of N field elements is a ``uint64[2, N]`` tensor:
plane 0 = real parts, plane 1 = imaginary parts, each canonical in
``[0, 2^61-1)``.  The minor axis vectorizes over VPU lanes; on CPU the u64
ops are native, on TPU XLA legalizes them to u32 pairs.

**Multiplication.** 61x61-bit products are built from four exact 32x32->64
partial products in u64 lanes — the same decomposition as the reference's
AVX2 ``packed_mymult`` (fieldElement.cpp:466-487) — followed by the Mersenne
fold ``(x >> 61) + (x & p)`` (fieldElement.cpp:336-338).  Extension
multiplication is the reference's 3-mult Karatsuba (fieldElement.cpp:49-78),
giving identical canonical outputs so transcripts serialize byte-for-byte.

A 4x-uint32 limb-plane variant of the same algorithms lives in
``gf_u32.py`` for Pallas kernels (Mosaic has no 64-bit integer support).

All functions are pure and jit-friendly.  Requires jax_enable_x64 (switched
on by the package __init__).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

MOD = (1 << 61) - 1  # 2305843009213693951, the Mersenne prime 2^61-1
MAX_ORDER = 62  # multiplicative group of GF(p^2) has order p^2-1 = 2^62*m

# Generator of the order-2^62 subgroup (fieldElement.cpp:237-249).
ROU_MAX_REAL = 2147483648
ROU_MAX_IMG = 1033321771269002680

_P = np.uint64(MOD)
_LO32 = np.uint64(0xFFFFFFFF)

__all__ = [
    "MOD", "MAX_ORDER",
    "zeros", "ones", "full", "from_u64", "to_u64", "from_int",
    "add", "sub", "neg", "mul",
    "eq", "is_zero",
    "pow_static", "inv", "root_of_unity", "root_of_unity_int", "inv_int",
]


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------

def zeros(shape=()):
    return jnp.zeros((2,) + tuple(shape), dtype=jnp.uint64)


def ones(shape=()):
    o = np.zeros((2,) + tuple(shape), dtype=np.uint64)
    o[0] = 1
    return jnp.asarray(o)


def full(shape, real, img=0):
    e = np.zeros((2,) + tuple(shape), dtype=np.uint64)
    e[0] = real
    e[1] = img
    return jnp.asarray(e)


def from_u64(real, img=None):
    real = np.asarray(real, dtype=np.uint64)
    if img is None:
        img = np.zeros_like(real)
    return jnp.stack([jnp.asarray(real), jnp.asarray(np.asarray(img, dtype=np.uint64))])


def to_u64(x):
    x = np.asarray(x)
    return x[0], x[1]


def from_int(x, img=0):
    if x < 0:
        x = MOD + x
    if img < 0:
        img = MOD + img
    return full((), x, img)


# ---------------------------------------------------------------------------
# Base-field primitives on u64 planes
# ---------------------------------------------------------------------------

def _cond_sub_p(x):
    return jnp.where(x >= _P, x - _P, x)


def _mymult(x, y):
    """floor(x*y / 2^61) + (x*y & p) for x, y < 2^62; result < ~8p.

    Exact 128-bit product via four 32x32->64 partials, identical to the
    reference's packed_mymult schedule (fieldElement.cpp:466-487)."""
    xl = x & _LO32
    xh = x >> 32
    yl = y & _LO32
    yh = y >> 32
    bd = xl * yl
    ac = xh * yh
    ad = xh * yl
    bc = xl * yh
    ad_bc = ad + bc
    hi = ac + ((ad_bc + (bd >> 32)) >> 32)
    lo = bd + (ad_bc << 32)
    return ((hi << 3) | (lo >> 61)) + (lo & _P)


def _base_neg(x):
    # x ^ p == p - x for canonical x (fieldElement.cpp:86-87)
    return x ^ _P


# ---------------------------------------------------------------------------
# Extension-field public ops
# ---------------------------------------------------------------------------

def add(x, y):
    return _cond_sub_p(x + y)


def reduce_lazy(x):
    """Reduce a lazy sum of up to 8 canonical elements (< 2^64) back to
    canonical [0, p): Mersenne fold + one conditional subtract.  Used after
    integer collectives (psum) which cannot reduce mod p themselves."""
    t = (x >> 61) + (x & _P)
    return _cond_sub_p(t)


def sub(x, y):
    return _cond_sub_p(x + (y ^ _P))


def neg(x):
    return _cond_sub_p(jnp.zeros_like(x) + (x ^ _P))


def mul(x, y):
    """(a+bi)(c+di): 3-mult Karatsuba (fieldElement.cpp:49-78)."""
    a, b = x[0], x[1]
    c, d = y[0], y[1]
    all_prod = _mymult(a + b, c + d)        # <= ~5p
    ac = _mymult(a, c)                      # < 2p
    bd = _mymult(b, d)                      # < 2p
    nac = _base_neg(_cond_sub_p(ac))
    nbd = _base_neg(_cond_sub_p(bd))
    t_img = all_prod + nac + nbd            # < 8p, fits u64
    t_img = (t_img >> 61) + (t_img & _P)    # myMod
    t_img = _cond_sub_p(t_img)
    t_real = _cond_sub_p(_cond_sub_p(ac + nbd))
    return jnp.stack([t_real, t_img])


def eq(x, y):
    return jnp.all(x == y, axis=0)


def is_zero(x):
    return jnp.all(x == 0, axis=0)


# ---------------------------------------------------------------------------
# Powers / inverses (static python-int exponents; unrolls at trace time)
# ---------------------------------------------------------------------------

def pow_static(x, e: int):
    acc = None
    base = x
    while e:
        if e & 1:
            acc = base if acc is None else mul(acc, base)
        e >>= 1
        if e:
            base = mul(base, base)
    if acc is None:
        return ones(x.shape[1:])
    return acc


_INV_EXP_BITS = np.array(
    [(MOD * MOD - 2) >> k & 1 for k in range((MOD * MOD - 2).bit_length())],
    dtype=bool)


def inv(x):
    """x^(p^2-2), batched.  Square-and-multiply as a lax.scan over the 122
    exponent bits (an unrolled chain makes XLA's CPU scheduler blow up)."""
    import jax

    def body(carry, bit):
        acc, base = carry
        acc = jnp.where(bit, mul(acc, base), acc)
        base = mul(base, base)
        return (acc, base), None

    shape = x.shape[1:]
    o = jnp.broadcast_to(ones(shape).reshape((2,) + shape), x.shape)
    (acc, _), _ = jax.lax.scan(body, (o, x), jnp.asarray(_INV_EXP_BITS))
    return acc


# ---------------------------------------------------------------------------
# Roots of unity (host-side python-int computation)
# ---------------------------------------------------------------------------

def _py_mul(x, y):
    a, b = x
    c, d = y
    ac = a * c % MOD
    bd = b * d % MOD
    ad_bc = ((a + b) * (c + d) - ac - bd) % MOD
    return ((ac - bd) % MOD, ad_bc)


def _py_pow(x, e):
    r = (1, 0)
    while e:
        if e & 1:
            r = _py_mul(r, x)
        x = _py_mul(x, x)
        e >>= 1
    return r


def root_of_unity_int(log_order: int):
    """(real, img) ints of the canonical 2^log_order root of unity
    (fieldElement.cpp:237-249)."""
    assert log_order <= 61
    rou = (ROU_MAX_REAL, ROU_MAX_IMG)
    for _ in range(MAX_ORDER - log_order):
        rou = _py_mul(rou, rou)
    return rou


def root_of_unity(log_order: int):
    r, i = root_of_unity_int(log_order)
    return full((), r, i)


def inv_int(x):
    return _py_pow(x, MOD * MOD - 2)


def pow_int(x, e: int):
    return _py_pow(x, e)

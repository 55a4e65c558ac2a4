"""GF((2^61-1)^2) batched arithmetic in uint32 limb planes — the TPU-native core.

The reference implements this field with inline x86-64 ``mulx`` assembly and AVX2
4-lane packing (``/root/reference/lib/virgo/src/fieldElement.cpp:340-360,
466-487``).  TPUs have no 64-bit integer multiplier, so the TPU-native design
keeps every element as four uint32 *limb planes* laid out on a leading axis:

    limbs[0] = real  & 0xFFFFFFFF      (low 32 bits)
    limbs[1] = real >> 32              (high 29 bits, value < 2^61-1)
    limbs[2] = imag  & 0xFFFFFFFF
    limbs[3] = imag >> 32

so an array of N field elements is a ``uint32[4, N]`` tensor whose minor axis
vectorizes over the 8x128 VPU lanes.  Multiplication decomposes each 61-bit
component into 16-bit limbs; all partial products fit a uint32 lane, column
sums are carry-normalised, and the Mersenne reduction ``(x >> 61) + (x & p)``
becomes shifts and masks (same fold as ``fieldElement.cpp:336-338``).

All functions are pure and jit-friendly; values are kept canonical in
``[0, p)`` at function boundaries, exactly like the reference arithmetic
(each reference operator reduces its result to canonical range), so proof
transcripts serialize byte-identically.

Extension arithmetic is GF(p)[i]/(i^2+1) (p = 2^61-1 = 3 mod 4) using the same
3-multiplication Karatsuba schedule as ``fieldElement.cpp:49-78``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

MOD = (1 << 61) - 1  # 2305843009213693951, the Mersenne prime 2^61-1
P_LO = np.uint32(0xFFFFFFFF)  # low 32 bits of MOD
P_HI = np.uint32(0x1FFFFFFF)  # high 29 bits of MOD
MAX_ORDER = 62  # the multiplicative group of GF(p^2) has order p^2-1 = 2^62*m

# Generator of the order-2^62 subgroup (fieldElement.cpp:237-249).
ROU_MAX_REAL = 2147483648
ROU_MAX_IMG = 1033321771269002680

U16 = np.uint32(0xFFFF)

__all__ = [
    "MOD", "MAX_ORDER",
    "zeros", "ones", "full", "from_u64", "to_u64", "from_int",
    "add", "sub", "neg", "mul", "mul_base_lazy", "reduce_base",
    "eq", "is_zero", "scale_int",
    "pow_static", "inv", "root_of_unity", "batch_inverse",
]


# ---------------------------------------------------------------------------
# Construction / conversion (host side uses numpy; device side stays uint32)
# ---------------------------------------------------------------------------

def zeros(shape=(), dtype_module=jnp):
    return dtype_module.zeros((4,) + tuple(shape), dtype=jnp.uint32)


def ones(shape=()):
    o = np.zeros((4,) + tuple(shape), dtype=np.uint32)
    o[0] = 1
    return jnp.asarray(o)


def full(shape, real, img=0):
    """Broadcast a single (real, img) python-int element to `shape`."""
    e = np.zeros((4,) + tuple(shape), dtype=np.uint32)
    e[0] = real & 0xFFFFFFFF
    e[1] = real >> 32
    e[2] = img & 0xFFFFFFFF
    e[3] = img >> 32
    return jnp.asarray(e)


def from_u64(real, img=None):
    """Build limb planes from numpy uint64 (or python-int) arrays."""
    real = np.asarray(real, dtype=np.uint64)
    if img is None:
        img = np.zeros_like(real)
    img = np.asarray(img, dtype=np.uint64)
    out = np.empty((4,) + real.shape, dtype=np.uint32)
    out[0] = (real & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[1] = (real >> np.uint64(32)).astype(np.uint32)
    out[2] = (img & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[3] = (img >> np.uint64(32)).astype(np.uint32)
    return jnp.asarray(out)


def to_u64(x):
    """Return (real, img) as numpy uint64 arrays (host-side)."""
    x = np.asarray(x)
    real = x[0].astype(np.uint64) | (x[1].astype(np.uint64) << np.uint64(32))
    img = x[2].astype(np.uint64) | (x[3].astype(np.uint64) << np.uint64(32))
    return real, img


def from_int(x, img=0):
    """Single scalar element from python ints (negative = mod + x, as the
    reference constructor fieldElement(long long) does)."""
    if x < 0:
        x = MOD + x
    if img < 0:
        img = MOD + img
    return full((), x, img)


# ---------------------------------------------------------------------------
# uint64-as-(lo,hi) primitive helpers.  Every value below is a pair of uint32
# arrays; carries are synthesised with compares (cheap VPU select ops).
# ---------------------------------------------------------------------------

def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    hi = ahi + bhi + carry
    return lo, hi


def _sub64(alo, ahi, blo, bhi):
    lo = alo - blo
    borrow = (alo < blo).astype(jnp.uint32)
    hi = ahi - bhi - borrow
    return lo, hi


def _geq64(alo, ahi, blo, bhi):
    return (ahi > bhi) | ((ahi == bhi) & (alo >= blo))


def _cond_sub_p(lo, hi):
    """One conditional subtract of p (as u64 pair)."""
    ge = _geq64(lo, hi, P_LO, P_HI)
    slo, shi = _sub64(lo, hi, jnp.uint32(P_LO), jnp.uint32(P_HI))
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def _mul_61x61_fold(xlo, xhi, ylo, yhi):
    """The reference ``mymult`` (fieldElement.cpp:340-360) on limb planes:
    inputs < 2^62 as (lo32, hi32) pairs; returns floor(x*y / 2^61) +
    ((x*y) & p) as a (lo, hi) pair, value < ~8p.

    The 124-bit product is built from 16-bit limbs so each lane product fits
    uint32; column sums stay below 2^19 so no lane ever overflows.
    """
    x0 = xlo & U16
    x1 = xlo >> 16
    x2 = xhi & U16
    x3 = xhi >> 16
    y0 = ylo & U16
    y1 = ylo >> 16
    y2 = yhi & U16
    y3 = yhi >> 16

    xs = (x0, x1, x2, x3)
    ys = (y0, y1, y2, y3)

    # Column accumulators: col[k] collects the low halves of products with
    # i+j==k plus the high halves of products with i+j==k-1.
    col = [jnp.zeros_like(xlo) for _ in range(8)]
    for i in range(4):
        for j in range(4):
            p = xs[i] * ys[j]
            col[i + j] = col[i + j] + (p & U16)
            col[i + j + 1] = col[i + j + 1] + (p >> 16)

    # Carry-normalise into exact 16-bit limbs d0..d7.
    d = [None] * 8
    carry = jnp.zeros_like(xlo)
    for k in range(8):
        t = col[k] + carry
        d[k] = t & U16
        carry = t >> 16
    # product < 2^124 so the final carry is absorbed in d7 (<2^16) already.

    lo_lo = d[0] | (d[1] << 16)
    lo_hi = d[2] | (d[3] << 16)
    hi_lo = d[4] | (d[5] << 16)
    hi_hi = d[6] | (d[7] << 16)

    # t = (hi64 << 3) | (lo64 >> 61)
    t_lo = (hi_lo << 3) | (lo_hi >> 29)
    t_hi = (hi_hi << 3) | (hi_lo >> 29)
    # m = lo64 & p
    m_lo = lo_lo
    m_hi = lo_hi & P_HI
    return _add64(t_lo, t_hi, m_lo, m_hi)


# ---------------------------------------------------------------------------
# Base-field ops on (lo, hi) pairs (canonical in, canonical out unless noted)
# ---------------------------------------------------------------------------

def _base_add(alo, ahi, blo, bhi):
    lo, hi = _add64(alo, ahi, blo, bhi)
    return _cond_sub_p(lo, hi)


def _base_neg(lo, hi):
    # x ^ p == p - x for canonical x (61-bit complement); p itself represents 0
    # only transiently — callers reduce. Mirrors fieldElement.cpp:86-87.
    return lo ^ P_LO, hi ^ P_HI


def _base_sub(alo, ahi, blo, bhi):
    nlo, nhi = _base_neg(blo, bhi)
    lo, hi = _add64(alo, ahi, nlo, nhi)
    return _cond_sub_p(lo, hi)


# ---------------------------------------------------------------------------
# Extension-field public ops on limb-plane tensors
# ---------------------------------------------------------------------------

def add(x, y):
    rlo, rhi = _base_add(x[0], x[1], y[0], y[1])
    ilo, ihi = _base_add(x[2], x[3], y[2], y[3])
    return jnp.stack([rlo, rhi, ilo, ihi])


def sub(x, y):
    rlo, rhi = _base_sub(x[0], x[1], y[0], y[1])
    ilo, ihi = _base_sub(x[2], x[3], y[2], y[3])
    return jnp.stack([rlo, rhi, ilo, ihi])


def neg(x):
    z = zeros(x.shape[1:])
    return sub(z, x)


def mul(x, y):
    """(a + bi)(c + di) with the reference's 3-mult Karatsuba schedule
    (fieldElement.cpp:49-78): real = ac - bd, imag = (a+b)(c+d) - ac - bd."""
    a_lo, a_hi, b_lo, b_hi = x[0], x[1], x[2], x[3]
    c_lo, c_hi, d_lo, d_hi = y[0], y[1], y[2], y[3]

    # a+b and c+d without reduction (inputs canonical so sums < 2^62)
    ab_lo, ab_hi = _add64(a_lo, a_hi, b_lo, b_hi)
    cd_lo, cd_hi = _add64(c_lo, c_hi, d_lo, d_hi)

    ap_lo, ap_hi = _mul_61x61_fold(ab_lo, ab_hi, cd_lo, cd_hi)  # < ~5p
    ac_lo, ac_hi = _mul_61x61_fold(a_lo, a_hi, c_lo, c_hi)      # < 2p
    bd_lo, bd_hi = _mul_61x61_fold(b_lo, b_hi, d_lo, d_hi)      # < 2p

    # reduce ac,bd to canonical then negate (for the imaginary part)
    nac_lo, nac_hi = _cond_sub_p(ac_lo, ac_hi)
    rbd_lo, rbd_hi = _cond_sub_p(bd_lo, bd_hi)
    nac_lo, nac_hi = _base_neg(nac_lo, nac_hi)
    nbd_lo, nbd_hi = _base_neg(rbd_lo, rbd_hi)

    # imag = all_prod - ac - bd, then Mersenne fold + conditional subtract
    t_lo, t_hi = _add64(ap_lo, ap_hi, nac_lo, nac_hi)
    t_lo, t_hi = _add64(t_lo, t_hi, nbd_lo, nbd_hi)  # < 8p < 2^64
    # myMod: (x >> 61) + (x & p)
    f_lo = (t_hi >> 29)
    f_hi = jnp.zeros_like(t_hi)
    m_lo = t_lo
    m_hi = t_hi & P_HI
    i_lo, i_hi = _add64(f_lo, f_hi, m_lo, m_hi)
    i_lo, i_hi = _cond_sub_p(i_lo, i_hi)

    # real = ac + (-bd); ac still lazy (<2p), -bd canonical, so < 3p:
    # two conditional subtracts (the reference uses a while loop).
    r_lo, r_hi = _add64(ac_lo, ac_hi, nbd_lo, nbd_hi)
    r_lo, r_hi = _cond_sub_p(r_lo, r_hi)
    r_lo, r_hi = _cond_sub_p(r_lo, r_hi)

    return jnp.stack([r_lo, r_hi, i_lo, i_hi])


def eq(x, y):
    return jnp.all(x == y, axis=0)


def is_zero(x):
    return jnp.all(x == 0, axis=0)


def scale_int(x, k: int):
    """Multiply by a small python-int constant via mul with a broadcast scalar."""
    return mul(x, full((), k % MOD))


# ---------------------------------------------------------------------------
# Powers / inverses.  Exponent is a static python int: the loop unrolls at
# trace time into ~122 squarings (compiler-friendly; no dynamic control flow).
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


def inv(x):
    """x^(p^2-2); works batched."""
    return pow_static(x, MOD * MOD - 2)


def batch_inverse(x):
    """Montgomery trick is sequential; for TPU the batched pow is simply
    ~122 vectorized squarings/mults, which is faster on wide arrays."""
    return inv(x)


# ---------------------------------------------------------------------------
# Roots of unity (host-side python-int computation; returns a scalar element)
# ---------------------------------------------------------------------------

def _py_base_mul(a, b):
    return (a * b) % MOD


def _py_mul(x, y):
    a, b = x
    c, d = y
    ac = _py_base_mul(a, c)
    bd = _py_base_mul(b, d)
    ad_bc = (_py_base_mul((a + b) % MOD, (c + d) % MOD) - ac - bd) % MOD
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
    """(real, img) python ints of the canonical 2^log_order root of unity,
    derived by repeated squaring from the fixed order-2^62 generator
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
    """Python-int inverse of an (real, img) pair."""
    return _py_pow(x, MOD * MOD - 2)

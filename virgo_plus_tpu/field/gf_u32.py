"""GF((2^61-1)^2) arithmetic in 4x uint32 limb planes — the Pallas/Mosaic
path.

Mosaic (the Pallas TPU compiler) has no 64-bit integer support, so kernels
that fuse field arithmetic into custom TPU code need a pure-u32 formulation.
This module provides it: an element is four uint32 planes
[real_lo32, real_hi29, imag_lo32, imag_hi29]; multiplication decomposes each
61-bit component into 16-bit limbs (all partial products fit a u32 lane),
accumulates carry-safe column sums, and applies the Mersenne fold as
shifts/masks — the same mathematics as field/gf.py's u64 path
(reference: packed_mymult, fieldElement.cpp:466-487), verified equal in
tests/test_field_u32.py.

Conversion to/from the u64 representation is a bitcast + transpose
(from_u64_planes / to_u64_planes), so XLA-level code and future Pallas
kernels can interoperate freely.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

MOD = (1 << 61) - 1
P_LO = np.uint32(0xFFFFFFFF)
P_HI = np.uint32(0x1FFFFFFF)
U16 = np.uint32(0xFFFF)


def from_u64_planes(x):
    """(2, ...) u64 -> (4, ...) u32 [rl, rh, il, ih].

    Mask/shift, not bitcast: lax.bitcast_convert_type to a trailing (..., 2)
    axis fuses catastrophically with upstream gathers on TPU (measured
    ~500x: 8ms vs 15us for a (2,4,2^16) convert+permute), while the word
    extraction below stays a clean elementwise pass."""
    lo = jnp.uint64(0xFFFFFFFF)
    return jnp.stack([(x[0] & lo).astype(jnp.uint32),
                      (x[0] >> np.uint64(32)).astype(jnp.uint32),
                      (x[1] & lo).astype(jnp.uint32),
                      (x[1] >> np.uint64(32)).astype(jnp.uint32)])


def to_u64_planes(x4):
    """(4, ...) u32 -> (2, ...) u64."""
    real = x4[0].astype(jnp.uint64) | (x4[1].astype(jnp.uint64) << 32)
    img = x4[2].astype(jnp.uint64) | (x4[3].astype(jnp.uint64) << 32)
    return jnp.stack([real, img])


# ---------------------------------------------------------------------------
# u64-as-(lo,hi) pair helpers in u32 lanes
# ---------------------------------------------------------------------------

def _add64(alo, ahi, blo, bhi):
    lo = alo + blo
    carry = (lo < alo).astype(jnp.uint32)
    hi = ahi + bhi + carry
    return lo, hi


def _geq_p(lo, hi):
    return (hi > P_HI) | ((hi == P_HI) & (lo >= P_LO))


def _cond_sub_p(lo, hi):
    ge = _geq_p(lo, hi)
    slo = lo - P_LO
    borrow = (lo < P_LO).astype(jnp.uint32)
    shi = hi - P_HI - borrow
    return jnp.where(ge, slo, lo), jnp.where(ge, shi, hi)


def _mul_61x61_fold(xlo, xhi, ylo, yhi):
    """mymult on limb planes: inputs < 2^62 as (lo32, hi32); returns
    floor(xy/2^61) + (xy & p) as (lo, hi), < ~8p.  16-bit limb schoolbook;
    column sums stay < 2^19."""
    xs = (xlo & U16, xlo >> 16, xhi & U16, xhi >> 16)
    ys = (ylo & U16, ylo >> 16, yhi & U16, yhi >> 16)
    col = [jnp.zeros_like(xlo) for _ in range(8)]
    for i in range(4):
        for j in range(4):
            p = xs[i] * ys[j]
            col[i + j] = col[i + j] + (p & U16)
            col[i + j + 1] = col[i + j + 1] + (p >> 16)
    d = [None] * 8
    carry = jnp.zeros_like(xlo)
    for k in range(8):
        t = col[k] + carry
        d[k] = t & U16
        carry = t >> 16
    lo_lo = d[0] | (d[1] << 16)
    lo_hi = d[2] | (d[3] << 16)
    hi_lo = d[4] | (d[5] << 16)
    hi_hi = d[6] | (d[7] << 16)
    t_lo = (hi_lo << 3) | (lo_hi >> 29)
    t_hi = (hi_hi << 3) | (hi_lo >> 29)
    return _add64(t_lo, t_hi, lo_lo, lo_hi & P_HI)


def add(x, y):
    rlo, rhi = _cond_sub_p(*_add64(x[0], x[1], y[0], y[1]))
    ilo, ihi = _cond_sub_p(*_add64(x[2], x[3], y[2], y[3]))
    return jnp.stack([rlo, rhi, ilo, ihi])


def sub(x, y):
    rlo, rhi = _cond_sub_p(*_add64(x[0], x[1], y[0] ^ P_LO, y[1] ^ P_HI))
    ilo, ihi = _cond_sub_p(*_add64(x[2], x[3], y[2] ^ P_LO, y[3] ^ P_HI))
    return jnp.stack([rlo, rhi, ilo, ihi])


def mul(x, y):
    """3-mult Karatsuba, canonical in/out (fieldElement.cpp:49-78)."""
    a_lo, a_hi, b_lo, b_hi = x[0], x[1], x[2], x[3]
    c_lo, c_hi, d_lo, d_hi = y[0], y[1], y[2], y[3]
    ab_lo, ab_hi = _add64(a_lo, a_hi, b_lo, b_hi)
    cd_lo, cd_hi = _add64(c_lo, c_hi, d_lo, d_hi)
    ap = _mul_61x61_fold(ab_lo, ab_hi, cd_lo, cd_hi)
    ac = _mul_61x61_fold(a_lo, a_hi, c_lo, c_hi)
    bd = _mul_61x61_fold(b_lo, b_hi, d_lo, d_hi)
    nac_lo, nac_hi = _cond_sub_p(*ac)
    nbd_lo, nbd_hi = _cond_sub_p(*bd)
    nac = (nac_lo ^ P_LO, nac_hi ^ P_HI)
    nbd = (nbd_lo ^ P_LO, nbd_hi ^ P_HI)
    t_lo, t_hi = _add64(*_add64(*ap, *nac), *nbd)
    f_lo, f_hi = _add64(t_hi >> 29, jnp.zeros_like(t_hi), t_lo, t_hi & P_HI)
    i_lo, i_hi = _cond_sub_p(f_lo, f_hi)
    r_lo, r_hi = _cond_sub_p(*_cond_sub_p(*_add64(*ac, *nbd)))
    return jnp.stack([r_lo, r_hi, i_lo, i_hi])

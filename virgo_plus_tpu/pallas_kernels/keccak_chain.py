"""Pallas TPU kernel for SHA3-256 on 64-byte blocks.

The XLA keccak (pc/keccak.py) materializes ~10 (25, N) intermediates per
round through HBM, so one hash call costs hundreds of microseconds at
Merkle widths and the 65-step leaf chains (fri.cpp:96-124) dominate the
PC prover.  This kernel runs the whole Keccak-f[1600] permutation with the
state resident in VMEM/vector registers: the only HBM traffic is reading
the 8 message words and writing the 4 digest words.

Mosaic has no 64-bit integers, so every u64 word is an (lo, hi) u32 pair;
ROTL64 specializes per compile-time rotation constant into 2-6 shift/or
ops on the pair.  Bit-identical to pc/keccak.sha3_256_x64 (tested in
interpret mode and cross-checked against hashlib).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBL = 8                     # lanes per op = SUBL * LANES


def _perm_tables():
    from ..pc.keccak import _RC, _PERM_SRC, _PERM_ROT
    return _RC, _PERM_SRC, _PERM_ROT


def _xor(a, b):
    return (a[0] ^ b[0], a[1] ^ b[1])


def _rotl(x, r: int):
    """ROTL64 of an (lo, hi) u32 pair by compile-time r."""
    lo, hi = x
    r = r % 64
    if r == 0:
        return x
    if r == 32:
        return (hi, lo)
    if r > 32:
        lo, hi = hi, lo
        r -= 32
    rr = np.uint32(r)
    cr = np.uint32(32 - r)
    return ((lo << rr) | (hi >> cr), (hi << rr) | (lo >> cr))


def _keccak_f(st):
    """st: list of 25 (lo, hi) pairs; each half a (SUBL, LANES) u32."""
    RC, PERM_SRC, PERM_ROT = _perm_tables()
    for rnd in range(24):
        # theta
        c = [st[x] for x in range(5)]
        for y in range(1, 5):
            for x in range(5):
                c[x] = _xor(c[x], st[x + 5 * y])
        d = [_xor(c[(x + 4) % 5], _rotl(c[(x + 1) % 5], 1))
             for x in range(5)]
        st = [_xor(st[i], d[i % 5]) for i in range(25)]
        # rho + pi
        b = [_rotl(st[int(PERM_SRC[j])], int(PERM_ROT[j])) for j in range(25)]
        # chi
        ns = []
        for y in range(5):
            for x in range(5):
                b1 = b[(x + 1) % 5 + 5 * y]
                b2 = b[(x + 2) % 5 + 5 * y]
                ns.append((b[x + 5 * y][0] ^ (~b1[0] & b2[0]),
                           b[x + 5 * y][1] ^ (~b1[1] & b2[1])))
        st = ns
        # iota
        rc = int(RC[rnd])
        st[0] = (st[0][0] ^ np.uint32(rc & 0xFFFFFFFF),
                 st[0][1] ^ np.uint32(rc >> 32))
    return st


def _kernel(xs_ref, out_ref):
    """xs_ref: (8, 2, SUBL, LANES) u32 message words; out: (4, 2, S, L)."""
    zero = jnp.zeros((SUBL, LANES), jnp.uint32)
    st = [(zero, zero) for _ in range(25)]
    for w in range(8):
        st[w] = (xs_ref[w, 0], xs_ref[w, 1])
    st[8] = (jnp.full((SUBL, LANES), np.uint32(0x06), jnp.uint32), zero)
    st[16] = (zero, jnp.full((SUBL, LANES), np.uint32(0x80000000),
                             jnp.uint32))
    st = _keccak_f(st)
    for w in range(4):
        out_ref[w, 0] = st[w][0]
        out_ref[w, 1] = st[w][1]


@functools.lru_cache(maxsize=None)
def _call(n_blocks: int, interpret: bool):
    z = np.int32(0)
    return pl.pallas_call(
        _kernel,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec((8, 2, SUBL, LANES), lambda b: (z, z, b, z),
                               memory_space=pltpu.VMEM)],
        out_shape=jax.ShapeDtypeStruct((4, 2, n_blocks * SUBL, LANES),
                                       jnp.uint32),
        out_specs=pl.BlockSpec((4, 2, SUBL, LANES), lambda b: (z, z, b, z),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def sha3_256_x64_pallas(words, interpret: bool = False):
    """Drop-in for pc/keccak.sha3_256_x64: (8, N) u64 LE words -> (4, N)."""
    n = words.shape[1]
    blk = SUBL * LANES
    n_pad = -(-n // blk) * blk
    n_blocks = n_pad // blk
    w = jnp.pad(words, ((0, 0), (0, n_pad - n)))
    lo = (w & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (w >> jnp.uint64(32)).astype(jnp.uint32)
    xs32 = jnp.stack([lo, hi], axis=1).reshape(8, 2, n_blocks * SUBL, LANES)
    out32 = _call(n_blocks, interpret)(xs32)
    out32 = out32.reshape(4, 2, n_pad)
    out = out32[:, 0].astype(jnp.uint64) | (
        out32[:, 1].astype(jnp.uint64) << jnp.uint64(32))
    return out[:, :n]

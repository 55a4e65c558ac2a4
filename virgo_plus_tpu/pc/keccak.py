"""Vectorized SHA3-256 (Keccak-f[1600]) in uint64 lanes.

The reference links XKCP's ``SHA3_256`` and hashes exactly 64-byte blocks
(/root/reference/lib/virgo/src/my_hhash.h:27-33).  TPU-native equivalent:
the Keccak state is a (25, N) uint64 tensor — one lane column per message —
so one call hashes an entire Merkle level / leaf batch.

The 24 rounds run as a ``lax.scan`` over a single vectorized round body
(theta as an axis reduction, rho+pi as one static permutation gather with a
per-row rotation vector, chi as rolls) — an unrolled 24-round DAG makes
XLA's scheduler take minutes, the scan body compiles in ~1s.

Only the 64-byte single-block path is needed (SHA3-256 rate = 136 bytes):
absorb 8 words, pad 0x06 at byte 64 and 0x80 at byte 135, permute, squeeze
4 words.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_RC = np.array([
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
], dtype=np.uint64)

# rotation offsets r[x][y], flat state index = x + 5*y
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

# rho+pi as one permutation: b[y + 5*((2x+3y)%5)] = rotl(a[x+5y], ROT[x][y])
_PERM_SRC = np.zeros(25, dtype=np.int32)
_PERM_ROT = np.zeros(25, dtype=np.uint64)
for _x in range(5):
    for _y in range(5):
        _j = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PERM_SRC[_j] = _x + 5 * _y
        _PERM_ROT[_j] = _ROT[_x][_y]


def _round(a, rc):
    """One Keccak round; a: (25, N) uint64."""
    n = a.shape[1]
    A = a.reshape(5, 5, n)                       # [y, x]
    c = A[0] ^ A[1] ^ A[2] ^ A[3] ^ A[4]         # (5, N) indexed by x
    c1 = jnp.roll(c, -1, axis=0)                 # c[(x+1)%5]
    d = jnp.roll(c, 1, axis=0) ^ ((c1 << jnp.uint64(1)) |
                                  (c1 >> jnp.uint64(63)))
    a = a ^ jnp.tile(d, (5, 1))                  # row i gets d[i % 5]
    # rho + pi
    src = a[jnp.asarray(_PERM_SRC)]
    rot = jnp.asarray(_PERM_ROT)[:, None]
    left = src << rot
    right = jnp.where(rot == 0, jnp.uint64(0),
                      src >> (jnp.uint64(64) - rot))
    b = left | right
    # chi
    B = b.reshape(5, 5, n)
    chi = b ^ ((~jnp.roll(B, -1, axis=1).reshape(25, n)) &
               jnp.roll(B, -2, axis=1).reshape(25, n))
    chi = chi.at[0].set(chi[0] ^ rc)
    return chi, None


import os

# Unrolled rounds trade 24 scan-iteration overheads for straight-line code.
# On TPU loop overhead dominates (measured ~65us/iteration: one sha3 call
# costs 1.6ms as a scan vs 0.021ms unrolled, and the 65-step FRI leaf chain
# drops 9.8ms -> 0.02ms), so unroll is the default off-CPU; the CPU XLA
# scheduler chokes on the unrolled DAG, so CPU keeps the scan.
_UNROLL_ENV = os.environ.get("VPT_KECCAK_UNROLL")


def _use_unroll() -> bool:
    if _UNROLL_ENV is not None:
        return _UNROLL_ENV == "1"
    return jax.default_backend() not in ("cpu",)


def keccak_f(state):
    """state: (25, N) uint64 -> (25, N)."""
    if _use_unroll():
        for rnd in range(24):
            state, _ = _round(state, jnp.uint64(_RC[rnd]))
        return state
    out, _ = jax.lax.scan(_round, state, jnp.asarray(_RC))
    return out


# Pallas VMEM-resident permutation: the XLA formulation round-trips ~10
# (25, N) intermediates per round through HBM (a 65-step Merkle leaf chain
# costs ~22 ms at SHA256_64 widths); the kernel's only HBM traffic is the
# message in and digest out.  Default on off-CPU; bit-exactness pinned by
# tests/test_pallas_kernels.py (interpret mode vs hashlib).
_PALLAS_ENV = os.environ.get("VPT_PALLAS_KECCAK")


def _use_pallas() -> bool:
    if _PALLAS_ENV is not None:
        return _PALLAS_ENV == "1"
    return jax.default_backend() not in ("cpu",)


def sha3_256_x64(words):
    """SHA3-256 of 64-byte messages given as (8, N) uint64 words (LE).
    Returns (4, N) uint64 digest words."""
    if _use_pallas():
        from ..pallas_kernels.keccak_chain import sha3_256_x64_pallas
        return sha3_256_x64_pallas(words)
    return sha3_256_x64_xla(words)


def sha3_256_x64_xla(words):
    """Pure-XLA formulation (CPU path and bit-exactness cross-check)."""
    n = words.shape[1]
    state = jnp.zeros((25, n), jnp.uint64)
    state = state.at[:8].set(words)
    state = state.at[8].set(jnp.uint64(0x06))                 # pad (byte 64)
    state = state.at[16].set(jnp.uint64(0x80) << jnp.uint64(56))  # byte 135
    return keccak_f(state)[:4]


def digest_to_bytes(d):
    """(4,) uint64 digest -> 32 bytes (host-side)."""
    return b"".join(int(np.asarray(x)).to_bytes(8, "little") for x in d)

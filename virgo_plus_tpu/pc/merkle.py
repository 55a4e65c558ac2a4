"""Merkle tree construction and verification over SHA3-256 digests.

Reference: /root/reference/lib/virgo/src/merkle_tree.cpp:7-51 — heap layout
in a 2N array (root at index 1, leaves at [N, 2N)), parent = SHA3-256 of the
two 32-byte children concatenated.  TPU-native: digests are (4, N) uint64
word tensors and every level is one batched sha3_256_x64 call
(level-synchronous hashing; log N sequential steps).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .keccak import sha3_256_x64


def create_tree(leaves):
    """leaves: (4, N) digests, N a power of two.
    Returns (4, 2N) heap-layout tree; root = tree[:, 1], tree[:, 0] = 0."""
    n = leaves.shape[1]
    assert n & (n - 1) == 0
    levels = [leaves]
    cur = leaves
    while cur.shape[1] > 1:
        le = cur[:, 0::2]
        ri = cur[:, 1::2]
        words = jnp.concatenate([le, ri], axis=0)  # (8, n/2)
        cur = sha3_256_x64(words)
        levels.append(cur)
    parts = [jnp.zeros((4, 1), jnp.uint64)]
    for lv in reversed(levels[1:]):
        parts.append(lv)
    parts.append(leaves)
    return jnp.concatenate(parts, axis=1)


def root_of(tree):
    return tree[:, 1]


def merkle_path(tree, pos: int):
    """Sibling digests from leaf `pos` (heap index N+pos) to below the root.
    Host-side helper for proof serialization; returns (4, depth) array."""
    n = tree.shape[1] // 2
    idx = []
    p = n + pos
    while p > 1:
        idx.append(p ^ 1)
        p //= 2
    return tree[:, np.array(idx, dtype=np.int64)]

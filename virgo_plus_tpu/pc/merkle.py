"""Merkle tree construction and verification over SHA3-256 digests.

Reference: /root/reference/lib/virgo/src/merkle_tree.cpp:7-51 — heap layout
in a 2N array (root at index 1, leaves at [N, 2N)), parent = SHA3-256 of the
two 32-byte children concatenated.  TPU-native: digests are (4, N) uint64
word tensors and every level is one batched sha3_256_x64 call
(level-synchronous hashing; log N sequential steps).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .keccak import sha3_256_x64


def create_tree(leaves):
    """leaves: (4, N) digests, N a power of two.
    Returns (4, 2N) heap-layout tree; root = tree[:, 1], tree[:, 0] = 0.

    Levels run as ONE lax.scan over a fixed-width buffer (each level's
    digests live in the valid prefix; the junk tail is hashed and discarded)
    so the whole tree is a single keccak instantiation in the graph — an
    unrolled per-level chain bloats fused modules ~10x and measures slower
    on TPU (0.063 ms vs 0.021 ms for 2^11 leaves)."""
    n = leaves.shape[1]
    assert n & (n - 1) == 0
    if n == 1:
        return jnp.concatenate([jnp.zeros((4, 1), jnp.uint64), leaves],
                               axis=1)
    depth = n.bit_length() - 1

    def body(cur, _):
        h = sha3_256_x64(jnp.concatenate([cur[:, 0::2], cur[:, 1::2]],
                                         axis=0))       # (4, n/2)
        return jnp.concatenate([h, h], axis=1), h

    _, hs = jax.lax.scan(body, leaves, None, length=depth)
    parts = [jnp.zeros((4, 1), jnp.uint64)]
    for d in range(depth - 1, -1, -1):
        parts.append(hs[d][:, :n >> (d + 1)])
    parts.append(leaves)
    return jnp.concatenate(parts, axis=1)


def create_trees_batched(leaves_list):
    """Build many Merkle trees TOGETHER: every loop iteration hashes the
    current level of every still-active tree in one sha3 call, so a forest
    of K trees costs max-depth sequential hash steps instead of the sum of
    depths (the per-level keccak dispatch is latency-bound at these widths,
    not throughput-bound).  Bit-identical to create_tree per tree.

    leaves_list: [(4, N_k)] -> [(4, 2*N_k)] heap-layout trees."""
    k = len(leaves_list)
    levels = [[lv] for lv in leaves_list]   # per tree, levels bottom-up
    cur = list(leaves_list)
    while True:
        active = [t for t in range(k) if cur[t].shape[1] > 1]
        if not active:
            break
        parts = [jnp.concatenate([cur[t][:, 0::2], cur[t][:, 1::2]], axis=0)
                 for t in active]
        widths = [p.shape[1] for p in parts]
        h = sha3_256_x64(jnp.concatenate(parts, axis=1))
        off = 0
        for t, w in zip(active, widths):
            cur[t] = h[:, off:off + w]
            levels[t].append(cur[t])
            off += w
    trees = []
    for t in range(k):
        parts = [jnp.zeros((4, 1), jnp.uint64)] + levels[t][::-1]
        trees.append(jnp.concatenate(parts, axis=1))
    return trees


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

"""Query-sparse answering from sharded oracles (the >1-HBM path).

The single-chip prover answers FRI queries from host mirrors of the full
codewords and Merkle trees (pc/vpd.py OracleHost).  At pod-slice scale the
codewords do not fit one address space (PODSLICE.md: 2^26 input => ~17 GB
of codeword state), so the sharded prover must never gather them.  This
module answers queries with *sparse* gathers instead: per oracle only the
~33 opened value-pairs and the O(33 * log N) Merkle path digests move,
pulled from the device-resident sharded arrays that
parallel/pc_sharded.sharded_pc_prove leaves in place.

Digest addressing (layout contract with pc_sharded._local_tree): a tree
with n_leaf leaves is stored as

* ``sub``  (4, S * nsub), sharded: shard q holds the subtree over the
  contiguous leaf block [q*half, (q+1)*half), half = n_leaf/S, as levels
  bottom-up (sizes half, half/2, .., 1; nsub = 2*half - 1);
* ``top``  (4, 2*S - 1), replicated: the global levels above, bottom-up
  (sizes S, S/2, .., 1);
* tiny trees (half < 1, i.e. n_leaf < S) skip sub and store every level
  in ``top`` (sizes n_leaf, .., 1).

A node at global level d (leaves = level 0), index m:
  d <= lg(half):  shard q = m >> (lg(half) - d), local index
                  m - q*(half >> d), at sub offset sum_{e<d}(half >> e);
  d  > lg(half):  top level dt = d - lg(half), offset sum_{e<dt}(S >> e).

Output is bit-identical to pc/vpd.answer_queries (asserted in
tests/test_gkr_sharded.py), including the reference's deduplicated
proof-size accounting (positions-only, vpd.dedup_proof_size).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..pc import vpd
from ..pc.virgo_pc import LOG_SLICE, RATE


@jax.jit
def _take_last(arr, idx):
    return arr[..., idx]


@dataclass
class ShardedOracle:
    """Host handle to a device-resident sharded oracle."""
    cw: object               # (2, 65, n) shard-major strided codeword
    sub: Optional[object]    # (4, S*nsub) per-shard subtree digests
    top: np.ndarray          # replicated top levels (see module docstring)
    n: int                   # codeword positions per slice
    S: int                   # shard count

    @property
    def tiny(self) -> bool:
        # matches pc_sharded._local_tree's branch: per-shard leaf count
        # (n/2)/S below S means the whole tree lives in `top`
        return (self.n // 2 // self.S) < self.S

    @property
    def root(self) -> np.ndarray:
        return self.top[:, -1]


def _level_offsets(n: int) -> List[int]:
    """Offsets of levels [n, n/2, .., 1] concatenated bottom-up."""
    offs, cur, off = [], n, 0
    while cur >= 1:
        offs.append(off)
        off += cur
        cur //= 2
    return offs


def gather_vals(desc: ShardedOracle, pos: np.ndarray) -> np.ndarray:
    """Natural positions pos (R,) -> (R, 65, 2, 2) value pairs
    (pos, pos + n/2), matching vpd._gather_vals bit for bit.  Natural
    position p lives at shard-major flat index (p % S)*L + p//S."""
    S, n = desc.S, desc.n
    L = n // S
    p = np.asarray(pos, np.int64)
    ph = p + n // 2
    fa = (p % S) * L + p // S
    fb = (ph % S) * L + ph // S
    both = jnp.asarray(np.concatenate([fa, fb]).astype(np.int32))
    vals = np.asarray(_take_last(desc.cw, both))       # (2, 65, 2R)
    R = len(p)
    a, b = vals[:, :, :R], vals[:, :, R:]
    out = np.stack([a, b], axis=3)                     # (2, 65, R, 2)
    return np.ascontiguousarray(out.transpose(2, 1, 3, 0))


def gather_paths(desc: ShardedOracle, pos: np.ndarray) -> np.ndarray:
    """Leaf positions pos (R,) -> (R, depth+1, 4): sibling digests
    bottom-up then the leaf digest, matching vpd._gather_paths."""
    n_leaf = desc.n // 2
    depth = n_leaf.bit_length() - 1
    R = len(pos)
    out = np.zeros((R, depth + 1, 4), np.uint64)
    top = np.asarray(desc.top)
    half = n_leaf // desc.S
    if desc.tiny:
        # tiny tree: every level is in top
        offs = _level_offsets(n_leaf)
        for r in range(R):
            p = int(pos[r])
            for d in range(depth):
                out[r, d] = top[:, offs[d] + ((p >> d) ^ 1)]
            out[r, depth] = top[:, offs[0] + p]
        return out
    sub_depth = half.bit_length() - 1
    nsub = 2 * half - 1
    sub_offs = _level_offsets(half)
    top_offs = _level_offsets(desc.S)
    sub_idx, sub_slots = [], []
    for r in range(R):
        p = int(pos[r])
        nodes = [(d, (p >> d) ^ 1) for d in range(depth)] + [(0, p)]
        for slot, (d, m) in enumerate(nodes):
            if d <= sub_depth:
                q = m >> (sub_depth - d)
                ml = m - q * (half >> d)
                sub_idx.append(q * nsub + sub_offs[d] + ml)
                sub_slots.append((r, slot))
            else:
                dt = d - sub_depth
                out[r, slot] = top[:, top_offs[dt] + m]
    if sub_idx:
        g = np.asarray(_take_last(
            desc.sub, jnp.asarray(np.array(sub_idx, np.int32))))  # (4, K)
        for k, (r, slot) in enumerate(sub_slots):
            out[r, slot] = g[:, k]
    return out


def answer_queries_sharded(pows: List[int], bl: int, l_desc: ShardedOracle,
                           h_desc: ShardedOracle,
                           level_descs: List[ShardedOracle]):
    """Sparse-sharded equivalent of vpd.answer_queries: same QueryAnswers
    content, same deduplicated proof size, O(R log N) data movement."""
    lg0 = bl + RATE - LOG_SLICE
    pows_np = np.asarray(pows, dtype=np.int64)
    p0s = pows_np // 2
    init_l_vals = gather_vals(l_desc, p0s)
    init_l_paths = gather_paths(l_desc, p0s)
    init_h_vals = gather_vals(h_desc, p0s)
    init_h_paths = gather_paths(h_desc, p0s)
    lvl_vals, lvl_paths = [], []
    pw = pows_np.copy()
    for lvl, desc in enumerate(level_descs):
        if lvl > 0:
            pw = pw % (1 << (lg0 - lvl))
        bps = (pw // 2) % (desc.n // 2)
        lvl_vals.append(gather_vals(desc, bps))
        lvl_paths.append(gather_paths(desc, bps))
    proof_size = vpd.dedup_proof_size(pows, bl, len(level_descs))
    return vpd.QueryAnswers(
        init_l_vals=init_l_vals, init_l_paths=init_l_paths,
        init_h_vals=init_h_vals, init_h_paths=init_h_paths,
        lvl_vals=lvl_vals, lvl_paths=lvl_paths), proof_size

"""Sharded polynomial-commitment pipeline (SURVEY.md §5.8).

Layout choice does all the work: codeword positions shard *strided*
(position p lives on shard p mod S).  Then:

* **FFT**: shard q computes X[j*S + q] = FFT_L(c_n * w^{q n}) — a local
  length-L FFT of coset-twiddled coefficients (coefficients are 32x smaller
  than the codeword, so they replicate for free).  The reference's
  butterfly network becomes zero-communication; the "all-to-all" of a
  blocked layout is absorbed into the twiddle.
* **FRI folds**: pair (i, i + N/2) is congruent mod S — folds stay entirely
  shard-local at every level until N/2 < S.
* **Leaf chains**: leaf j hashes pairs (j, j + N/2) of all 65 slices —
  also shard-local.
* **Merkle tree**: the only communication — one all_to_all re-blocks leaf
  digests to contiguous ranges, each shard reduces its subtree, and an
  all_gather of the S subtree roots lets every shard finish the top
  log2(S) levels (the reference's single-thread create_tree has no
  analogue; this is the gather-reduce schedule).

Bit-exactness: field arithmetic is exact, so the re-associated twiddle
products produce identical values; the Merkle root equals the single-chip
root bit for bit (tested on the CPU mesh).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..field import gf
from ..pc.fft import fft, ifft, powers
from ..pc.keccak import sha3_256_x64
from ..pc.virgo_pc import LOG_SLICE, SLICES, RATE


def sharded_commit_private(mesh: Mesh, axis: str, bl: int):
    """Returns fn(values (2, 2^bl)) -> (root (4,), codeword_strided) with
    the commit pipeline sharded over `axis`."""
    S = mesh.shape[axis]
    log_s = S.bit_length() - 1
    assert 1 << log_s == S
    lg_ss = bl + RATE - LOG_SLICE
    ss = 1 << lg_ss
    srec = 1 << (bl - LOG_SLICE)
    L = ss // S                   # codeword positions per shard per slice
    assert L >= 2
    rou_small = gf.root_of_unity_int(bl - LOG_SLICE)
    rou_ss_int = gf.root_of_unity_int(lg_ss)
    rou_local_int = gf.pow_int(rou_ss_int, S)
    # per-shard coset bases w^q, precomputed host-side for all shards
    coset = np.zeros((2, S), dtype=np.uint64)
    cur = (1, 0)
    for q in range(S):
        coset[0, q], coset[1, q] = cur
        cur = gf._py_mul(cur, rou_ss_int)
    coset = jnp.asarray(coset)

    n_leaf = ss // 2
    leaf_per_shard = n_leaf // S
    sub_depth = leaf_per_shard.bit_length() - 1

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None),),
             out_specs=(P(None), P(None, None, axis)),
             check_vma=False)
    def run(values):
        q = jax.lax.axis_index(axis)
        # replicated per-slice IFFT (coefficients are small)
        sl = values.reshape(2, SLICES, srec)
        coefs = jax.vmap(lambda v: ifft(v, rou_small),
                         in_axes=1, out_axes=1)(sl)        # (2, 64, srec)
        # coset twiddle: c_n * (w^q)^n, then local FFT of order L
        base = coset[:, q]
        tw = _powers_dev(base, srec)                        # (2, srec)
        c2 = gf.mul(coefs, tw[:, None, :])
        local = jax.vmap(lambda c: fft(c, (L).bit_length() - 1,
                                       rou_local_int),
                         in_axes=1, out_axes=1)(c2)         # (2, 64, L)
        mask = jnp.zeros((2, 1, L), jnp.uint64)
        cw = jnp.concatenate([local, mask], axis=1)         # (2, 65, L)

        # leaf chains: local pairs (j, j + N/2) -> (4, L/2) digests
        half = L // 2
        x = cw[:, :, :half]
        y = cw[:, :, half:]
        xs = jnp.stack([x[0], x[1], y[0], y[1]], axis=1)    # (65, 4, half)

        def chain(state, slc):
            return sha3_256_x64(jnp.concatenate([slc, state], axis=0)), None

        leaves, _ = jax.lax.scan(chain, jnp.zeros((4, half), jnp.uint64), xs)
        # leaves[:, t] is global leaf j = t*S + q.

        # re-block: global leaf j -> shard j // leaf_per_shard.  Build the
        # exchange with one all_to_all over a (S, half/S ...) reshuffle:
        # shard q holds leaves {t*S + q}; destination shard d needs leaves
        # [d*lps, (d+1)*lps).  t*S + q in that range <=> t in
        # [d*lps/S, ...): contiguous t-blocks of size lps/S map to shard d.
        blk = leaf_per_shard // S
        send = leaves.reshape(4, S, blk)                    # t = d*blk + r
        recv = jax.lax.all_to_all(send, axis, split_axis=1, concat_axis=1,
                                  tiled=False)
        # recv: (4, S, blk) where recv[:, src, r] = leaf (d*blk + r)*S + src
        # global index within this shard's block: (blk*r? ) careful below.
        # local leaf l = j - d*lps = (t*S + src) - d*lps with t = d*blk + r
        #             = r*S + src  -> order by (r, src)
        sub = jnp.transpose(recv, (0, 2, 1)).reshape(4, leaf_per_shard)

        # local subtree reduction
        cur_level = sub
        sub_roots = []
        for _ in range(sub_depth):
            le = cur_level[:, 0::2]
            ri = cur_level[:, 1::2]
            cur_level = sha3_256_x64(jnp.concatenate([le, ri], axis=0))
        my_root = cur_level[:, 0]
        # gather the S subtree roots and finish the top levels replicated
        roots = jnp.moveaxis(jax.lax.all_gather(my_root, axis), 0, 1)
        lvl = roots
        while lvl.shape[1] > 1:
            lvl = sha3_256_x64(jnp.concatenate([lvl[:, 0::2], lvl[:, 1::2]],
                                               axis=0))
        return lvl[:, 0], cw

    return run


def _powers_dev(base, n: int):
    out = gf.ones((1,))
    cur = base
    while out.shape[1] < n:
        nxt = gf.mul(out, cur.reshape(2, 1))
        out = jnp.concatenate([out, nxt], axis=1)
        cur = gf.mul(cur, cur)
    return out[:, :n]

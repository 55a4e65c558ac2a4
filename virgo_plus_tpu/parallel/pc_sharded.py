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
    """Returns fn(values (2, 2^bl)) -> (root (4,), sub, top,
    codeword_strided) with the commit pipeline sharded over `axis`
    (sub/top = query-sparse tree parts, see _local_tree)."""
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
             out_specs=(P(None), P(None, axis), P(None),
                        P(None, None, axis)),
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
        root, sub, top = _local_tree(cw, axis, S)
        return root, sub, top, cw

    return jax.jit(run)


def _powers_dev(base, n: int):
    out = gf.ones((1,))
    cur = base
    while out.shape[1] < n:
        nxt = gf.mul(out, cur.reshape(2, 1))
        out = jnp.concatenate([out, nxt], axis=1)
        cur = gf.mul(cur, cur)
    return out[:, :n]


# ---------------------------------------------------------------------------
# Shared sharded-oracle construction (leaf chains local, Merkle
# gather-reduce) + the rest of the PC pipeline: public commit and LDT folds.
# ---------------------------------------------------------------------------

def _coset_table(base_int, S: int):
    """(2, S) powers base^q for q in [0, S) as a host constant."""
    out = np.zeros((2, S), dtype=np.uint64)
    cur = (1, 0)
    for q in range(S):
        out[0, q], out[1, q] = cur
        cur = gf._py_mul(cur, base_int)
    return jnp.asarray(out)


def _local_tree(cw, axis: str, S: int):
    """Inside shard_map: (2, 65, L) local strided codeword ->
    (root (4,) replicated, sub (4, nsub) per-shard subtree digests,
    top (4, ntop) replicated top levels).

    Leaf j packs pairs (j, j + N/2) of all 65 slices; with the strided
    layout both elements are local (j and j+N/2 share a residue mod S),
    so chains cost zero communication.  One all_to_all re-blocks digests
    to contiguous leaf ranges (shard q then owns global leaves
    [q*half, (q+1)*half)), each shard reduces its subtree keeping every
    level, and the S subtree roots finish replicated.

    Digest layout (the query-sparse answering contract, see
    ShardedOracle): ``sub`` concatenates the shard's subtree levels
    bottom-up (sizes half, half/2, .., 1 -> nsub = 2*half - 1); ``top``
    concatenates the global levels above bottom-up (sizes S, S/2, .., 1
    -> ntop = 2*S - 1, first S entries = the subtree roots).  When
    half < S (tiny codeword) sub is a (4, 1) dummy and top holds the
    WHOLE tree's levels bottom-up (sizes n_leaf .. 1)."""
    L = cw.shape[2]
    half = L // 2
    x = cw[:, :, :half]
    y = cw[:, :, half:]
    xs = jnp.stack([x[0], x[1], y[0], y[1]], axis=1)        # (65, 4, half)

    def chain(state, slc):
        return sha3_256_x64(jnp.concatenate([slc, state], axis=0)), None

    leaves, _ = jax.lax.scan(chain, jnp.zeros((4, half), jnp.uint64), xs)
    # leaves[:, t] = global leaf t*S + q on shard q
    n_leaf_local = half
    if n_leaf_local >= S:
        blk = n_leaf_local // S
        send = leaves.reshape(4, S, blk)
        recv = jax.lax.all_to_all(send, axis, split_axis=1, concat_axis=1,
                                  tiled=False)
        sub_levels = [jnp.transpose(recv, (0, 2, 1)).reshape(4,
                                                             n_leaf_local)]
        cur = sub_levels[0]
        while cur.shape[1] > 1:
            cur = sha3_256_x64(jnp.concatenate([cur[:, 0::2], cur[:, 1::2]],
                                               axis=0))
            sub_levels.append(cur)
        sub = jnp.concatenate(sub_levels, axis=1)     # (4, 2*half - 1)
        roots = jnp.moveaxis(jax.lax.all_gather(cur[:, 0], axis), 0, 1)
    else:
        # tiny level: gather all leaf digests and finish replicated
        sub = jnp.zeros((4, 1), jnp.uint64)
        g = jnp.moveaxis(jax.lax.all_gather(leaves, axis), 0, 1)  # (4,S,hf)
        # global leaf t*S + q sits at gathered [q, t] -> natural order
        roots = jnp.transpose(g, (0, 2, 1)).reshape(4, S * n_leaf_local)
    top_levels = [roots]
    lvl = roots
    while lvl.shape[1] > 1:
        lvl = sha3_256_x64(jnp.concatenate([lvl[:, 0::2], lvl[:, 1::2]],
                                           axis=0))
        top_levels.append(lvl)
    top = jnp.concatenate(top_levels, axis=1)
    return lvl[:, 0], sub, top


def _local_root(cw, axis: str, S: int):
    return _local_tree(cw, axis, S)[0]


def sharded_commit_public(mesh: Mesh, axis: str, bl: int):
    """poly_commit.h:126-349 sharded over `axis` with the strided layout.

    Returns fn(l_local (2,65,L) strided codeword block, q_values (2,2^bl)
    replicated) -> (root_h (4,), all_sum (2,65), vo_local (2,65,L),
    h_local (2,65,L)) under shard_map; vo/h stay strided for the fold
    phase.  Requires S <= 2^(RATE-1) so the l*q subsample (global stride
    16) lands on shard 0 only."""
    S = mesh.shape[axis]
    assert S <= 1 << (RATE - 1), "subsample stride must cover the mesh"
    lg_ss = bl + RATE - LOG_SLICE
    ss = 1 << lg_ss
    srec = 1 << (bl - LOG_SLICE)
    L = ss // S
    st = ss // (2 * srec)          # global subsample stride = 2^(RATE-1)
    st_local = st // S
    rou_small = gf.root_of_unity_int(bl - LOG_SLICE)
    rou_2s = gf.root_of_unity_int(bl - LOG_SLICE + 1)
    rou_ss_int = gf.root_of_unity_int(lg_ss)
    inv_rou_int = gf.inv_int(rou_ss_int)
    rou_local_int = gf.pow_int(rou_ss_int, S)
    coset = _coset_table(rou_ss_int, S)
    # xn(p) = rou^(srec*p); inv_x(p) = rou^(-p); p = t*S + q
    xn_base = _coset_table(gf.pow_int(rou_ss_int, srec), S)
    inv_base = _coset_table(inv_rou_int, S)
    xn_step_int = gf.pow_int(rou_ss_int, srec * S)
    inv_step_int = gf.pow_int(inv_rou_int, S)
    srec_el = gf.full((1,), srec % gf.MOD)
    one = gf.ones((1,))

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, None, axis), P(None, None)),
             out_specs=(P(None), P(None, axis), P(None), P(None, None),
                        P(None, None, axis), P(None, None, axis)),
             check_vma=False)
    def run(l_local, q_values):
        q = jax.lax.axis_index(axis)
        # q-side slice encode (replicated coefs, coset-twiddled local FFT)
        sl = q_values.reshape(2, SLICES, srec)
        q_coefs = jax.vmap(lambda v: ifft(v, rou_small),
                           in_axes=1, out_axes=1)(sl)
        tw = _powers_dev(coset[:, q], srec)
        c2 = gf.mul(q_coefs, tw[:, None, :])
        q_local = jax.vmap(lambda c: fft(c, L.bit_length() - 1,
                                         rou_local_int),
                           in_axes=1, out_axes=1)(c2)       # (2, 64, L)

        # l*q on the 2*srec subgroup: global positions k*st, all on shard 0
        lq_local = gf.mul(l_local[:, :SLICES, ::st_local],
                          q_local[:, :, ::st_local])        # (2, 64, 2srec)
        lq_sub = jax.lax.psum(
            jnp.where(q == 0, lq_local, jnp.zeros_like(lq_local)), axis)
        lq_coef = jax.vmap(lambda v: ifft(v, rou_2s),
                           in_axes=1, out_axes=1)(lq_sub)
        h_coef = lq_coef[:, :, srec:]
        c0 = gf.add(lq_coef[:, :, 0], h_coef[:, :, 0])      # (2, 64)
        all_sum = gf.mul(c0, srec_el)
        all_sum = jnp.concatenate(
            [all_sum, jnp.zeros((2, 1), jnp.uint64)], axis=1)

        # h on the big domain: coset-twiddled local FFT of h_coef
        tw_h = _powers_dev(coset[:, q], srec)
        h2 = gf.mul(h_coef, tw_h[:, None, :])
        h_local = jax.vmap(lambda c: fft(c, L.bit_length() - 1,
                                         rou_local_int),
                           in_axes=1, out_axes=1)(h2)       # (2, 64, L)

        # virtual oracle at local positions p = t*S + q
        xn = gf.mul(_powers_dev(gf.full((), *_int2(xn_step_int)), L),
                    xn_base[:, q][:, None])                 # (2, L)
        inv_x = gf.mul(_powers_dev(gf.full((), *_int2(inv_step_int)), L),
                       inv_base[:, q][:, None])
        lq_full = gf.mul(l_local[:, :SLICES], q_local)
        g = gf.sub(lq_full,
                   gf.mul(gf.sub(xn, one)[:, None, :], h_local))
        vo = gf.mul(gf.mul(gf.sub(g, c0[:, :, None]), srec_el[:, :, None]),
                    inv_x[:, None, :])
        vo = jnp.concatenate([vo, jnp.zeros((2, 1, L), jnp.uint64)], axis=1)
        h_full = jnp.concatenate(
            [h_local, jnp.zeros((2, 1, L), jnp.uint64)], axis=1)

        root_h, sub_h, top_h = _local_tree(h_full, axis, S)
        return root_h, sub_h, top_h, all_sum, vo, h_full

    return jax.jit(run)


def _int2(pair):
    return pair[0], pair[1]


def sharded_fold_step(mesh: Mesh, axis: str, lg_n: int):
    """One FRI fold (fri.cpp:315-334) on the strided layout — zero
    communication: pair (i, i + N/2) shares its residue mod S, and the
    output at local index t is the input's local pair (t, t + L/2)."""
    S = mesh.shape[axis]
    n = 1 << lg_n
    L = n // S
    assert L >= 2
    inv_rou_int = gf.inv_int(gf.root_of_unity_int(lg_n))
    inv_base = _coset_table(inv_rou_int, S)
    inv_step_int = gf.pow_int(inv_rou_int, S)
    inv2 = gf.inv_int((2, 0))
    inv2_el = gf.full((1, 1), inv2[0], inv2[1])

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, None, axis), P(None)),
             out_specs=P(None, None, axis), check_vma=False)
    def run(cw_local, r):
        q = jax.lax.axis_index(axis)
        half = L // 2
        # inv_mu at global positions t*S + q for t < half
        inv_mu = gf.mul(_powers_dev(gf.full((), *_int2(inv_step_int)), half),
                        inv_base[:, q][:, None])
        a = cw_local[:, :, :half]
        b = cw_local[:, :, half:]
        s = gf.add(a, b)
        d = gf.mul(gf.mul(gf.sub(a, b), inv_mu[:, None, :]),
                   r[:, None, None])
        return gf.mul(gf.add(s, d), inv2_el)

    return jax.jit(run)


def sharded_oracle_root(mesh: Mesh, axis: str):
    """fn(cw_local strided (2,65,L)) -> (4,) root (replicated)."""
    S = mesh.shape[axis]

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, axis),),
             out_specs=P(None), check_vma=False)
    def run(cw_local):
        return _local_root(cw_local, axis, S)

    return jax.jit(run)


def sharded_oracle_tree(mesh: Mesh, axis: str):
    """fn(cw_local strided (2,65,L)) -> (root (4,), sub (4, S*nsub)
    sharded, top (4, ntop) replicated) — the query-sparse tree parts
    (parallel/sharded_queries.ShardedOracle layout)."""
    S = mesh.shape[axis]

    @partial(shard_map, mesh=mesh, in_specs=(P(None, None, axis),),
             out_specs=(P(None), P(None, axis), P(None)), check_vma=False)
    def run(cw_local):
        return _local_tree(cw_local, axis, S)

    return jax.jit(run)


def unstride(cw_strided, S: int):
    """(2, 65, ss) shard-major device output -> natural position order."""
    cw = np.asarray(cw_strided)
    ss = cw.shape[2]
    L = ss // S
    out = np.empty_like(cw)
    blocks = cw.reshape(cw.shape[0], cw.shape[1], S, L)
    for q in range(S):
        out[:, :, q::S] = blocks[:, :, q, :]
    return out


def sharded_pc_prove(mesh: Mesh, axis: str, bl: int):
    """End-to-end sharded polynomial-commitment prove: private commit,
    public commit, and every LDT fold level sharded over `axis`.

    Returns fn(values (2,2^bl), q_values (2,2^bl), randomness list of (2,))
    -> dict with root/sub/top tree parts per oracle (the query-sparse
    layout of parallel/sharded_queries.ShardedOracle) and the strided
    codewords, ALL left sharded on device — nothing is gathered, so
    per-device memory stays O(full/S) (the >1-HBM requirement,
    PODSLICE.md).  Query answering uses sharded_queries.

    The whole pipeline compiles as ONE jit: an eagerly-dispatched shard_map
    pays a full lower+compile per call (~minutes on the CPU mesh), so the
    composed prove must never run its stages un-jitted."""
    S = mesh.shape[axis]
    lg = bl + RATE - LOG_SLICE
    commit_fn = sharded_commit_private(mesh, axis, bl)
    public_fn = sharded_commit_public(mesh, axis, bl)
    tree_fn = sharded_oracle_tree(mesh, axis)
    fold_fns = {}
    cur_lg = lg
    while (1 << cur_lg) > (1 << RATE):
        fold_fns[cur_lg] = sharded_fold_step(mesh, axis, cur_lg)
        cur_lg -= 1

    @jax.jit
    def run(values, q_values, randomness):
        root_l, l_sub, l_top, l_strided = commit_fn(values)
        root_h, h_sub, h_top, all_sum, vo, h_strided = public_fn(
            l_strided, q_values)
        levels = []
        cur = vo
        cur_lg = lg
        for r in randomness:
            cur = fold_fns[cur_lg](cur, r)
            cur_lg -= 1
            levels.append((tree_fn(cur), cur))
        return dict(
            root_l=root_l, l_sub=l_sub, l_top=l_top,
            root_h=root_h, h_sub=h_sub, h_top=h_top,
            all_sum=all_sum,
            l_codeword=l_strided, h_codeword=h_strided,
            level_roots=[lv[0][0] for lv in levels],
            level_subs=[lv[0][1] for lv in levels],
            level_tops=[lv[0][2] for lv in levels],
            level_codewords=[lv[1] for lv in levels],
            final_codeword=levels[-1][1])

    return run


def oracle_descs(out: dict, S: int, lg: int):
    """sharded_pc_prove output -> (l_desc, h_desc, level_descs) for
    parallel/sharded_queries.answer_queries_sharded."""
    from .sharded_queries import ShardedOracle

    def mk(cw, sub, top, n):
        return ShardedOracle(cw=cw, sub=sub, top=np.asarray(top), n=n, S=S)

    n0 = 1 << lg
    l_desc = mk(out["l_codeword"], out["l_sub"], out["l_top"], n0)
    h_desc = mk(out["h_codeword"], out["h_sub"], out["h_top"], n0)
    level_descs = [
        mk(cw, sub, top, n0 >> (k + 1))
        for k, (cw, sub, top) in enumerate(zip(
            out["level_codewords"], out["level_subs"], out["level_tops"]))]
    return l_desc, h_desc, level_descs

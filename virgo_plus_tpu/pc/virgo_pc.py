"""Virgo polynomial commitment (VPD) — prover side, TPU-native.

Reference: /root/reference/lib/virgo/src/poly_commit.h (slice commit
pipeline), fri.cpp (interleaved codeword, leaf chains, folds), vpd_prover.cpp.

Design notes (all verified against the reference index algebra):

* The reference interleaves the 65-slice codeword so a Merkle leaf j packs
  the (j, j+N/2) value pair of every slice (fri.cpp:67-94), then drives all
  folds through ``*_mapping`` indirection arrays.  The mapping always
  resolves to "value at natural slice position pos and pos+N/2", so the
  TPU-native state keeps codewords in natural (2, 65, N) layout; leaf chains
  and folds read strided slices directly and produce bit-identical hashes.

* Leaf hash = a 65-step SHA3-256 chain over the per-slice value pairs
  (fri.cpp:96-124), vectorized across all leaves: 65 batched keccak calls
  per level instead of 65 * N sequential ones.

* Fold step (fri.cpp:315-334):
    next[i] = 1/2 * ((v[i] + v[i+N/2]) + r * rou^{-i} * (v[i] - v[i+N/2]))
  — one vectorized expression per step over the (65, N/2) tensor.

The mask (ZK) machinery is carried exactly as the reference runs it: a
single zero mask element, so slice 64 is identically zero but still hashed
into every leaf chain (src/prover.cpp:526, src/verifier.cpp:377).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gf
from .fft import fft, ifft, powers
from .keccak import sha3_256_x64
from .merkle import create_tree

LOG_SLICE = 6
SLICES = 1 << LOG_SLICE       # 64 real slices (+1 mask)
RATE = 5                      # RS code rate 1/32
LDT_REPEATS = 33


def leaf_chain_hash(codeword):
    """codeword: (2, 65, N) natural layout -> (4, N/2) leaf digests.

    Leaf j chains slices 0..64 of pairs (v[s][j], v[s][j+N/2])
    (fri.cpp:96-124: 64 interleaved slices then the mask slice).  One
    lax.scan over the 65 slices so the keccak body is compiled once."""
    n = codeword.shape[2]
    half = n // 2
    # xs: (65, 4, half): [x.real, x.img, y.real, y.img] per slice
    x = codeword[:, :, :half]
    y = codeword[:, :, half:]
    xs = jnp.stack([x[0], x[1], y[0], y[1]], axis=1)

    def body(state, sl):
        words = jnp.concatenate([sl, state], axis=0)
        return sha3_256_x64(words), None

    state0 = jnp.zeros((4, half), jnp.uint64)
    out, _ = jax.lax.scan(body, state0, xs)
    return out


def _slice_encode(values, bl: int):
    """The commit FFT pipeline (poly_commit.h:75-110): split 2^bl values
    into 64 slices, IFFT each to coefficients, FFT onto the 32x domain.
    values: (2, 2^bl) -> (2, 65, 2^(bl-1)); slice 64 (mask) is zero."""
    srec = 1 << (bl - LOG_SLICE)          # real elements per slice
    lg_ss = bl + RATE - LOG_SLICE         # log slice_size
    ss = 1 << lg_ss
    rou_small = gf.root_of_unity_int(bl - LOG_SLICE)
    rou_big = gf.root_of_unity_int(lg_ss)
    sl = values.reshape(2, SLICES, srec)
    # batched IFFT/FFT over the slice axis: reuse fft() by folding the slice
    # axis into the free (last) dimension? fft operates on last axis with
    # leading (2,) — vmap over the slice axis instead.
    ifft_b = jax.vmap(lambda v: ifft(v, rou_small), in_axes=1, out_axes=1)
    fft_b = jax.vmap(lambda c: fft(c, lg_ss, rou_big), in_axes=1, out_axes=1)
    coefs = ifft_b(sl)                    # (2, 64, srec)
    evals = fft_b(coefs)                  # (2, 64, ss)
    mask = jnp.zeros((2, 1, ss), jnp.uint64)
    return jnp.concatenate([evals, mask], axis=1), coefs


@jax.tree_util.register_dataclass
@dataclass
class Oracle:
    codeword: jnp.ndarray        # (2, 65, N) natural layout
    leaves: jnp.ndarray          # (4, N/2)
    tree: jnp.ndarray            # (4, N)


def make_oracle(codeword) -> Oracle:
    leaves = leaf_chain_hash(codeword)
    tree = create_tree(leaves)
    return Oracle(codeword=codeword, leaves=leaves, tree=tree)


def make_oracles_batched(codewords) -> List[Oracle]:
    """Hash MANY oracles together: all leaf chains concatenate along the
    lane axis into one 65-step chain (the chain is latency-bound — 65
    sequential keccaks regardless of width), and all trees build as one
    forest (merkle.create_trees_batched).  Bit-identical to make_oracle
    per codeword; ~K x fewer sequential hash steps for K oracles."""
    from .merkle import create_trees_batched
    halves = [cw.shape[2] // 2 for cw in codewords]
    xs_parts = []
    for cw in codewords:
        x = cw[:, :, :cw.shape[2] // 2]
        y = cw[:, :, cw.shape[2] // 2:]
        xs_parts.append(jnp.stack([x[0], x[1], y[0], y[1]], axis=1))
    xs = jnp.concatenate(xs_parts, axis=2)        # (65, 4, sum_half)

    def body(state, sl):
        return sha3_256_x64(jnp.concatenate([sl, state], axis=0)), None

    state0 = jnp.zeros((4, xs.shape[2]), jnp.uint64)
    all_leaves, _ = jax.lax.scan(body, state0, xs)
    leaves_list = []
    off = 0
    for h in halves:
        leaves_list.append(all_leaves[:, off:off + h])
        off += h
    trees = create_trees_batched(leaves_list)
    return [Oracle(codeword=cw, leaves=lv, tree=tr)
            for cw, lv, tr in zip(codewords, leaves_list, trees)]


def commit_private(values, bl: int):
    """poly_commit.h:41-124 + fri::request_init_commit(bl, 0).
    Returns (Oracle, l_coefs) — root is oracle.tree[:, 1]."""
    l_eval, l_coefs = _slice_encode(values, bl)
    return make_oracle(l_eval), l_coefs


def commit_public_eval(l_eval, q_values, bl: int):
    """poly_commit.h:126-349 compute half (no hashing): encode the public
    (beta) array, build the aggregated virtual oracle and the h codeword.

    Returns (h_codeword (2,65,ss), q_eval, q_coefs, all_sum (2,65),
             virtual_oracle (2,65,ss))."""
    srec = 1 << (bl - LOG_SLICE)
    lg_ss = bl + RATE - LOG_SLICE
    ss = 1 << lg_ss
    q_eval, q_coefs = _slice_encode(q_values, bl)

    # per-slice product polynomial: sample l*q on the 2*srec subgroup
    stride = ss // (2 * srec)
    lq = gf.mul(l_eval[:, :SLICES, ::stride], q_eval[:, :SLICES, ::stride])
    rou_2s = gf.root_of_unity_int(bl - LOG_SLICE + 1)
    ifft_b = jax.vmap(lambda v: ifft(v, rou_2s), in_axes=1, out_axes=1)
    lq_coef = ifft_b(lq)                          # (2, 64, 2*srec)
    h_coef = lq_coef[:, :, srec:]
    rou_big = gf.root_of_unity_int(lg_ss)
    fft_b = jax.vmap(lambda c: fft(c, lg_ss, rou_big), in_axes=1, out_axes=1)
    h_eval = fft_b(h_coef)                        # (2, 64, ss)

    # all_sum[i] = (lq_coef[0] + h_coef[0]) * srec  (poly_commit.h:323)
    c0 = gf.add(lq_coef[:, :, 0], h_coef[:, :, 0])      # (2, 64)
    srec_el = gf.full((1,), srec % gf.MOD)
    all_sum = gf.mul(c0, srec_el)
    all_sum = jnp.concatenate(
        [all_sum, jnp.zeros((2, 1), jnp.uint64)], axis=1)  # mask slice: 0

    # virtual oracle (poly_commit.h:294-318):
    #   vo[j] = (l*q[j] - (x^srec - 1)*h[j] - c0) * srec * rou^{-j}
    rou_int = gf.root_of_unity_int(lg_ss)
    inv_rou_int = gf.inv_int(rou_int)
    xn = powers(gf.pow_int(rou_int, srec), ss)          # rou^(srec*j)
    inv_x = powers(inv_rou_int, ss)                     # rou^{-j}
    one = gf.ones((1,))
    lq_full = gf.mul(l_eval[:, :SLICES], q_eval[:, :SLICES])
    g = gf.sub(lq_full, gf.mul(gf.sub(xn, one)[:, None, :], h_eval))
    vo = gf.mul(gf.mul(gf.sub(g, c0[:, :, None]), srec_el[:, :, None]),
                inv_x[:, None, :])
    vo = jnp.concatenate([vo, jnp.zeros((2, 1, ss), jnp.uint64)], axis=1)

    h_full = jnp.concatenate(
        [h_eval, jnp.zeros((2, 1, ss), jnp.uint64)], axis=1)
    return h_full, q_eval, q_coefs, all_sum, vo


def commit_public(l_eval, q_values, bl: int):
    """commit_public_eval + the h-oracle hash (poly_commit.h:342).
    Returns (h_oracle, q_eval, q_coefs, all_sum, virtual_oracle)."""
    h_full, q_eval, q_coefs, all_sum, vo = commit_public_eval(
        l_eval, q_values, bl)
    return make_oracle(h_full), q_eval, q_coefs, all_sum, vo


def fold_step(codeword, r, lg_n: int):
    """One FRI fold (fri.cpp:315-334): codeword (2, 65, N) -> (2, 65, N/2).
    r: (2,) challenge; rou of order N fixed by lg_n."""
    n = 1 << lg_n
    half = n // 2
    inv_rou = gf.inv_int(gf.root_of_unity_int(lg_n))
    inv_mu = powers(inv_rou, half)                # rou^{-i}
    a = codeword[:, :, :half]
    b = codeword[:, :, half:]
    s = gf.add(a, b)
    d = gf.mul(gf.mul(gf.sub(a, b), inv_mu[:, None, :]), r[:, None, None])
    inv2 = gf.inv_int((2, 0))
    inv2_el = gf.full((1, 1), inv2[0], inv2[1])
    return gf.mul(gf.add(s, d), inv2_el)


@jax.tree_util.register_dataclass
@dataclass
class LDTCommitment:
    oracles: List[Oracle]        # one per fold step
    randomness: List[jnp.ndarray]
    final_codeword: jnp.ndarray  # (2, 65, 2^RATE) last level codeword


def fold_codewords(vo, bl: int, randomness: List):
    """All LDT fold-level codewords (no hashing): vo folded until each
    slice is <= 2^RATE (vpd_verifier.cpp:44-74)."""
    lg = bl + RATE - LOG_SLICE
    cur = vo
    cws = []
    for r in randomness:
        cur = fold_step(cur, r, lg)
        lg -= 1
        cws.append(cur)
    assert cur.shape[2] == 1 << RATE
    return cws


def commit_phase(vo, bl: int, randomness: List) -> LDTCommitment:
    """vpd_verifier.cpp:44-74: fold the virtual oracle until each slice is
    <= 2^RATE, committing every level.  Folds run first (cheap, sequential)
    and every level's leaf chains + trees hash TOGETHER (latency-bound at
    these widths).  randomness: list of (2,) arrays, length bl - LOG_SLICE."""
    cws = fold_codewords(vo, bl, randomness)
    oracles = make_oracles_batched(cws)
    return LDTCommitment(oracles=oracles, randomness=list(randomness),
                         final_codeword=cws[-1])

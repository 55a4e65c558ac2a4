"""Fiat-Shamir (non-interactive) mode.

The reference ships only an interactive protocol driven by srand(3396)
randomness; its SHA3 transcript (lib/virgo/src/transcriptCache.hpp) is dead
code.  This module defines a real non-interactive mode, TPU-first: the
*entire GKR prover runs as one jitted computation with round challenges
squeezed from an on-device SHA3 sponge* — no host round-trips — which is
only possible because the sponge itself (pc/keccak.py) is a device kernel.

Sponge spec (ours; the reference defines none):
  state D: 32 bytes as (4,) u64 words, initialized from the domain tag.
  absorb(e0, e1): D <- SHA3-256(e0.real||e0.img||e1.real||e1.img||D)
                  (same 64-byte block shape as the Merkle leaf chains);
                  element streams are absorbed pairwise, zero-padded.
  squeeze():      H = SHA3-256(D || 0x01 pad block); D <- SHA3-256(D || 0x02)
                  challenge = (H[0] mod p, H[1] mod p).

Round-by-round soundness: each sumcheck round absorbs the round polynomial
before its challenge is squeezed (unlike batch-FS, which is unsound for
sumcheck).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gf
from ..pc.keccak import sha3_256_x64
from .sumcheck import tree_sum, mle_fold
from .beta import beta_table
from . import protocol

_P = np.uint64(gf.MOD)

DOMAIN_TAG = b"virgo_plus_tpu.fs.v1\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00\x00"


def init_state():
    h = hashlib.sha3_256(DOMAIN_TAG).digest()
    return jnp.asarray(np.frombuffer(h, dtype=np.uint64).copy())


def _sha3_one(words8):
    """words8: (8,) u64 -> (4,) u64 (single-lane sha3)."""
    return sha3_256_x64(words8[:, None])[:, 0]


def absorb_pair(D, e0, e1):
    return _sha3_one(jnp.concatenate([e0, e1, D]))


def absorb_elems(D, elems):
    """elems: (2, k) — absorbed pairwise in order, zero-padded.

    Long streams run as ONE lax.scan (bit-identical to the unrolled
    chain): an unrolled absorb emits a separate keccak instantiation per
    pair, and hundreds of single-lane keccaks in one module blow up the
    AOT compile (the helper gets OOM-killed)."""
    k = elems.shape[1]
    if k % 2:
        elems = jnp.pad(elems, ((0, 0), (0, 1)))
        k += 1
    if k <= 8:
        for i in range(0, k, 2):
            D = absorb_pair(D, elems[:, i], elems[:, i + 1])
        return D
    xs = jnp.concatenate([elems[:, 0::2], elems[:, 1::2]], axis=0).T

    def body(d, x):
        return _sha3_one(jnp.concatenate([x, d])), None

    D, _ = jax.lax.scan(body, D, xs)
    return D


_PAD1 = jnp.asarray(np.array([1, 0, 0, 0], dtype=np.uint64))
_PAD2 = jnp.asarray(np.array([2, 0, 0, 0], dtype=np.uint64))


def squeeze(D):
    """-> ((2,) challenge element, new state)."""
    h = _sha3_one(jnp.concatenate([D, _PAD1]))
    d2 = _sha3_one(jnp.concatenate([D, _PAD2]))
    el = jnp.stack([h[0] % _P, h[1] % _P])
    return el, d2


def squeeze_vec(D, n):
    """n challenges; long draws as ONE lax.scan (same reason as
    absorb_elems — the fft_gkr schedule alone squeezes ~257 times)."""
    if n <= 4:
        out = []
        for _ in range(n):
            el, D = squeeze(D)
            out.append(el)
        return jnp.stack(out, axis=1), D  # (2, n)

    def body(d, _):
        el, d2 = squeeze(d)
        return d2, el

    D, els = jax.lax.scan(body, D, None, length=n)
    return jnp.moveaxis(els, 0, 1), D


def fs_scan_sumcheck(v, a, m, bl: int, D):
    """Sumcheck with per-round absorb+squeeze, as one lax.scan.
    Returns (polys (bl,2,3), rs (2,bl), bound scalars, D')."""
    n = v.shape[1]
    assert n == 1 << bl
    if bl == 0:
        return (jnp.zeros((0, 2, 3), jnp.uint64),
                jnp.zeros((2, 0), jnp.uint64),
                (v[:, 0], a[:, 0], m[:, 0]), D)
    half = n // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, half), 1)

    def body(carry, j):
        cv, ca, cm, D = carry
        v0, v1 = cv[:, 0::2], cv[:, 1::2]
        a0, a1 = ca[:, 0::2], ca[:, 1::2]
        m0, m1 = cm[:, 0::2], cm[:, 1::2]
        dv = gf.sub(v1, v0)
        da = gf.sub(a1, a0)
        dm = gf.sub(m1, m0)
        pa = gf.mul(dm, dv)
        pb = gf.add(gf.add(gf.mul(dm, v0), gf.mul(m0, dv)), da)
        pc = gf.add(gf.mul(m0, v0), a0)
        mask = lane < (half >> j)
        poly = jnp.stack([tree_sum(jnp.where(mask, pa, 0)),
                          tree_sum(jnp.where(mask, pb, 0)),
                          tree_sum(jnp.where(mask, pc, 0))], axis=1)
        # absorb the round polynomial, then squeeze the round challenge
        D2 = absorb_pair(D, poly[:, 0], poly[:, 1])
        D2 = absorb_pair(D2, poly[:, 2], jnp.zeros((2,), jnp.uint64))
        r, D3 = squeeze(D2)
        rr = r[:, None]
        nv = gf.add(v0, gf.mul(dv, rr))
        na = gf.add(a0, gf.mul(da, rr))
        nm = gf.add(m0, gf.mul(dm, rr))
        pad = ((0, 0), (0, half))
        return ((jnp.pad(nv, pad), jnp.pad(na, pad), jnp.pad(nm, pad), D3),
                (poly, r))

    (fv, fa, fm, D), (polys, rs) = jax.lax.scan(
        body, (v, a, m, D), jnp.arange(bl, dtype=jnp.int32))
    return polys, jnp.moveaxis(rs, 0, 1), (fv[:, 0], fa[:, 0], fm[:, 0]), D


def fs_arrays(cc, plans) -> dict:
    """Per-layer index/coefficient/scatter arrays for fs_prove, passed as
    jit ARGUMENTS (closure capture inlines them as dense MLIR constants —
    the SHA256_64 fs module reached 17 MB and the TPU compile helper was
    OOM-killed; protocol.circuit_arrays documents the same rule)."""
    arrs = {}
    for i in range(1, cc.depth):
        L = cc.layers[i]
        P = plans[i]
        arrs[f"x{i}"] = jnp.asarray(L.x_idx)
        arrs[f"y{i}"] = jnp.asarray(L.y_idx)
        arrs[f"co{i}"] = jnp.asarray(L.coeff)
        arrs[f"p1P{i}"] = P.p1.arrays()
        if P.p2 is not None:
            arrs[f"p2P{i}"] = P.p2.arrays()
            arrs[f"dg{i}"] = jnp.asarray(np.clip(L.dad_gather_idx, 0, None))
            arrs[f"dgm{i}"] = jnp.asarray(L.dad_gather_idx >= 0)[None, :]
        if P.liu_plan is not None:
            arrs[f"liuP{i}"] = P.liu_plan.arrays()
    return arrs


def fs_prove(cc, plans, values, root_l, arrs=None):
    """Non-interactive GKR proof: one device computation, challenges from
    the sponge.  Returns (Proof, challenges-as-Challenges, final state).
    arrs: fs_arrays(cc, plans) passed as jit arguments (None falls back to
    closure capture — only safe for small circuits / CPU tests)."""
    if arrs is None:
        arrs = fs_arrays(cc, plans)
    depth = cc.depth
    D = init_state()
    D = absorb_elems(D, jnp.stack([root_l[:2], root_l[2:]], axis=1))

    bl_last = cc.layers[depth - 1].bit_length
    out_block = values[:, int(cc.value_off[depth - 1]):]
    # the output claim point is drawn first (it only depends on the input
    # commitment), then vres is computed and absorbed
    r_out, D = squeeze_vec(D, bl_last)
    vres = mle_fold(out_block, r_out)
    D = absorb_elems(D, vres[:, None])

    layer_proofs: List[Optional[protocol.LayerProof]] = [None] * depth
    ch_layers: List[Optional[protocol.LayerChallenges]] = [None] * depth
    r_cur = r_out
    # Liu-phase beta contributions need consumer challenges (r_v of higher
    # layers) — available since layers are processed top-down.
    for i in range(depth - 1, 0, -1):
        rvs = {f"rv{j}": ch_layers[j].r_v
               for (j, _ds, _bl, _off) in plans[i].liu_consumers if j != i}
        lp, chl, D = _fs_layer(cc, plans, i, values, r_cur, D, rvs, arrs)
        layer_proofs[i] = lp
        ch_layers[i] = chl
        r_cur = chl.r_liu

    proof = protocol.Proof(vres=vres, layers=layer_proofs)
    ch = protocol.Challenges(r_out=r_out, layers=ch_layers)
    return proof, ch, D


def _fs_layer(cc, plans, i, values, r_cur, D, rvs, arrs):
    """One layer of the FS walk (phase 1 + joint phase 2 + Liu) with every
    challenge squeezed from the sponge.  rvs: {f"rv{j}": r_v} of consumer
    layers j > i (already processed).  Returns (LayerProof,
    LayerChallenges, new sponge state)."""
    L = cc.layers[i]
    P = plans[i]
    bl_prev = cc.layers[i - 1].bit_length
    one = gf.ones(())

    assert_r, D = squeeze(D)
    bg_full = beta_table(r_cur, L.bit_length, one)
    bg_full = protocol._scale_beta_asserts(cc, i, bg_full, assert_r)
    bg = bg_full[:, :L.size]
    y = values[:, arrs[f"y{i}"]]
    co = arrs[f"co{i}"]
    A, B, C, Dc = co[0], co[1], co[2], co[3]
    add_c = gf.mul(bg, gf.add(gf.mul(B, y), Dc))
    mult_c = gf.mul(bg, gf.add(A, gf.mul(C, y)))
    tmp_add = P.p1.apply(add_c, arrs[f"p1P{i}"])
    tmp_mult = P.p1.apply(mult_c, arrs[f"p1P{i}"])
    tmp_v = protocol._values_block(cc, values, i - 1)
    p1_polys, r_u, (claim_u, _, _), D = fs_scan_sumcheck(
        tmp_v, tmp_add, tmp_mult, bl_prev, D)
    D = absorb_elems(D, claim_u[:, None])

    p2_polys = None
    claims_v = None
    r_v = None
    if L.max_dad_bit_length >= 0:
        mdb = L.max_dad_bit_length
        beta_u = beta_table(r_u, bl_prev, one)
        tmp_g = gf.mul(bg, beta_u[:, arrs[f"x{i}"]])
        cu = claim_u[:, None]
        addv_c = gf.mul(tmp_g, gf.add(gf.mul(A, cu), Dc))
        multv_c = gf.mul(tmp_g, gf.add(B, gf.mul(C, cu)))
        addV = P.p2.apply(addv_c, arrs[f"p2P{i}"])
        multV = P.p2.apply(multv_c, arrs[f"p2P{i}"])
        vdad = jnp.where(arrs[f"dgm{i}"], values[:, arrs[f"dg{i}"]], 0)
        # FS phase 2 runs the tables JOINTLY round by round: rounds
        # must share challenges across tables, so we fold all tables
        # with a shared scan over the concatenated buffer, handling
        # exhausted tables via the add_term chain exactly as the
        # interactive prover does — but with sponge challenges.
        zero = jnp.zeros((2,), jnp.uint64)
        tables = []
        for li in range(i):
            if L.dad_sizes[li] == 0:
                continue
            off = L.dad_offsets[li]
            blk = slice(off, off + (1 << L.dad_bls[li]))
            tables.append((li, L.dad_bls[li],
                           vdad[:, blk], addV[:, blk], multV[:, blk]))
        a_term = zero
        out_polys = []
        rs_list = []
        bounds = {}
        state = {li: (vv, aa, mm) for (li, bl_l, vv, aa, mm) in tables}
        bls = {li: bl_l for (li, bl_l, *_rest) in tables}
        for j in range(mdb):
            if j > 0:
                a_term = gf.mul(a_term, gf.sub(one, rs_list[-1]))
            pj = jnp.zeros((2, 3), jnp.uint64)
            for li, (vv, aa, mm) in state.items():
                bl_l = bls[li]
                if j < bl_l:
                    v0, v1 = vv[:, 0::2], vv[:, 1::2]
                    a0, a1 = aa[:, 0::2], aa[:, 1::2]
                    m0, m1 = mm[:, 0::2], mm[:, 1::2]
                    dv = gf.sub(v1, v0)
                    da = gf.sub(a1, a0)
                    dm = gf.sub(m1, m0)
                    pa = tree_sum(gf.mul(dm, dv))
                    pb = tree_sum(gf.add(gf.add(gf.mul(dm, v0),
                                                gf.mul(m0, dv)), da))
                    pcc = tree_sum(gf.add(gf.mul(m0, v0), a0))
                    pj = gf.add(pj, jnp.stack([pa, pb, pcc], axis=1))
                elif j == bl_l:
                    vb, ab, mb = state[li]
                    a_term = gf.add(a_term,
                                    gf.add(gf.mul(vb[:, 0], mb[:, 0]),
                                           ab[:, 0]))
                    bounds[li] = vb[:, 0]
            pj = gf.add(pj, jnp.stack(
                [zero, gf.neg(a_term), a_term], axis=1))
            D2 = absorb_pair(D, pj[:, 0], pj[:, 1])
            D2 = absorb_pair(D2, pj[:, 2], zero)
            r, D = squeeze(D2)
            rs_list.append(r)
            out_polys.append(pj)
            # bind
            new_state = {}
            for li, (vv, aa, mm) in state.items():
                if j < bls[li]:
                    rr = r[:, None]
                    v0, v1 = vv[:, 0::2], vv[:, 1::2]
                    a0, a1 = aa[:, 0::2], aa[:, 1::2]
                    m0, m1 = mm[:, 0::2], mm[:, 1::2]
                    new_state[li] = (
                        gf.add(v0, gf.mul(gf.sub(v1, v0), rr)),
                        gf.add(a0, gf.mul(gf.sub(a1, a0), rr)),
                        gf.add(m0, gf.mul(gf.sub(m1, m0), rr)))
                else:
                    new_state[li] = state[li]
            state = new_state
        for li, (vv, aa, mm) in state.items():
            if bls[li] == mdb:
                bounds[li] = vv[:, 0]
            elif li not in bounds:
                bounds[li] = vv[:, 0]
        p2_polys = (jnp.stack(out_polys) if out_polys
                    else jnp.zeros((0, 2, 3), jnp.uint64))
        r_v = (jnp.stack(rs_list, axis=1) if rs_list
               else jnp.zeros((2, 0), jnp.uint64))
        cl = [bounds.get(li, zero) for li in range(i)]
        claims_v = jnp.stack(cl) if cl else jnp.zeros((0, 2), jnp.uint64)
        D = absorb_elems(D, claims_v.T)

    # Liu
    sig, D = squeeze_vec(D, cc.depth)
    bsig = beta_table(r_u, bl_prev, sig[:, 0])
    pre_size = cc.layers[i - 1].size
    multL = jnp.pad(bsig[:, :pre_size],
                    ((0, 0), (0, cc.layers[i - 1].padded - pre_size)))
    if P.liu_plan is not None:
        parts = []
        for (j, ds, bl_jl, off) in P.liu_consumers:
            # j == i is this layer's own dad table: its r_v was just
            # drawn above; higher layers were processed earlier.
            rv_j = r_v if j == i else rvs[f"rv{j}"]
            bt = beta_table(rv_j[:, :bl_jl], bl_jl,
                            sig[:, j - i + 1])
            parts.append(bt[:, :ds])
        contr = jnp.concatenate(parts, axis=1)
        multL = gf.add(multL, P.liu_plan.apply(contr,
                                               arrs[f"liuP{i}"]))
    addL = jnp.zeros_like(multL)
    liu_polys, r_liu, (liu_claim, _, _), D = fs_scan_sumcheck(
        tmp_v, addL, multL, bl_prev, D)
    D = absorb_elems(D, liu_claim[:, None])

    lp = protocol.LayerProof(
        p1_polys=p1_polys, claim_u=claim_u, p2_polys=p2_polys,
        claims_v=claims_v, liu_polys=liu_polys, liu_claim=liu_claim)
    chl = protocol.LayerChallenges(
        r_u=r_u, assert_r=assert_r, r_v=r_v, sig=sig, r_liu=r_liu)
    return lp, chl, D


def make_fs_prover(cc, plans, staged: bool = True):
    """staged=True (default): the sponge init + each layer compile as
    SEPARATE jits with the sponge state threaded through — one fused
    module for SHA256_64 is a graph the chipless AOT compile helper gets
    OOM-killed on (depth x unrolled phase-2 rounds), and per-layer modules
    also cache/reuse across circuits sharing layer shapes.  staged=False:
    the single-jit fusion (fine for small circuits)."""
    arrs = fs_arrays(cc, plans)
    depth = cc.depth
    if not staged:
        f = jax.jit(lambda values, root_l, arrs_:
                    fs_prove(cc, plans, values, root_l, arrs_))
        return lambda values, root_l: f(values, root_l, arrs)

    bl_last = cc.layers[depth - 1].bit_length
    off_last = int(cc.value_off[depth - 1])

    @jax.jit
    def init_fn(values, root_l):
        D = init_state()
        D = absorb_elems(D, jnp.stack([root_l[:2], root_l[2:]], axis=1))
        r_out, D = squeeze_vec(D, bl_last)
        vres = mle_fold(values[:, off_last:], r_out)
        D = absorb_elems(D, vres[:, None])
        return vres, r_out, D

    layer_fns = {}

    def layer_fn(i):
        fn = layer_fns.get(i)
        if fn is None:
            fn = jax.jit(lambda values, r_cur, D, rvs, arrs_:
                         _fs_layer(cc, plans, i, values, r_cur, D, rvs,
                                   arrs_))
            layer_fns[i] = fn
        return fn

    def run(values, root_l):
        vres, r_out, D = init_fn(values, root_l)
        layer_proofs = [None] * depth
        ch_layers = [None] * depth
        r_cur = r_out
        for i in range(depth - 1, 0, -1):
            rvs = {f"rv{j}": ch_layers[j].r_v
                   for (j, _ds, _bl, _off) in plans[i].liu_consumers
                   if j != i}
            lp, chl, D = layer_fn(i)(values, r_cur, D, rvs, arrs)
            layer_proofs[i] = lp
            ch_layers[i] = chl
            r_cur = chl.r_liu
        proof = protocol.Proof(vres=vres, layers=layer_proofs)
        ch = protocol.Challenges(r_out=r_out, layers=ch_layers)
        return proof, ch, D

    return run


# ---------------------------------------------------------------------------
# Device-side FS PC: commit_public + fft_gkr messages + every FRI fold level
# with the sponge absorb/squeeze chain ON DEVICE (one dispatch from root_l's
# post-GKR state to the final codeword).
# ---------------------------------------------------------------------------

def _fs_fft_schedule(D, lg: int):
    """Squeeze the fft_gkr draw schedule from the device sponge, in the
    exact order the host adapter (HostSponge.field_element) feeds
    fft_gkr.run/draw_schedule."""
    d = {}
    d["r"], D = squeeze_vec(D, lg)
    d["eval_points"], D = squeeze_vec(D, 64)
    d["r0"], D = squeeze_vec(D, lg + 10)
    d["r1"], D = squeeze_vec(D, lg + 10)
    d["add_ru"], D = squeeze_vec(D, lg + 6)
    d["add_rv"], D = squeeze_vec(D, lg + 6)
    d["mult_ru"], D = squeeze_vec(D, lg)
    d["mult_rv"], D = squeeze_vec(D, lg)
    stages = []
    for _ in range(lg):
        ru, D = squeeze_vec(D, lg)
        rv, D = squeeze_vec(D, lg)
        al, D = squeeze(D)
        be, D = squeeze(D)
        stages.append((ru, rv, al, be))
    d["stages"] = tuple(stages)
    return d, D


def make_fs_pc_prover(bl0: int, staged: bool = True):
    """Returns run(l_codeword, final_point, D) -> (h_oracle, all_sum,
    q_coefs, fft_msgs, ldt_oracles, final_codeword, fold_rands, D'): the
    whole PC half of the non-interactive prover on device.  Bit-identical
    to the HostSponge path (verified by verify_fs).

    staged=True splits the work into a public-commit jit, one jit per FRI
    fold level, and the fft_gkr message tape — single-jit fusion at
    SHA256_64 scale OOM-kills the chipless AOT compile helper (same issue
    as make_fs_prover)."""
    from ..pc import virgo_pc, fft_gkr
    from ..pc.fft import ifft
    lg = bl0 - virgo_pc.LOG_SLICE

    def commit_part(l_codeword, final_point, D):
        q_values = beta_table(final_point, bl0, gf.ones(()))
        srec_lg = bl0 - virgo_pc.LOG_SLICE
        rou_small = gf.root_of_unity_int(srec_lg)
        sl = q_values.reshape(2, virgo_pc.SLICES, 1 << srec_lg)
        q_coefs = jax.vmap(lambda v: ifft(v, rou_small),
                           in_axes=1, out_axes=1)(sl)

        h_oracle, _qe, _qc, all_sum, vo = virgo_pc.commit_public(
            l_codeword, q_values, bl0)
        rt = h_oracle.tree[:, 1]
        D2 = absorb_pair(D, rt[:2], rt[2:])
        D2 = absorb_elems(D2, all_sum)
        d, D2 = _fs_fft_schedule(D2, lg)
        return h_oracle, all_sum, q_coefs, d, vo, D2

    def fold_part(cur, D2, lgc):
        r, D2 = squeeze(D2)
        cur = virgo_pc.fold_step(cur, r, lgc)
        o = virgo_pc.make_oracle(cur)
        ort = o.tree[:, 1]
        D2 = absorb_pair(D2, ort[:2], ort[2:])
        return o, r, cur, D2

    if not staged:
        def run_fused(l_codeword, final_point, D):
            h_oracle, all_sum, q_coefs, d, vo, D2 = commit_part(
                l_codeword, final_point, D)
            msgs = fft_gkr.prove_messages(lg, d)
            cur = vo
            lgc = bl0 + virgo_pc.RATE - virgo_pc.LOG_SLICE
            oracles, rands = [], []
            for _ in range(lg):
                o, r, cur, D2 = fold_part(cur, D2, lgc)
                lgc -= 1
                oracles.append(o)
                rands.append(r)
            return (h_oracle, all_sum, q_coefs, msgs, oracles, cur,
                    jnp.stack(rands, axis=1), D2)

        return jax.jit(run_fused)

    commit_jit = jax.jit(commit_part)
    msgs_jit = jax.jit(lambda d: fft_gkr.prove_messages(lg, d))
    fold_jits = {}

    def fold_jit(lgc):
        fn = fold_jits.get(lgc)
        if fn is None:
            fn = jax.jit(lambda cur, D2: fold_part(cur, D2, lgc))
            fold_jits[lgc] = fn
        return fn

    def run(l_codeword, final_point, D):
        h_oracle, all_sum, q_coefs, d, vo, D2 = commit_jit(
            l_codeword, final_point, D)
        msgs = msgs_jit(d)
        cur = vo
        lgc = bl0 + virgo_pc.RATE - virgo_pc.LOG_SLICE
        oracles, rands = [], []
        for _ in range(lg):
            o, r, cur, D2 = fold_jit(lgc)(cur, D2)
            lgc -= 1
            oracles.append(o)
            rands.append(r)
        return (h_oracle, all_sum, q_coefs, msgs, oracles, cur,
                jnp.stack(rands, axis=1), D2)

    return run


# ---------------------------------------------------------------------------
# Host-side sponge (verifier re-derivation)
# ---------------------------------------------------------------------------

class HostSponge:
    def __init__(self):
        self.state = hashlib.sha3_256(DOMAIN_TAG).digest()

    def _h(self, data64: bytes) -> bytes:
        return hashlib.sha3_256(data64).digest()

    def absorb_pair(self, e0, e1):
        blob = b"".join(int(x).to_bytes(8, "little")
                        for x in (e0[0], e0[1], e1[0], e1[1]))
        self.state = self._h(blob + self.state)

    def absorb_elems(self, elems):
        """elems: list of (real, img) int pairs."""
        es = list(elems)
        if len(es) % 2:
            es.append((0, 0))
        for k in range(0, len(es), 2):
            self.absorb_pair(es[k], es[k + 1])

    def squeeze(self):
        h = self._h(self.state + b"\x01" + b"\x00" * 31)
        self.state = self._h(self.state + b"\x02" + b"\x00" * 31)
        w = np.frombuffer(h, dtype=np.uint64)
        return (int(w[0]) % gf.MOD, int(w[1]) % gf.MOD)

    def squeeze_vec(self, n):
        return [self.squeeze() for _ in range(n)]

    # rng-adapter API (GlibcRandom-compatible) so transcript-seeded
    # components (fft_gkr, query positions) can draw from the sponge
    def field_element(self):
        return self.squeeze()

    def rand(self):
        r, _ = self.squeeze()
        return r & 0x7FFFFFFF

    @staticmethod
    def from_device_state(D):
        sp = HostSponge.__new__(HostSponge)
        sp.state = b"".join(int(x).to_bytes(8, "little")
                            for x in np.asarray(D))
        return sp

    def absorb_digest_words(self, words4):
        w = np.asarray(words4)
        self.absorb_pair((int(w[0]), int(w[1])), (int(w[2]), int(w[3])))


def derive_challenges(cc, proof: protocol.Proof, root_l):
    """Verifier side: re-derive every FS challenge from the proof messages
    with the host sponge.  root_l: (4,) digest words.

    Pass a proof whose leaves are HOST numpy (e.g. straight from
    proof_io.load): every message is read element-wise here, and each
    ``np.asarray`` of an axon device array costs a ~6 ms tunnel round trip
    — the per-layer pulls were most of the old 21 s verify_fs wall.  The
    returned challenges are host numpy too, so the verifier jit ships them
    in one batched transfer instead of ~70 eager H2D copies."""
    sp = HostSponge()
    rl = np.asarray(root_l)
    sp.absorb_pair((int(rl[0]), int(rl[1])), (int(rl[2]), int(rl[3])))

    def el(x):
        a = np.asarray(x)
        return (int(a[0]), int(a[1]))

    def to_arr(pairs):
        out = np.zeros((2, len(pairs)), dtype=np.uint64)
        for k, (r, i) in enumerate(pairs):
            out[0, k], out[1, k] = r, i
        return out

    depth = cc.depth
    bl_last = cc.layers[depth - 1].bit_length
    r_out = to_arr(sp.squeeze_vec(bl_last))
    sp.absorb_elems([el(proof.vres)])

    layers: list = [None] * depth
    for i in range(depth - 1, 0, -1):
        lp = proof.layers[i]
        bl_prev = cc.layers[i - 1].bit_length
        assert_r = to_arr([sp.squeeze()])[:, 0]
        p1 = np.asarray(lp.p1_polys)
        r_u = []
        for j in range(bl_prev):
            sp.absorb_elems([el(p1[j, :, 0]), el(p1[j, :, 1]),
                             el(p1[j, :, 2])])
            r_u.append(sp.squeeze())
        r_u = to_arr(r_u)
        sp.absorb_elems([el(lp.claim_u)])
        r_v = None
        if lp.p2_polys is not None:
            p2 = np.asarray(lp.p2_polys)
            rv = []
            for j in range(p2.shape[0]):
                sp.absorb_elems([el(p2[j, :, 0]), el(p2[j, :, 1]),
                                 el(p2[j, :, 2])])
                rv.append(sp.squeeze())
            r_v = to_arr(rv)
            cv = np.asarray(lp.claims_v)
            sp.absorb_elems([el(cv[k]) for k in range(cv.shape[0])])
        sig = to_arr(sp.squeeze_vec(depth))
        lpo = np.asarray(lp.liu_polys)
        r_liu = []
        for j in range(bl_prev):
            sp.absorb_elems([el(lpo[j, :, 0]), el(lpo[j, :, 1]),
                             el(lpo[j, :, 2])])
            r_liu.append(sp.squeeze())
        r_liu = to_arr(r_liu)
        sp.absorb_elems([el(lp.liu_claim)])
        layers[i] = protocol.LayerChallenges(
            r_u=r_u, assert_r=assert_r, r_v=r_v, sig=sig, r_liu=r_liu)
    return protocol.Challenges(r_out=r_out, layers=layers), sp


def fs_verify(cc, proof: protocol.Proof, root_l, output_values=None):
    """Non-interactive verification: re-derive challenges, then run the
    standard checks.  Returns (ok, final_claim, final_point)."""
    ch, _sp = derive_challenges(cc, proof, root_l)
    return protocol.verify(cc, proof, ch, output_values)

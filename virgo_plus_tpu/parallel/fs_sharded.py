"""Fiat-Shamir (non-interactive) sharded prover: mesh + fs composed.

The glibc sharded prover (gkr_sharded.py) fuses all layers into one
shard_map because its challenges are message-independent.  FS challenges
are not: every round's challenge is squeezed from the sponge *after* the
round polynomial is absorbed, so the walk is inherently sequential.  This
module keeps the sharding story of gkr_sharded (leading-bit-sharded
bookkeeping tables, sharded gate sweeps over per-shard perm segments,
local low-bit folds with an all_gather tail — SURVEY §5.7) but stages one
shard_map'd jit per layer with the sponge state threaded through,
replicated: each fold round computes its partial round polynomial
per-shard, psums it into the full message, absorbs, squeezes — all shards
hold the same sponge and draw the same challenge (reference for the FS
round discipline: gkr/fs.py; its sponge spec supersedes the reference's
dead transcriptCache.hpp:14-50).

The PC half threads the sponge through the sharded VPD pipeline
(pc_sharded.py): public commit -> absorb root_h + all_sum -> squeeze the
fft_gkr schedule -> per FRI fold level squeeze the fold randomness, fold
(zero-communication strided layout), rebuild the sharded tree, absorb the
level root.  Everything stays sharded on device; only query answers move
(parallel/sharded_queries.py).

Output proofs are bit-identical to driver.prove_fs (field ops are exact,
so the psum reassociation of partial round polynomials changes nothing)
and verify with driver.verify_fs — tested on the CPU mesh.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..field import gf
from ..gkr import protocol, fs
from ..gkr.beta import beta_table
from ..gkr.sumcheck import tree_sum, mle_fold
from ..pc import virgo_pc, fft_gkr
from .gkr_sharded import (_is_sharded, _pl_local, _scatter_apply_ordered,
                          _beta_local, layer_plan_arrays)


def _local_slice_q(x, q, local_n):
    zero = jnp.int32(0)
    return jax.lax.dynamic_slice(x, (zero, q * jnp.int32(local_n)),
                                 (2, local_n))


def _fs_fold_sharded(v, a, m, bl: int, log_s: int, axis: str, D):
    """FS sumcheck fold of a leading-bit-sharded (v, a, m) table: local
    rounds as one lax.scan with the round polynomial psum'd before each
    absorb/squeeze, then an all_gather of the per-shard bound scalars and
    a replicated tail over the 2^log_s shard bits.  Bit-identical to
    fs.fs_scan_sumcheck on the full table (the local fold pairs global
    (2g, 2g+1) exactly; the gathered table's index bits are the original
    leading bits in order)."""
    local_bl = bl - log_s
    n = v.shape[1]
    assert n == 1 << local_bl and local_bl >= 1
    half = n // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, half), 1)
    zero2 = jnp.zeros((2,), jnp.uint64)

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
        loc = jnp.stack([tree_sum(jnp.where(mask, pa, 0)),
                         tree_sum(jnp.where(mask, pb, 0)),
                         tree_sum(jnp.where(mask, pc, 0))], axis=1)
        poly = gf.reduce_lazy(jax.lax.psum(loc, axis))
        D2 = fs.absorb_pair(D, poly[:, 0], poly[:, 1])
        D2 = fs.absorb_pair(D2, poly[:, 2], zero2)
        r, D3 = fs.squeeze(D2)
        rr = r[:, None]
        nv = gf.add(v0, gf.mul(dv, rr))
        na = gf.add(a0, gf.mul(da, rr))
        nm = gf.add(m0, gf.mul(dm, rr))
        pad = ((0, 0), (0, half))
        return ((jnp.pad(nv, pad), jnp.pad(na, pad), jnp.pad(nm, pad), D3),
                (poly, r))

    (fv, fa, fm, D), (polys_l, rs_l) = jax.lax.scan(
        body, (v, a, m, D), jnp.arange(local_bl, dtype=jnp.int32))
    rs_l = jnp.moveaxis(rs_l, 0, 1)
    vt = jnp.moveaxis(jax.lax.all_gather(fv[:, 0], axis), 0, 1)
    at = jnp.moveaxis(jax.lax.all_gather(fa[:, 0], axis), 0, 1)
    mt = jnp.moveaxis(jax.lax.all_gather(fm[:, 0], axis), 0, 1)
    polys_t, rs_t, bound, D = fs.fs_scan_sumcheck(vt, at, mt, log_s, D)
    return (jnp.concatenate([polys_l, polys_t], axis=0),
            jnp.concatenate([rs_l, rs_t], axis=1), bound, D)


def _fs_phase2_joint(tables, i: int, mdb: int, D, axis: str, log_s: int):
    """fs._fs_layer's joint phase-2 fold (all dad tables round by round
    with shared challenges), sharded: tables still holding local bits
    contribute their partial round polynomials via one psum per round;
    when a sharded table's local bits exhaust, its per-shard scalar is
    all_gathered into the replicated (2, S) tail table and it continues
    like an unsharded one.  tables: (li, bl_l, sharded, v, a, m)."""
    one = gf.ones(())
    zero = jnp.zeros((2,), jnp.uint64)
    state = {li: (vv, aa, mm) for (li, _bl, _sh, vv, aa, mm) in tables}
    bls = {li: bl_l for (li, bl_l, *_r) in tables}
    mode = {li: ("sh" if sh else "rep") for (li, _bl, sh, *_r) in tables}
    a_term = zero
    out_polys, rs_list = [], []
    bounds = {}
    for j in range(mdb):
        if j > 0:
            a_term = gf.mul(a_term, gf.sub(one, rs_list[-1]))
        pj = jnp.zeros((2, 3), jnp.uint64)
        pj_sh = None
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
                contrib = jnp.stack([pa, pb, pcc], axis=1)
                if mode[li] == "sh":
                    pj_sh = (contrib if pj_sh is None
                             else gf.add(pj_sh, contrib))
                else:
                    pj = gf.add(pj, contrib)
            elif j == bl_l:
                vb, ab, mb = state[li]
                a_term = gf.add(a_term,
                                gf.add(gf.mul(vb[:, 0], mb[:, 0]),
                                       ab[:, 0]))
                bounds[li] = vb[:, 0]
        if pj_sh is not None:
            pj = gf.add(pj, gf.reduce_lazy(jax.lax.psum(pj_sh, axis)))
        pj = gf.add(pj, jnp.stack([zero, gf.neg(a_term), a_term], axis=1))
        D2 = fs.absorb_pair(D, pj[:, 0], pj[:, 1])
        D2 = fs.absorb_pair(D2, pj[:, 2], zero)
        r, D = fs.squeeze(D2)
        rs_list.append(r)
        out_polys.append(pj)
        new_state = {}
        for li, (vv, aa, mm) in state.items():
            if j < bls[li]:
                rr = r[:, None]
                v0, v1 = vv[:, 0::2], vv[:, 1::2]
                a0, a1 = aa[:, 0::2], aa[:, 1::2]
                m0, m1 = mm[:, 0::2], mm[:, 1::2]
                nv = gf.add(v0, gf.mul(gf.sub(v1, v0), rr))
                na = gf.add(a0, gf.mul(gf.sub(a1, a0), rr))
                nm = gf.add(m0, gf.mul(gf.sub(m1, m0), rr))
                if mode[li] == "sh" and nv.shape[1] == 1:
                    nv = jnp.moveaxis(
                        jax.lax.all_gather(nv[:, 0], axis), 0, 1)
                    na = jnp.moveaxis(
                        jax.lax.all_gather(na[:, 0], axis), 0, 1)
                    nm = jnp.moveaxis(
                        jax.lax.all_gather(nm[:, 0], axis), 0, 1)
                    mode[li] = "rep"
                new_state[li] = (nv, na, nm)
            else:
                new_state[li] = (vv, aa, mm)
        state = new_state
    for li, (vv, _aa, _mm) in state.items():
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
    return p2_polys, r_v, claims_v, D


def _make_layer_fn(cc, plans, i: int, mesh: Mesh, axis: str, S: int,
                   log_s: int):
    """One FS layer (phase 1 + joint phase 2 + Liu, fs._fs_layer) as a
    shard_map'd jit with the inits sharded exactly as gkr_sharded.body:
    per-shard gate sweeps over perm segments, split-half beta gathers,
    sharded scatter segments, local slices of the value block."""
    L = cc.layers[i]
    Pl = plans[i]
    depth = cc.depth
    bl_prev = cc.layers[i - 1].bit_length
    pre_padded = cc.layers[i - 1].padded
    pre_size = cc.layers[i - 1].size
    sh1 = _is_sharded(bl_prev, log_s)
    local_n = pre_padded // S if sh1 else pre_padded
    one = gf.ones(())

    def fold(v, a, m, D, sharded):
        if sharded:
            return _fs_fold_sharded(v, a, m, bl_prev, log_s, axis, D)
        return fs.fs_scan_sumcheck(v, a, m, bl_prev, D)

    def body(values, r_cur, D, rvs, ar, ash):
        q = jax.lax.axis_index(axis)

        def halves(r, bl, init):
            h = bl // 2
            lo = beta_table(r[:, :h], h, init)
            hi = beta_table(r[:, h:bl], bl - h, one)
            return lo, hi, h

        def at(tabs, idx):
            lo, hi, h = tabs
            return gf.mul(lo[:, idx & ((1 << h) - 1)], hi[:, idx >> h])

        assert_r, D = fs.squeeze(D)
        tabs_g = halves(r_cur, L.bit_length, one)

        def bg_at(pg):
            bg = at(tabs_g, pg)
            if L.has_assert:
                am = ar[f"ia{i}"][pg]
                bg = jnp.where(am[None, :],
                               gf.mul(bg, assert_r[:, None]), bg)
            return bg

        # ---- phase 1 ------------------------------------------------
        pll = _pl_local((ash if sh1 else ar)[f"p1_{i}"], sh1)
        if len(Pl.p1.perm) == 0:
            add_c = mult_c = jnp.zeros((2, pll["perm"].shape[0]),
                                       jnp.uint64)
        else:
            pg, pv = pll["perm"], pll["valid"][None, :]
            bg = bg_at(pg)
            y = values[:, ar[f"y{i}"][pg]]
            co = ar[f"co{i}"][:, :, pg]
            A, B, C, Dc = co[0], co[1], co[2], co[3]
            add_c = jnp.where(pv, gf.mul(bg, gf.add(gf.mul(B, y), Dc)), 0)
            mult_c = jnp.where(pv, gf.mul(bg, gf.add(A, gf.mul(C, y))), 0)
        vblock = protocol._values_block(cc, values, i - 1)
        vloc = _local_slice_q(vblock, q, local_n) if sh1 else vblock
        p1_polys, r_u, (claim_u, _, _), D = fold(
            vloc, _scatter_apply_ordered(add_c, pll),
            _scatter_apply_ordered(mult_c, pll), D, sh1)
        D = fs.absorb_elems(D, claim_u[:, None])
        out = dict(p1_polys=p1_polys, claim_u=claim_u,
                   r_u=r_u, assert_r=assert_r)

        # ---- phase 2 (joint multi-table FS fold) --------------------
        r_v = None
        if L.max_dad_bit_length >= 0:
            mdb = L.max_dad_bit_length
            tabs_u = halves(r_u, bl_prev, one)
            cu = claim_u[:, None]
            tables = []
            for li in range(i):
                if L.dad_sizes[li] == 0:
                    continue
                bl_l = L.dad_bls[li]
                sh_l = _is_sharded(bl_l, log_s)
                src = ash if sh_l else ar
                pll2 = _pl_local(src[f"p2_{i}_{li}"], sh_l)
                if len(L.dad_gather_idx) and len(Pl.p2.perm):
                    pg2 = pll2["perm"]
                    pv2 = pll2["valid"][None, :]
                    tmp_g = gf.mul(bg_at(pg2),
                                   at(tabs_u, ar[f"x{i}"][pg2]))
                    co = ar[f"co{i}"][:, :, pg2]
                    A, B, C, Dc = co[0], co[1], co[2], co[3]
                    addc = jnp.where(
                        pv2, gf.mul(tmp_g, gf.add(gf.mul(A, cu), Dc)), 0)
                    mulc = jnp.where(
                        pv2, gf.mul(tmp_g, gf.add(B, gf.mul(C, cu))), 0)
                else:
                    addc = mulc = jnp.zeros((2, pll2["perm"].shape[0]),
                                            jnp.uint64)
                dg = src[f"dg{i}_{li}"]
                dgm = src[f"dgm{i}_{li}"]
                if sh_l:
                    dg, dgm = dg[0], dgm[0]
                vdad = jnp.where(dgm[None, :], values[:, dg], 0)
                tables.append((li, bl_l, sh_l, vdad,
                               _scatter_apply_ordered(addc, pll2),
                               _scatter_apply_ordered(mulc, pll2)))
            p2_polys, r_v, claims_v, D = _fs_phase2_joint(
                tables, i, mdb, D, axis, log_s)
            D = fs.absorb_elems(D, claims_v.T)
            out.update(p2_polys=p2_polys, claims_v=claims_v, r_v=r_v)

        # ---- Liu ----------------------------------------------------
        sig, D = fs.squeeze_vec(D, depth)
        if sh1:
            bsig = _beta_local(r_u, bl_prev, bl_prev - log_s,
                               sig[:, 0], q)
            gpos = (q * local_n +
                    jax.lax.broadcasted_iota(jnp.int32, (1, local_n), 1))
            multL = jnp.where(gpos < pre_size, bsig, 0)
        else:
            bsig = beta_table(r_u, bl_prev, sig[:, 0])
            multL = jnp.pad(bsig[:, :pre_size],
                            ((0, 0), (0, pre_padded - pre_size)))
        if Pl.liu_plan is not None:
            pll_l = _pl_local((ash if sh1 else ar)[f"liu_{i}"], sh1)
            pg_l, pv_l = pll_l["perm"], pll_l["valid"]
            contr = jnp.zeros((2, pg_l.shape[0]), jnp.uint64)
            for (j, ds, bl_jl, offp) in Pl.liu_consumers:
                rv_j = r_v if j == i else rvs[f"rv{j}"]
                tabs_j = halves(rv_j[:, :bl_jl], bl_jl, sig[:, j - i + 1])
                rel = pg_l - offp
                inb = (pg_l >= offp) & (pg_l < offp + ds) & pv_l
                relc = jnp.clip(rel, 0, (1 << bl_jl) - 1)
                contr = gf.add(contr, jnp.where(inb[None, :],
                                                at(tabs_j, relc), 0))
            multL = gf.add(multL, _scatter_apply_ordered(contr, pll_l))
        liu_polys, r_liu, (liu_claim, _, _), D = fold(
            vloc, jnp.zeros_like(multL), multL, D, sh1)
        D = fs.absorb_elems(D, liu_claim[:, None])
        out.update(liu_polys=liu_polys, liu_claim=liu_claim,
                   sig=sig, r_liu=r_liu, D=D)
        return out

    smapped = shard_map(
        body, mesh=mesh,
        in_specs=(P(None, None), P(), P(), P(), P(), P(axis)),
        out_specs=P(), check_vma=False)
    return jax.jit(smapped)


def make_fs_sharded_prover(cc, plans, mesh: Mesh, axis: str = "sp"):
    """Returns run(values, root_l_words) -> (Proof, Challenges, D_final),
    the FS analogue of make_sharded_prover: one shard_map'd jit per layer
    with the sponge threaded through (the walk is sequential in FS by
    construction — each layer's challenges hash its own messages)."""
    S = mesh.shape[axis]
    log_s = S.bit_length() - 1
    assert 1 << log_s == S
    depth = cc.depth
    bl_last = cc.layers[depth - 1].bit_length
    off_last = int(cc.value_off[depth - 1])

    layer_arrs = {i: layer_plan_arrays(cc, plans, i, S, log_s)
                  for i in range(1, depth)}
    layer_fns = {i: _make_layer_fn(cc, plans, i, mesh, axis, S, log_s)
                 for i in range(1, depth)}

    @jax.jit
    def init_fn(values, root_l):
        D = fs.init_state()
        D = fs.absorb_elems(D, jnp.stack([root_l[:2], root_l[2:]], axis=1))
        r_out, D = fs.squeeze_vec(D, bl_last)
        vres = mle_fold(values[:, off_last:], r_out)
        D = fs.absorb_elems(D, vres[:, None])
        return vres, r_out, D

    def run(values, root_l):
        vres, r_out, D = init_fn(values, root_l)
        layer_proofs = [None] * depth
        ch_layers = [None] * depth
        r_cur = r_out
        for i in range(depth - 1, 0, -1):
            rvs = {f"rv{j}": ch_layers[j].r_v
                   for (j, _ds, _bl, _off) in plans[i].liu_consumers
                   if j != i}
            ar, ash = layer_arrs[i]
            out = layer_fns[i](values, r_cur, D, rvs, ar, ash)
            D = out["D"]
            layer_proofs[i] = protocol.LayerProof(
                p1_polys=out["p1_polys"], claim_u=out["claim_u"],
                p2_polys=out.get("p2_polys"),
                claims_v=out.get("claims_v"),
                liu_polys=out["liu_polys"], liu_claim=out["liu_claim"])
            ch_layers[i] = protocol.LayerChallenges(
                r_u=out["r_u"], assert_r=out["assert_r"],
                r_v=out.get("r_v"), sig=out["sig"], r_liu=out["r_liu"])
            r_cur = out["r_liu"]
        proof = protocol.Proof(vres=vres, layers=layer_proofs)
        ch = protocol.Challenges(r_out=r_out, layers=ch_layers)
        return proof, ch, D

    return run


def make_fs_sharded_pc(mesh: Mesh, axis: str, bl0: int):
    """FS variant of pc_sharded.sharded_pc_prove: the sponge threads
    through the sharded public commit and every FRI fold level (squeeze
    fold randomness -> zero-comm strided fold -> sharded tree -> absorb
    level root), mirroring fs.make_fs_pc_prover's absorb/squeeze order."""
    from . import pc_sharded

    lg = bl0 - virgo_pc.LOG_SLICE
    lgc0 = bl0 + virgo_pc.RATE - virgo_pc.LOG_SLICE
    public_fn = pc_sharded.sharded_commit_public(mesh, axis, bl0)
    tree_fn = pc_sharded.sharded_oracle_tree(mesh, axis)
    fold_fns = {}
    cur_lg = lgc0
    while (1 << cur_lg) > (1 << virgo_pc.RATE):
        fold_fns[cur_lg] = pc_sharded.sharded_fold_step(mesh, axis, cur_lg)
        cur_lg -= 1
    msgs_jit = jax.jit(lambda d: fft_gkr.prove_messages(lg, d))

    @jax.jit
    def pc_part(l_strided, final_point, D):
        q_values = beta_table(final_point, bl0, gf.ones(()))
        root_h, h_sub, h_top, all_sum, vo, h_strided = public_fn(
            l_strided, q_values)
        D2 = fs.absorb_pair(D, root_h[:2], root_h[2:])
        D2 = fs.absorb_elems(D2, all_sum)
        d, D2 = fs._fs_fft_schedule(D2, lg)
        levels, rands = [], []
        cur = vo
        lgc = lgc0
        for _ in range(lg):
            r, D2 = fs.squeeze(D2)
            cur = fold_fns[lgc](cur, r)
            lgc -= 1
            root, sub, top = tree_fn(cur)
            D2 = fs.absorb_pair(D2, root[:2], root[2:])
            levels.append((root, sub, top, cur))
            rands.append(r)
        return (root_h, h_sub, h_top, all_sum, d, levels, rands, D2,
                h_strided)

    def run(l_strided, final_point, D):
        (root_h, h_sub, h_top, all_sum, d, levels, rands, D2,
         h_strided) = pc_part(l_strided, final_point, D)
        msgs = msgs_jit(d)
        return (root_h, h_sub, h_top, all_sum, msgs, levels, rands, D2,
                h_strided)

    return run


def compile_fs_sharded(circuit, mesh: Mesh, axis: str = "sp"):
    """Compile the FS sharded pipelines once; pass to prove_fs_sharded's
    ``compiled=`` to reuse jits across proves."""
    from ..circuits.compile import compile_circuit
    from ..gkr.protocol import build_plans
    from . import pc_sharded

    cc = compile_circuit(circuit)
    plans = build_plans(cc)
    bl0 = cc.layers[0].bit_length
    return dict(cc=cc, plans=plans, bl0=bl0, S=mesh.shape[axis],
                evaluator=protocol.make_evaluator(cc),
                commit=pc_sharded.sharded_commit_private(mesh, axis, bl0),
                gkr=make_fs_sharded_prover(cc, plans, mesh, axis),
                pc=make_fs_sharded_pc(mesh, axis, bl0))


def prove_fs_sharded(circuit, mesh: Mesh, axis: str = "sp",
                     witness: Optional[np.ndarray] = None, compiled=None):
    """Non-interactive sharded prove (mesh + fs): FS sponge threaded
    through the sharded GKR layer walk and the sharded PC pipeline.
    Codewords and Merkle trees stay sharded on device; only query answers
    move.  Returns (FullProof, info) bit-identical to driver.prove_fs and
    accepted by driver.verify_fs."""
    from ..circuits.compile import input_buffer
    from ..pc import vpd
    from .. import proof_io, driver
    from . import pc_sharded
    from .sharded_queries import answer_queries_sharded

    comp = compiled or compile_fs_sharded(circuit, mesh, axis)
    cc, bl0, S = comp["cc"], comp["bl0"], comp["S"]

    t0 = time.time()
    inputs = input_buffer(cc, witness)
    values = comp["evaluator"](inputs)
    root_l, l_sub, l_top, l_strided = comp["commit"](inputs)
    proof, ch, D = comp["gkr"](values, root_l)
    final_point = ch.layers[1].r_liu[:, :bl0]
    (root_h, h_sub, h_top, all_sum, msgs, levels, _rands, D_final,
     h_strided) = comp["pc"](l_strided, final_point, D)

    lg_ss = bl0 + virgo_pc.RATE - virgo_pc.LOG_SLICE
    sp = fs.HostSponge.from_device_state(D_final)
    pows = vpd.draw_positions(sp, bl0)
    out = dict(l_codeword=l_strided, l_sub=l_sub, l_top=l_top,
               h_codeword=h_strided, h_sub=h_sub, h_top=h_top,
               level_codewords=[lv[3] for lv in levels],
               level_subs=[lv[1] for lv in levels],
               level_tops=[lv[2] for lv in levels])
    l_desc, h_desc, level_descs = pc_sharded.oracle_descs(out, S, lg_ss)
    answers, query_size = answer_queries_sharded(pows, bl0, l_desc, h_desc,
                                                 level_descs)

    n_folds = bl0 - virgo_pc.LOG_SLICE
    fg_size = fft_gkr.fft_gkr_proof_size(n_folds)
    level_roots = np.stack([np.asarray(lv[0]) for lv in levels])
    full = proof_io.FullProof(
        vres=np.asarray(proof.vres),
        layers=[None] + [driver._layer_proof_arrays(proof.layers[i])
                         for i in range(1, cc.depth)],
        root_l=np.asarray(root_l),
        root_h=np.asarray(root_h),
        all_sum=np.asarray(all_sum),
        level_roots=level_roots,
        final_codeword=np.asarray(pc_sharded.unstride(
            levels[-1][3], S)),
        fft_gkr_messages=[np.asarray(m) for m in msgs],
        queries=answers,
        meta=dict(mode=1, bl0=bl0, depth=cc.depth, mesh_shards=S))
    info = dict(prove_time=time.time() - t0,
                gkr_proof_size=driver.gkr_proof_size_bytes(cc),
                pc_proof_size=fg_size + query_size + 2 * 32 + 16)
    return full, info

"""Sharded GKR prover: the sumcheck bookkeeping tables over a device mesh.

SURVEY §5.7: the scale-out axis of the GKR half is the 2^k hypercube of the
bookkeeping tables (V / addV / mult, reference src/prover.cpp:189-420).
Layout: tables shard over the LEADING index bits (shard q holds global
indices [q*2^local, (q+1)*2^local)); the round fold pairs (2i, 2i+1) — the
LOW bit — so every fold round is shard-local until log(S) variables remain,
then the per-shard bound scalars all_gather into one tiny table and the tail
finishes replicated (halving-reduce schedule).

Sharded construction of the tables themselves (the reference's scatter
loops, prover.cpp:214-273, 282-367, 369-420):

* beta tables are tensor products (utils.cpp:8-45): shard q builds only its
  slice — beta_table over the low variables scaled by the high-variable
  factor eq(r_high, bits(q)) — log-many local ops, no communication;
* the gate scatters become per-shard pre-partitioned segment sums: the
  compile-time ScatterPlan sorts contributions by destination, so a shard's
  destination range is one contiguous segment of the sorted order — each
  shard computes and segment-sums just its segment (padded to the max
  across shards for SPMD);
* the gate-side sweep is sharded too: each shard evaluates contributions
  ONLY for the ~|gates|/S gates in its perm segment, with per-gate beta
  weights from split-half eq tables (two 2^(bl/2) tables + one mul per
  gate, the initHalfTable trick) instead of full 2^bl tables — no
  replicated O(#gates) or O(2^bl) work remains in the init path.

Everything composes into ONE shard_map'd jit per circuit; outputs are
bit-identical to the single-chip prover (field ops are exact, so the psum
reassociation of partial round polynomials changes nothing).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..field import gf
from ..gkr import protocol
from ..gkr.beta import beta_table
from ..gkr.sumcheck import (ScatterPlan, prefix_sum, scan_sumcheck_batched,
                            scan_sumcheck_batched_br, mle_fold)


# ---------------------------------------------------------------------------
# Compile-time plan partitioning
# ---------------------------------------------------------------------------

def _plan_block_shards(plan: ScatterPlan, lo: int, size: int, S: int):
    """Partition destinations [lo, lo+size) of a ScatterPlan into S equal
    contiguous destination blocks.

    Returns dict(perm (S, maxlen) int32 source indices CLAMPED to
    [0, n-1], valid (S, maxlen) bool marking real entries, starts/ends
    (S, blk) int32 into the local prefix array).  Contributions are
    computed per shard directly at the perm indices (the sharded gate
    sweep), so padding carries an explicit mask instead of the synthetic
    zero-contribution index."""
    n = len(plan.perm)
    blk = size // S
    assert blk * S == size
    perms, valids, starts, ends = [], [], [], []
    seg_lo = [int(plan.starts[lo + q * blk]) for q in range(S)]
    seg_hi = [int(plan.ends[lo + q * blk + blk - 1]) for q in range(S)]
    maxlen = max(h - l for l, h in zip(seg_lo, seg_hi))
    maxlen = max(maxlen, 1)
    for q in range(S):
        l, h = seg_lo[q], seg_hi[q]
        pq = plan.perm[l:h].astype(np.int32)
        k = len(pq)
        pq = np.concatenate([pq, np.zeros(maxlen - k, np.int32)])
        perms.append(np.minimum(pq, max(n - 1, 0)))
        valids.append(np.arange(maxlen) < k)
        starts.append(plan.starts[lo + q * blk:lo + (q + 1) * blk] - l)
        ends.append(plan.ends[lo + q * blk:lo + (q + 1) * blk] - l)
    return dict(perm=jnp.asarray(np.stack(perms)),
                valid=jnp.asarray(np.stack(valids)),
                starts=jnp.asarray(np.stack(starts).astype(np.int32)),
                ends=jnp.asarray(np.stack(ends).astype(np.int32)))


def _plan_block_full(plan: ScatterPlan, lo: int, size: int):
    """The [lo, lo+size) destination block of a plan as replicated arrays
    (used for tables too small to shard); same clamped-perm + valid-mask
    contract as _plan_block_shards.

    An entirely empty plan (n == 0) gets an all-invalid single entry with
    zero starts/ends — consumers must check ``plan_empty`` (the plan
    object's perm length) before gathering from their source arrays, since
    the clamped index 0 has nothing to point at when sources are empty."""
    n = len(plan.perm)
    if n == 0:
        return dict(perm=jnp.zeros(1, jnp.int32),
                    valid=jnp.zeros(1, bool),
                    starts=jnp.zeros(size, jnp.int32),
                    ends=jnp.zeros(size, jnp.int32))
    seg_lo = int(plan.starts[lo])
    seg_hi = int(plan.ends[lo + size - 1])
    pq = plan.perm[seg_lo:seg_hi].astype(np.int32)
    k = len(pq)
    if k == 0:
        pq = np.zeros(1, dtype=np.int32)
        seg_lo -= 1  # keep starts/ends >= 0 with the dummy entry
    valid = np.arange(len(pq)) < k
    return dict(perm=jnp.asarray(np.minimum(pq, n - 1)),
                valid=jnp.asarray(valid),
                starts=jnp.asarray((plan.starts[lo:lo + size] -
                                    seg_lo).astype(np.int32)),
                ends=jnp.asarray((plan.ends[lo:lo + size] -
                                  seg_lo).astype(np.int32)))


def _pl_local(pl, sharded: bool):
    """Slice the leading shard axis off a plan dict inside shard_map."""
    if sharded:
        return {k: v[0] for k, v in pl.items()}
    return pl


def _scatter_apply_ordered(c_ordered, pl):
    """Segment-sum contributions ALREADY in perm order (2, maxlen) into
    the destination block (padded entries must be zero)."""
    s = prefix_sum(c_ordered)
    s0 = jnp.concatenate([jnp.zeros((2, 1), jnp.uint64), s], axis=1)
    return gf.sub(s0[:, pl["ends"]], s0[:, pl["starts"]])


# ---------------------------------------------------------------------------
# Sharded beta table: local slice of the tensor product
# ---------------------------------------------------------------------------

def _beta_local(r, bl: int, local_bl: int, init, q):
    """Shard q's slice of beta_table(r, bl, init): the high-variable factor
    eq(r[local_bl:bl], bits(q)) is a scalar, the low variables build the
    local table (utils.cpp:8-45 split-half construction, distributed)."""
    one = gf.ones(())
    scale = init
    for b in range(local_bl, bl):
        bit = (q >> (b - local_bl)) & 1
        rb = r[:, b]
        scale = gf.mul(scale, jnp.where(bit == 1, rb, gf.sub(one, rb)))
    return beta_table(r[:, :local_bl], local_bl, scale)


# ---------------------------------------------------------------------------
# Sharded batched fold
# ---------------------------------------------------------------------------

def _fold_group(v, a, m, rs, axis: str, log_s: int, sharded: bool):
    """v/a/m (2, K, n_local_or_full); rs (2, K, bl) replicated.
    Returns (polys (bl, K, 2, 3), bound (2, K) x3), replicated."""
    if not sharded or log_s == 0:
        return scan_sumcheck_batched_br(v, a, m, rs)
    bl = rs.shape[2]
    local_bl = bl - log_s
    polys_l, (vb, ab, mb) = scan_sumcheck_batched_br(
        v, a, m, rs[:, :, :local_bl])
    # partial round polys -> full messages; psum adds raw u64 lanes (S <= 8
    # canonical terms stay < 2^64), one Mersenne fold restores canon.
    polys_l = gf.reduce_lazy(jax.lax.psum(polys_l, axis))
    # tail: per-shard bound scalars form the 2^log_s high-variable table
    vt = jnp.moveaxis(jax.lax.all_gather(vb, axis), 0, 2)   # (2, K, S)
    at = jnp.moveaxis(jax.lax.all_gather(ab, axis), 0, 2)
    mt = jnp.moveaxis(jax.lax.all_gather(mb, axis), 0, 2)
    polys_t, bound = scan_sumcheck_batched(vt, at, mt, rs[:, :, local_bl:])
    return jnp.concatenate([polys_l, polys_t], axis=0), bound


# ---------------------------------------------------------------------------
# The sharded prover
# ---------------------------------------------------------------------------

def _is_sharded(bl: int, log_s: int) -> bool:
    return bl >= log_s + 1 and log_s > 0


def layer_plan_arrays(cc, plans, i: int, S: int, log_s: int):
    """Compile-time index/coefficient/scatter arrays for layer i, split
    into (replicated, leading-S-sharded) dicts — shared by the glibc
    (make_sharded_prover) and FS (fs_sharded) sharded provers."""
    arrs_rep, arrs_sh = {}, {}
    L = cc.layers[i]
    Pl = plans[i]
    bl_prev = cc.layers[i - 1].bit_length
    pre_padded = cc.layers[i - 1].padded
    arrs_rep[f"x{i}"] = jnp.asarray(L.x_idx)
    arrs_rep[f"y{i}"] = jnp.asarray(L.y_idx)
    arrs_rep[f"co{i}"] = jnp.asarray(L.coeff)
    if L.has_assert:
        arrs_rep[f"ia{i}"] = jnp.asarray(np.asarray(L.is_assert))
    tgt = arrs_sh if _is_sharded(bl_prev, log_s) else arrs_rep
    if _is_sharded(bl_prev, log_s):
        tgt[f"p1_{i}"] = _plan_block_shards(Pl.p1, 0, pre_padded, S)
        if Pl.liu_plan is not None:
            tgt[f"liu_{i}"] = _plan_block_shards(Pl.liu_plan, 0,
                                                 pre_padded, S)
    else:
        tgt[f"p1_{i}"] = _plan_block_full(Pl.p1, 0, pre_padded)
        if Pl.liu_plan is not None:
            tgt[f"liu_{i}"] = _plan_block_full(Pl.liu_plan, 0,
                                               pre_padded)
    if Pl.p2 is not None:
        dg = np.asarray(L.dad_gather_idx)
        for li in range(i):
            if L.dad_sizes[li] == 0:
                continue
            bl_l = L.dad_bls[li]
            off = L.dad_offsets[li]
            blk_n = 1 << bl_l
            idx = np.maximum(dg[off:off + blk_n], 0)
            msk = (dg[off:off + blk_n] >= 0)
            if _is_sharded(bl_l, log_s):
                arrs_sh[f"p2_{i}_{li}"] = _plan_block_shards(
                    Pl.p2, off, blk_n, S)
                arrs_sh[f"dg{i}_{li}"] = jnp.asarray(
                    idx.reshape(S, -1).astype(np.int32))
                arrs_sh[f"dgm{i}_{li}"] = jnp.asarray(
                    msk.reshape(S, -1))
            else:
                arrs_rep[f"p2_{i}_{li}"] = _plan_block_full(
                    Pl.p2, off, blk_n)
                arrs_rep[f"dg{i}_{li}"] = jnp.asarray(
                    idx.astype(np.int32))
                arrs_rep[f"dgm{i}_{li}"] = jnp.asarray(msk)
    return arrs_rep, arrs_sh


def make_sharded_prover(cc, plans, mesh: Mesh, axis: str = "sp"):
    """Returns run(values, ch) -> protocol.Proof with every fold-table init
    and every fold sharded over `axis` (bit-exact vs protocol.prove)."""
    S = mesh.shape[axis]
    log_s = S.bit_length() - 1
    assert 1 << log_s == S
    depth = cc.depth

    p1_groups, p2_groups = {}, {}
    for i in range(depth - 1, 0, -1):
        p1_groups.setdefault(cc.layers[i - 1].bit_length, []).append(i)
        L = cc.layers[i]
        if L.max_dad_bit_length < 0:
            continue
        for li in range(i):
            if L.dad_sizes[li] > 0:
                p2_groups.setdefault(L.dad_bls[li], []).append((i, li))

    def is_sharded(bl):
        return _is_sharded(bl, log_s)

    # ---- compile-time arrays ------------------------------------------
    arrs_rep = {}   # replicated inputs
    arrs_sh = {}    # leading-S inputs, sharded over `axis`
    for i in range(1, depth):
        rep_i, sh_i = layer_plan_arrays(cc, plans, i, S, log_s)
        arrs_rep.update(rep_i)
        arrs_sh.update(sh_i)

    one = gf.ones(())

    def _values_block(values, i):
        off = int(cc.value_off[i])
        return values[:, off:off + cc.layers[i].padded]

    def _local_slice(x, q, local_n):
        zero = jnp.int32(0)
        return jax.lax.dynamic_slice(x, (zero, q * jnp.int32(local_n)),
                                     (2, local_n))

    def body(values, ch, arrs_rep_, arrs_sh_):
        q = jax.lax.axis_index(axis)
        vres = mle_fold(_values_block(values, depth - 1), ch.r_out)

        def halves(r, bl, init):
            """Split-half eq tables (utils.cpp:8-27): entry g of the full
            table == lo[g & (2^h - 1)] * hi[g >> h] — field ops are exact
            and canonical, so regrouped products stay bit-identical."""
            h = bl // 2
            lo = beta_table(r[:, :h], h, init)
            hi = beta_table(r[:, h:bl], bl - h, one)
            return lo, hi, h

        def at(tabs, idx):
            lo, hi, h = tabs
            return gf.mul(lo[:, idx & ((1 << h) - 1)], hi[:, idx >> h])

        def bg_maker(i, r_cur, chl):
            """Per-gate beta weight via half-table gathers: the O(#gates)
            gate-side sweep runs on each shard ONLY over that shard's perm
            segment (~|gates|/S entries), never the full 2^bl_i table."""
            L = cc.layers[i]
            tabs = halves(r_cur, L.bit_length, one)

            def bg_at(pg):
                bg = at(tabs, pg)
                if L.has_assert:
                    am = arrs_rep_[f"ia{i}"][pg]
                    bg = jnp.where(am[None, :],
                                   gf.mul(bg, chl.assert_r[:, None]), bg)
                return bg

            return bg_at

        # ---- phase-1 + Liu inits (sharded gate sweep + beta slices) ----
        p1_jobs, liu_jobs = {}, {}
        for i in range(depth - 1, 0, -1):
            L = cc.layers[i]
            Pl = plans[i]
            chl = ch.layers[i]
            bl_prev = cc.layers[i - 1].bit_length
            pre_padded = cc.layers[i - 1].padded
            sh = is_sharded(bl_prev)
            local_n = pre_padded // S if sh else pre_padded
            r_cur = (ch.r_out if i == depth - 1
                     else ch.layers[i + 1].r_liu[:, :L.bit_length])
            bg_at = bg_maker(i, r_cur, chl)
            pll = _pl_local((arrs_sh_ if sh else arrs_rep_)[f"p1_{i}"], sh)
            if len(Pl.p1.perm) == 0:
                # empty plan: nothing scatters into this block; skip the
                # gathers (source arrays may be empty — _plan_block_full)
                add_c = mult_c = jnp.zeros((2, pll["perm"].shape[0]),
                                           jnp.uint64)
            else:
                pg, pv = pll["perm"], pll["valid"][None, :]
                bg = bg_at(pg)
                y = values[:, arrs_rep_[f"y{i}"][pg]]
                co = arrs_rep_[f"co{i}"][:, :, pg]
                A, B, C, D = co[0], co[1], co[2], co[3]
                add_c = jnp.where(pv, gf.mul(bg, gf.add(gf.mul(B, y), D)), 0)
                mult_c = jnp.where(pv, gf.mul(bg, gf.add(A, gf.mul(C, y))),
                                   0)
            vloc = (_local_slice(_values_block(values, i - 1), q, local_n)
                    if sh else _values_block(values, i - 1))
            p1_jobs.setdefault(bl_prev, []).append(
                (vloc, _scatter_apply_ordered(add_c, pll),
                 _scatter_apply_ordered(mult_c, pll), chl.r_u[:, :bl_prev]))

            # Liu init: bsig slice (sharded tensor product) + consumer parts
            sig = chl.sig
            pre_size = cc.layers[i - 1].size
            if sh:
                local_bl = bl_prev - log_s
                bsig = _beta_local(chl.r_u[:, :bl_prev], bl_prev, local_bl,
                                   sig[:, 0], q)
                gpos = (q * local_n +
                        jax.lax.broadcasted_iota(jnp.int32, (1, local_n), 1))
                multL = jnp.where(gpos < pre_size, bsig, 0)
            else:
                bsig = beta_table(chl.r_u[:, :bl_prev], bl_prev, sig[:, 0])
                multL = jnp.pad(bsig[:, :pre_size],
                                ((0, 0), (0, pre_padded - pre_size)))
            if Pl.liu_plan is not None:
                pll_l = _pl_local((arrs_sh_ if sh else arrs_rep_)
                                  [f"liu_{i}"], sh)
                pg_l, pv_l = pll_l["perm"], pll_l["valid"]
                contr = jnp.zeros((2, pg_l.shape[0]), jnp.uint64)
                for (j, ds, bl_jl, offp) in Pl.liu_consumers:
                    tabs_j = halves(ch.layers[j].r_v, bl_jl,
                                    sig[:, j - i + 1])
                    rel = pg_l - offp
                    inb = (pg_l >= offp) & (pg_l < offp + ds) & pv_l
                    relc = jnp.clip(rel, 0, (1 << bl_jl) - 1)
                    contr = gf.add(contr, jnp.where(inb[None, :],
                                                    at(tabs_j, relc), 0))
                multL = gf.add(multL, _scatter_apply_ordered(contr, pll_l))
            liu_jobs.setdefault(bl_prev, []).append(
                (vloc, jnp.zeros_like(multL), multL,
                 chl.r_liu[:, :bl_prev]))

        def stack(jobs):
            return {bl: tuple(jnp.stack([g[k] for g in grp], axis=1)
                              for k in range(4))
                    for bl, grp in jobs.items()}

        p1_raw = {bl: _fold_group(*job, axis, log_s, is_sharded(bl))
                  for bl, job in sorted(stack(p1_jobs).items())}
        liu_raw = {bl: _fold_group(*job, axis, log_s, is_sharded(bl))
                   for bl, job in sorted(stack(liu_jobs).items())}

        claims = {}
        for bl, grp in p1_groups.items():
            _, (vb, _a, _m) = p1_raw[bl]
            for kk, tag in enumerate(grp):
                claims[tag] = vb[:, kk]

        # ---- phase-2 inits (per source layer, sharded dad blocks) -----
        p2_jobs = {}
        for i in range(depth - 1, 0, -1):
            L = cc.layers[i]
            if L.max_dad_bit_length < 0:
                continue
            chl = ch.layers[i]
            bl_prev = cc.layers[i - 1].bit_length
            claim_u = claims[i]
            r_cur = (ch.r_out if i == depth - 1
                     else ch.layers[i + 1].r_liu[:, :L.bit_length])
            bg_at = bg_maker(i, r_cur, chl)
            tabs_u = halves(chl.r_u, bl_prev, one)
            cu = claim_u[:, None]
            for li in range(i):
                if L.dad_sizes[li] == 0:
                    continue
                bl_l = L.dad_bls[li]
                sh = is_sharded(bl_l)
                src = arrs_sh_ if sh else arrs_rep_
                pll = _pl_local(src[f"p2_{i}_{li}"], sh)
                if len(L.dad_gather_idx) and len(Pl.p2.perm):
                    pg, pv = pll["perm"], pll["valid"][None, :]
                    tmp_g = gf.mul(bg_at(pg), at(tabs_u,
                                                 arrs_rep_[f"x{i}"][pg]))
                    co = arrs_rep_[f"co{i}"][:, :, pg]
                    A, B, C, D = co[0], co[1], co[2], co[3]
                    addc = jnp.where(pv, gf.mul(tmp_g,
                                                gf.add(gf.mul(A, cu), D)),
                                     0)
                    mulc = jnp.where(pv, gf.mul(tmp_g,
                                                gf.add(B, gf.mul(C, cu))),
                                     0)
                else:           # empty plan (see _plan_block_full)
                    addc = mulc = jnp.zeros((2, pll["perm"].shape[0]),
                                            jnp.uint64)
                dg = src[f"dg{i}_{li}"]
                dgm = src[f"dgm{i}_{li}"]
                if sh:
                    dg, dgm = dg[0], dgm[0]
                vdad = jnp.where(dgm[None, :], values[:, dg], 0)
                p2_jobs.setdefault(bl_l, []).append(
                    (vdad, _scatter_apply_ordered(addc, pll),
                     _scatter_apply_ordered(mulc, pll), chl.r_v[:, :bl_l]))

        p2_raw = {bl: _fold_group(*job, axis, log_s, is_sharded(bl))
                  for bl, job in sorted(stack(p2_jobs).items())}
        return vres, p1_raw, p2_raw, liu_raw

    smapped = shard_map(
        lambda values, ch, ar, ash: body(values, ch, ar, ash),
        mesh=mesh,
        in_specs=(P(None, None), P(), P(), P(axis)),
        out_specs=P(),
        check_vma=False)

    def assemble(vres, ch, p1_raw, p2_raw, liu_raw):
        p1_res = protocol._unstack(p1_raw, p1_groups)
        liu_res = protocol._unstack(liu_raw, p1_groups)
        p2_scan = protocol._unstack(p2_raw, p2_groups, bounds=True)
        p2_out = protocol._prove_p2_combine(cc, ch, p2_scan)
        layer_proofs = [None] * depth
        for i in range(depth - 1, 0, -1):
            p2_polys, claims_v = p2_out.get(i, (None, None))
            layer_proofs[i] = protocol.LayerProof(
                p1_polys=p1_res[i][0], claim_u=p1_res[i][1],
                p2_polys=p2_polys, claims_v=claims_v,
                liu_polys=liu_res[i][0], liu_claim=liu_res[i][1])
        return protocol.Proof(vres=vres, layers=layer_proofs)

    @jax.jit
    def run_jit(values, ch, ar, ash):
        vres, p1_raw, p2_raw, liu_raw = smapped(values, ch, ar, ash)
        return assemble(vres, ch, p1_raw, p2_raw, liu_raw)

    return lambda values, ch: run_jit(values, ch, arrs_rep, arrs_sh)


# ---------------------------------------------------------------------------
# Full composed multi-chip prove (GKR + PC), mirroring driver.prove
# ---------------------------------------------------------------------------

def compile_sharded(circuit, mesh: Mesh, axis: str = "sp"):
    """Compile the sharded prover pipelines once; pass the result to
    prove_sharded's ``compiled=`` to reuse jits across proves (the
    steady-state path — rebuilding per call recompiles everything)."""
    from ..circuits.compile import compile_circuit
    from ..gkr.protocol import build_plans
    from . import pc_sharded

    cc = compile_circuit(circuit)
    plans = build_plans(cc)
    bl0 = cc.layers[0].bit_length
    return dict(cc=cc, plans=plans, bl0=bl0,
                evaluator=protocol.make_evaluator(cc),
                gkr=make_sharded_prover(cc, plans, mesh, axis),
                pc=pc_sharded.sharded_pc_prove(mesh, axis, bl0))


def prove_sharded(circuit, mesh: Mesh, axis: str = "sp", seed: int = 3396,
                  witness: Optional[np.ndarray] = None, compiled=None):
    """Full sharded prove: sharded GKR + sharded PC (pc_sharded) with
    query-sparse answering (sharded_queries) — codewords and Merkle trees
    stay sharded on device end to end; only the ~33 opened value-pairs and
    path digests per oracle ever move.  Returns (FullProof, info) with
    output bit-identical to driver.prove."""
    from ..circuits.compile import input_buffer
    from ..gkr.protocol import make_challenges
    from ..pc import virgo_pc, vpd, fft_gkr
    from ..utils.glibc_rand import GlibcRandom
    from .. import proof_io, driver
    from . import pc_sharded
    from .sharded_queries import answer_queries_sharded

    comp = compiled or compile_sharded(circuit, mesh, axis)
    cc, bl0 = comp["cc"], comp["bl0"]
    evaluator, gkr, pc = comp["evaluator"], comp["gkr"], comp["pc"]
    S = mesh.shape[axis]

    import time
    t0 = time.time()
    inputs = input_buffer(cc, witness)
    values = evaluator(inputs)
    rng = GlibcRandom(seed)
    ch = make_challenges(cc, rng)
    proof = gkr(values, ch)
    final_point = ch.layers[1].r_liu[:, :bl0]
    q_values = beta_table(final_point, bl0, gf.ones(()))

    fg = fft_gkr.run(bl0 - virgo_pc.LOG_SLICE, rng)
    n_folds = bl0 - virgo_pc.LOG_SLICE
    randomness = []
    for _ in range(n_folds):
        r, i = rng.field_element()
        randomness.append(gf.from_u64(np.uint64(r), np.uint64(i)).reshape(2))
    out = pc(inputs, q_values, randomness)

    lg = bl0 + virgo_pc.RATE - virgo_pc.LOG_SLICE
    l_desc, h_desc, level_descs = pc_sharded.oracle_descs(out, S, lg)
    pows = vpd.draw_positions(rng, bl0)
    answers, query_size = answer_queries_sharded(pows, bl0, l_desc, h_desc,
                                                 level_descs)

    # measured per-device PC state: the sharded arrays actually resident
    # after the prove (1/S of each codeword/subtree buffer per device) vs
    # what a host gather of every codeword would cost (the r3 design)
    sharded_keys = ("l_codeword", "h_codeword", "level_codewords",
                    "l_sub", "h_sub", "level_subs")
    per_dev = full_cw = 0
    for k, v in out.items():
        if k == "final_codeword":
            continue    # aliases level_codewords[-1] (already counted)
        for arr in (v if isinstance(v, list) else [v]):
            nb = arr.size * arr.dtype.itemsize
            per_dev += nb // S if k in sharded_keys else nb
            if k in ("l_codeword", "h_codeword", "level_codewords"):
                full_cw += nb
    level_roots = np.stack([np.asarray(r) for r in out["level_roots"]])
    full = proof_io.FullProof(
        vres=np.asarray(proof.vres),
        layers=[None] + [driver._layer_proof_arrays(proof.layers[i])
                         for i in range(1, cc.depth)],
        root_l=np.asarray(out["root_l"]),
        root_h=np.asarray(out["root_h"]),
        all_sum=np.asarray(out["all_sum"]),
        level_roots=level_roots,
        final_codeword=np.asarray(pc_sharded.unstride(
            out["final_codeword"], S)),
        fft_gkr_messages=fg.messages,
        queries=answers,
        meta=dict(seed=seed, bl0=bl0, depth=cc.depth, mesh_shards=S))
    info = dict(prove_time=time.time() - t0,
                gkr_proof_size=driver.gkr_proof_size_bytes(cc),
                pc_proof_size=fg.proof_size + query_size + 2 * 32 + 16,
                fft_gkr_ok=fg.ok,
                per_device_pc_bytes=per_dev,
                full_codeword_bytes=full_cw)
    return full, info

"""The Virgo++ GKR protocol for unlayered circuits: prover and verifier.

Functional re-design of the reference's co-resident prover/verifier objects
(/root/reference/src/prover.cpp, src/verifier.cpp): challenges are an explicit
schedule precomputed per circuit shape (the reference's F::random() stream is
message-independent, so the whole prover becomes one feed-forward device
computation), the proof is an explicit pytree, and verification replays the
succinct checks plus vectorized predicate sweeps.

Layer walk (verifier.cpp:134-189): output MLE fold (Vres), then per layer
phase-1 sumcheck over the left input, phase-2 over right inputs grouped by
source layer (the "unlayered" part), a wiring-predicate consistency check,
and the Liu claim-merging sumcheck; the surviving claim about the input layer
is discharged by the polynomial commitment (pc/).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gf
from ..utils.glibc_rand import GlibcRandom
from .beta import beta_table, beta_tables_batched
from .sumcheck import (ScatterPlan, concat_scatter_plans, scan_sumcheck,
                       scan_sumcheck_batched, scan_sumcheck_batched_br,
                       scan_sumcheck_auto, eval_quad, quad_at_0_plus_1,
                       mle_fold, tree_sum)
from ..circuits.compile import CompiledCircuit

MOD = gf.MOD


# ---------------------------------------------------------------------------
# Challenge schedule (exact draw order of verifier.cpp / fieldElement::random)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class LayerChallenges:
    r_u: jnp.ndarray        # (4, max_bl)
    assert_r: jnp.ndarray   # (4,)
    r_v: Optional[jnp.ndarray]   # (4, maxDadBl) or None
    sig: jnp.ndarray        # (4, depth)
    r_liu: jnp.ndarray      # (4, max_bl)


@jax.tree_util.register_dataclass
@dataclass
class Challenges:
    r_out: jnp.ndarray      # (4, bl_last)
    layers: List[Optional[LayerChallenges]]  # index by layer; [0] unused


def _draw(rng: GlibcRandom, n: int):
    """Challenges stay HOST numpy: they originate on the host rng, eager
    jnp.stack per draw costs a device dispatch (~6 ms each through the
    axon tunnel once the process is in sync mode — ~70 draws per
    transcript), and every consumer is a jit that ships numpy args in one
    batched transfer anyway."""
    vals = np.zeros((2, n), dtype=np.uint64)
    for k in range(n):
        r, i = rng.field_element()
        vals[0, k], vals[1, k] = r, i
    return vals


def make_challenges(cc: CompiledCircuit, rng: Optional[GlibcRandom] = None
                    ) -> Challenges:
    """Draw order: r_out (bl_last); per layer top..1: r_u (max_bl),
    assert_random (1), r_v (maxDadBl, only if layer has dads), sig (depth),
    r_liu (max_bl).  Matches verifier.cpp:144,196,202,236,278-279."""
    if rng is None:
        rng = GlibcRandom(3396)
    depth = cc.depth
    r_out = _draw(rng, cc.layers[depth - 1].bit_length)
    layers: List[Optional[LayerChallenges]] = [None] * depth
    for i in range(depth - 1, 0, -1):
        r_u = _draw(rng, cc.max_bl)
        assert_r = _draw(rng, 1)[:, 0]
        mdb = cc.layers[i].max_dad_bit_length
        r_v = _draw(rng, mdb) if mdb >= 0 else None
        sig = _draw(rng, depth)
        r_liu = _draw(rng, cc.max_bl)
        layers[i] = LayerChallenges(r_u, assert_r, r_v, sig, r_liu)
    return Challenges(r_out=r_out, layers=layers)


# ---------------------------------------------------------------------------
# Compile-time scatter plans (kept outside CompiledCircuit so the circuits
# package stays protocol-agnostic)
# ---------------------------------------------------------------------------

@dataclass
class LayerPlans:
    p1: ScatterPlan
    p2: Optional[ScatterPlan]
    # Liu scatter for pre-layer i-1: contributions from consumers j>=i
    liu_consumers: list          # [(j, dad_size, dad_bl, offset)]
    liu_plan: Optional[ScatterPlan]


def _inits_layout(cc, plans):
    """Static block layout of the fused phase-1 + Liu init scatter:
    (kind, layer, in_len, out_len) in a fixed order shared between the
    combined-plan build and the contribution concat."""
    blocks = []
    for i in range(cc.depth - 1, 0, -1):
        L = cc.layers[i]
        P = plans[i]
        pre_padded = cc.layers[i - 1].padded
        blocks.append(("add", i, L.size, pre_padded))
        blocks.append(("mult", i, L.size, pre_padded))
        if P.liu_plan is not None:
            n_in = sum(ds for (_j, ds, _b, _o) in P.liu_consumers)
            blocks.append(("liu", i, n_in, pre_padded))
    return blocks


def _p2_layout(cc, plans):
    blocks = []
    for i in range(cc.depth - 1, 0, -1):
        L = cc.layers[i]
        if L.max_dad_bit_length < 0:
            continue
        blocks.append(("p2a", i, L.size, L.dad_padded_total))
        blocks.append(("p2m", i, L.size, L.dad_padded_total))
    return blocks


def _fused_plan(blocks, plans):
    pls = []
    for kind, i, n_in, _out in blocks:
        P = plans[i]
        pls.append(P.liu_plan if kind == "liu" else
                   P.p2 if kind in ("p2a", "p2m") else P.p1)
    return concat_scatter_plans(pls, [b[2] for b in blocks])


def circuit_arrays(cc: CompiledCircuit, plans) -> dict:
    """All large per-layer index/coefficient arrays as one pytree, passed
    into the staged jits as ARGUMENTS (closure capture would inline them as
    dense constants — multi-MB MLIR, TPU compile-helper OOM).  Includes the
    bit-reversal permutations for every fold size so the Pallas fold kernel
    can run inside a fused jit (a closed-over perm becomes a ~130x slower
    constant gather), and the FUSED init-scatter plans (all layers' phase
    inits as ONE prefix-sum pass each for p1+liu and p2)."""
    from .sumcheck import _bitrev_perm
    arrs = {}
    fold_bls = set()
    for i in range(1, cc.depth):
        L = cc.layers[i]
        P = plans[i]
        arrs[f"x{i}"] = jnp.asarray(L.x_idx)
        arrs[f"y{i}"] = jnp.asarray(L.y_idx)
        arrs[f"co{i}"] = jnp.asarray(L.coeff)
        fold_bls.add(cc.layers[i - 1].bit_length)
        if P.p2 is not None:
            arrs[f"dg{i}"] = jnp.asarray(np.clip(L.dad_gather_idx, 0, None))
            arrs[f"dgm{i}"] = jnp.asarray(
                L.dad_gather_idx >= 0)[None, :]
            for li in range(i):
                if L.dad_sizes[li] > 0:
                    fold_bls.add(L.dad_bls[li])
    arrs["initsP"] = _fused_plan(_inits_layout(cc, plans), plans).arrays()
    p2_blocks = _p2_layout(cc, plans)
    if p2_blocks:
        arrs["p2P"] = _fused_plan(p2_blocks, plans).arrays()
    for bl in fold_bls:
        arrs[f"perm{bl}"] = jnp.asarray(_bitrev_perm(bl))
    return arrs


def build_plans(cc: CompiledCircuit) -> List[Optional[LayerPlans]]:
    src = cc.source
    plans: List[Optional[LayerPlans]] = [None] * cc.depth
    for i in range(1, cc.depth):
        L = cc.layers[i]
        pre_padded = cc.layers[i - 1].padded
        p1 = ScatterPlan.build(np.asarray(L.x_idx), pre_padded)
        p2 = None
        if L.max_dad_bit_length >= 0:
            p2 = ScatterPlan.build(np.asarray(L.p2_flat_idx),
                                   L.dad_padded_total)
        # Liu for pre layer i-1: consumers j in [i, depth)
        consumers = []
        idx_parts = []
        off = 0
        for j in range(i, cc.depth):
            Lj = src.layers[j]
            ds = Lj.dad_size[i - 1] if i - 1 < len(Lj.dad_size) else 0
            if ds > 0:
                consumers.append((j, ds, Lj.dad_bit_length[i - 1], off))
                idx_parts.append(Lj.dad_id[i - 1])
                off += ds
        liu_plan = None
        if idx_parts:
            liu_plan = ScatterPlan.build(np.concatenate(idx_parts), pre_padded)
        plans[i] = LayerPlans(p1=p1, p2=p2, liu_consumers=consumers,
                              liu_plan=liu_plan)
    return plans


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclass
class LayerProof:
    p1_polys: jnp.ndarray          # (bl_prev, 4, 3)
    claim_u: jnp.ndarray           # (4,)
    p2_polys: Optional[jnp.ndarray]   # (maxDadBl, 4, 3)
    claims_v: Optional[jnp.ndarray]   # (i, 4) one claim per source layer
    liu_polys: jnp.ndarray         # (bl_prev, 4, 3)
    liu_claim: jnp.ndarray         # (4,)


@jax.tree_util.register_dataclass
@dataclass
class Proof:
    vres: jnp.ndarray              # (4,)
    layers: List[Optional[LayerProof]]


def _values_block(cc, values, i):
    off = int(cc.value_off[i])
    return values[:, off:off + cc.layers[i].padded]


def _batched_betas(jobs):
    """jobs: {tag: (r (2, >=bl), bl, init (2,))} -> {tag: (2, 2^bl)}.
    One doubling loop per DISTINCT bl (beta_tables_batched) instead of one
    per table — the ~100 per-proof beta builds are op-dispatch-bound."""
    groups = {}
    for tag, (_r, bl, _init) in jobs.items():
        groups.setdefault(bl, []).append(tag)
    out = {}
    for bl, tags in sorted(groups.items()):
        rs = jnp.stack([jobs[t][0][:, :bl] for t in tags], axis=1)
        inits = jnp.stack([jobs[t][2] for t in tags], axis=1)
        tbl = beta_tables_batched(rs, bl, inits)
        for k, t in enumerate(tags):
            out[t] = tbl[:, k]
    return out


def _scale_beta_asserts(cc, i, bg, assert_r, mask=None):
    """mask: optional pre-built device bool mask (verifier_arrays) so
    jitted callers avoid closure-captured constants."""
    L = cc.layers[i]
    if not L.has_assert:
        return bg
    if mask is None:
        m = np.zeros(bg.shape[1], dtype=bool)
        m[:L.size] = L.is_assert
        mask = jnp.asarray(m)
    scaled = gf.mul(bg, assert_r[:, None])
    return jnp.where(mask[None, :], scaled, bg)


def prove(cc: CompiledCircuit, plans, values, ch: Challenges,
          arrs=None) -> Proof:
    """Full GKR proof (traceable; used fused under one jit or staged via
    make_prover).  All sumchecks of the same table size fuse into ONE
    batched scan — layers are independent once the (message-independent)
    challenge schedule is fixed — producing bit-identical messages with
    ~10x fewer scan bodies than a per-layer walk."""
    depth = cc.depth
    p1_groups = {}
    for i in range(depth - 1, 0, -1):
        p1_groups.setdefault(cc.layers[i - 1].bit_length, []).append(i)
    p2_groups = {}
    for i in range(depth - 1, 0, -1):
        L = cc.layers[i]
        if L.max_dad_bit_length < 0:
            continue
        for li in range(i):
            if L.dad_sizes[li] > 0:
                p2_groups.setdefault(L.dad_bls[li], []).append((i, li))

    if arrs is None:
        arrs = circuit_arrays(cc, plans)
    vres, p1_stacked, liu_stacked = _prove_inits(cc, plans, values, ch, arrs)
    # p1 and Liu tables are both ready after the inits, so same-size jobs
    # from BOTH phases merge into one fold launch (half the kernel launches)
    m_stacked, m_groups = {}, {}
    for bl in sorted(set(p1_stacked) | set(liu_stacked)):
        parts, tags = [], []
        if bl in p1_stacked:
            parts.append(p1_stacked[bl])
            tags += [("p1", i) for i in p1_groups[bl]]
        if bl in liu_stacked:
            parts.append(liu_stacked[bl])
            tags += [("liu", i) for i in p1_groups[bl]]
        m_stacked[bl] = tuple(
            jnp.concatenate([p[k] for p in parts], axis=1) for k in range(4))
        m_groups[bl] = tags
    m_res = _apply_grouped(m_stacked, m_groups, arrs)
    p1_res = {i: m_res[("p1", i)] for bl in p1_stacked
              for i in p1_groups[bl]}
    liu_res = {i: m_res[("liu", i)] for bl in liu_stacked
               for i in p1_groups[bl]}
    claims = {i: p1_res[i][1] for i in p1_res}
    p2_stacked = _prove_p2_inits(cc, plans, values, ch, claims, arrs)
    p2_scan = _apply_grouped(p2_stacked, p2_groups, arrs, bounds=True)
    p2_out = _prove_p2_combine(cc, ch, p2_scan)

    layer_proofs: List[Optional[LayerProof]] = [None] * depth
    for i in range(depth - 1, 0, -1):
        p2_polys, claims_v = p2_out.get(i, (None, None))
        layer_proofs[i] = LayerProof(
            p1_polys=p1_res[i][0], claim_u=p1_res[i][1],
            p2_polys=p2_polys, claims_v=claims_v,
            liu_polys=liu_res[i][0], liu_claim=liu_res[i][1])
    return Proof(vres=vres, layers=layer_proofs)


BUCKET_MIN_BL = 7    # jobs at or above this size merge into one launch
BUCKET_MAX_BL = 17   # Pallas kernel ceiling (sumcheck_fold MAX bl)


def _apply_grouped(stacked, groups, arrs=None, bounds=False):
    """Trace-inline fold application (used inside the fused prove jit).

    All jobs with bl in [BUCKET_MIN_BL, BUCKET_MAX_BL] zero-pad to the
    largest such size and fold as ONE batched launch: padded table entries
    are zero (contributing zero to every round message) and padded rounds
    use zero challenges (binding keeps the real bound scalar), so messages
    and bounds are bit-identical while the graph holds a single fold-kernel
    instantiation instead of one per table size — the per-size instantiation
    set alone was ~2/3 of a 22 MB fused module (OOM-killing the TPU
    compile helper).

    arrs: the circuit_arrays pytree; its perm{bl} entries feed the Pallas
    kernel's bit-reversal gather as jit ARGUMENTS (a closed-over perm is a
    ~130x slower constant gather on TPU).  Without arrs, falls back to the
    pure-XLA fold."""
    out = {}

    def emit(bl, polys, vb, ab, mb, k0=0):
        for kk, tag in enumerate(groups[bl]):
            k = k0 + kk
            if bounds:
                out[tag] = (polys[:bl, k], (vb[:, k], ab[:, k], mb[:, k]))
            else:
                out[tag] = (polys[:bl, k], vb[:, k])

    small = {bl: job for bl, job in stacked.items() if bl < BUCKET_MIN_BL
             or bl > BUCKET_MAX_BL}
    big = {bl: job for bl, job in stacked.items()
           if BUCKET_MIN_BL <= bl <= BUCKET_MAX_BL}

    for bl, job in sorted(small.items()):
        polys, (vb, ab, mb) = scan_sumcheck_batched_br(*job)
        emit(bl, polys, vb, ab, mb)

    if big:
        BL = max(big)
        n_pad = 1 << BL
        vs, as_, ms, rss, metas = [], [], [], [], []
        for bl, (v, a, m, rs) in sorted(big.items()):
            pad_n = ((0, 0), (0, 0), (0, n_pad - v.shape[2]))
            pad_r = ((0, 0), (0, 0), (0, BL - bl))
            vs.append(jnp.pad(v, pad_n))
            as_.append(jnp.pad(a, pad_n))
            ms.append(jnp.pad(m, pad_n))
            rss.append(jnp.pad(rs, pad_r))
            metas.append((bl, v.shape[1]))
        V = jnp.concatenate(vs, axis=1)
        A = jnp.concatenate(as_, axis=1)
        M = jnp.concatenate(ms, axis=1)
        RS = jnp.concatenate(rss, axis=1)
        perm = None if arrs is None else arrs.get(f"perm{BL}")
        polys, (vb, ab, mb) = scan_sumcheck_auto(V, A, M, RS, perm=perm)
        k0 = 0
        for bl, k in metas:
            emit(bl, polys, vb, ab, mb, k0)
            k0 += k
    return out


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------

def _check_round_chain(polys, rs, previous_sum):
    """Check p_j(0)+p_j(1) == prev and chain prev = p_j(r_j).
    Returns (ok (bool array), final previous_sum)."""
    ok = jnp.bool_(True)
    for j in range(polys.shape[0]):
        s = quad_at_0_plus_1(polys[j])
        ok = ok & jnp.all(s == previous_sum)
        previous_sum = eval_quad(polys[j], rs[:, j])
    return ok, previous_sum


def verifier_arrays(cc: CompiledCircuit) -> dict:
    """Per-layer index/coefficient arrays the verifier needs, as one
    pytree passed into make_verifier's two jits as ARGUMENTS — closure
    capture would inline them as dense MLIR constants (multi-MB modules
    that stall/OOM the TPU AOT compile helper; same rule as
    circuit_arrays)."""
    src = cc.source
    arrs = {}
    for i in range(1, cc.depth):
        L = cc.layers[i]
        arrs[f"vx{i}"] = jnp.asarray(L.x_idx)
        arrs[f"vco{i}"] = jnp.asarray(L.coeff)
        if L.has_assert:
            mask = np.zeros(1 << L.bit_length, dtype=bool)
            mask[:L.size] = L.is_assert
            arrs[f"via{i}"] = jnp.asarray(mask)
        if L.max_dad_bit_length >= 0:
            arrs[f"vlv{i}"] = jnp.asarray(
                np.where(np.asarray(src.layers[i].l) < 0, 0,
                         np.asarray(src.layers[i].lv)).astype(np.int32))
            arrs[f"vsl{i}"] = jnp.asarray(
                np.where(np.asarray(src.layers[i].l) < 0, i - 1,
                         np.asarray(src.layers[i].l)).astype(np.int32))
    for j in range(1, cc.depth):
        Lj = src.layers[j]
        for i1 in range(len(Lj.dad_size)):
            if Lj.dad_size[i1] > 0:
                arrs[f"vdad{j}_{i1}"] = jnp.asarray(
                    Lj.dad_id[i1].astype(np.int32))
    return arrs


def predicate_check(cc: CompiledCircuit, i: int, lp: LayerProof,
                    r_cur, ch: LayerChallenges, previous_sum_mid,
                    varrs: dict = None):
    """The O(#gates) wiring-predicate sweep (verifier.cpp:63-132, 160-166).

    This is the reference's "slow" verifier cost (verify_slow_timer,
    verifier.h:45-46), kept separable so the driver can time it apart from
    the succinct round-chain checks.  It is a pure side-check: it consumes
    the previousSum value reached after the phase-2 rounds and produces
    only a boolean — nothing downstream depends on it.

    varrs: verifier_arrays(cc), passed as jit arguments; None falls back
    to closure capture (small circuits / CPU only)."""
    L = cc.layers[i]
    src = cc.source
    bl_prev = cc.layers[i - 1].bit_length
    one = gf.ones(())

    bg = beta_table(r_cur, L.bit_length, one)
    bg = _scale_beta_asserts(
        cc, i, bg, ch.assert_r,
        mask=None if varrs is None else varrs.get(f"via{i}"))
    bg = bg[:, :L.size]
    bu = beta_table(ch.r_u[:, :bl_prev], bl_prev, one)
    x_idx = L.x_idx if varrs is None else varrs[f"vx{i}"]
    w = gf.mul(bg, bu[:, x_idx])
    if L.max_dad_bit_length >= 0:
        bv = beta_table(ch.r_v[:, :L.max_dad_bit_length],
                        L.max_dad_bit_length, one)
        if varrs is None:
            lv_flat = jnp.asarray(
                np.where(np.asarray(src.layers[i].l) < 0, 0,
                         np.asarray(src.layers[i].lv)).astype(np.int32))
        else:
            lv_flat = varrs[f"vlv{i}"]
        w = gf.mul(w, bv[:, lv_flat])
    cu = lp.claim_u[:, None]
    if lp.claims_v is not None and lp.claims_v.shape[0] > 0:
        if varrs is None:
            src_l = jnp.asarray(
                np.where(np.asarray(src.layers[i].l) < 0, i - 1,
                         np.asarray(src.layers[i].l)).astype(np.int32))
        else:
            src_l = varrs[f"vsl{i}"]
        cv = lp.claims_v.T[:, src_l]  # (4, N)
    else:
        cv = jnp.zeros((2, L.size), jnp.uint64)
    co = L.coeff if varrs is None else varrs[f"vco{i}"]
    A, B, C, D = co[0], co[1], co[2], co[3]
    gate_val = gf.add(gf.add(gf.mul(A, cu), gf.mul(B, cv)),
                      gf.add(gf.mul(C, gf.mul(cu, cv)), D))
    test_value = tree_sum(gf.mul(w, gate_val))
    return jnp.all(test_value == previous_sum_mid)


def verify_layer_fast(cc: CompiledCircuit, i: int, lp: LayerProof,
                      r_cur, ch: LayerChallenges, previous_sum,
                      proof: "Proof", ch_all: Challenges,
                      varrs: dict = None):
    """The succinct half of one layer's verification: round chains + Liu
    (verifier.cpp:191-337 minus the predicate sweeps).  Returns
    (ok, previous_sum_mid, new_sum) where previous_sum_mid is the value the
    predicate sweep must reproduce.  varrs: see predicate_check."""
    L = cc.layers[i]
    src = cc.source
    bl_prev = cc.layers[i - 1].bit_length
    one = gf.ones(())

    # phase 1 round checks
    ok1, previous_sum = _check_round_chain(lp.p1_polys,
                                           ch.r_u[:, :bl_prev], previous_sum)
    # phase 2 round checks
    ok2 = jnp.bool_(True)
    if L.max_dad_bit_length >= 0:
        ok2, previous_sum = _check_round_chain(
            lp.p2_polys, ch.r_v[:, :L.max_dad_bit_length], previous_sum)
    previous_sum_mid = previous_sum

    # Liu phase (verifier.cpp:272-337)
    sig = ch.sig
    liu_sum = gf.mul(sig[:, 0], lp.claim_u)
    ok_extra = jnp.bool_(True)
    for j in range(i, cc.depth):
        # claims about layer i-1 pending from higher layers (incl. this one)
        lp_j = proof.layers[j]
        if lp_j.claims_v is not None and lp_j.claims_v.shape[0] > i - 1:
            liu_sum = gf.add(liu_sum, gf.mul(sig[:, j - i + 1],
                                             lp_j.claims_v[i - 1]))
    previous_sum = liu_sum
    ok4, previous_sum = _check_round_chain(lp.liu_polys,
                                           ch.r_liu[:, :bl_prev],
                                           previous_sum)
    # gr computation
    bu_liu = beta_table(ch.r_liu[:, :bl_prev], bl_prev, one)
    bsig = beta_table(ch.r_u[:, :bl_prev], bl_prev, sig[:, 0])
    pre_size = cc.layers[i - 1].size
    gr = tree_sum(gf.mul(bsig[:, :pre_size], bu_liu[:, :pre_size]))
    for j in range(i, cc.depth):
        Lj = src.layers[j]
        ds = Lj.dad_size[i - 1] if i - 1 < len(Lj.dad_size) else 0
        if ds == 0:
            continue
        bl_jl = Lj.dad_bit_length[i - 1]
        ch_j = ch_all.layers[j]
        bt = beta_table(ch_j.r_v[:, :bl_jl], bl_jl, sig[:, j - i + 1])
        dad_id = (jnp.asarray(Lj.dad_id[i - 1].astype(np.int32))
                  if varrs is None else varrs[f"vdad{j}_{i - 1}"])
        gathered = bu_liu[:, dad_id]
        gr = gf.add(gr, tree_sum(gf.mul(bt[:, :ds], gathered)))
    ok5 = jnp.all(gf.mul(lp.liu_claim, gr) == previous_sum)
    previous_sum = lp.liu_claim

    ok = ok1 & ok2 & ok4 & ok5 & ok_extra
    return ok, previous_sum_mid, previous_sum


def verify_layer(cc: CompiledCircuit, i: int, lp: LayerProof,
                 r_cur, ch: LayerChallenges, previous_sum,
                 proof: "Proof", ch_all: Challenges):
    """Replays verifier.cpp:191-337 for one layer. Returns (ok, new_sum)."""
    ok_fast, mid, new_sum = verify_layer_fast(cc, i, lp, r_cur, ch,
                                              previous_sum, proof, ch_all)
    ok_slow = predicate_check(cc, i, lp, r_cur, ch, mid)
    return ok_fast & ok_slow, new_sum


def verify(cc: CompiledCircuit, proof: Proof, ch: Challenges,
           output_values=None):
    """Full GKR verification (without the polynomial commitment).

    output_values: optional (4, 2^bl_last) claimed output block to check
    vres against.  Returns (ok, final_claim, final_point): the surviving
    claim  V_input(final_point) == final_claim  for the PC opening.
    """
    depth = cc.depth
    previous_sum = proof.vres
    ok = jnp.bool_(True)
    if output_values is not None:
        ok = ok & jnp.all(mle_fold(output_values, ch.r_out) == proof.vres)
    r_cur = ch.r_out
    for i in range(depth - 1, 0, -1):
        ok_i, previous_sum = verify_layer(cc, i, proof.layers[i], r_cur,
                                          ch.layers[i], previous_sum,
                                          proof, ch)
        ok = ok & ok_i
        r_cur = ch.layers[i].r_liu[:, :cc.layers[i - 1].bit_length]
    return ok, previous_sum, r_cur


# ---------------------------------------------------------------------------
# Jitted entry points (circuit/plans closed over as compile-time constants)
# ---------------------------------------------------------------------------

def make_prover(cc: CompiledCircuit, plans, staged: bool = True):
    """Returns prove(values, challenges) -> Proof.

    staged=True (default): the prover runs as a handful of separately
    jitted stages — phase inits, one batched scan per table size, the
    phase-2 combine — instead of one mega-jit.  Compiles in seconds
    instead of tens of minutes (the XLA/TPU compile of the fused graph
    dominates wall time otherwise) at the cost of a few extra dispatches;
    the batched scan executables are shared across shapes and circuits.
    staged=False: the original single-jit fusion."""
    if not staged:
        arrs0 = circuit_arrays(cc, plans)
        f = jax.jit(lambda values, ch, arrs: prove(cc, plans, values, ch,
                                                   arrs))
        return lambda values, ch: f(values, ch, arrs0)

    # static group plans: which layers/tables fold together per size
    p1_groups = {}
    for i in range(cc.depth - 1, 0, -1):
        p1_groups.setdefault(cc.layers[i - 1].bit_length, []).append(i)
    p2_groups = {}
    for i in range(cc.depth - 1, 0, -1):
        L = cc.layers[i]
        if L.max_dad_bit_length < 0:
            continue
        for li in range(i):
            if L.dad_sizes[li] > 0:
                p2_groups.setdefault(L.dad_bls[li], []).append((i, li))

    arrs = circuit_arrays(cc, plans)
    inits_fn = jax.jit(
        lambda values, ch, arrs: _prove_inits(cc, plans, values, ch, arrs))

    def _p2init(values, ch, p1_raw, arrs):
        claims = {}
        for bl, group in p1_groups.items():
            _, (vb, _a, _m) = p1_raw[bl]
            for kk, tag in enumerate(group):
                claims[tag] = vb[:, kk]
        return _prove_p2_inits(cc, plans, values, ch, claims, arrs)

    p2init_fn = jax.jit(_p2init)

    def _assemble(vres, ch, p1_raw, p2_raw, liu_raw):
        p1_res = _unstack(p1_raw, p1_groups)
        liu_res = _unstack(liu_raw, p1_groups)
        p2_scan = _unstack(p2_raw, p2_groups, bounds=True)
        p2_out = _prove_p2_combine(cc, ch, p2_scan)
        depth = cc.depth
        layer_proofs = [None] * depth
        for i in range(depth - 1, 0, -1):
            p2_polys, claims_v = p2_out.get(i, (None, None))
            layer_proofs[i] = LayerProof(
                p1_polys=p1_res[i][0], claim_u=p1_res[i][1],
                p2_polys=p2_polys, claims_v=claims_v,
                liu_polys=liu_res[i][0], liu_claim=liu_res[i][1])
        return Proof(vres=vres, layers=layer_proofs)

    assemble_fn = jax.jit(_assemble)
    scan_fn = _batched_scan_jit()

    def run(values, ch):
        vres, p1_stacked, liu_stacked = inits_fn(values, ch, arrs)
        p1_raw = {bl: scan_fn(*a) for bl, a in sorted(p1_stacked.items())}
        p2_stacked = p2init_fn(values, ch, p1_raw, arrs)
        p2_raw = {bl: scan_fn(*a) for bl, a in sorted(p2_stacked.items())}
        liu_raw = {bl: scan_fn(*a) for bl, a in sorted(liu_stacked.items())}
        return assemble_fn(vres, ch, p1_raw, p2_raw, liu_raw)

    return run


_SCAN_JIT = None


def _batched_scan_jit():
    global _SCAN_JIT
    if _SCAN_JIT is None:
        from .sumcheck import _bitrev_perm
        inner = jax.jit(scan_sumcheck_auto)
        dev_perms = {}

        def run(v, a, m, rs):
            # bit-reversal permutation as a jit ARGUMENT (constant gathers
            # are ~130x slower on TPU); device copy cached per size so each
            # dispatch does not re-upload it through the tunnel
            bl = rs.shape[2]
            perm = dev_perms.get(bl)
            if perm is None:
                perm = jnp.asarray(_bitrev_perm(bl))
                dev_perms[bl] = perm
            return inner(v, a, m, rs, perm)

        _SCAN_JIT = run
    return _SCAN_JIT


def _unstack(raw, groups, bounds=False):
    """raw: {bl: (polys, (vb, ab, mb))} batched scan outputs;
    groups: {bl: [tag, ...]} static tag order.  Returns {tag: result}."""
    out = {}
    for bl, (polys, (vb, ab, mb)) in sorted(raw.items()):
        for kk, tag in enumerate(groups[bl]):
            if bounds:
                out[tag] = (polys[:, kk], (vb[:, kk], ab[:, kk], mb[:, kk]))
            else:
                out[tag] = (polys[:, kk], vb[:, kk])
    return out


def _prove_inits(cc, plans, values, ch, arrs):
    """Stage 1: vres + phase-1 and Liu table inits for every layer.

    All gate scatters (add/mult contributions of every layer plus every
    Liu consumer part) run as ONE fused segment-sum (concat_scatter_plans)
    — a single prefix-sum pass instead of ~3 per layer."""
    depth = cc.depth
    one = gf.ones(())
    vres = mle_fold(_values_block(cc, values, depth - 1), ch.r_out)

    blocks = _inits_layout(cc, plans)

    # pass 1: every beta table this stage needs, batched by size
    beta_jobs = {}
    for i in range(depth - 1, 0, -1):
        L = cc.layers[i]
        P = plans[i]
        chl = ch.layers[i]
        bl_prev = cc.layers[i - 1].bit_length
        r_cur = (ch.r_out if i == depth - 1
                 else ch.layers[i + 1].r_liu[:, :L.bit_length])
        beta_jobs[("bg", i)] = (r_cur, L.bit_length, one)
        sig = chl.sig
        beta_jobs[("bsig", i)] = (chl.r_u, bl_prev, sig[:, 0])
        if P.liu_plan is not None:
            for (j, ds, bl_jl, off) in P.liu_consumers:
                beta_jobs[("bt", i, j)] = (ch.layers[j].r_v, bl_jl,
                                           sig[:, j - i + 1])
    betas = _batched_betas(beta_jobs)

    contribs = {}
    multL_base = {}
    for i in range(depth - 1, 0, -1):
        L = cc.layers[i]
        P = plans[i]
        chl = ch.layers[i]
        bg_full = _scale_beta_asserts(cc, i, betas[("bg", i)], chl.assert_r)
        bg = bg_full[:, :L.size]
        y = values[:, arrs[f"y{i}"]]
        co = arrs[f"co{i}"]
        A, B, C, D = co[0], co[1], co[2], co[3]
        contribs[("add", i)] = gf.mul(bg, gf.add(gf.mul(B, y), D))
        contribs[("mult", i)] = gf.mul(bg, gf.add(A, gf.mul(C, y)))
        pre_size = cc.layers[i - 1].size
        multL_base[i] = jnp.pad(
            betas[("bsig", i)][:, :pre_size],
            ((0, 0), (0, cc.layers[i - 1].padded - pre_size)))
        if P.liu_plan is not None:
            parts = [betas[("bt", i, j)][:, :ds]
                     for (j, ds, bl_jl, off) in P.liu_consumers]
            contribs[("liu", i)] = jnp.concatenate(parts, axis=1)

    from .sumcheck import apply_scatter_arrays
    fused = apply_scatter_arrays(
        jnp.concatenate([contribs[(k, i)] for (k, i, _n, _o) in blocks],
                        axis=1), arrs["initsP"])
    slices = {}
    off = 0
    for (k, i, _n, out_len) in blocks:
        slices[(k, i)] = fused[:, off:off + out_len]
        off += out_len

    p1_jobs = {}
    liu_jobs = {}
    for i in range(depth - 1, 0, -1):
        P = plans[i]
        chl = ch.layers[i]
        bl_prev = cc.layers[i - 1].bit_length
        vloc = _values_block(cc, values, i - 1)
        p1_jobs.setdefault(bl_prev, []).append(
            (vloc, slices[("add", i)], slices[("mult", i)],
             chl.r_u[:, :bl_prev]))
        multL = multL_base[i]
        if P.liu_plan is not None:
            multL = gf.add(multL, slices[("liu", i)])
        liu_jobs.setdefault(bl_prev, []).append(
            (vloc, jnp.zeros_like(multL), multL, chl.r_liu[:, :bl_prev]))
    return (vres, _stack_jobs(p1_jobs), _stack_jobs(liu_jobs))


def _stack_jobs(jobs):
    return {bl: tuple(jnp.stack([g[k] for g in group], axis=1)
                      for k in range(4))
            for bl, group in jobs.items()}


def _prove_p2_inits(cc, plans, values, ch, claims, arrs):
    """Stage 2: phase-2 scatter inits (needs phase-1 claims).  All layers'
    addV/multV scatters fuse into ONE segment-sum pass."""
    from .sumcheck import apply_scatter_arrays
    one = gf.ones(())
    blocks = _p2_layout(cc, plans)
    if not blocks:
        return {}
    beta_jobs = {}
    for i in range(cc.depth - 1, 0, -1):
        L = cc.layers[i]
        if L.max_dad_bit_length < 0:
            continue
        chl = ch.layers[i]
        bl_prev = cc.layers[i - 1].bit_length
        r_cur = (ch.r_out if i == cc.depth - 1
                 else ch.layers[i + 1].r_liu[:, :L.bit_length])
        beta_jobs[("bg", i)] = (r_cur, L.bit_length, one)
        beta_jobs[("bu", i)] = (chl.r_u, bl_prev, one)
    betas = _batched_betas(beta_jobs)

    contribs = {}
    for i in range(cc.depth - 1, 0, -1):
        L = cc.layers[i]
        if L.max_dad_bit_length < 0:
            continue
        chl = ch.layers[i]
        claim_u = claims[i]
        bg_full = _scale_beta_asserts(cc, i, betas[("bg", i)], chl.assert_r)
        bg = bg_full[:, :L.size]
        co = arrs[f"co{i}"]
        A, B, C, D = co[0], co[1], co[2], co[3]
        tmp_g = gf.mul(bg, betas[("bu", i)][:, arrs[f"x{i}"]])
        cu = claim_u[:, None]
        contribs[("p2a", i)] = gf.mul(tmp_g, gf.add(gf.mul(A, cu), D))
        contribs[("p2m", i)] = gf.mul(tmp_g, gf.add(B, gf.mul(C, cu)))

    fused = apply_scatter_arrays(
        jnp.concatenate([contribs[(k, i)] for (k, i, _n, _o) in blocks],
                        axis=1), arrs["p2P"])
    slices = {}
    off = 0
    for (k, i, _n, out_len) in blocks:
        slices[(k, i)] = fused[:, off:off + out_len]
        off += out_len

    p2_jobs = {}
    for i in range(cc.depth - 1, 0, -1):
        L = cc.layers[i]
        if L.max_dad_bit_length < 0:
            continue
        chl = ch.layers[i]
        addV = slices[("p2a", i)]
        multV = slices[("p2m", i)]
        vdad = jnp.where(arrs[f"dgm{i}"], values[:, arrs[f"dg{i}"]], 0)
        for li in range(i):
            if L.dad_sizes[li] == 0:
                continue
            bl_l = L.dad_bls[li]
            off_l = L.dad_offsets[li]
            sl = slice(off_l, off_l + (1 << bl_l))
            p2_jobs.setdefault(bl_l, []).append(
                (vdad[:, sl], addV[:, sl], multV[:, sl],
                 chl.r_v[:, :bl_l]))
    return _stack_jobs(p2_jobs)


def _prove_p2_combine(cc, ch, p2_res):
    """Stage 3: per-layer round messages + add_term chain + claims."""
    one = gf.ones(())
    zero = jnp.zeros((2,), jnp.uint64)
    p2_out = {}
    for i in range(cc.depth - 1, 0, -1):
        L = cc.layers[i]
        if L.max_dad_bit_length < 0:
            continue
        chl = ch.layers[i]
        mdb = L.max_dad_bit_length
        a_term = zero
        out_polys = []
        for j in range(mdb):
            if j > 0:
                a_term = gf.mul(a_term, gf.sub(one, chl.r_v[:, j - 1]))
            pj = jnp.zeros((2, 3), jnp.uint64)
            for li in range(i):
                if L.dad_sizes[li] == 0:
                    continue
                bl_l = L.dad_bls[li]
                polys_l, bounds_l = p2_res[(i, li)]
                if j < bl_l:
                    pj = gf.add(pj, polys_l[j])
                elif j == bl_l:
                    vb, ab, mb = bounds_l
                    a_term = gf.add(a_term, gf.add(gf.mul(vb, mb), ab))
            pj = gf.add(pj, jnp.stack([zero, gf.neg(a_term), a_term],
                                      axis=1))
            out_polys.append(pj)
        p2_polys = (jnp.stack(out_polys) if out_polys
                    else jnp.zeros((0, 2, 3), jnp.uint64))
        cl = []
        for li in range(i):
            if L.dad_sizes[li] > 0:
                cl.append(p2_res[(i, li)][1][0])
            else:
                cl.append(zero)
        claims_v = jnp.stack(cl) if cl else jnp.zeros((0, 2), jnp.uint64)
        p2_out[i] = (p2_polys, claims_v)
    return p2_out


def _verify_fast_all(cc, proof, ch, output_values=None, varrs=None):
    """All layers' succinct checks in one traced program.  Valid because
    the previousSum entering layer i is the upper layer's Liu claim —
    proof data, not a computed dependency — so nothing here waits on a
    host round trip between layers.  Returns (ok, mids, final_claim,
    final_point); ``mids`` feeds the predicate sweeps."""
    depth = cc.depth
    previous_sum = proof.vres
    ok = jnp.bool_(True)
    if output_values is not None:
        ok = ok & jnp.all(mle_fold(output_values, ch.r_out) == proof.vres)
    r_cur = ch.r_out
    mids = []
    for i in range(depth - 1, 0, -1):
        ok_i, mid, previous_sum = verify_layer_fast(
            cc, i, proof.layers[i], r_cur, ch.layers[i], previous_sum,
            proof, ch, varrs)
        ok = ok & ok_i
        mids.append(mid)
        r_cur = ch.layers[i].r_liu[:, :cc.layers[i - 1].bit_length]
    return ok, mids, previous_sum, r_cur


def _verify_slow_all(cc, proof, ch, mids, varrs=None):
    """All layers' O(#gates) wiring-predicate sweeps in one traced
    program (the reference's verify_slow_timer half)."""
    ok = jnp.bool_(True)
    r_cur = ch.r_out
    for k, i in enumerate(range(cc.depth - 1, 0, -1)):
        ok = ok & predicate_check(cc, i, proof.layers[i], r_cur,
                                  ch.layers[i], mids[k], varrs)
        r_cur = ch.layers[i].r_liu[:, :cc.layers[i - 1].bit_length]
    return ok


def make_verifier(cc: CompiledCircuit, staged: bool = True):
    """Returns verify(proof, challenges, output_values).

    The whole layer walk runs as TWO device dispatches — one jit for every
    layer's succinct round-chain/Liu checks, one for every layer's
    O(#gates) predicate sweep — keeping the reference's fast/slow verifier
    time split (verifier.cpp:180, verify_slow_timer verifier.h:45-46)
    while avoiding a per-layer dispatch tax (~6 ms each through the axon
    tunnel).  After each call ``run.last_split`` holds
    ``(fast_seconds, slow_seconds)``.

    staged=False: single fused jit of both halves (no split timing)."""
    if not staged:
        return jax.jit(lambda proof, ch, out: verify(cc, proof, ch, out))

    varrs = verifier_arrays(cc)
    fast_all = jax.jit(
        lambda proof, ch, va: _verify_fast_all(cc, proof, ch, varrs=va))
    fast_all_out = jax.jit(
        lambda proof, ch, out, va: _verify_fast_all(cc, proof, ch, out, va))
    slow_all = jax.jit(
        lambda proof, ch, mids, va: _verify_slow_all(cc, proof, ch, mids,
                                                     va))

    def run(proof, ch, output_values=None):
        t0 = time.perf_counter()
        if output_values is not None:
            ok, mids, previous_sum, r_cur = fast_all_out(proof, ch,
                                                         output_values,
                                                         varrs)
        else:
            ok, mids, previous_sum, r_cur = fast_all(proof, ch, varrs)
        ok, previous_sum, r_cur = jax.block_until_ready(
            (ok, previous_sum, r_cur))
        t_fast = time.perf_counter() - t0

        ok = jax.block_until_ready(ok & slow_all(proof, ch, mids, varrs))
        run.last_split = (t_fast, time.perf_counter() - t0 - t_fast)
        return ok, previous_sum, r_cur

    run.last_split = (0.0, 0.0)
    return run


def make_evaluator(cc: CompiledCircuit):
    from ..circuits.compile import evaluate as _ev, eval_arrays
    arrs = eval_arrays(cc)
    f = jax.jit(lambda inputs, arrs: _ev(cc, inputs, arrs))
    return lambda inputs: f(inputs, arrs)

"""End-to-end GKR prove+verify on synthetic circuits (SURVEY.md §7 M2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from virgo_plus_tpu.circuits.layered import randomize, subset_init
from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer, evaluate
from virgo_plus_tpu.circuits.pws import parse_pws
from virgo_plus_tpu.circuits.layered import dag_to_layered
from virgo_plus_tpu.gkr import protocol
from virgo_plus_tpu.field import gf
from virgo_plus_tpu.field.ref import Fq2
from virgo_plus_tpu.gkr.sumcheck import mle_fold
from virgo_plus_tpu.utils.glibc_rand import GlibcRandom


def _setup(n_layers, bits, seed=7):
    c = randomize(n_layers, bits, seed=seed)
    subset_init(c)
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    values = protocol.make_evaluator(cc)(input_buffer(cc))
    ch = protocol.make_challenges(cc, GlibcRandom(3396))
    return cc, plans, values, ch


def test_evaluate_matches_oracle():
    c = randomize(4, 3, seed=1)
    subset_init(c)
    cc = compile_circuit(c)
    values = protocol.make_evaluator(cc)(input_buffer(cc))
    # oracle evaluation with python ints
    vals = [[Fq2.raw(int(r), int(i)) for r, i in
             zip(c.input_values[0], c.input_values[1])]]
    for i in range(1, c.size):
        L = c.layers[i]
        row = []
        for g in range(L.size):
            x = vals[i - 1][int(L.u[g])]
            y = vals[int(L.l[g])][int(L.v[g])]
            if L.ty[g] == 1:  # Add
                row.append(x + y)
            else:             # Mul
                row.append(x * y)
        vals.append(row)
    got_r, got_i = gf.to_u64(values)
    for i in range(c.size):
        off = int(cc.value_off[i])
        for g in range(c.layers[i].size):
            assert (int(got_r[off + g]), int(got_i[off + g])) == \
                (vals[i][g].real, vals[i][g].img), (i, g)


@pytest.mark.parametrize("n_layers,bits", [(3, 2), (4, 3), (6, 4)])
def test_gkr_roundtrip(n_layers, bits):
    cc, plans, values, ch = _setup(n_layers, bits)
    proof = protocol.make_prover(cc, plans)(values, ch)
    out_block = values[:, int(cc.value_off[cc.depth - 1]):]
    ok, final_claim, final_point = protocol.make_verifier(cc)(proof, ch, out_block)
    assert bool(ok), "honest proof must verify"
    # final claim == input MLE at final point
    inp = values[:, :cc.layers[0].padded]
    expect = mle_fold(inp, final_point)
    assert bool(jnp.all(expect == final_claim))


def test_gkr_rejects_tampering():
    cc, plans, values, ch = _setup(4, 3)
    proof = protocol.make_prover(cc, plans)(values, ch)
    # corrupt one round polynomial coefficient
    lp = proof.layers[cc.depth - 1]
    bad = lp.p1_polys.at[0, 0, 1].add(1)
    proof.layers[cc.depth - 1] = protocol.LayerProof(
        p1_polys=bad, claim_u=lp.claim_u, p2_polys=lp.p2_polys,
        claims_v=lp.claims_v, liu_polys=lp.liu_polys, liu_claim=lp.liu_claim)
    out_block = values[:, int(cc.value_off[cc.depth - 1]):]
    ok, _, _ = protocol.make_verifier(cc)(proof, ch, out_block)
    assert not bool(ok), "tampered proof must be rejected"


def test_gkr_rejects_wrong_witness():
    cc, plans, values, ch = _setup(4, 3)
    proof = protocol.make_prover(cc, plans)(values, ch)
    out_block = values[:, int(cc.value_off[cc.depth - 1]):]
    # flip one output value the verifier believes in
    bad_out = out_block.at[0, 0].add(1)
    ok, _, _ = protocol.make_verifier(cc)(proof, ch, bad_out)
    assert not bool(ok)

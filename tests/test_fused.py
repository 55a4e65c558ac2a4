"""The single-dispatch fused prover must be bit-exact vs the staged path."""

import numpy as np

from virgo_plus_tpu import driver, fused
from virgo_plus_tpu.circuits.compile import input_buffer
from virgo_plus_tpu.field import gf
from virgo_plus_tpu.gkr import protocol
from virgo_plus_tpu.pc import virgo_pc
from virgo_plus_tpu.utils.glibc_rand import GlibcRandom

FIXTURE = "tests/data/small1200.pws"


def test_fused_matches_staged():
    c = driver.load_circuit(FIXTURE)
    cp = driver.compile_prover(c)
    cc = cp.cc
    bl0 = cc.layers[0].bit_length
    n_folds = bl0 - virgo_pc.LOG_SLICE

    # staged reference run (same challenge stream)
    full, info = driver.prove(c, cp)

    rng = GlibcRandom(3396)
    ch = protocol.make_challenges(cc, rng)
    # driver.prove consumes the fft_gkr draws before the fold challenges
    from virgo_plus_tpu.pc import fft_gkr
    fft_gkr.run(bl0 - virgo_pc.LOG_SLICE, rng)
    randomness = tuple(
        gf.from_u64(np.uint64(r), np.uint64(i)).reshape(2)
        for (r, i) in [rng.field_element() for _ in range(n_folds)])
    inputs = input_buffer(cc)

    run = fused.make_e2e_prover(cc, cp.plans)
    proof, l_oracle, h_oracle, all_sum, q_coefs, ldt = run(
        inputs, ch, randomness)

    assert np.array_equal(np.asarray(proof.vres), full.vres)
    for i in range(1, cc.depth):
        lp = proof.layers[i]
        ref = full.layers[i]
        assert np.array_equal(np.asarray(lp.p1_polys), ref["p1_polys"])
        assert np.array_equal(np.asarray(lp.claim_u), ref["claim_u"])
        if ref.get("p2_polys") is not None:
            assert np.array_equal(np.asarray(lp.p2_polys), ref["p2_polys"])
            assert np.array_equal(np.asarray(lp.claims_v), ref["claims_v"])
        assert np.array_equal(np.asarray(lp.liu_polys), ref["liu_polys"])
        assert np.array_equal(np.asarray(lp.liu_claim), ref["liu_claim"])

    assert np.array_equal(np.asarray(l_oracle.tree[:, 1]), full.root_l)
    assert np.array_equal(np.asarray(h_oracle.tree[:, 1]), full.root_h)
    assert np.array_equal(np.asarray(all_sum), full.all_sum)
    level_roots = np.stack([np.asarray(o.tree[:, 1]) for o in ldt.oracles])
    assert np.array_equal(level_roots, full.level_roots)
    assert np.array_equal(np.asarray(ldt.final_codeword),
                          full.final_codeword)

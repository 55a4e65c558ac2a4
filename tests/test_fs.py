"""Fiat-Shamir (non-interactive) mode: on-device prover, host verifier."""

import numpy as np
import jax
import jax.numpy as jnp

from virgo_plus_tpu.circuits.layered import randomize, subset_init
from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
from virgo_plus_tpu.gkr import protocol, fs
from virgo_plus_tpu.pc import virgo_pc


def _setup(n_layers=4, bits=3):
    c = randomize(n_layers, bits, seed=3)
    subset_init(c)
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    inputs = input_buffer(cc)
    values = protocol.make_evaluator(cc)(inputs)
    return cc, plans, inputs, values


def test_fs_roundtrip():
    cc, plans, inputs, values = _setup()
    bl0 = cc.layers[0].bit_length
    # a commitment root to seed the transcript; for the GKR-only test use
    # a synthetic digest of the inputs
    root_l = jnp.asarray(np.arange(4, dtype=np.uint64) + 7)
    prover = fs.make_fs_prover(cc, plans)
    proof, ch, D = prover(values, root_l)
    ok, fc, fp = fs.fs_verify(cc, proof, root_l)
    assert bool(ok)
    # derived challenges must match the prover's device-side draws
    ch2, _ = fs.derive_challenges(cc, proof, root_l)
    assert bool(jnp.all(ch2.r_out == ch.r_out))
    for i in range(1, cc.depth):
        assert bool(jnp.all(ch2.layers[i].r_u == ch.layers[i].r_u))
        assert bool(jnp.all(ch2.layers[i].sig == ch.layers[i].sig))


def test_fs_rejects_tampering():
    cc, plans, inputs, values = _setup()
    root_l = jnp.asarray(np.arange(4, dtype=np.uint64) + 7)
    proof, ch, D = fs.make_fs_prover(cc, plans)(values, root_l)
    lp = proof.layers[cc.depth - 1]
    bad = protocol.LayerProof(
        p1_polys=lp.p1_polys.at[0, 0, 1].add(1), claim_u=lp.claim_u,
        p2_polys=lp.p2_polys, claims_v=lp.claims_v,
        liu_polys=lp.liu_polys, liu_claim=lp.liu_claim)
    proof.layers[cc.depth - 1] = bad
    ok, _, _ = fs.fs_verify(cc, proof, root_l)
    assert not bool(ok)


def test_fs_end_to_end_with_pc():
    from virgo_plus_tpu import driver
    c = randomize(3, 7, seed=9)
    subset_init(c)
    cp = driver.compile_prover(c)
    full, info = driver.prove_fs(c, cp)
    rep = driver.verify_fs(c, full, cp)
    assert rep.ok and rep.gkr_ok and rep.pc_ok
    # tamper with all_sum -> verification must fail
    tampered = full.all_sum.copy()
    tampered[0, 0] = (int(tampered[0, 0]) + 1) % ((1 << 61) - 1)
    good_all_sum, full.all_sum = full.all_sum, tampered
    rep2 = driver.verify_fs(c, full, cp)
    assert not rep2.ok
    full.all_sum = good_all_sum
    # forged constant final codeword (constancy passes, binding must not)
    full.final_codeword = np.zeros_like(full.final_codeword)
    rep3 = driver.verify_fs(c, full, cp)
    assert not rep3.ok

"""Sharded GKR prover + full sharded prove: bit-exact vs single chip on the
8-device CPU mesh (default-on, not skip-gated)."""

import numpy as np
import jax
from jax.sharding import Mesh

from virgo_plus_tpu import driver
from virgo_plus_tpu.circuits.layered import randomize, subset_init
from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
from virgo_plus_tpu.gkr import protocol
from virgo_plus_tpu.parallel.gkr_sharded import (make_sharded_prover,
                                                 prove_sharded)
from virgo_plus_tpu.utils.glibc_rand import GlibcRandom


def _mesh(n=8):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _circ(n_layers=4, bits=7, seed=5):
    c = randomize(n_layers, bits, seed=seed)
    subset_init(c)
    return c


def test_sharded_gkr_bit_exact():
    c = _circ()
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    inputs = input_buffer(cc)
    evaluator = protocol.make_evaluator(cc)
    values = evaluator(inputs)
    ch = protocol.make_challenges(cc, GlibcRandom(3396))

    ref = protocol.prove(cc, plans, values, ch)
    got = make_sharded_prover(cc, plans, _mesh(), "sp")(values, ch)

    assert np.array_equal(np.asarray(got.vres), np.asarray(ref.vres))
    for i in range(1, cc.depth):
        g, r = got.layers[i], ref.layers[i]
        assert np.array_equal(np.asarray(g.p1_polys), np.asarray(r.p1_polys))
        assert np.array_equal(np.asarray(g.claim_u), np.asarray(r.claim_u))
        if r.p2_polys is not None:
            assert np.array_equal(np.asarray(g.p2_polys),
                                  np.asarray(r.p2_polys))
            assert np.array_equal(np.asarray(g.claims_v),
                                  np.asarray(r.claims_v))
        assert np.array_equal(np.asarray(g.liu_polys),
                              np.asarray(r.liu_polys))
        assert np.array_equal(np.asarray(g.liu_claim),
                              np.asarray(r.liu_claim))


def test_full_sharded_prove_matches_and_verifies():
    """prove_sharded == driver.prove bit-for-bit (roots, polys, queries),
    and the sharded proof verifies standalone."""
    c = _circ()
    cp = driver.compile_prover(c)
    ref, _ = driver.prove(c, cp)
    got, info = prove_sharded(c, _mesh(), "sp")

    assert np.array_equal(got.root_l, ref.root_l)
    assert np.array_equal(got.root_h, ref.root_h)
    assert np.array_equal(got.level_roots, ref.level_roots)
    assert np.array_equal(got.all_sum, ref.all_sum)
    assert np.array_equal(got.final_codeword, ref.final_codeword)
    assert np.array_equal(got.vres, ref.vres)
    for i in range(1, cp.cc.depth):
        for k, v in ref.layers[i].items():
            if v is None:
                continue
            assert np.array_equal(got.layers[i][k], v), (i, k)
    assert np.array_equal(got.queries.init_l_vals, ref.queries.init_l_vals)
    assert np.array_equal(got.queries.init_l_paths,
                          ref.queries.init_l_paths)

    rep = driver.verify(c, got, cp)
    assert rep.ok

"""Batched full prover (GKR + PC vmapped) == per-instance single prove."""

import numpy as np
import jax.numpy as jnp

from virgo_plus_tpu import driver
from virgo_plus_tpu.circuits.layered import randomize, subset_init
from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
from virgo_plus_tpu.field import gf
from virgo_plus_tpu.gkr import protocol
from virgo_plus_tpu.parallel.sharded import make_batched_full_prover
from virgo_plus_tpu.pc import virgo_pc, fft_gkr
from virgo_plus_tpu.utils.glibc_rand import GlibcRandom


def test_batched_full_matches_single():
    c = randomize(3, 7, seed=6)
    subset_init(c)
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    bl0 = cc.layers[0].bit_length
    n_folds = bl0 - virgo_pc.LOG_SLICE

    rng = GlibcRandom(3396)
    ch = protocol.make_challenges(cc, rng)
    fft_gkr.run(n_folds, rng)
    randomness = tuple(
        gf.from_u64(np.uint64(r), np.uint64(i)).reshape(2)
        for (r, i) in [rng.field_element() for _ in range(n_folds)])
    final_point = ch.layers[1].r_liu[:, :bl0]

    base = np.asarray(input_buffer(cc))
    batch = 3
    xs = np.stack([base] * batch)
    xs[1, 0, 0] = (int(xs[1, 0, 0]) + 1) % ((1 << 61) - 1)
    xs[2, 0, 1] = (int(xs[2, 0, 1]) + 2) % ((1 << 61) - 1)

    run = make_batched_full_prover(cc, plans)
    proofs, root_l, root_h, all_sum, level_roots, final_cw = run(
        jnp.asarray(xs), ch, final_point, randomness)

    # per-instance reference: driver.prove with the same witness
    cp = driver.compile_prover(c)
    for b in range(batch):
        full, _ = driver.prove(c, cp, witness=xs[b])
        assert np.array_equal(np.asarray(root_l[b]), full.root_l), b
        assert np.array_equal(np.asarray(root_h[b]), full.root_h), b
        assert np.array_equal(np.asarray(all_sum[b]), full.all_sum), b
        assert np.array_equal(np.asarray(level_roots[b]),
                              full.level_roots), b
        assert np.array_equal(np.asarray(final_cw[b]),
                              full.final_codeword), b
        assert np.array_equal(np.asarray(proofs.vres[b]), full.vres), b
        for i in range(1, cc.depth):
            assert np.array_equal(np.asarray(proofs.layers[i].p1_polys[b]),
                                  full.layers[i]["p1_polys"]), (b, i)

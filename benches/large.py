"""Large unlayered circuit (BASELINE config #4: 2^24 gates), full prove.

Synthetic unlayered circuit — every layer's right inputs come from random
earlier layers (the subset/`dad` machinery at scale, reference
src/circuit.cpp:43-80) — proven end to end: GKR + polynomial commitment on
the 2^bits-value input layer (FFT/IFFT onto the 32x RS domain + Merkle +
LDT folds).  Default 5 layers x 2^22 = 2^24 gates; the input layer commit
encodes 2^22 values into a (65, 2^21)-per-slice codeword.

    python benches/large.py [layers] [bits]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(layers=5, bits=22):
    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from virgo_plus_tpu.circuits.layered import randomize, subset_init
    from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
    from virgo_plus_tpu.field import gf
    from virgo_plus_tpu.gkr import protocol
    from virgo_plus_tpu.gkr.beta import beta_table
    from virgo_plus_tpu.pc import virgo_pc
    from virgo_plus_tpu.utils.glibc_rand import GlibcRandom

    t0 = time.time()
    c = randomize(layers, bits, seed=4)
    subset_init(c)
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    aot_s = time.time() - t0

    bl0 = cc.layers[0].bit_length
    n_folds = bl0 - virgo_pc.LOG_SLICE
    ev = protocol.make_evaluator(cc)
    prover = protocol.make_prover(cc, plans)
    commit_fn = jax.jit(lambda v: virgo_pc.commit_private(v, bl0))
    commit_pub_fn = jax.jit(
        lambda l_eval, fp: virgo_pc.commit_public(
            l_eval, beta_table(fp, bl0, gf.ones(())), bl0))
    folds_fn = jax.jit(
        lambda vo, rands: virgo_pc.commit_phase(vo, bl0, list(rands)))

    rng = GlibcRandom(3396)
    ch = protocol.make_challenges(cc, rng)
    randomness = tuple(
        gf.from_u64(np.uint64(r), np.uint64(i)).reshape(2)
        for (r, i) in [rng.field_element() for _ in range(n_folds)])
    final_point = ch.layers[1].r_liu[:, :bl0]
    inputs = input_buffer(cc)

    def prove_once():
        values = ev(inputs)
        proof = prover(values, ch)
        l_oracle, _ = commit_fn(inputs)
        h_oracle, _q_eval, _q_coefs, all_sum, vo = commit_pub_fn(
            l_oracle.codeword, final_point)
        ldt = folds_fn(vo, randomness)
        return proof, l_oracle.tree[:, 1], h_oracle.tree[:, 1], ldt

    out = prove_once()
    jax.block_until_ready(jax.tree.leaves(out))
    compile_s = time.time() - t0 - aot_s

    iters = 3
    t = time.time()
    for _ in range(iters):
        out = prove_once()
    jax.block_until_ready(jax.tree.leaves(out))
    dt = (time.time() - t) / iters

    n_gates = (layers - 1) * (1 << bits)
    print(json.dumps({
        "metric": "large_unlayered_full_prove",
        "gates": n_gates,
        "input_size": 1 << bits,
        "prove_wall_s": round(dt, 4),
        "gates_per_s_M": round(n_gates / dt / 1e6, 2),
        "aot_compile_s": round(aot_s, 2),
        "jit_compile_s": round(compile_s, 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

"""SHA256_64 proving throughput — the serving scenario (BASELINE config #3).

Proves a stream of independent SHA256_64 witnesses with the staged
single-chip prover; successive proofs pipeline through the device queue
(per-instance GKR + both PC commits + LDT folds, i.e. everything bench.py
counts).  On a pod slice this scales linearly over the 'dp' mesh axis
(instances are independent); the single-chip number is the per-chip rate.

    python benches/serve_sha.py [n_proofs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n=20):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from virgo_plus_tpu.circuits.pws import parse_pws
    from virgo_plus_tpu.circuits.layered import dag_to_layered, subset_init
    from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
    from virgo_plus_tpu.gkr import protocol
    from virgo_plus_tpu.gkr.beta import beta_table
    from virgo_plus_tpu.field import gf
    from virgo_plus_tpu.pc import virgo_pc
    from virgo_plus_tpu.utils.glibc_rand import GlibcRandom

    dag = parse_pws("/root/reference/data/SHA256_64.pws")
    c = dag_to_layered(dag, bug_compat=True)
    subset_init(c)
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    bl0 = cc.layers[0].bit_length
    n_folds = bl0 - virgo_pc.LOG_SLICE

    evaluator = protocol.make_evaluator(cc)
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

    # independent witnesses: the parser's random input values re-drawn
    base = np.asarray(input_buffer(cc))
    wrng = np.random.default_rng(7)
    insts = [jnp.asarray((base + wrng.integers(0, 5, size=base.shape,
                                               dtype=np.uint64)) % gf.MOD)
             for _ in range(n)]

    def prove_one(inputs):
        values = evaluator(inputs)
        l_oracle, _ = commit_fn(inputs)
        proof = prover(values, ch)
        h_oracle, q_eval, q_coefs, all_sum, vo = commit_pub_fn(
            l_oracle.codeword, final_point)
        ldt = folds_fn(vo, randomness)
        return proof, l_oracle, h_oracle, ldt

    out = prove_one(insts[0])
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    outs = [prove_one(x) for x in insts]
    jax.block_until_ready(jax.tree.leaves(outs[-1]))
    dt = time.time() - t0
    print(json.dumps({
        "metric": "sha256_64_proofs_per_s",
        "value": round(n / dt, 2),
        "unit": "proofs/s",
        "vs_baseline": round((n / dt) / (1 / 0.414), 2),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)

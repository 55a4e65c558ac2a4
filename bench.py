"""Benchmark: SHA256_64 end-to-end prove time vs the reference C++ baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference prove = 0.414 s (0.113 GKR + 0.301 PC) measured on the
single-core C++ build (BASELINE.md).

Measures the steady-state prover wall time (evaluate + input commit + GKR
prove + public commit + LDT folds — the device work the reference counts in
its prove timers), after one warm-up for jit compilation.
"""

import json
import os
import time

import numpy as np


BASELINE_PROVE_S = 0.414


def main():
    import jax
    # persistent compile cache works on the TPU (axon) backend (it hangs on
    # CPU in this environment — tests keep it off)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
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
    # staged prover: per-stage jits + the Pallas fused fold kernels
    # (compiles in minutes and runs ~5x faster than the old fused-jit
    # masked-scan path)
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
    inputs = input_buffer(cc)
    final_point = ch.layers[1].r_liu[:, :bl0]

    def prove_once():
        values = evaluator(inputs)
        l_oracle, _ = commit_fn(inputs)
        proof = prover(values, ch)
        h_oracle, q_eval, q_coefs, all_sum, vo = commit_pub_fn(
            l_oracle.codeword, final_point)
        ldt = folds_fn(vo, randomness)
        return proof, l_oracle, h_oracle, ldt

    # warm-up (compile)
    out = prove_once()
    jax.block_until_ready(out)

    runs = 5
    t0 = time.time()
    for _ in range(runs):
        out = prove_once()
        jax.block_until_ready(out)
    dt = (time.time() - t0) / runs

    print(json.dumps({
        "metric": "sha256_64_prove_wall_s",
        "value": round(dt, 5),
        "unit": "s",
        "vs_baseline": round(BASELINE_PROVE_S / dt, 3),
    }))


if __name__ == "__main__":
    main()

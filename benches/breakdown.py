"""Per-stage wall-time breakdown of the fused SHA256_64 prove on the active
backend.  Each stage is its own jit so its steady-state time is measurable;
the sum overshoots the fused single-dispatch number (bench.py) by the
inter-stage HBM round-trips XLA fuses away, but the ratios show where the
device program's time goes.

    python benches/breakdown.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def bench(name, fn, *args, iters=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    dt = (time.time() - t) / iters
    print(json.dumps({"stage": name, "ms": round(dt * 1e3, 3)}), flush=True)
    return out, dt


def main():
    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from virgo_plus_tpu import driver
    from virgo_plus_tpu.circuits.compile import compile_circuit, evaluate
    from virgo_plus_tpu.gkr import protocol
    from virgo_plus_tpu.gkr.beta import beta_table
    from virgo_plus_tpu.field import gf
    from virgo_plus_tpu.pc import virgo_pc
    from virgo_plus_tpu.pc.fft import ifft
    import chutil

    chutil.ensure()
    c = driver.load_circuit("/root/reference/data/SHA256_64.pws")
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    bl0 = cc.layers[0].bit_length
    ch, randomness, inputs = chutil.load_challenges()
    arrs = protocol.circuit_arrays(cc, plans)

    ev = jax.jit(lambda i, a: evaluate(cc, i, a))
    values, _ = bench("evaluate", ev, inputs, arrs)

    gkr = jax.jit(lambda v, c_, a: protocol.prove(cc, plans, v, c_, a))
    _, t_gkr = bench("gkr_prove", gkr, values, ch, arrs)

    enc = jax.jit(lambda i: virgo_pc._slice_encode(i, bl0))
    (l_eval, _), _ = bench("slice_encode_l", enc, inputs)

    final_point = ch.layers[1].r_liu[:, :bl0]

    def qside(fp):
        q_values = beta_table(fp, bl0, gf.ones(()))
        srec_lg = bl0 - virgo_pc.LOG_SLICE
        rou_small = gf.root_of_unity_int(srec_lg)
        sl = q_values.reshape(2, virgo_pc.SLICES, 1 << srec_lg)
        q_coefs = jax.vmap(lambda v: ifft(v, rou_small),
                           in_axes=1, out_axes=1)(sl)
        return q_values, q_coefs

    (q_values, _), _ = bench("beta+q_ifft", jax.jit(qside), final_point)

    pub = jax.jit(lambda l, q: virgo_pc.commit_public_eval(l, q, bl0))
    (h_full, _qe, _qc, all_sum, vo), _ = bench("commit_public_eval", pub,
                                               l_eval, q_values)

    folds = jax.jit(lambda v, r: virgo_pc.fold_codewords(v, bl0, list(r)))
    cws, _ = bench("fold_codewords", folds, vo, randomness)

    oc = jax.jit(lambda lst: virgo_pc.make_oracles_batched(lst))
    _, _ = bench("make_oracles_batched(9)", oc, [l_eval, h_full] + cws)


if __name__ == "__main__":
    main()

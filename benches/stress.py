"""Dense synthetic circuit stress (BASELINE config #2 analogue: ~2^20 gates).

    python benches/stress.py [layers] [bits]     # default 4 x 2^18 = 2^20
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(layers=4, bits=18):
    import jax
    from virgo_plus_tpu.circuits.layered import randomize, subset_init
    from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
    from virgo_plus_tpu.gkr import protocol
    from virgo_plus_tpu.utils.glibc_rand import GlibcRandom

    t0 = time.time()
    c = randomize(layers, bits, seed=2)
    subset_init(c)
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    compile_s = time.time() - t0

    ev = protocol.make_evaluator(cc)
    prover = protocol.make_prover(cc, plans)
    ch = protocol.make_challenges(cc, GlibcRandom(3396))
    inputs = input_buffer(cc)

    values = ev(inputs)
    proof = prover(values, ch)
    jax.block_until_ready(proof)

    iters = 3
    t = time.time()
    for _ in range(iters):
        values = ev(inputs)
        proof = prover(values, ch)
    jax.block_until_ready(proof)
    dt = (time.time() - t) / iters

    n_gates = (layers - 1) * (1 << bits)
    print(json.dumps({
        "metric": "dense_gkr_prove",
        "gates": n_gates,
        "prove_wall_s": round(dt, 4),
        "gates_per_s": round(n_gates / dt / 1e6, 2),
        "unit": "Mgates/s",
        "aot_compile_s": round(compile_s, 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

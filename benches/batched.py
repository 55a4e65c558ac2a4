"""Batched multi-instance proving throughput (BASELINE config #3 analogue).

Proves N independent witnesses of the same circuit with one vmapped device
computation (challenges are message-independent in the reference's
interactive model, so instances share the schedule).  On a multi-chip mesh
the batch shards over 'dp'.

    python benches/batched.py [batch] [layers] [bits]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(batch=8, layers=6, bits=10):
    import jax
    import jax.numpy as jnp
    from virgo_plus_tpu.circuits.layered import randomize, subset_init
    from virgo_plus_tpu.circuits.compile import (compile_circuit,
                                                 input_buffer, evaluate)
    from virgo_plus_tpu.gkr import protocol
    from virgo_plus_tpu.utils.glibc_rand import GlibcRandom

    c = randomize(layers, bits, seed=1)
    subset_init(c)
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    ch = protocol.make_challenges(cc, GlibcRandom(3396))

    def one(inputs):
        values = evaluate(cc, inputs)
        return protocol.prove(cc, plans, values, ch)

    batched = jax.jit(jax.vmap(one))
    base = np.asarray(input_buffer(cc))
    rng = np.random.default_rng(0)
    xs = np.stack([base] * batch)
    xs[:, 0, :] = rng.integers(0, (1 << 61) - 1, xs[:, 0, :].shape,
                               dtype=np.uint64)
    xs = jnp.asarray(xs)

    out = batched(xs)
    jax.block_until_ready(out)
    iters = 5
    t = time.time()
    for _ in range(iters):
        out = batched(xs)
    jax.block_until_ready(out)
    dt = (time.time() - t) / iters
    print(json.dumps({
        "metric": "batched_gkr_prove",
        "batch": batch, "layers": layers, "gates_per_layer": 1 << bits,
        "batch_wall_s": round(dt, 4),
        "proofs_per_s": round(batch / dt, 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

"""Batched FULL proofs — GKR + PC per instance (BASELINE config #3).

Proves a batch of independent SHA256_64 witnesses with everything vmapped:
GKR, private commit, public commit, and all LDT folds.  Reports proofs/s
per chip; on a dp mesh the rate multiplies by the chip count (instances
are independent — tests/test_parallel.py pins the dp-sharded GKR path).

    python benches/batched_full.py [batch]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(batch=16):
    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from virgo_plus_tpu import driver
    from virgo_plus_tpu.circuits.compile import input_buffer
    from virgo_plus_tpu.field import gf
    from virgo_plus_tpu.gkr import protocol
    from virgo_plus_tpu.parallel.sharded import make_batched_full_prover
    from virgo_plus_tpu.pc import virgo_pc, fft_gkr
    from virgo_plus_tpu.utils.glibc_rand import GlibcRandom

    c = driver.load_circuit("/root/reference/data/SHA256_64.pws")
    from virgo_plus_tpu.circuits.compile import compile_circuit
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    bl0 = cc.layers[0].bit_length
    n_folds = bl0 - virgo_pc.LOG_SLICE

    rng = GlibcRandom(3396)
    ch = protocol.make_challenges(cc, rng)
    # advance the stream past the fft_gkr draws WITHOUT fft_gkr.run: run()
    # pulls device results to host, and one D2H on the axon backend flips
    # the process into ~6ms-per-dispatch synchronous mode, taxing the
    # timed loop below (draw_schedule consumes the identical draws —
    # pinned by tests/test_fft_gkr_schedule.py)
    fft_gkr.draw_schedule(n_folds, rng)
    randomness = tuple(
        gf.from_u64(np.uint64(r), np.uint64(i)).reshape(2)
        for (r, i) in [rng.field_element() for _ in range(n_folds)])
    final_point = ch.layers[1].r_liu[:, :bl0]

    base = np.asarray(input_buffer(cc))
    wrng = np.random.default_rng(7)
    xs = np.stack([base] * batch)
    xs[:, 0, :] = (xs[:, 0, :] + wrng.integers(
        0, 5, xs[:, 0, :].shape, dtype=np.uint64)) % ((1 << 61) - 1)
    xs = jnp.asarray(xs)

    run = make_batched_full_prover(cc, plans)
    out = run(xs, ch, final_point, randomness)
    jax.block_until_ready(jax.tree.leaves(out))

    iters = 3
    t = time.time()
    for _ in range(iters):
        out = run(xs, ch, final_point, randomness)
    jax.block_until_ready(jax.tree.leaves(out))
    dt = (time.time() - t) / iters

    print(json.dumps({
        "metric": "sha256_64_batched_full_proofs_per_s",
        "batch": batch,
        "batch_wall_s": round(dt, 4),
        "value": round(batch / dt, 2),
        "unit": "proofs/s/chip",
        "vs_baseline": round((batch / dt) / (1 / 0.414), 2),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)

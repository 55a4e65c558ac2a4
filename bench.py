"""Benchmark: SHA256_64 end-to-end prove time vs the reference C++ baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference prove = 0.414 s (0.113 GKR + 0.301 PC) measured on the
single-core C++ build (BASELINE.md).

Measures the steady-state prover wall time of the SINGLE-DISPATCH fused
prover (virgo_plus_tpu/fused.py): evaluate + input commit + full GKR +
public commit + all LDT fold levels run as ONE jitted device program, so
the number is a property of the device, not of host-link dispatch latency
(the staged prover's ~30 dispatches measured anywhere from 0.013 s to
0.183 s depending on tunnel state).  Accounting matches the reference's
prove timers (verifier.cpp:178,183): the fft_gkr message generation and
query answering (host-side, verifier-bound) are excluded, as they are from
the reference's p_time-dominated numbers; BENCH.md reports them separately.
"""

import json
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
    from virgo_plus_tpu import driver, fused
    from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
    from virgo_plus_tpu.gkr import protocol
    from virgo_plus_tpu.field import gf
    from virgo_plus_tpu.pc import virgo_pc, fft_gkr
    from virgo_plus_tpu.utils.glibc_rand import GlibcRandom

    c = driver.load_circuit("/root/reference/data/SHA256_64.pws")
    cc = compile_circuit(c)
    plans = protocol.build_plans(cc)
    bl0 = cc.layers[0].bit_length
    n_folds = bl0 - virgo_pc.LOG_SLICE

    # the exact challenge stream of a real prove (fft_gkr draws included)
    rng = GlibcRandom(3396)
    ch = protocol.make_challenges(cc, rng)
    fft_gkr.run(bl0 - virgo_pc.LOG_SLICE, rng)
    randomness = tuple(
        gf.from_u64(np.uint64(r), np.uint64(i)).reshape(2)
        for (r, i) in [rng.field_element() for _ in range(n_folds)])
    inputs = input_buffer(cc)

    run = fused.make_e2e_prover(cc, plans)

    # warm-up (compile)
    out = run(inputs, ch, randomness)
    jax.block_until_ready(out)

    runs = 5
    t0 = time.time()
    for _ in range(runs):
        out = run(inputs, ch, randomness)
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

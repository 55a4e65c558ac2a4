"""Verification wall time on SHA256_64 (reference: 0.052 s GKR + 0.0076 s
PC, verifier.cpp:180,183).

Times driver.verify end-to-end (challenge re-derivation, GKR round chains +
device predicate sweeps, fft_gkr replay, vectorized FRI query walks) on a
pre-built proof, steady-state.

    python benches/verify_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from virgo_plus_tpu import driver

    c = driver.load_circuit("/root/reference/data/SHA256_64.pws")
    cp = driver.compile_prover(c)
    full, info = driver.prove(c, cp)

    rep = driver.verify(c, full, cp)          # warm-up (compiles)
    assert rep.ok

    iters = 5
    t = time.time()
    for _ in range(iters):
        rep = driver.verify(c, full, cp)
    dt = (time.time() - t) / iters
    assert rep.ok

    print(json.dumps({
        "metric": "sha256_64_verify_wall_s",
        "value": round(dt, 4),
        "unit": "s",
        "vs_baseline": round(0.0596 / dt, 3),
        "backend": jax.default_backend(),
    }))
    # reference fast/slow split (verifier.cpp:180: 0.017 fast + 0.035 slow)
    print(json.dumps({
        "metric": "sha256_64_verify_slow_sweeps_s",
        "value": round(rep.verify_time_slow, 4),
        "unit": "s",
        "vs_baseline": round(0.035 / max(rep.verify_time_slow, 1e-9), 3),
    }))


if __name__ == "__main__":
    main()

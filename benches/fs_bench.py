"""Fiat-Shamir (non-interactive) mode performance on SHA256_64.

The headline bench times the glibc-stream prover (message-independent
challenges, matching the reference's accounting).  The deployable
non-interactive mode is driver.prove_fs: every challenge squeezes from the
on-device SHA3 sponge, which serializes ~one keccak pair per sumcheck
round — this bench reports what that costs, steady-state, plus verify_fs.
Reference anchor: the dead transcriptCache.hpp:14-50 this mode supersedes
(the reference has no live FS mode, so there is no C++ baseline; the
vs_baseline field compares against the reference's interactive prove /
verify times as the nearest meaningful anchor).

    python benches/fs_bench.py
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

    full, info = driver.prove_fs(c, cp)       # warm-up (compiles)
    rep = driver.verify_fs(c, full, cp)
    assert rep.ok, "FS round trip failed"

    iters = 3
    t = time.time()
    for _ in range(iters):
        full, info = driver.prove_fs(c, cp)
    dt_prove = (time.time() - t) / iters

    t = time.time()
    for _ in range(iters):
        rep = driver.verify_fs(c, full, cp)
    dt_verify = (time.time() - t) / iters
    assert rep.ok

    print(json.dumps({
        "metric": "sha256_64_fs_prove_wall_s",
        "value": round(dt_prove, 4),
        "unit": "s",
        "vs_baseline": round(0.414 / dt_prove, 3),
        "backend": jax.default_backend(),
    }))
    print(json.dumps({
        "metric": "sha256_64_fs_verify_wall_s",
        "value": round(dt_verify, 4),
        "unit": "s",
        "vs_baseline": round(0.0596 / dt_verify, 3),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()

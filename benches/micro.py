"""Per-kernel micro-benchmarks: field ops/s/chip, hash/s, FFT/s, fold/s.

The BASELINE metric asks for "prover field-ops/s/chip" with per-kernel
speed-of-light accounting; the reference's analogue is
fieldElement::self_speed_test_{add,mult} (fieldElement.cpp:275-307).

Run on whatever backend is active (TPU by default in this environment):
    python benches/micro.py
Prints one JSON object per kernel.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def bench(name, fn, args, work, unit, iters=50):
    import jax
    r = fn(*args)
    jax.block_until_ready(r)
    t = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t) / iters
    print(json.dumps({"kernel": name, "per_call_ms": round(dt * 1e3, 4),
                      "throughput": round(work / dt / 1e9, 3),
                      "unit": unit}))


def main():
    import jax
    import jax.numpy as jnp
    from virgo_plus_tpu.field import gf
    from virgo_plus_tpu.gkr.sumcheck import scan_sumcheck
    from virgo_plus_tpu.pc.keccak import sha3_256_x64
    from virgo_plus_tpu.pc.fft import fft
    from virgo_plus_tpu.pc.virgo_pc import leaf_chain_hash

    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))
    rng = np.random.default_rng(0)
    n = 1 << 20

    def arr(m):
        return gf.from_u64(rng.integers(0, gf.MOD, m, dtype=np.uint64),
                           rng.integers(0, gf.MOD, m, dtype=np.uint64))

    a, b = arr(n), arr(n)

    @jax.jit
    def mul8(a, b):
        x = a
        for _ in range(8):
            x = gf.mul(x, b)
        return x

    bench("field_mul (chain of 8 on 2^20)", mul8, (a, b), 8 * n, "Gmul/s")

    @jax.jit
    def add8(a, b):
        x = a
        for _ in range(8):
            x = gf.add(x, b)
        return x

    bench("field_add (chain of 8 on 2^20)", add8, (a, b), 8 * n, "Gadd/s")

    bl = 16
    v, ad, m_ = arr(1 << bl), arr(1 << bl), arr(1 << bl)
    rs = arr(bl)
    bench("sumcheck_full (2^16, 16 rounds)", jax.jit(scan_sumcheck),
          (v, ad, m_, rs), 13 * (1 << bl), "Gmul/s")

    w = jnp.asarray(rng.integers(0, 2**63, (8, 1 << 14), dtype=np.uint64))
    bench("sha3_256 (2^14 msgs)", jax.jit(sha3_256_x64), (w,),
          1 << 14, "Ghash/s")

    cw = arr(65 * (1 << 12)).reshape(2, 65, 1 << 12)
    bench("merkle_leaf_chain (65x2^12)", jax.jit(leaf_chain_hash), (cw,),
          65 * (1 << 11), "Ghash/s")

    coef = arr(1 << 13)
    rou = gf.root_of_unity_int(18)
    bench("fft (2^13 coef -> 2^18 evals)", jax.jit(lambda c: fft(c, 18, rou)),
          (coef,), (1 << 18) * 13 // 2, "Gbutterfly/s")


if __name__ == "__main__":
    main()

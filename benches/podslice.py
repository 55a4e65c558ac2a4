"""Pod-slice dryrun (BASELINE config #5): full sharded prove on a CPU mesh.

Runs the composed multi-chip prove (sharded GKR bookkeeping tables +
sharded PC with strided codewords, parallel/gkr_sharded.prove_sharded) on
an 8-virtual-device CPU mesh at a configurable circuit size, printing the
per-device protocol-array footprint and asserting the Merkle roots equal
the single-chip prover's (bit-exact).  See PODSLICE.md for the 2^26 /
v5e-16 memory plan this validates in miniature.

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benches/podslice.py [layers] [bits]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(layers=16, bits=14):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh
    from virgo_plus_tpu import driver
    from virgo_plus_tpu.circuits.layered import randomize, subset_init
    from virgo_plus_tpu.parallel.gkr_sharded import (prove_sharded,
                                                     compile_sharded)

    S = 8
    mesh = Mesh(np.array(jax.devices()[:S]), ("sp",))
    c = randomize(layers, bits, seed=9)
    subset_init(c)

    comp = compile_sharded(c, mesh, "sp")
    t0 = time.time()
    full_sh, info = prove_sharded(c, mesh, "sp", compiled=comp)
    dt_cold = time.time() - t0
    # steady state: same jits, warm — the honest wall (the cold number is
    # dominated by one-off CPU-mesh XLA compiles)
    t0 = time.time()
    full_sh, info = prove_sharded(c, mesh, "sp", compiled=comp)
    dt = time.time() - t0

    cp = driver.compile_prover(c)
    full_ref, _ = driver.prove(c, cp)
    assert np.array_equal(full_sh.root_l, full_ref.root_l)
    assert np.array_equal(full_sh.root_h, full_ref.root_h)
    assert np.array_equal(full_sh.level_roots, full_ref.level_roots)
    assert np.array_equal(full_sh.queries.init_l_paths,
                          full_ref.queries.init_l_paths)
    rep = driver.verify(c, full_sh, cp)
    assert rep.ok

    print(json.dumps({
        "metric": "podslice_dryrun_sharded_prove",
        "devices": S,
        "gates": (layers - 1) * (1 << bits),
        "bl0": bits,
        # measured from the arrays actually resident after the prove:
        # per-device sharded PC state vs a full-codeword host gather
        "per_device_pc_bytes": info["per_device_pc_bytes"],
        "full_codeword_bytes": info["full_codeword_bytes"],
        "prove_wall_s": round(dt, 3),
        "prove_wall_cold_s": round(dt_cold, 3),
        "roots_bit_exact": True,
        "verified": bool(rep.ok),
    }))


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)

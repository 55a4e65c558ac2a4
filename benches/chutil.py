"""Challenge-stream prep/save/load for clean TPU timing runs.

On the axon remote backend, ONE device->host transfer flips the process
into synchronous dispatch (~6ms tunnel round trip per call, measured).
fft_gkr.run — needed only to advance the shared rng stream past its draws —
does np.asarray on device outputs, so any process that builds the challenge
schedule inline is permanently in the slow regime before its first
measurement.  Fix: build the schedule ONCE here (polluted process), save
everything to .npz, and let benchmark processes load it host-side.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CH_NPZ = "/tmp/vpt_sha256_challenges.npz"
PWS = "/root/reference/data/SHA256_64.pws"


def save_challenges(path=CH_NPZ, pws=PWS):
    from virgo_plus_tpu import driver
    from virgo_plus_tpu.circuits.compile import compile_circuit, input_buffer
    from virgo_plus_tpu.gkr import protocol
    from virgo_plus_tpu.field import gf
    from virgo_plus_tpu.pc import virgo_pc, fft_gkr
    from virgo_plus_tpu.utils.glibc_rand import GlibcRandom

    c = driver.load_circuit(pws)
    cc = compile_circuit(c)
    bl0 = cc.layers[0].bit_length
    n_folds = bl0 - virgo_pc.LOG_SLICE

    rng = GlibcRandom(3396)
    ch = protocol.make_challenges(cc, rng)
    fft_gkr.run(n_folds, rng)
    rands = np.stack([np.array(rng.field_element(), dtype=np.uint64)
                      for _ in range(n_folds)])

    out = {"r_out": np.asarray(ch.r_out), "rands": rands,
           "inputs": np.asarray(input_buffer(cc)), "depth": cc.depth}
    for i in range(1, cc.depth):
        L = ch.layers[i]
        out[f"ru{i}"] = np.asarray(L.r_u)
        out[f"ar{i}"] = np.asarray(L.assert_r)
        if L.r_v is not None:
            out[f"rv{i}"] = np.asarray(L.r_v)
        out[f"sig{i}"] = np.asarray(L.sig)
        out[f"rliu{i}"] = np.asarray(L.r_liu)
    np.savez(path, **out)
    return path


def ensure(path=CH_NPZ):
    """Generate the npz in a subprocess (eating the D2H dispatch flip
    there) if it does not exist yet."""
    if not os.path.exists(path):
        import subprocess
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
    return path


def load_challenges(path=CH_NPZ):
    """Returns (ch, fold_rands tuple, inputs) — all from host numpy, no
    device->host transfer in this process."""
    import jax.numpy as jnp
    from virgo_plus_tpu.gkr.protocol import Challenges, LayerChallenges
    from virgo_plus_tpu.field import gf

    z = np.load(path)
    depth = int(z["depth"])
    layers = [None] * depth
    for i in range(1, depth):
        layers[i] = LayerChallenges(
            r_u=jnp.asarray(z[f"ru{i}"]),
            assert_r=jnp.asarray(z[f"ar{i}"]),
            r_v=jnp.asarray(z[f"rv{i}"]) if f"rv{i}" in z else None,
            sig=jnp.asarray(z[f"sig{i}"]),
            r_liu=jnp.asarray(z[f"rliu{i}"]))
    ch = Challenges(r_out=jnp.asarray(z["r_out"]), layers=layers)
    rands = tuple(gf.from_u64(np.uint64(r), np.uint64(i)).reshape(2)
                  for (r, i) in z["rands"])
    return ch, rands, jnp.asarray(z["inputs"])


if __name__ == "__main__":
    print(save_challenges())

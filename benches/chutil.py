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
    # the fft_gkr draw schedule advances the stream exactly as fft_gkr.run
    # does (fs.py relies on the same equivalence); saving it lets benches
    # time the device-side message tape (fft_gkr.prove_messages) too
    fg = fft_gkr.draw_schedule(n_folds, rng)
    rands = np.stack([np.array(rng.field_element(), dtype=np.uint64)
                      for _ in range(n_folds)])

    out = {"r_out": np.asarray(ch.r_out), "rands": rands,
           "inputs": np.asarray(input_buffer(cc)), "depth": cc.depth}
    for k in ("r", "eval_points", "r0", "r1", "add_ru", "add_rv",
              "mult_ru", "mult_rv"):
        out[f"fg_{k}"] = np.asarray(fg[k])
    for s, (ru, rv, al, be) in enumerate(fg["stages"]):
        out[f"fgst{s}_ru"] = np.asarray(ru)
        out[f"fgst{s}_rv"] = np.asarray(rv)
        out[f"fgst{s}_al"] = np.asarray(al)
        out[f"fgst{s}_be"] = np.asarray(be)
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


def matches(path, cc, n_folds):
    """True iff the cached npz matches the challenge schedule of cc: same
    depth, per-layer challenge shapes, and fold-challenge count.  A stale
    cache (circuit compilation or schedule change) must regenerate, not
    silently load."""
    if not os.path.exists(path):
        return False
    try:
        z = np.load(path)
        if int(z["depth"]) != cc.depth or len(z["rands"]) != n_folds:
            return False
        if "fg_r" not in z.files or z["fg_r"].shape[1] != n_folds:
            return False
        if z["r_out"].shape[1] != cc.layers[cc.depth - 1].bit_length:
            return False
        for i in range(1, cc.depth):
            L = cc.layers[i]
            bl_prev = cc.layers[i - 1].bit_length
            if z[f"ru{i}"].shape[1] != bl_prev:
                return False
            if L.max_dad_bit_length >= 0:
                if f"rv{i}" not in z or \
                        z[f"rv{i}"].shape[1] != L.max_dad_bit_length:
                    return False
            elif f"rv{i}" in z.files:
                return False
        return True
    except Exception:
        return False


def ensure(path=CH_NPZ, cc=None, n_folds=None):
    """Generate the npz in a subprocess (eating the D2H dispatch flip
    there) if it is missing — or stale, when cc/n_folds are given to
    validate against."""
    stale = (not os.path.exists(path) if cc is None
             else not matches(path, cc, n_folds))
    if stale:
        import subprocess
        try:
            subprocess.run([sys.executable, os.path.abspath(__file__)],
                           check=True, capture_output=True, text=True)
        except subprocess.CalledProcessError as e:
            raise RuntimeError(
                f"challenge-stream generation failed:\n{e.stderr}") from e
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


def load_fg_schedule(path=CH_NPZ):
    """The fft_gkr draw schedule as a jit-ready dict (fft_gkr.prove_messages
    input), loaded host-side."""
    import jax.numpy as jnp

    z = np.load(path)
    d = {k: jnp.asarray(z[f"fg_{k}"])
         for k in ("r", "eval_points", "r0", "r1", "add_ru", "add_rv",
                   "mult_ru", "mult_rv")}
    stages = []
    s = 0
    while f"fgst{s}_ru" in z.files:
        stages.append((jnp.asarray(z[f"fgst{s}_ru"]),
                       jnp.asarray(z[f"fgst{s}_rv"]),
                       jnp.asarray(z[f"fgst{s}_al"]),
                       jnp.asarray(z[f"fgst{s}_be"])))
        s += 1
    d["stages"] = tuple(stages)
    return d


if __name__ == "__main__":
    print(save_challenges())

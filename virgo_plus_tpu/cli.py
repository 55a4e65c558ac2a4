"""Command-line interface.

    python -m virgo_plus_tpu prove  <circuit.pws> -o proof.npz
    python -m virgo_plus_tpu verify <circuit.pws> proof.npz
    python -m virgo_plus_tpu run    <circuit.pws>        # prove + verify

`run` mirrors the reference binary's output format
(/root/reference/src/verifier.cpp:176-184): input size, prove time, proof
sizes — so existing tooling that parses the reference's stdout keeps
working.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="virgo_plus_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("prove", help="prove a .pws circuit")
    pp.add_argument("circuit")
    pp.add_argument("-o", "--out", default="proof.npz")
    pp.add_argument("--seed", type=int, default=3396)
    pp.add_argument("--witness", default=None,
                    help=".npy witness file: (n,) reals or (2, n) "
                         "real/imag uint64 rows (the reference only "
                         "supports random witnesses)")
    pp.add_argument("--fs", action="store_true",
                    help="non-interactive Fiat-Shamir transcript instead "
                         "of the reference's glibc stream")
    pp.add_argument("--no-bug-compat", action="store_true",
                    help="faithful Not/Copy semantics instead of the "
                         "reference's fallthrough behaviour")

    vp = sub.add_parser("verify", help="verify a serialized proof")
    vp.add_argument("circuit")
    vp.add_argument("proof")
    vp.add_argument("--seed", type=int, default=3396)
    vp.add_argument("--fs", action="store_true")
    vp.add_argument("--no-bug-compat", action="store_true")

    rp = sub.add_parser("run", help="prove + verify (reference-style output)")
    rp.add_argument("circuit")
    rp.add_argument("--seed", type=int, default=3396)
    rp.add_argument("--no-bug-compat", action="store_true")

    args = p.parse_args(argv)

    from . import driver, proof_io

    circuit = driver.load_circuit(args.circuit,
                                  bug_compat=not args.no_bug_compat)

    if args.cmd == "prove":
        witness = None
        if args.witness:
            import numpy as np
            w = np.load(args.witness)
            witness = w if w.ndim == 2 else np.stack(
                [w, np.zeros_like(w)])
        if args.fs:
            full, info = driver.prove_fs(circuit, witness=witness)
        else:
            full, info = driver.prove(circuit, seed=args.seed,
                                      witness=witness)
        proof_io.save(args.out, full)
        print(f"proof written to {args.out}")
        print(f"Prove Time {info['prove_time']:.6f}")
        print(f"proof size = {info['gkr_proof_size'] / 1024:.6f} kb "
              f"(+ {info['pc_proof_size'] / 1024:.6f} kb PC)")
        return 0

    if args.cmd == "verify":
        full = proof_io.load(args.proof)
        if args.fs:
            rep = driver.verify_fs(circuit, full)
        else:
            rep = driver.verify(circuit, full, seed=args.seed)
        print("Verification pass" if rep.ok else "Verification fail",
              file=sys.stderr)
        print(f"Input size {rep.input_size}")
        # reference format (verifier.cpp:180): total = fast + slow sweeps
        print(f"verify time {rep.verify_time:.6f} = "
              f"{rep.verify_time_fast:.6f} + {rep.verify_time_slow:.6f}(slow)")
        return 0 if rep.ok else 1

    # run
    t0 = time.time()
    rep = driver.run(circuit=circuit, seed=args.seed)
    print("Verification pass" if rep.ok else "Verification fail",
          file=sys.stderr)
    print(f"Input size {rep.input_size}")
    print(f"Prove Time {rep.prove_time:.6f}")
    print(f"verify time {rep.verify_time:.6f} = "
          f"{rep.verify_time_fast:.6f} + {rep.verify_time_slow:.6f}(slow)")
    print(f"proof size = {rep.gkr_proof_size / 1024:.6f} kb")
    print(f"Polynomial commitment: proof size "
          f"{rep.pc_proof_size / 1024:.6f} kb")
    # op-counter line (main.cpp:157): analytic sumcheck field-op counts of
    # the protocol on this circuit + the resulting throughput
    mult, add = rep.details.get("op_counts", (0, 0))
    print(f"mult counter {mult}, add counter {add}")
    if rep.prove_time > 0 and (mult or add):
        print(f"prover field-ops/s {(mult + add) / rep.prove_time:.3e}")
    print(f"total wall {time.time() - t0:.3f}s")
    return 0 if rep.ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

"""Run the scenario benches and aggregate their JSON lines into
BENCH_TABLE.json at the repo root.

Each bench runs in its OWN subprocess (the axon backend flips a process
into slow synchronous-dispatch mode after any device->host transfer, so
isolation keeps one bench from taxing the next).  Results merge into the
existing table, so benches can be (re)collected one at a time:

    python benches/collect.py                 # the cheap set
    python benches/collect.py bench verify    # just these
    python benches/collect.py all             # everything incl. big compiles

Names: bench (headline prove), verify, micro, stress, batched, large,
podslice (CPU mesh).
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLE = os.path.join(ROOT, "BENCH_TABLE.json")

BENCHES = {
    "bench": ["bench.py"],
    "verify": ["benches/verify_bench.py"],
    "micro": ["benches/micro.py"],
    "stress": ["benches/stress.py"],
    "batched": ["benches/batched_full.py"],
    "large": ["benches/large.py"],
    "podslice": ["benches/podslice.py"],
}
CHEAP = ["bench", "verify", "micro"]


def run_one(name, timeout=3600):
    cmd = [sys.executable, "-u"] + BENCHES[name]
    t0 = time.time()
    try:
        p = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True,
                           timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"error": f"timeout after {timeout}s"}
    lines = []
    for ln in p.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                lines.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
    rec = {"results": lines, "wall_s": round(time.time() - t0, 1),
           "rc": p.returncode}
    if p.returncode != 0:
        rec["stderr_tail"] = p.stderr[-1500:]
    return rec


def main(names):
    table = {}
    if os.path.exists(TABLE):
        with open(TABLE) as f:
            table = json.load(f)
    for name in names:
        print(f"== {name}", flush=True)
        rec = run_one(name)
        table[name] = rec
        table["_updated"] = time.strftime("%Y-%m-%d %H:%M:%S")
        with open(TABLE, "w") as f:
            json.dump(table, f, indent=1)
        print(json.dumps(rec.get("results", rec))[:600], flush=True)
    print(f"wrote {TABLE}")


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args:
        names = CHEAP
    elif args == ["all"]:
        names = list(BENCHES)
    else:
        names = args
        for n in names:
            assert n in BENCHES, f"unknown bench {n}; choose {list(BENCHES)}"
    main(names)

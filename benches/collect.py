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

# name -> (argv, timeout_s).  The big compiles (large/podslice/batched)
# get longer budgets: a cold fused-module compile alone is ~15 min via the
# axon remote-compile helper (BENCH.md), and those benches compile several.
BENCHES = {
    "bench": (["bench.py"], 3600),
    "verify": (["benches/verify_bench.py"], 3600),
    "micro": (["benches/micro.py"], 3600),
    "fs": (["benches/fs_bench.py"], 7200),
    "stress": (["benches/stress.py"], 5400),
    "batched": (["benches/batched_full.py"], 7200),
    "large": (["benches/large.py"], 7200),
    "podslice": (["benches/podslice.py"], 5400),
}
CHEAP = ["bench", "verify", "micro", "fs"]


def run_one(name, timeout=None):
    argv, default_timeout = BENCHES[name]
    if timeout is None:
        timeout = default_timeout
    cmd = [sys.executable, "-u"] + argv
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
                obj = json.loads(ln)
            except json.JSONDecodeError:
                continue
            # only ingest result-shaped objects, not stray debug dicts
            # (scenario benches print {"metric": ...}, micro prints
            # {"kernel": ...} per-kernel records + one {"backend": ...})
            if isinstance(obj, dict) and (
                    "metric" in obj or "kernel" in obj or "backend" in obj):
                lines.append(obj)
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
        bad = [n for n in names if n not in BENCHES]
        if bad:
            print(f"unknown bench(es) {bad}; choose from {list(BENCHES)}")
            sys.exit(1)
    main(names)

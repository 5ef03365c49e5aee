#!/usr/bin/env python3
"""Standing SCALE-REGRESSION gate (r16, VERDICT r15 #5).

The r15 sf0.1/sf1/sf10 study proved every curve sublinear, but nothing
re-checked those numbers afterwards — a regression (say, dropping the
minhash df-cap) would only surface as a mystery slowdown rounds later.
This gate re-runs the 13 study operators against the DETERMINISTIC
ScaleUp-synthesized sf10 directory each round and asserts, per query:

  * wall-time  <= envelope_sec * factor   (factor 1.5 — generous enough
    for shared-box noise on min-of-REPEAT timings, tight enough that a
    2x plan regression trips);
  * row count  == envelope_rows exactly   (ScaleUp is deterministic, so
    a row drift means the SYNTHESIZER or an operator changed semantics
    — either way a loud stop, not a silent re-baseline).

Usage:
  python3 tools/scale_gate.py            # run the gate
  python3 tools/scale_gate.py --update   # re-pin the envelope from a
                                         # fresh run (use only after a
                                         # DELIBERATE, explained change)

The sf10 directory is built on demand (sf0.1 -> /tmp/sf1 -> /tmp/sf10
via graft.ScaleUp, ~2 min) and reused across invocations. Results land
in bench_artifacts/SCALE_GATE_LAST.json next to the committed envelope
bench_artifacts/SCALE_ENVELOPE.json.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENVELOPE = os.path.join(REPO, "bench_artifacts", "SCALE_ENVELOPE.json")
LAST = os.path.join(REPO, "bench_artifacts", "SCALE_GATE_LAST.json")
SF01 = "/root/testdata/sf0.1"
SF1, SF10 = "/tmp/sf1", "/tmp/sf10"


def sbt(args, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    subprocess.run(["sbt", "-batch", args], cwd=REPO, env=e, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)


def ensure_sf10():
    probe = os.path.join(SF10, "documents.parquet")
    if os.path.isdir(probe) or os.path.isfile(probe):
        return
    print("[scale_gate] synthesizing sf1 + sf10 via graft.ScaleUp ...")
    sbt(f"runMain graft.ScaleUp {SF01} {SF1} 10")
    sbt(f"runMain graft.ScaleUp {SF1} {SF10} 10")


def run_bench(queries):
    repeat = os.environ.get("SCALE_GATE_REPEAT", "2")
    print(f"[scale_gate] benching {len(queries)} queries at sf10 "
          f"(repeat={repeat}) ...")
    sbt("runMain graft.Bench", env={
        "SPARK_GRAFT_SF_DIR": SF10,
        "SPARK_GRAFT_BENCH_ONLY": ",".join(sorted(queries)),
        "SPARK_GRAFT_BENCH_OUT": LAST,
        "SPARK_GRAFT_BENCH_REPEAT": repeat,
    })
    return json.load(open(LAST))


def main():
    update = "--update" in sys.argv
    env = json.load(open(ENVELOPE))
    factor = env["factor"]
    pinned = env["queries"]
    if os.environ.get("SCALE_GATE_SKIP_BENCH") == "1":
        # comparator-only mode: re-grade the LAST run against the
        # (possibly edited) envelope — tripwire self-test aid
        got = json.load(open(LAST))
    else:
        ensure_sf10()
        got = run_bench(pinned.keys())
    fails = []
    lines = []
    for name in sorted(pinned):
        want = pinned[name]
        sec = got["queries"].get(name)
        rows = got["rows"].get(name)
        if sec is None:
            fails.append(f"{name}: MISSING from bench output")
            continue
        ok_t = sec <= want["sec"] * factor
        ok_r = rows == want["rows"]
        lines.append(f"{name}: {sec:.2f}s vs {want['sec']:.2f}s"
                     f"*{factor} rows={rows}"
                     f" {'OK' if ok_t and ok_r else 'FAIL'}")
        if not ok_t:
            fails.append(f"{name}: {sec:.2f}s exceeds envelope "
                         f"{want['sec']:.2f}s * {factor}")
        if not ok_r:
            fails.append(f"{name}: rows {rows} != pinned {want['rows']} "
                         "(synthesizer or semantics drift)")
    print("\n".join(lines))
    if got.get("failed"):
        fails.append(f"bench failures: {got['failed']}")
    if update:
        # an envelope may only be re-pinned from a CLEAN, COMPLETE run:
        # a failed query would bake rows=-1 and a failure-path timing
        # into the baseline, and comparator-only mode may carry a
        # partial LAST file that would silently shrink the gated set
        if got.get("failed"):
            print(f"[scale_gate] REFUSING --update: run has failures "
                  f"{got['failed']}")
            return 1
        missing = sorted(set(pinned) - set(got.get("queries", {})))
        if missing:
            print(f"[scale_gate] REFUSING --update: run is missing pinned "
                  f"queries {missing} (comparator-only partial file?)")
            return 1
        env["queries"] = {n: {"sec": got["queries"][n],
                              "rows": got["rows"][n]}
                          for n in sorted(got["queries"])}
        json.dump(env, open(ENVELOPE, "w"), indent=1)
        print(f"[scale_gate] envelope re-pinned -> {ENVELOPE}")
        return 0
    if fails:
        print("[scale_gate] GATE TRIPPED:")
        for f in fails:
            print("  " + f)
        return 1
    print(f"[scale_gate] all {len(pinned)} queries inside the envelope")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Same-epoch serial-query A/B: round-2 code vs current working tree.

Round-3's bench regressed 1.46x suite-wide vs round-2 and the builder
attributed it to host drift on build-side evidence only (round-3 verdict
item #2 demands the controlled experiment).  This runs the two code
versions' bench.py INTERLEAVED (A B A B ...), same JVM config, same box,
same minutes — so host drift hits both arms equally — and reports
per-section medians plus the serial-query ratio.

Usage:
    python tools/ab_serial.py <r2_checkout_dir> [rounds=3]
(the r2 checkout comes from `git worktree add /tmp/zsolr-r2 <r2-commit>`)
"""

import json
import os
import statistics
import subprocess
import sys


def run_bench(repo_dir: str) -> dict:
    env = dict(os.environ,
               ZSOLR_BENCH_REPLICATE="10",
               SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1",
               SPARK_GRAFT_CPUS="32",
               ZSOLR_BENCH_QUERY_REPS="3")
    out = subprocess.run(
        [sys.executable, os.path.join(repo_dir, "bench.py")],
        env=env, cwd=repo_dir, capture_output=True, text=True, timeout=560)
    line = [ln for ln in out.stdout.splitlines() if ln.strip().startswith("{")]
    return json.loads(line[-1])


def main():
    r2_dir = sys.argv[1]
    cur_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    log = os.environ.get("AB_LOG", "/tmp/ab_runs.jsonl")
    arms: dict[str, list[dict]] = {"r2": [], "cur": []}
    if rounds:
        for i in range(rounds):
            for name, d in (("r2", r2_dir), ("cur", cur_dir)):
                r = run_bench(d)
                with open(log, "a") as fh:
                    fh.write(json.dumps({"arm": name, "r": r}) + "\n")
                qs = {k: v for k, v in r["queries"].items()
                      if k.startswith("q")}
                serial = sum(qs.values())
                print(f"{name:3s}: build={r['queries']['build']:.2f}s "
                      f"serial20={serial:.2f}s p50={r['p50_query_ms']:.0f}ms "
                      f"p95={r['p95_query_ms']:.0f}ms", flush=True)
    # summarize everything accumulated in the log (rounds=0 → just report)
    for ln in open(log):
        rec = json.loads(ln)
        arms[rec["arm"]].append(rec["r"])

    def med(arm, key):
        return statistics.median(key(r) for r in arms[arm])

    serial = lambda r: sum(v for k, v in r["queries"].items()
                           if k.startswith("q"))
    build = lambda r: r["queries"]["build"]
    p95 = lambda r: r["p95_query_ms"]
    p50 = lambda r: r["p50_query_ms"]
    summary = {
        "rounds": {a: len(v) for a, v in arms.items()},
        "r2": {"build_s": med("r2", build), "serial20_s": med("r2", serial),
               "p50_ms": med("r2", p50), "p95_ms": med("r2", p95)},
        "cur": {"build_s": med("cur", build),
                "serial20_s": med("cur", serial),
                "p50_ms": med("cur", p50), "p95_ms": med("cur", p95)},
    }
    summary["ratio_serial_cur_over_r2"] = round(
        summary["cur"]["serial20_s"] / summary["r2"]["serial20_s"], 3)
    summary["ratio_build_cur_over_r2"] = round(
        summary["cur"]["build_s"] / summary["r2"]["build_s"], 3)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

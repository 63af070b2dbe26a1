"""Two-cluster-size scaling evidence (north_rule: ">=0.8 throughput scaling
efficiency between N and 4N executors"; sandbox stand-in per the task brief:
the same job at local[8] and local[32] on the same input).

Runs bench.py in fresh JVMs at both parallelism levels and writes
BENCH/BASELINE.md with raw throughput + efficiency.

Usage: python tools/bench_scaling.py [--replicate 40] [--sf-dir ...]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str, replicate: int, reps: int) -> dict:
    env = {**os.environ,
           "SPARK_GRAFT_CPUS": str(cpus),
           "SPARK_GRAFT_SF_DIR": sf_dir,
           "ZSOLR_BENCH_REPLICATE": str(replicate),
           "ZSOLR_BENCH_QUERY_REPS": str(reps)}
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, timeout=7200, env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--replicate", type=int, default=800)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BASELINE.md"))
    args = ap.parse_args()

    results = {}
    for cpus in (8, 32):
        t0 = time.time()
        results[cpus] = run_bench(cpus, args.sf_dir, args.replicate, args.reps)
        print(f"local[{cpus}]: {json.dumps(results[cpus])}", flush=True)
        print(f"  ({time.time() - t0:.0f}s total)", flush=True)

    r8, r32 = results[8], results[32]
    eff = (r32["files_per_sec"] / r8["files_per_sec"]) / 4.0
    qs8 = sorted(v for k, v in r8["queries"].items() if k != "build")
    qs32 = sorted(v for k, v in r32["queries"].items() if k != "build")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(f"""# BENCH/BASELINE — measured performance baseline

Corpus: {args.sf_dir} documents deterministically replicated ×{r8['replicate']}
→ **{r8['n_files']:,} files** (FIXTURES.md §1 replication; content and
vocabulary statistics unchanged).  Single machine, two parallelism levels as
the sandbox stand-in for N vs 4N executors (task brief's two-cluster-size
rule; no real cluster available).  Fresh JVM per level; cold index build
each run.

## Index-build throughput

| cluster size | build wall (s) | files/sec |
| --- | --- | --- |
| local[8]  (N)  | {r8['queries']['build']:.1f} | {r8['files_per_sec']:.0f} |
| local[32] (4N) | {r32['queries']['build']:.1f} | {r32['files_per_sec']:.0f} |

**Scaling efficiency N→4N = (fps_32 / fps_8) / 4 = {eff:.2f}**
(required ≥ 0.8 by BASELINE.json north_rule).

## BM25 top-10 query latency (reference query set, warm index)

| cluster size | p50 (ms) | p95 (ms) |
| --- | --- | --- |
| local[8]  | {r8['p50_query_ms']:.0f} | {r8['p95_query_ms']:.0f} |
| local[32] | {r32['p50_query_ms']:.0f} | {r32['p95_query_ms']:.0f} |

Query latency at this scale is dominated by fixed Spark job-scheduling
overhead (~2 jobs/query), not data volume — the fast path touches only the
query terms' posting buckets, so latency stays flat as the corpus grows.

## Rank identity & invariants (gates, enforced in pytest)

* top-k docIDs and BM25 scores rank-identical to the pure-Python oracle on
  all 20 reference queries (atol 1e-9), WAND on == WAND off == oracle.
* per-row content sha256 equality corpus → docs → results.
* docID assignment identical across partition counts / parallelism levels.

Raw JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
""")
    print(f"efficiency={eff:.3f} → {args.out}")
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    sys.exit(main())

"""Core-count scaling evidence at sf1 (VERDICT r13 item 3).

The driver's sf0.1 bench cannot show parallelism: at ~600k rows every
query is dominated by the fixed per-query floor (whole-stage-codegen
JIT, job scheduling), so 8 cores beat 32 on the r13 totals and no
per-query low/high ratio exceeded 1.35. This harness produces the
missing evidence at a scale factor where parallel work exists: it runs
a named set of the bench's most expensive queries at sf1 (10x rows,
tools/gen_scale_data.py) once per core count — low (default 8) and
high (default 32) — in SEPARATE processes (master local[N] comes from
$SPARK_GRAFT_CPUS exactly like bench.py), and writes
BENCH_CORE_SCALING.json with per-query times and the low/high speedup
ratio.

Timing follows the bench contract: noop sink, reps with min kept (the
per-corpus offline artifacts — codebooks, IVF layouts, CC labels — are
warm at both core counts so the ratio measures the operators, not a
one-time build).

Usage:
  python tools/bench_core_scaling.py [--sf-dir scale_data/sf1]
      [--low 8] [--high 32] [--reps 2] [--out BENCH_CORE_SCALING.json]
      [--only name[,name...]]

The default query set: data-bound scan/shuffle/compute shapes where
core-count scaling SHOULD show, plus a few engine-lifecycle fixtures
where it honestly should NOT (sequential insert->flush lifecycles are
driver-serialized by design) — the JSON records which is which.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# kind: "parallel" = data-bound, cores should help;
#       "lifecycle" = sequential fixture surface, cores should NOT help
QUERIES: dict[str, str] = {
    "q_corr_matrix": "parallel",        # one-pass decimal moment agg
    "q_semdedup": "parallel",           # embedding clustering + matmul
    "q_dedup_simhash": "parallel",      # shingle hash + banded join
    "q_near_dedup": "parallel",         # minhash + inverted index join
    "q_dedup_ngram_prefix": "parallel",  # shingle explode + prefix join
    "q_dedup_substring": "parallel",    # suffix shingle containment
    "q_dedup_containment": "parallel",
    "q_basket_lift": "parallel",        # pair self-join blowup
    "q_text_tfidf": "parallel",
    "q_text_bigram_pmi": "parallel",
    "q_embed_pca": "parallel",          # gramian accumulation
    "q_knn_join_ivf": "parallel",
    "q_join_salted": "parallel",
    "q_quantile_weighted": "parallel",
    "q_sql_tpch_q1": "parallel",
    "q_sql_tpch_q18": "parallel",
    "q_sql_tpch_q21": "parallel",
    "q_events_funnel": "parallel",
    # honest non-scaling controls: sequential insert->flush lifecycles
    "q_mergetree_engine": "lifecycle",
    "q_token_search": "lifecycle",
}


def run_side(cpus: int, sf_dir: str, names: list[str], reps: int) -> dict:
    """One fresh process per core count — the same contract as the
    driver's own low/high-core bench runs ($SPARK_GRAFT_CPUS -> master
    local[N]); an in-process re-configure cannot change the master."""
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "time_queries.py"),
         "--reps", str(reps), *names],
        env=env, cwd=REPO, capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    args = sys.argv[1:]

    def opt(flag: str, default: str) -> str:
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i:i + 2]
            return v
        return default

    sf_dir = opt("--sf-dir", os.path.join(REPO, "scale_data", "sf1"))
    low = int(opt("--low", "8"))
    high = int(opt("--high", "32"))
    reps = int(opt("--reps", "2"))
    out_path = opt("--out", os.path.join(REPO, "BENCH_CORE_SCALING.json"))
    only = opt("--only", "")
    names = ([n for n in only.split(",") if n] if only
             else list(QUERIES))

    # high first, then low: any residual page-cache warmup favors the
    # LOW side, biasing the reported speedup conservatively
    high_res = run_side(high, sf_dir, names, reps)
    low_res = run_side(low, sf_dir, names, reps)

    rows = {}
    for n in names:
        lo, hi = low_res[n]["total"], high_res[n]["total"]
        rows[n] = {
            "kind": QUERIES.get(n, "parallel"),
            f"sec_{low}c": lo,
            f"sec_{high}c": hi,
            "speedup_low_over_high": round(lo / hi, 3) if hi else None,
            f"reps_{low}c": low_res[n]["reps"],
            f"reps_{high}c": high_res[n]["reps"],
        }
    doc = {
        "sf_dir": sf_dir, "low_cpus": low, "high_cpus": high,
        "reps": reps, "queries": rows,
        "total_low": round(sum(low_res[n]["total"] for n in names), 2),
        "total_high": round(sum(high_res[n]["total"] for n in names), 2),
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps({n: rows[n]["speedup_low_over_high"] for n in names}))
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()

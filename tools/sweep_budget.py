"""Per-query sweep-cost budget artifact (VERDICT r12 #5).

The driver's CORRECTNESS gate runs every registered query against its
DuckDB oracle at sf0.01; that sweep's wall cost has only been tracked as
hand-kept BENCH_NOTES prose, which let a 3x per-query cost regression
(x109, r11) go unnoticed until the judge re-measured it. This script IS
the per-round measurement: it runs the full registry through the same
compare the driver performs (tests/oracle_harness.compare — Spark result
vs DuckDB oracle, count + sorted-column value equality) and writes
SWEEP_BUDGET.json with TWO wall-seconds rows per query:

 - cold: first touch in the session, registry order — what the driver
   sweep actually pays per row (sums to the gate's wall cost);
 - warm: an immediate second identical compare — the steadier number
   BENCH_NOTES' trim policy (">15 s warm gets trimmed inside its own
   fixture") is defined on; single first-touch numbers wander several
   seconds with machine state (the r11 x104 21.8 s-cold / 8.5 s-warm
   lesson).

tests/test_sweep_budget.py pins the ceilings against the artifact: warm
rows under per-query ceilings (default + the documented justified-audit
pins), cold total under the gate ceiling. Regenerate each round:

    PYTHONPATH=. python tools/sweep_budget.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.join(REPO_ROOT, "tests"))

# Soft ceilings (seconds) — tests/test_sweep_budget.py reads these.
PER_QUERY_WARM_CEILING_S = 15.0
TOTAL_COLD_CEILING_S = 450.0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from oracle_harness import compare, duck_connection

    from detecting_and_addressing_change_spark.queries import (
        ORACLE_SQL,
        QUERIES,
    )
    from detecting_and_addressing_change_spark.session import get_spark

    spark = get_spark(app_name="sweep_budget")
    spark.sparkContext.setLogLevel("ERROR")
    # one throwaway action so JVM/session warm-up isn't billed to row 1
    con = duck_connection(sf_dir)
    con.sql("SELECT count(*) FROM lineitem").fetchall()
    con.close()
    spark.range(1).count()

    def one_pass(name: str) -> None:
        df = QUERIES[name](spark, sf_dir)
        oracle = ORACLE_SQL.get(name)
        if oracle is None:
            assert df.count() >= 0
        else:
            compare(df, oracle, sf_dir)

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    failures: dict[str, str] = {}
    t_total = time.perf_counter()
    for name in QUERIES:
        try:
            t0 = time.perf_counter()
            one_pass(name)
            cold[name] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            one_pass(name)
            warm[name] = round(time.perf_counter() - t0, 2)
        except Exception as exc:  # record, keep sweeping
            failures[name] = f"{type(exc).__name__}: {exc}"[:300]
            cold.setdefault(name, round(time.perf_counter() - t0, 2))
        print(
            f"{cold.get(name, -1):>7.2f}s cold {warm.get(name, -1):>7.2f}s"
            f" warm  {name}"
            + (f"  FAILED: {failures[name]}" if name in failures else ""),
            flush=True,
        )
    total = round(time.perf_counter() - t_total, 1)
    total_cold = round(sum(cold.values()), 1)
    spark.stop()

    out = {
        "sf_dir": sf_dir,
        "n_queries": len(cold),
        "n_failed": len(failures),
        "total_sec": total,
        "total_cold_sec": total_cold,
        "per_query_warm_ceiling_sec": PER_QUERY_WARM_CEILING_S,
        "total_cold_ceiling_sec": TOTAL_COLD_CEILING_S,
        "cold": cold,
        "warm": warm,
        "failures": failures,
    }
    path = os.path.join(REPO_ROOT, "SWEEP_BUDGET.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    over = {n: s for n, s in warm.items() if s > PER_QUERY_WARM_CEILING_S}
    print(f"\nwrote {path}: {len(cold)} queries, cold total {total_cold}s "
          f"(wall {total}s incl. warm pass), {len(failures)} failed, "
          f"{len(over)} warm rows over {PER_QUERY_WARM_CEILING_S}s: {over}")
    if failures:
        raise SystemExit(f"sweep had {len(failures)} failures: "
                         f"{sorted(failures)}")


if __name__ == "__main__":
    main()

"""Per-query Spark job/stage/task audit (guide §1.2: action/job count).

For each bench query (or the names given on the command line), runs the
query once end-to-end into the noop sink inside its own job group and
reports how many Spark jobs, stages and tasks the timed region fired —
construction-time driver actions (collect/count/first, eager
localCheckpoints) included, exactly as bench.py times them. Jobs are
the unit the per-action scheduler floor is paid on (~0.2-0.4 s each at
sf0.1 regardless of data), so this table is the targeting list for
in-plan folds: a 0.8 s row firing 4 jobs is floor-bound; the lever is
job count, not compute.

    PYTHONPATH=. python tools/job_audit.py [name ...]

Caveats: jobs fired from streaming query threads (x100-family drains)
carry their own job group and are NOT counted here — the reported
number for those rows is the batch-side job count only. One warm-up
pass at the target sf runs first so JIT/AQE warm-up jobs are not
attributed to the audited pass.
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import BENCH_QUERIES, warm_worker_pool
    from detecting_and_addressing_change_spark.queries import QUERIES
    from detecting_and_addressing_change_spark.session import get_spark

    names = sys.argv[1:] or BENCH_QUERIES
    spark = get_spark(app_name="job-audit")
    spark.sparkContext.setLogLevel("ERROR")
    warm_worker_pool(spark)
    sc = spark.sparkContext

    # one warm pass so JIT/codegen warm-up jobs don't pollute the audit
    for name in names:
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:
            print(f"warm-up failed for {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)

    tracker = sc.statusTracker()
    rows = []
    for name in names:
        group = f"audit_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:
            print(f"audit failed for {name}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        finally:
            dt = time.perf_counter() - t0
            sc.setJobGroup(None, None)
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None and sinfo.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += sinfo.numCompletedTasks
        rows.append((name, dt, len(job_ids), n_stages, n_tasks))

    rows.sort(key=lambda r: -r[2])
    print(f"{'query':40s} {'sec':>7s} {'jobs':>5s} {'stages':>7s} {'tasks':>7s}")
    for name, dt, nj, ns, nt in rows:
        print(f"{name:40s} {dt:7.2f} {nj:5d} {ns:7d} {nt:7d}")
    total_jobs = sum(r[2] for r in rows)
    total_sec = sum(r[1] for r in rows)
    print(f"{'TOTAL':40s} {total_sec:7.2f} {total_jobs:5d}")
    spark.stop()


if __name__ == "__main__":
    main()

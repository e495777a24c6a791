"""Per-query cost breakdown for the bench headliners (guide §1).

For each headline query, separately times:

- build:   registry[name].fn(spark, sf_dir)  (driver-side plan construction,
           incl. any training/collect the query does before returning a DF)
- first:   first noop-sink execution (codegen compile + cold path)
- steady:  median of N further noop runs (the number bench.py reports)
- jobs:    Spark jobs submitted during one steady run (statusTracker delta)

Usage: python scripts/profile_headliners.py [query ...]   (default: all)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROF_ITERS (default 5).
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HEADLINE  # noqa: E402

from crate_spark.queries import load_all  # noqa: E402
from crate_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("PROF_ITERS", "5"))
    names = sys.argv[1:] or HEADLINE
    spark = get_spark("profile-headliners")
    registry = load_all()
    registry["count_star"].fn(spark, sf_dir).collect()  # session warm
    tracker = spark.sparkContext.statusTracker()

    print(f"{'query':34s} {'build':>7s} {'first':>7s} {'steady':>7s} {'jobs':>5s}")
    for name in names:
        fn = registry[name].fn
        spark.sparkContext.setJobDescription(f"profile: {name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        t_first = time.perf_counter() - t0
        runs = []
        jobs_before = len(tracker.getJobIdsForGroup(None) or [])
        for i in range(iters):
            if i == 1:
                jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            # re-build the DF each run, as bench.py does (plan build is
            # inside bench's timed region)
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
            if i == 1:
                jobs_one = len(tracker.getJobIdsForGroup(None) or []) - jobs_before
        steady = statistics.median(runs)
        print(
            f"{name:34s} {t_build:7.3f} {t_first:7.3f} {steady:7.3f} {jobs_one:5d}"
        )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Multi-seed differential sweep: run the fuzz grammar from
tests/test_differential_fuzz.py with FRESH seeds against both engines.

The committed test pins one seed (regression guard); this script is
the exploration side — new seeds sweep new regions of the grammar
space and any mismatch is either a real engine divergence or a
generator determinism flake (see the temporal top-k tie fix).

    python scripts/fuzz_sweep.py [seed ...]   (default: 5 seeds)

Env: CRATE_SPARK_TEST_SF_DIR (default /root/testdata/sf0.001).
Exit code 1 on any disagreement.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import tests.test_differential_fuzz as fz  # noqa: E402
from crate_spark.engine import CrateSession  # noqa: E402
from tests.conftest import SF_DIR, canonical_rows  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings".split()
)


def main() -> int:
    seeds = [int(a, 0) for a in sys.argv[1:]] or [1, 77, 424242, 0xBEEF, 20260815]
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("fuzz-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    crate = CrateSession(spark, SF_DIR)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    bad = total = 0
    for seed in seeds:
        rng = random.Random(seed)
        qs = (
            [fz.gen_query(rng) for _ in range(50)]
            + [fz.gen_temporal_query(rng) for _ in range(15)]
            + [fz.gen_relational_query(rng) for _ in range(10)]
        )
        for sql in qs:
            total += 1
            try:
                sdf = crate.execute(sql)
                a = canonical_rows(
                    [c.lower() for c in sdf.columns],
                    [tuple(r) for r in sdf.collect()],
                )
                cur = con.execute(sql)
                b = canonical_rows(
                    [c[0].lower() for c in cur.description], cur.fetchall()
                )
                if a != b:
                    bad += 1
                    print(f"MISMATCH (seed {seed}): {sql}")
            except Exception as e:  # noqa: BLE001
                bad += 1
                print(f"ERROR (seed {seed}): {sql}\n  {e}")
        # crate-dialect spelling pairs: both sides through the engine
        for _ in range(15):
            child = random.Random(rng.getrandbits(64))
            a_sql, b_sql = fz.gen_dialect_pair(child)
            total += 1
            try:
                da, db = crate.execute(a_sql), crate.execute(b_sql)
                a = canonical_rows(
                    [c.lower() for c in da.columns],
                    [tuple(r) for r in da.collect()],
                )
                b = canonical_rows(
                    [c.lower() for c in db.columns],
                    [tuple(r) for r in db.collect()],
                )
                if a != b:
                    bad += 1
                    print(f"PAIR MISMATCH (seed {seed}): {a_sql} | {b_sql}")
            except Exception as e:  # noqa: BLE001
                bad += 1
                print(f"PAIR ERROR (seed {seed}): {a_sql} | {b_sql}\n  {e}")
    print(f"{total - bad}/{total} agree across {len(seeds)} seeds")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

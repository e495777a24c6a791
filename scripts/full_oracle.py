#!/usr/bin/env python
"""Full-registry oracle run: every registered query vs its DuckDB
oracle, driver-style (plain SparkSession, sf0.01 by default), written
as one JSON artifact.

The per-round driver samples only the first 50 registered queries;
this harness covers ALL of them so the round's correctness evidence is
reproducible from the repo (ADVICE r2: commit the judge-run evidence).

    python scripts/full_oracle.py [out.json]

Env: CRATE_SPARK_ORACLE_SF_DIR (default /root/testdata/sf0.01).
Compare = the driver's gate: row count, column names, and an
order-insensitive canonical value hash (columns sorted by name,
floats at 12 significant digits). Queries without an oracle get a
rows-only record.
"""

from __future__ import annotations

import json
import os
import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from crate_spark.queries import load_all  # noqa: E402
from crate_spark.session import TABLES  # noqa: E402
from tests.conftest import canonical_rows  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("CRATE_SPARK_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "FULL_CORRECTNESS.json"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("full-oracle")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results: dict[str, dict] = {}
    n_pass = n_fail = 0
    for name, spec in load_all().items():
        rec: dict = {"err": None}
        try:
            sdf = spec.fn(spark, sf_dir)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(rows)
            if spec.oracle is None:
                rec["rows_only"] = True
                rec["ok"] = bool(cols) and len(rows) >= 0
            else:
                res = con.execute(spec.oracle)
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                rec["oracle_rows"] = len(drows)
                rec["rows_match"] = len(rows) == len(drows)
                rec["schema_match"] = sorted(c.lower() for c in cols) == sorted(
                    c.lower() for c in dcols
                )
                rec["hash_match"] = canonical_rows(
                    [c.lower() for c in cols], rows
                ) == canonical_rows([c.lower() for c in dcols], drows)
                rec["ok"] = (
                    rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
                )
        except Exception as e:  # noqa: BLE001 - recorded, not swallowed
            rec["err"] = f"{type(e).__name__}: {e}"
            rec["ok"] = False
            traceback.print_exc()
        results[name] = rec
        n_pass += rec["ok"]
        n_fail += not rec["ok"]
        print(f"{'PASS' if rec['ok'] else 'FAIL'} {name}", flush=True)

    summary = {
        "sf_dir": sf_dir,
        "total": len(results),
        "pass": n_pass,
        "fail": n_fail,
        "queries": results,
    }
    Path(out_path).write_text(json.dumps(summary, indent=1))
    print(f"\n{n_pass}/{len(results)} pass -> {out_path}")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

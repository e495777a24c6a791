#!/usr/bin/env python
"""A/B ts_lttb_downsample variants at sf0.1: bucket-count sweep for
the small-input hash-bucket path, plus an applyInArrow variant (skip
pandas). Equality-checked against the current implementation."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import functions as F

from crate_spark.session import get_spark, load_tables

SF = "/root/testdata/sf0.1"
N_BUCKETS = 50
SERIES, XCOL, YCOL = "user_id", "ts", "value"


def _pick(xs, ys):
    n = len(xs)
    picked = [0]
    bucket_size = (n - 2) / (N_BUCKETS - 2)
    for b in range(N_BUCKETS - 2):
        start = int(b * bucket_size) + 1
        end = min(int((b + 1) * bucket_size) + 1, n - 1)
        nstart = end
        nend = min(int((b + 2) * bucket_size) + 1, n)
        if nstart < nend:
            cx, cy = xs[nstart:nend].mean(), ys[nstart:nend].mean()
        else:
            cx, cy = xs[n - 1], ys[n - 1]
        ax, ay = xs[picked[-1]], ys[picked[-1]]
        areas = abs((ax - cx) * (ys[start:end] - ay) - (ax - xs[start:end]) * (cy - ay))
        picked.append(start + int(areas.argmax()))
    picked.append(n - 1)
    return np.asarray(picked)


def _select_all(s, xs_i, ys_f):
    """shared numpy selection over a bucket's worth of series."""
    order = np.argsort(s, kind="stable")
    s, xs_i, ys_f = s[order], xs_i[order], ys_f[order]
    bounds = np.flatnonzero(np.diff(s)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(s)]))
    out_s, out_x, out_y = [], [], []
    for st, en in zip(starts, ends):
        ordx = np.argsort(xs_i[st:en], kind="quicksort")
        xi = xs_i[st:en][ordx]
        yi = ys_f[st:en][ordx]
        n = en - st
        picked = np.arange(n) if n <= N_BUCKETS else _pick(xi.astype("float64"), yi)
        out_s.append(np.full(len(picked), s[st]))
        out_x.append(xi[picked])
        out_y.append(yi[picked])
    return np.concatenate(out_s), np.concatenate(out_x), np.concatenate(out_y)


def build(spark, df, mult, arrow=False):
    out_schema = f"{SERIES} long, x_us long, y double"
    x_us = (
        F.expr("ts_ns div 1000")
        if "ts_ns" in df.columns
        else F.unix_micros(F.col(XCOL).cast("timestamp"))
    )
    prepared = df.select(
        F.col(SERIES), x_us.alias("x_us"), F.col(YCOL).cast("double").alias("y")
    )
    n_groups = mult * spark.sparkContext.defaultParallelism
    bucketed = prepared.withColumn("_bk", F.pmod(F.xxhash64(F.col(SERIES)), F.lit(n_groups)))

    if arrow:
        def _bucket_arrow(table: pa.Table) -> pa.Table:
            if table.num_rows == 0:
                return pa.table({SERIES: pa.array([], "int64"), "x_us": pa.array([], "int64"), "y": pa.array([], "float64")})
            s = table.column(SERIES).to_numpy()
            xs_i = table.column("x_us").to_numpy()
            ys_f = table.column("y").to_numpy().astype("float64", copy=False)
            os_, ox, oy = _select_all(s, xs_i, ys_f)
            return pa.table({SERIES: os_, "x_us": ox, "y": oy})

        return bucketed.groupBy("_bk").applyInArrow(_bucket_arrow, out_schema)

    def _bucket_pd(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pdf[[SERIES, "x_us", "y"]]
        os_, ox, oy = _select_all(
            pdf[SERIES].to_numpy(), pdf["x_us"].to_numpy(), pdf["y"].to_numpy(dtype="float64")
        )
        return pd.DataFrame({SERIES: os_, "x_us": ox, "y": oy})

    return bucketed.groupBy("_bk").applyInPandas(_bucket_pd, out_schema)


def main():
    from crate_spark.queries import load_all

    spark = get_spark("lttb-ab")
    reg = load_all()
    fn = reg["ts_lttb_downsample"].fn

    t = load_tables(spark, SF)
    ev = t["events"]
    x_us = F.expr("ts_ns div 1000") if "ts_ns" in ev.columns else F.unix_micros(F.col("ts").cast("timestamp"))
    dups = (
        ev.select(F.col(SERIES), x_us.alias("x_us"))
        .groupBy(SERIES, "x_us").count().filter("count > 1").count()
    )
    print("duplicate (series, x_us) rows:", dups, "| events rows:", ev.count(),
          "| series:", ev.select(SERIES).distinct().count())

    base_rows = sorted(map(tuple, fn(spark, SF).collect()))
    for mult, arrow in [(4, False), (1, False), (2, False), (1, True), (4, True)]:
        rows = sorted(map(tuple, build(spark, ev, mult, arrow).collect()))
        print(f"mult={mult} arrow={arrow} equal={rows == base_rows} n={len(rows)}")

    def noop(d):
        d.write.mode("overwrite").format("noop").save()

    def timeit(label, mk, iters=6):
        noop(mk())
        runs = []
        for _ in range(iters):
            t0 = time.perf_counter()
            noop(mk())
            runs.append(time.perf_counter() - t0)
        runs.sort()
        print(f"{label:24s} med={runs[len(runs)//2]:.3f} {['%.2f' % r for r in runs]}")

    timeit("registry current", lambda: fn(spark, SF))
    timeit("pandas mult=4 (cur)", lambda: build(spark, ev, 4))
    timeit("pandas mult=1", lambda: build(spark, ev, 1))
    timeit("pandas mult=2", lambda: build(spark, ev, 2))
    timeit("arrow  mult=1", lambda: build(spark, ev, 1, arrow=True))
    timeit("arrow  mult=4", lambda: build(spark, ev, 4, arrow=True))
    spark.stop()


if __name__ == "__main__":
    main()

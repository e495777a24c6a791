"""Time-series operators: sessionization, gap detection, LTTB
downsampling.

Reference parity: CrateDB's time-series story is date_bin + window
functions + LTTB (``extensions/functions/.../LTTBAggregation.java:50``,
Largest-Triangle-Three-Buckets). Sessionization has no reference
analog (LLM/eventstream extension) but composes from the same window
primitives the reference has.

Scale notes: everything partitions by the series key (user_id); LTTB
runs as applyInPandas per series — Arrow-batched, one pass, state
bounded by one series partition (the reference's LTTB is likewise a
per-group aggregate).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    ns_col: str | None = None,
) -> DataFrame:
    """Assign session ids: a new session starts when the gap from the
    previous event of the same user exceeds ``gap_minutes``.

    lag + running sum over (user, ts) — two window passes over one
    shuffle by user_col. This is the standard batch sessionization; the
    streaming twin lives in crate_spark.streaming.

    Gap arithmetic is SESSION-STATE-FREE: ``ts`` is TIMESTAMP_NTZ and a
    cast to TIMESTAMP interprets it in ``spark.sql.session.timeZone``,
    so two sessions with different zone confs would disagree across DST
    transitions. When the raw epoch column (``ns_col``, kept by
    session._normalize_events exactly for this) is present we use pure
    long arithmetic on it (``ts_ns div 1000`` == epoch_us(ts), matching
    the DuckDB oracle); otherwise we subtract the NTZ timestamps
    directly (interval comparison — also timezone-free).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    if ns_col is None and "ts_ns" in df.columns:
        ns_col = "ts_ns"
    if ns_col is not None:
        gap_us = gap_minutes * 60 * 1_000_000
        us = F.expr(f"{ns_col} div 1000")
        prev_us = F.lag(us).over(w)
        new_session = (
            prev_us.isNull() | ((us - prev_us) > gap_us)
        ).cast("int")
    else:
        prev_ts = F.lag(F.col(ts_col)).over(w)
        new_session = (
            prev_ts.isNull()
            | ((F.col(ts_col) - prev_ts) > F.expr(f"INTERVAL {gap_minutes} MINUTES"))
        ).cast("int")
    return df.withColumn("_new_session", new_session).withColumn(
        "session_id", F.sum("_new_session").over(w)
    ).drop("_new_session")


def lttb(
    df: DataFrame,
    n_buckets: int,
    *,
    series_col: str = "user_id",
    x_col: str = "ts",
    y_col: str = "value",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling per series
    (reference ``LTTBAggregation.java:50`` — same algorithm: first and
    last points kept, each interior bucket contributes the point
    maximizing the triangle area with the previously selected point and
    the next bucket's centroid).

    Deterministic. Memory/grouping contract: for SMALL inputs
    (optimizer size estimate at or below the
    ``crate_spark.exec.spread_small_input_bytes`` gate, default
    64 MiB) many series batch into one Arrow group via a hash-bucket
    key — the per-group Python round-trip was the dominant cost
    (~2,000 series = ~2,000 pandas calls; r11 optimization round:
    3.7 s -> ~1 s at sf0.1). The r12 round moved the bucket path to
    ``applyInArrow`` (the selection loop is numpy end to end, so the
    pandas DataFrame on each side of the boundary was pure conversion
    cost) and dropped the bucket count from 4x to 1x parallelism
    (fewer, larger Arrow round-trips — guide §2.2 logic at the Python
    boundary; interleaved A/B at sf0.1: 1.48 -> 1.27 s med, outputs
    equal). Large inputs keep the one-series-per-group pandas shape
    so task memory stays bounded by one series. Both paths sort each
    series by a STABLE (x_us, y) key (ADVICE r11: the bucket path's
    quicksort over scan-order rows could tie-break duplicate x_us
    differently across the size gate; testdata has zero duplicate
    (series, x_us) pairs at every SF, so this is behavior-preserving
    here and permutation-independent in general). The per-series
    selection is computed independently either way — output rows
    identical (golden-pinned). Output: (series, x, y) of
    <= n_buckets rows per series.
    """
    out_schema = f"{series_col} long, x_us long, y double"

    def _lttb_one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["x_us", "y"], kind="stable").reset_index(drop=True)
        n = len(pdf)
        if n <= n_buckets:
            return pdf[[series_col, "x_us", "y"]]
        picked = _pick(
            pdf["x_us"].to_numpy(dtype="float64"),
            pdf["y"].to_numpy(dtype="float64"),
        )
        return pdf.iloc[picked][[series_col, "x_us", "y"]]

    def _pick(xs: "np.ndarray", ys: "np.ndarray") -> "np.ndarray":
        # the interior-bucket selection of _lttb_one over pre-sorted
        # float64 arrays; same arithmetic, same argmax tie-break
        import numpy as np

        n = len(xs)
        picked = [0]
        bucket_size = (n - 2) / (n_buckets - 2)
        for b in range(n_buckets - 2):
            start = int(b * bucket_size) + 1
            end = min(int((b + 1) * bucket_size) + 1, n - 1)
            nstart = end
            nend = min(int((b + 2) * bucket_size) + 1, n)
            if nstart < nend:
                cx, cy = xs[nstart:nend].mean(), ys[nstart:nend].mean()
            else:
                cx, cy = xs[n - 1], ys[n - 1]
            ax, ay = xs[picked[-1]], ys[picked[-1]]
            areas = abs(
                (ax - cx) * (ys[start:end] - ay) - (ax - xs[start:end]) * (cy - ay)
            )
            picked.append(start + int(areas.argmax()))
        picked.append(n - 1)
        return np.asarray(picked)

    def _lttb_bucket_arrow(table):
        # one hash bucket = many whole series, processed on numpy
        # arrays end to end (r11 resumed session): the previous
        # per-series pandas path (groupby -> sort_values -> iloc ->
        # per-series DataFrame -> concat) cost ~1-2 ms of pandas
        # machinery per series x ~2000 series; r12 removed the
        # remaining pandas conversion on both sides of the boundary
        # (applyInArrow; to_numpy on the Arrow columns is zero-copy
        # for the non-null int64/float64 data here). Groups iterate
        # in stable-argsort key order; each series sorts by the
        # stable (x_us, y) key (see docstring) — output rows equal
        # to the pandas path (equality sweep at sf0.1; golden-pinned).
        import numpy as np
        import pyarrow as pa

        if table.num_rows == 0:
            return table.select([series_col, "x_us", "y"])
        s = table.column(series_col).to_numpy()
        xs_i = table.column("x_us").to_numpy()
        ys_f = table.column("y").to_numpy().astype("float64", copy=False)
        order = np.argsort(s, kind="stable")
        s, xs_i, ys_f = s[order], xs_i[order], ys_f[order]
        bounds = np.flatnonzero(np.diff(s)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(s)]))
        out_s, out_x, out_y = [], [], []
        for st, en in zip(starts, ends):
            ordx = np.lexsort((ys_f[st:en], xs_i[st:en]))
            xi = xs_i[st:en][ordx]
            yi = ys_f[st:en][ordx]
            n = en - st
            picked = (
                np.arange(n)
                if n <= n_buckets
                else _pick(xi.astype("float64"), yi)
            )
            out_s.append(np.full(len(picked), s[st]))
            out_x.append(xi[picked])
            out_y.append(yi[picked])
        return pa.table(
            {
                series_col: np.concatenate(out_s),
                "x_us": np.concatenate(out_x),
                "y": np.concatenate(out_y),
            }
        )

    x_us = (
        F.expr("ts_ns div 1000")
        if (x_col == "ts" and "ts_ns" in df.columns)
        else F.unix_micros(F.col(x_col).cast("timestamp"))
    )
    prepared = df.select(
        F.col(series_col),
        x_us.alias("x_us"),
        F.col(y_col).cast("double").alias("y"),
    )
    from crate_spark.session import input_is_small

    spark = df.sparkSession
    if input_is_small(df):
        n_groups = spark.sparkContext.defaultParallelism
        bucketed = prepared.withColumn(
            "_bk", F.pmod(F.xxhash64(F.col(series_col)), F.lit(n_groups))
        )
        return bucketed.groupBy("_bk").applyInArrow(_lttb_bucket_arrow, out_schema)
    return prepared.groupBy(series_col).applyInPandas(_lttb_one, out_schema)


def topk_map(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 8,
) -> DataFrame:
    """``topk(col, k)`` with the reference's OUTPUT SHAPE: one
    value -> count map per group (``TopKAggregation.java:77`` returns
    the ItemsSketch frequency map).

    Semantics mapping (declared): the reference uses a DataSketches
    ItemsSketch — approximate counts under heavy-hitter guarantees; we
    compute EXACT most-frequent values and emit the same map shape.
    Exact supersedes approximate for the correctness gate; at 100 TB
    the partial count aggregation shuffles only distinct (group, value)
    pairs, then the per-group window is bounded by that distinct set.
    """
    counted = df.groupBy(*group_cols, value_col).agg(F.count("*").alias("_n"))
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("_n").desc(), F.col(value_col)
    )
    topped = counted.withColumn("_rnk", F.row_number().over(w)).filter(
        F.col("_rnk") <= k
    )
    return (
        topped.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(F.struct(F.col(value_col).alias("key"), F.col("_n").alias("value")))
                )
            ).alias("frequencies")
        )
    )

"""Temporal pipeline operators: as-of join and sessionization.

Event/telemetry window operators a web-scale training-data pipeline
needs next to the geospatial track ops (operators/route.py covers the
reference's TrackLabel/RouteSearch analogs; these two are the standard
temporal joins the reference delegates to engine SQL).

Scale notes (100 TB event logs):
- asof_join is the union+ordered-window MERGE formulation: both inputs
  shuffle ONCE on the join key, sort within partitions, and a running
  last_value carries the most recent right-side state forward. No
  range-explosion join, no per-key driver loop, no broadcast
  requirement — the same plan shape Spark uses for
  sessionization/window aggs, so it scales with the shuffle, and AQE
  handles skewed keys like any other window.
- sessionize is the gaps-and-islands formulation: one shuffle on the
  key, one sort, a lag + running sum. Session ids are deterministic
  (ordered by (ts, id)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "sessionize", "session_stats", "interval_join",
           "funnel", "transition_matrix", "retention_cohorts", "peak_bucket"]


def transition_matrix(df: DataFrame, key_col: str, ts_col: str,
                      state_col: str,
                      order_col: str | None = None) -> DataFrame:
    """First-order Markov transition table over per-key state
    sequences: for every consecutive event pair within a key, the
    (from_state, to_state) count and its exact-integer probability
    share — the "what happens after a view" table behind next-action
    prediction, funnel design and bot detection (bots have degenerate
    transition rows).

    Probability is ``prob_ppm = (n * 1e6) DIV row_total`` — exact
    integer arithmetic (the tfidf_topk_terms convention), no float
    division to defend across engines. Returns (from_state, to_state,
    n, prob_ppm).

    Scale shape: ONE per-key window (lead) over the event stream, one
    combining pair count (at most |states|^2 rows), one tiny
    row-total join back. Deterministic: ordered by (ts, order_col).
    """
    order = [F.col(ts_col).asc()] + (
        [F.col(order_col).asc()] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (df.select(F.col(state_col).alias("from_state"),
                       F.lead(state_col).over(w).alias("to_state"))
               .filter(F.col("to_state").isNotNull())
               .groupBy("from_state", "to_state")
               .agg(F.count("*").alias("n")))
    totals = pairs.groupBy("from_state").agg(F.sum("n").alias("__tot__"))
    return (pairs.join(totals, on="from_state")
                 .withColumn("prob_ppm",
                             F.expr("CAST(n * 1000000 DIV __tot__ AS BIGINT)"))
                 .drop("__tot__"))


def funnel(df: DataFrame, key_col: str, ts_col: str, step_col: str,
           steps: list, within_us: int | None = None) -> DataFrame:
    """Ordered-step funnel analysis: for each key, the earliest strictly
    increasing chain of timestamps through ``steps`` (classic product
    funnel: view -> click -> purchase), optionally constrained to a
    ``within_us`` window after the first step.

        t_1 = min ts where step = steps[0]
        t_i = min ts where step = steps[i], ts > t_{i-1}
              (and ts - t_1 <= within_us when set)

    This greedy chain is OPTIMAL: taking each step as early as
    possible only enlarges the candidate set for every later step, so
    a key completes the funnel iff any increasing chain exists (the
    standard funnel semantics). Returns one row per key that performed
    step 1: (key, step1_ts..stepK_ts, steps_completed); unreached
    steps are NULL, and NULLs are monotone (a missed step ends the
    chain).

    Scale shape: the whole cascade is ONE shuffle — K chained
    whole-partition window minimums over the same key partitioning
    (Catalyst collapses them into a single exchange; no per-step join,
    no collected per-key event lists) followed by one combining agg to
    collapse to a row per key. Hot keys are plain window skew.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(key_col)
    cur = df
    out_cols = []
    prev = None
    for i, s in enumerate(steps):
        cname = f"step{i + 1}_ts"
        cond = F.col(step_col) == F.lit(s)
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
            if within_us is not None:
                cond = cond & (F.timestamp_diff(
                    "MICROSECOND", F.col("step1_ts"), F.col(ts_col))
                    <= F.lit(int(within_us)))
        cur = cur.withColumn(
            cname, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = cname
        out_cols.append(cname)
    done = sum((F.col(c).isNotNull().cast("int") for c in out_cols),
               F.lit(0))
    return (cur.groupBy(key_col)
               .agg(*[F.max(c).alias(c) for c in out_cols],
                    F.max(done).alias("steps_completed"))
               .filter(F.col("step1_ts").isNotNull()))


def _fdiv(c: F.Column, w: int) -> F.Column:
    """Floor division for longs: pmod makes the numerator the exact
    floor multiple of ``w`` (fixing negative truncation), and integer
    DIV keeps the quotient exact for the full int64 range — a double
    `/` would round numerators above 2^53 and misplace bins."""
    return F.call_function("div", c - F.pmod(c, F.lit(w)), F.lit(w))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    on: str | None = None,
    overlap_col: str = "overlap",
) -> DataFrame:
    """Interval overlap join (range join): every (left, right) pair of
    HALF-OPEN intervals with ``[ls, le) ∩ [rs, re) != ∅``, i.e.
    ``ls < re AND rs < le`` — the temporal join Spark's equi-join
    machinery can't express without a cartesian product.

    Interval columns are integers on a shared axis (epoch microseconds
    for timestamps — convert with ``timestamp_diff`` first; any long
    works, the axis is not inherently time). Adds ``overlap_col`` =
    ``least(le, re) - greatest(ls, rs)`` (> 0 by construction). With
    ``on``, pairs must also match that key column (shared name on both
    sides); other column names must be disjoint across the inputs.

    Scale shape — binned co-shuffle + report-once dedup (the
    spatial_join grid trick on a 1-D axis): each interval explodes to
    the ``bin_width``-sized bins it touches, both sides shuffle on the
    (key, bin) only, and a pair is emitted ONLY in its canonical bin
    ``max(first_left_bin, first_right_bin)`` — the first bin the two
    intervals share — so no distinct/dropDuplicates shuffle ever sees
    the matched rows. Pick ``bin_width`` near the typical interval
    length: n_bins per interval = ceil(duration / bin_width) rows of
    fan-out, while a too-coarse bin turns the equi-join into a dense
    per-bin cross product. Hot bins are plain shuffle-join skew (AQE
    splits them). Empty/inverted intervals (end <= start) match
    nothing and are dropped up front.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    dup = (set(left.columns) & set(right.columns)) - ({on} if on else set())
    if dup:
        raise ValueError(f"column names must be disjoint, got both-sided: {sorted(dup)}")
    reserved = {"__bin__", "__lb0__", "__rb0__"} & (set(left.columns)
                                                    | set(right.columns))
    if reserved:
        raise ValueError(
            f"inputs must not carry the reserved internal columns: {sorted(reserved)}")
    w = int(bin_width)
    ls, le = F.col(l_start).cast("long"), F.col(l_end).cast("long")
    rs, re = F.col(r_start).cast("long"), F.col(r_end).cast("long")
    lb = (left.filter(le > ls)
              .withColumn("__lb0__", _fdiv(ls, w))
              .withColumn("__bin__", F.explode(
                  F.sequence(F.col("__lb0__"), _fdiv(le - 1, w)))))
    rb = (right.filter(re > rs)
               .withColumn("__rb0__", _fdiv(rs, w))
               .withColumn("__bin__", F.explode(
                   F.sequence(F.col("__rb0__"), _fdiv(re - 1, w)))))
    keys = ["__bin__"] + ([on] if on else [])
    return (lb.join(rb, on=keys, how="inner")
              # report-once: only the first shared bin emits the pair
              .filter(F.col("__bin__") == F.greatest("__lb0__", "__rb0__"))
              .filter((ls < re) & (rs < le))
              .withColumn(overlap_col, F.least(le, re) - F.greatest(ls, rs))
              .drop("__bin__", "__lb0__", "__rb0__"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_order: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right_ts <= left_ts`` for the same ``on`` key (backward as-of
    join, inclusive — the enrichment join of feature pipelines:
    "state as of the time of the event").

    Ties on ``right_ts`` break by ``right_order`` descending (required
    when right timestamps can repeat, so the match is deterministic —
    the same tiebreak an ASOF engine needs; DuckDB's native ASOF JOIN
    leaves it unspecified, which is why the oracle spells the
    row_number formulation).

    Implementation: union both sides with a side tag, window over the
    key ordered by (ts, side, right_order); the right payload rides in
    ONE struct column so last_value(ignorenulls) always reads every
    field from the SAME matched row (per-column last_value could mix
    rows if the right data itself held nulls). Right rows order before
    left rows at equal ts, making the join inclusive.

    Right payload columns (all but key/ts/order) join back with their
    names intact; the right timestamp arrives as ``matched_<right_ts>``.
    """
    rpay_cols = [c for c in right.columns if c != on]
    clash = set(left.columns) & {("matched_" + c if c == right_ts else c)
                                 for c in rpay_cols}
    if clash:
        raise ValueError(f"rename right columns colliding with left: {sorted(clash)}")
    rstruct = F.struct(*[F.col(c) for c in rpay_cols])
    # a NULL right timestamp sorts before everything and would be
    # carried forward as "state" whose matched_<ts> is null — leaking
    # payload into rows a consumer reads as unmatched; it can never be
    # a legitimate as-of match, so drop it up front
    right = right.filter(F.col(right_ts).isNotNull())
    r = right.select(
        F.col(on).alias("__k__"), F.col(right_ts).alias("__t__"),
        F.lit(0).alias("__side__"),
        (F.col(right_order) if right_order else F.lit(0)).alias("__ord__"),
        rstruct.alias("__rpay__"))
    l = left.select(
        F.col(on).alias("__k__"), F.col(left_ts).alias("__t__"),
        F.lit(1).alias("__side__"), F.lit(0).alias("__ord__"),
        F.lit(None).cast(r.schema["__rpay__"].dataType).alias("__rpay__"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lpay__"))
    r = r.withColumn("__lpay__", F.lit(None).cast(l.schema["__lpay__"].dataType))

    w = (Window.partitionBy("__k__")
               .orderBy("__t__", "__side__", "__ord__")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = (r.unionByName(l)
               .withColumn("__m__", F.last("__rpay__", ignorenulls=True).over(w))
               .filter(F.col("__side__") == 1))
    out = merged.select(
        *[F.col(f"__lpay__.{c}").alias(c) for c in left.columns],
        *[F.col(f"__m__.{c}").alias(
            f"matched_{right_ts}" if c == right_ts else c) for c in rpay_cols])
    if how == "inner":
        out = out.filter(F.col(f"matched_{right_ts}").isNotNull())
    elif how != "left":
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    return out


def sessionize(df: DataFrame, key_col: str, ts_col: str,
               gap_minutes: float = 30.0,
               order_col: str | None = None) -> DataFrame:
    """Assign gap-based session indexes: a new session starts when the
    time since the key's previous event exceeds ``gap_minutes``.

    Gaps-and-islands: lag + running sum over one keyed window. The gap
    compares integer MICROSECONDS (timestamp_diff, which accepts both
    TIMESTAMP and TIMESTAMP_NTZ), so engines agree exactly. Adds
    ``session_idx`` (0-based per key, deterministic: ordered by
    (ts, order_col)).
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    gap = F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
    new_sess = F.when(prev.isNull() | (gap > gap_us), 1).otherwise(0)
    return df.withColumn(
        "session_idx",
        (F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1
         ).cast("long"))


def session_stats(df: DataFrame, key_col: str, ts_col: str,
                  gap_minutes: float = 30.0,
                  order_col: str | None = None) -> DataFrame:
    """Per-session rollup: (key, session_idx, n_events, t_start, t_end)."""
    s = sessionize(df, key_col, ts_col, gap_minutes, order_col)
    return (s.groupBy(key_col, "session_idx")
             .agg(F.count("*").alias("n_events"),
                  F.min(ts_col).alias("t_start"),
                  F.max(ts_col).alias("t_end")))


def retention_cohorts(df: DataFrame, key_col: str, ts_col: str,
                      bucket_us: int = 604_800_000_000) -> DataFrame:
    """Cohort retention matrix — the classic activity-analytics rollup:
    users bucketed by their first-seen period (``cohort_week``), counted
    in every later period they were active in (``age_weeks`` = periods
    since the cohort period). ``bucket_us`` is the period length in
    exact integer microseconds (default one week).

    Scale shape: one distinct on (key, period) — the only corpus-sized
    shuffle, keyed by the pair so map-side partial dedup absorbs
    per-user repetition; a combining min per key for the cohort; a join
    keyed by the user; a final combining count per (cohort, age) cell.
    The period index is ``floor(epoch_us / float(bucket_us))`` — one
    exact-integer-input DOUBLE division (the shared day-bucket
    spelling; exact for epochs below 2^53 µs ≈ year 2255) — and every
    value after it is an exact integer, so an oracle replaying the
    same float spelling matches bit-for-bit. Respelling either side as
    integer division would desync the pair — keep both on the float
    spelling.
    """
    if bucket_us <= 0:
        raise ValueError(f"bucket_us must be positive, got {bucket_us}")
    epoch = F.lit("1970-01-01 00:00:00").cast(
        df.schema[ts_col].dataType.simpleString())
    tus = F.timestamp_diff("MICROSECOND", epoch, F.col(ts_col))
    wk = F.floor(tus / F.lit(float(bucket_us))).cast("long")
    uw = df.select(F.col(key_col), wk.alias("__wk__")).distinct()
    cohort = uw.groupBy(key_col).agg(F.min("__wk__").alias("cohort_week"))
    return (uw.join(cohort, key_col)
              .groupBy("cohort_week",
                       (F.col("__wk__") - F.col("cohort_week"))
                       .alias("age_weeks"))
              # (key, period) is distinct, so plain count == distinct users
              .agg(F.count("*").alias("n_users")))


def peak_bucket(df: DataFrame, group_cols: list[str],
                bucket: F.Column, bucket_name: str = "peak_bucket") -> DataFrame:
    """Per-group busiest time bucket — "when is this cell/host/zone at
    its peak": count rows per (group, bucket), then ONE combining
    struct-max per group picks the bucket with the largest count
    (lexicographic (n, bucket) order — ties break on the LARGER bucket
    value, deterministically). The latest_capture argmax-without-a-window
    shape: partial aggregation absorbs hot groups; no window, no
    collect.

    ``bucket`` is any integer-valued Column (e.g. hour-of-day spelled
    as ``floor(epoch_us / 3.6e9) % 24`` — UTC-exact, engine-agnostic).
    Returns (group..., <bucket_name>, n_peak).
    """
    if not group_cols:
        raise ValueError("peak_bucket needs at least one group column")
    cnt = (df.select(*group_cols, bucket.alias("__b__"))
             .groupBy(*group_cols, "__b__")
             .agg(F.count("*").alias("__n__")))
    best = F.max(F.struct(F.col("__n__"), F.col("__b__")))
    return (cnt.groupBy(*group_cols).agg(best.alias("__best__"))
               .select(*group_cols,
                       F.col("__best__.__b__").alias(bucket_name),
                       F.col("__best__.__n__").alias("n_peak")))

"""AS-OF join — match each left row to the nearest right row at-or-before
(or at-or-after) its time, per key.

Reference: DuckDB's ASOF JOIN, which the reference inherits through its
embedded engine and documents as a first-class recipe
(tests/sqllogic/sdb/pg/site_docs/cookbook/sql_features/asof_join.test).

Spark-first design — NOT a join at all: tag both inputs, union them, and
run one `last(payload, ignorenulls=True)` window over (key, time). That is
a single shuffle on the `by` key followed by a linear scan per partition —
the shape that survives 100 TB event streams, where an inequality join
would either BNLJ (quadratic) or need range-bucketing gymnastics. Skewed
keys degrade to a single partition's sort, not a cross product.

Tie semantics match DuckDB: ``backward`` takes the LARGEST right time <=
left time (inclusive), ``forward`` the SMALLEST right time >= left time.
Right rows carrying identical (by, time) should be pre-aggregated by the
caller (DuckDB's ASOF picks an arbitrary one — we refuse to be
nondeterministic by construction instead) — or pass ``tie_break`` to fold
that dedup into the window's sort: the caller's groupBy costs a second
wide shuffle keyed (by, time) on top of the window's shuffle keyed (by);
the tie-break costs nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    how: str = "left",
    suffix: str = "_r",
    tie_break: str | None = None,
) -> DataFrame:
    """For every left row, attach the right row whose ``on`` value is the
    closest at-or-before it (``backward``) / at-or-after it (``forward``),
    within the same ``by`` key.

    - ``on``: time/order column name present in both inputs (numeric,
      date, or timestamp — both sides must agree).
    - ``tolerance``: max allowed |left.on - right.on| as a Column literal
      in the column's native difference unit (for timestamps: an interval
      via F.expr("INTERVAL ..."), or seconds if numeric). Matches outside
      it become NULL (left join) / are dropped (inner).
    - right's non-``by``, non-``on`` columns come back suffixed; its ``on``
      comes back as ``on + suffix``.
    - ``tie_break``: name of a right value column; among right rows with
      identical (by, on), the row with the LARGEST tie_break value wins
      (NULLs lose), deterministically. Equivalent to the caller
      pre-aggregating right per (by, on) with max_by — but expressed as
      extra sort keys inside the window's existing shuffle, so the whole
      join stays ONE shuffle on ``by`` instead of two.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    by = by or []

    val_cols = [c for c in right.columns if c not in (*by, on)]
    payload = F.struct(
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in val_cols],
    )
    ptype = right.select(payload.alias("p")).schema["p"].dataType
    lcols = [c for c in left.columns if c not in by]
    lstruct = F.struct(*[F.col(c) for c in lcols])
    ltype = left.select(lstruct.alias("l")).schema["l"].dataType

    # NULL times never match (DuckDB ASOF semantics): right rows with a
    # NULL `on` are excluded from the union entirely — otherwise they sort
    # first under asc and become a bogus running-last payload — and left
    # rows with a NULL `on` are forced to sort BEFORE every right row
    # (nulls_first in both directions) so their running last() is NULL:
    # unmatched under left join, dropped under inner.
    unioned = left.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(1).alias("__is_left"),
        lstruct.alias("__l"),
        F.lit(None).cast(ptype).alias("__p"),
    ).unionByName(right.where(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(ltype).alias("__l"),
        payload.alias("__p"),
    ))

    # backward: ascending time, right-before-left at equal time, so the
    # running last(right payload) at a left row is the largest right time
    # <= its own (inclusive). forward is the mirror image.
    t_ord = (F.col("__t").asc_nulls_first() if direction == "backward"
             else F.col("__t").desc_nulls_first())
    # tie_break ascending with NULLs first: among right rows tied on
    # (by, __t) the max-tie_break row sorts LAST, so the running last()
    # at any subsequent left row sees exactly it. Left rows still sort
    # after every tied right row via __is_left, so the extra key never
    # affects left/right interleaving.
    tie_ord = ([F.col(f"__p.{tie_break}{suffix}").asc_nulls_first()]
               if tie_break is not None else [])
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(t_ord, F.col("__is_left").asc(), *tie_ord)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        "__m", F.last("__p", ignorenulls=True).over(w)
    ).where(F.col("__is_left") == 1)

    if tolerance is not None:
        lo, hi = (F.col(f"__m.{on}{suffix}"), F.col("__t"))
        if direction == "forward":
            lo, hi = hi, lo
        matched = matched.withColumn(
            "__m", F.when(hi - lo <= tolerance, F.col("__m")))
    if how == "inner":
        matched = matched.where(F.col("__m").isNotNull())

    return matched.select(
        *by,
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__m.{f}").alias(f)
          for f in [f"{on}{suffix}", *[f"{c}{suffix}" for c in val_cols]]],
    )


def _as_long(col: Column, dtype: str) -> Column:
    """Numeric view of an ordering column for bucket arithmetic."""
    if dtype == "date":
        return F.unix_date(col)
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp_ltz"))
    return col.cast("double")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: list[str] | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Interval containment join: each point row matched to every interval
    row with ``start <= point <= end`` (BETWEEN semantics), optionally
    within the same ``by`` key.

    Spark-first scale shape: Spark executes a bare inequality join as a
    broadcast-nested-loop — quadratic once neither side is tiny. Bucketing
    makes it an EQUI-join: each interval is replicated into every
    bucket-of-width-w it touches (sequence(floor(s/w), floor(e/w)) — at
    most len/w + 1 copies), a point lives in exactly one bucket, and the
    bucket equi-join + exact BETWEEN filter covers every match exactly
    once — one shuffle, no dedup, no cross product. bucket_width defaults
    to the observed max interval length (~≤2 copies per interval; one
    scalar aggregate, the same build-time statistic discipline as the IVF
    layout); set it nearer the MEDIAN length when a few outlier intervals
    would otherwise pick a needlessly coarse width.

    ``bucket_width`` units are the column's NATIVE difference unit: DAYS
    for date columns, MICROSECONDS for timestamp columns, the raw value
    for numeric columns. A width below 1 native unit is clamped up to 1
    (sub-unit buckets cannot split rows that compare equal). Passing a
    seconds-based width for a timestamp column would make buckets ~1e6×
    too fine — multiply by 1_000_000 instead.
    """
    by = by or []
    ptype = dict(points.dtypes)[point_col]
    p_long = _as_long(F.col(point_col), ptype)
    s_long = _as_long(F.col(start_col), dict(intervals.dtypes)[start_col])
    e_long = _as_long(F.col(end_col), dict(intervals.dtypes)[end_col])

    if bucket_width is None:
        bucket_width = (
            intervals.agg(F.max(e_long - s_long)).first()[0] or 1
        )
    w = float(max(bucket_width, 1))

    pts = points.withColumn(
        "__b", F.floor(p_long / F.lit(w)).cast("long"))
    ivs = intervals.withColumn(
        "__b",
        F.explode(F.sequence(F.floor(s_long / F.lit(w)).cast("long"),
                             F.floor(e_long / F.lit(w)).cast("long"))))

    overlap = [c for c in points.columns if c in intervals.columns
               and c not in by]
    if overlap:
        raise ValueError(
            f"rename overlapping non-key columns before joining: {overlap}")
    cond = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col))
    return (
        pts.join(ivs, [*by, "__b"], "inner")
        .where(cond)
        .drop("__b")
    )

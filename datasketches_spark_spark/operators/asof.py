"""As-of (nearest-event) join — the time-series join Spark lacks natively.

For each left row, find the single right row with the greatest event time
at-or-before it (``direction="backward"``, the default), the least
at-or-after it (``"forward"``), or the smallest absolute gap
(``"nearest"``, backward winning ties — pandas ``merge_asof`` parity),
per join key. The classic use in a
training-data pipeline is attribution: join every interaction event to the
most recent prior signup / model-version rollout / config change.

No reference implementation exists (the reference is sketch functions
only; `/root/reference` contains no joins — SURVEY.md §2b). DuckDB's
native ``ASOF JOIN`` provides the correctness oracle.

Design — one shuffle, zero range explosion:

    left  rows tagged side=1, right rows tagged side=0 and their payload
    packed into one struct  ->  UNION  ->  window over (key) ordered by
    (ts, side, payload)  ->  last(payload, ignorenulls=True) up to the
    current row  ->  keep side=1 rows.

This is the sort-merge formulation: a single hash partition on the join
key plus an in-partition sort, exactly the cost of a regular sort-merge
join, independent of how many right rows precede each left row. The naive
alternative (range join + min/max over matches) explodes to |L|·|R| pairs
per key before aggregating; this never materializes a pair at all. At
100 TB the shuffle carries each input row once; skewed keys fall to AQE
skew-split handling like any sort-merge join.

Equal timestamps: a right row at exactly the left row's timestamp DOES
match in backward mode (ties sort side=0 first) and in forward mode
(ties sort side=1 first under the descending-side order) — matching
DuckDB's inclusive ``l.ts >= r.ts`` / ``l.ts <= r.ts`` semantics. Among
several right rows sharing (key, ts), the payload struct itself is the
final sort key, so the winner is deterministic (the struct-greatest row
in backward mode, struct-least in forward mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MATCH = "__asof_pay"
_SIDE = "__asof_side"
_TS = "__asof_ts"
_LEFT = "__asof_left"


def asof_join(left: DataFrame, right: DataFrame, on,
              left_ts: str = "ts", right_ts: str | None = None,
              right_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance_us: int | None = None,
              suffix: str = "_matched") -> DataFrame:
    """As-of join ``left`` to ``right`` on key columns ``on``.

    Returns every left row plus, when a match exists, the matched right
    row's ``right_ts`` (as ``{right_ts}{suffix}``) and ``right_cols``
    (suffixed on name clash with a left column). Unmatched left rows keep
    NULLs — LEFT OUTER semantics, like DuckDB's ``ASOF LEFT JOIN``.

    ``tolerance_us`` (microseconds) drops matches farther than the bound
    from the left timestamp, turning them back into NULLs.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    for c in keys:
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"join key {c!r} missing from an input")

    matched_ts = right_ts + suffix
    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in right_cols}

    lhs = left.select(
        *[F.col(c) for c in keys],
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias(_LEFT),
        F.lit(None).cast(
            right.select(
                F.struct(F.col(right_ts).alias(matched_ts),
                         *[F.col(c).alias(out_names[c])
                           for c in right_cols]).alias(_MATCH)
            ).schema[_MATCH].dataType).alias(_MATCH))
    # NULL-timestamp right rows can never satisfy ts <= / >= (SQL
    # comparison semantics, matching DuckDB ASOF) — but they would sort
    # to the partition edge and get picked up by the window scan, so drop
    # them here. NULL-timestamp LEFT rows also sort to the edge, where
    # their frame holds no (remaining) right rows: they emit unmatched.
    rhs = right.where(F.col(right_ts).isNotNull()).select(
        *[F.col(c) for c in keys],
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(lhs.schema[_LEFT].dataType).alias(_LEFT),
        F.struct(F.col(right_ts).alias(matched_ts),
                 *[F.col(c).alias(out_names[c])
                   for c in right_cols]).alias(_MATCH))

    both = lhs.unionByName(rhs)
    if direction == "nearest":
        # ONE ascending sort serves both scans: backward = last payload
        # up to the current row; forward = first payload after it. A
        # right row at the exact left timestamp sorts before the left
        # row (side asc), so it arrives through the BACKWARD leg with
        # gap 0 — which is also the tie-break (backward wins equal
        # gaps, like pandas merge_asof nearest).
        order = [F.col(_TS).asc(), F.col(_SIDE).asc(), F.col(_MATCH).asc()]
        wb = (Window.partitionBy(*keys).orderBy(*order)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wf = (Window.partitionBy(*keys).orderBy(*order)
              .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        back = F.last(_MATCH, ignorenulls=True).over(wb)
        fwd = F.first(_MATCH, ignorenulls=True).over(wf)

        def gap_us(pay):
            return F.abs(
                F.unix_micros(F.col(_TS).cast("timestamp"))
                - F.unix_micros(pay[matched_ts].cast("timestamp")))

        nearer_fwd = (back.isNull()
                      | (fwd.isNotNull() & (gap_us(fwd) < gap_us(back))))
        # NULL-ts left rows sort to the partition start where the forward
        # scan sees every right row — they must stay unmatched (SQL
        # comparison semantics, as in the other directions).
        pay = F.when(F.col(_TS).isNotNull(),
                     F.when(nearer_fwd, fwd).otherwise(back))
        res = (both.withColumn(_MATCH, pay)
               .where(F.col(_SIDE) == 1))
        if tolerance_us is not None:
            res = res.withColumn(
                _MATCH,
                F.when(gap_us(F.col(_MATCH)) <= F.lit(int(tolerance_us)),
                       F.col(_MATCH)))
        return res.select(
            *[F.col(c) if c in keys else F.col(f"{_LEFT}.{c}").alias(c)
              for c in left.columns],
            F.col(f"{_MATCH}.{matched_ts}").alias(matched_ts),
            *[F.col(f"{_MATCH}.{out_names[c]}").alias(out_names[c])
              for c in right_cols])
    if direction == "backward":
        # right(0) sorts before left(1) at equal ts -> inclusive match;
        # the window scans backward for the last non-null right payload.
        w = (Window.partitionBy(*keys)
             .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc(),
                      F.col(_MATCH).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pay = F.last(_MATCH, ignorenulls=True).over(w)
    else:
        # descending scan: left rows see right rows at >= their ts; side
        # stays ASC so a right row at the exact left ts still precedes it
        # in the scan (inclusive match, like backward).
        # desc_nulls_first keeps NULL-ts left rows at the partition edge
        # (empty frame -> unmatched), mirroring the ascending default.
        w = (Window.partitionBy(*keys)
             .orderBy(F.col(_TS).desc_nulls_first(), F.col(_SIDE).asc(),
                      F.col(_MATCH).desc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pay = F.last(_MATCH, ignorenulls=True).over(w)

    res = (both.withColumn(_MATCH, pay)
           .where(F.col(_SIDE) == 1))
    if tolerance_us is not None:
        # unix_micros rejects TIMESTAMP_NTZ; the NTZ->TZ cast shifts both
        # sides by the same session-timezone offset, so the gap is exact.
        gap = F.abs(
            F.unix_micros(F.col(_TS).cast("timestamp")) -
            F.unix_micros(F.col(_MATCH)[matched_ts].cast("timestamp")))
        res = res.withColumn(
            _MATCH, F.when(gap <= F.lit(int(tolerance_us)), F.col(_MATCH)))

    # key columns come from the union-level attributes (equal to the left
    # struct's fields on side=1 rows) so downstream groupBy/join on the
    # same keys reuses the window's hash partitioning instead of
    # re-shuffling.
    return res.select(
        *[F.col(c) if c in keys else F.col(f"{_LEFT}.{c}").alias(c)
          for c in left.columns],
        F.col(f"{_MATCH}.{matched_ts}").alias(matched_ts),
        *[F.col(f"{_MATCH}.{out_names[c]}").alias(out_names[c])
          for c in right_cols])

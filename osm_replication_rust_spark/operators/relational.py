"""Relational operators Spark lacks as built-ins, expressed set-based.

- ``asof_join``: for each left row, the latest right row at-or-before
  its timestamp within the same key (trade/quote style). Implemented
  with the union + last-observation-carried-forward window — one shuffle
  on (key), no range explosion, no per-group Python. (The pandas
  ``merge_asof``-in-``applyInPandas`` alternative shuffles the same data
  but pays the Arrow hop; this stays in Tungsten.)
- ``sessionize``: gap-based session ids per key (lag + conditional
  cumsum over an ordered window) — the batch analog of
  ``session_window`` in streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left rows annotated with the most recent right values at-or-before
    (``backward``) their timestamp, per key. Right columns come back
    null when no prior right row exists.

    Tie rule: a right row at exactly the same timestamp matches.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of implemented")
    l_tag = left.select(
        key,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left.columns).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        key,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    # right rows sort BEFORE left rows at equal _ts (so same-ts matches)
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        key,
        "_ts",
        "_is_left",
        "_lrow",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}") for c in value_cols],
    ).filter(F.col("_is_left") == 1)
    out_cols = [F.col("_lrow." + c).alias(c) for c in left.columns]
    out_cols += [F.col(f"_c_{c}").alias(f"right_{c}") for c in value_cols]
    return carried.select(*out_cols)


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign a per-key session id: a new session starts when the gap to
    the previous event exceeds ``gap_seconds``. Adds ``session_id``
    (1-based per key) — deterministic given (key, ts, tiebreak by all
    original order columns is the caller's concern)."""
    w = Window.partitionBy(key).orderBy(ts)
    gap = F.col(ts).cast("long") - F.lag(F.col(ts).cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )

"""Co-grouped Arrow processing: `df.groupBy(k).cogroup(other.groupBy(k))
.applyInPandas(...)` — the Spark API for per-key alignment of TWO tables
inside one pandas function, used here for a merge_asof as-of join.

Why it exists next to q33 (the pure-SQL union-sort as-of): some as-of
semantics (nearest-within-tolerance, backward+forward, per-key custom
tie-breaks) outgrow window expressions, and the escape hatch is pandas
per key group — Arrow-batched, never row-at-a-time. q113 implements the
SAME contract as q33 and shares its oracle, so the two execution
strategies cross-check each other exactly: SQL window form vs cogrouped
merge_asof form, one semantics.

Scale notes: cogroup shuffles BOTH tables once on the (uniform) user
key; each task sees one key group's pair of pandas frames — memory is
bounded by the largest single key's rows, the same bound the window
form's per-key sort has. At 100 TB the knob is key granularity, not the
operator: a hot key that breaks this breaks any per-key alignment and
calls for the q35 salting treatment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import QuerySpec
from ..plans.compat_queries import Q33_SQL
from ..tables import load_table

ASOF_SCHEMA = "event_id long, key long, asof_orderkey long"


def _merge_asof_group(edf, odf):
    import pandas as pd

    if len(edf) == 0:
        return pd.DataFrame({"event_id": [], "key": [], "asof_orderkey": []}).astype(
            {"event_id": "int64", "key": "int64", "asof_orderkey": "int64"}
        )
    edf = edf.sort_values("ts")
    edf["ts"] = edf["ts"].astype("datetime64[us]")
    # both frames carry the cogroup key column — drop one side or
    # merge_asof suffixes them into user_id_x/_y
    odf = odf.drop(columns=["user_id"])
    odf = odf.sort_values(["t", "o_orderkey"])  # same-date ties: last = max key
    odf["t"] = odf["t"].astype("datetime64[us]")
    merged = pd.merge_asof(
        edf, odf, left_on="ts", right_on="t", direction="backward"
    )  # allow_exact_matches=True default ⇒ t <= ts, matching q33's bound
    merged = merged[merged["o_orderkey"].notna()]
    out = merged[["event_id", "user_id", "o_orderkey"]].rename(
        columns={"user_id": "key", "o_orderkey": "asof_orderkey"}
    )
    return out.astype({"event_id": "int64", "key": "int64", "asof_orderkey": "int64"})


def q113_asof_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q33's as-of join through the cogrouped-pandas path (see module
    docstring); cites the identical tie-break contract: latest
    o_orderdate <= ts, largest o_orderkey among same-date orders."""
    events = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("t"),
            "o_orderkey",
        )
    )
    return (
        events.groupBy("user_id")
        .cogroup(orders.groupBy("user_id"))
        .applyInPandas(_merge_asof_group, schema=ASOF_SCHEMA)
        .orderBy("event_id")
    )


QUERIES = {
    "q113_asof_cogroup": QuerySpec(
        q113_asof_cogroup,
        Q33_SQL,
        "as-of join via cogrouped merge_asof (cross-checks q33's SQL form)",
    ),
}

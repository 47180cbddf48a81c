"""Grouped Arrow transforms (SURVEY §2.9: `applyInPandas` for grouped
transforms).

Pattern: per-key pandas function over Arrow-batched groups. Used when
the per-group logic genuinely needs dataframe-local code (model
scoring, scipy stats); for anything expressible as window/agg
expressions, the JVM path (see `zscore_expr`) is preferred — the test
suite asserts both give the same result, which is exactly the
discipline the engine applies before admitting Python to a hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ZSCORE_SCHEMA = "user_id bigint, event_id bigint, value double, zscore double"


def zscore_by_user_pandas(events: DataFrame) -> DataFrame:
    """Per-user z-score via applyInPandas (population std, ddof=0)."""

    def _z(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=0)
        mean = pdf["value"].mean()
        z = (pdf["value"] - mean) / std if std > 0 else pdf["value"] * 0.0
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "value": pdf["value"],
                "zscore": z,
            }
        )

    return events.select("user_id", "event_id", "value").groupBy("user_id").applyInPandas(
        _z, ZSCORE_SCHEMA
    )


def zscore_by_user_expr(events: DataFrame) -> DataFrame:
    """The JVM-expression twin: window mean/std (population)."""
    w = Window.partitionBy("user_id")
    mean = F.avg("value").over(w)
    std = F.stddev_pop("value").over(w)
    return events.select(
        "user_id",
        "event_id",
        "value",
        F.when(std > 0, (F.col("value") - mean) / std).otherwise(F.lit(0.0)).alias("zscore"),
    )

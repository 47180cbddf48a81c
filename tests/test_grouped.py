from __future__ import annotations

from real_time_database_monitoring_system_spark.operators import grouped
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_applyinpandas_zscore_matches_expression_twin(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    via_pandas = {
        r.event_id: r.zscore for r in grouped.zscore_by_user_pandas(events).collect()
    }
    via_expr = {
        r.event_id: r.zscore for r in grouped.zscore_by_user_expr(events).collect()
    }
    assert via_pandas.keys() == via_expr.keys()
    worst = max(abs(via_pandas[k] - via_expr[k]) for k in via_expr)
    assert worst < 1e-9, f"pandas vs expression z-score diverged: {worst}"

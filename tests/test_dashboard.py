from __future__ import annotations

from real_time_database_monitoring_system_spark.operators import monitoring
from real_time_database_monitoring_system_spark.operators.dashboard import snapshot_dashboard
from real_time_database_monitoring_system_spark.plans import checks
from real_time_database_monitoring_system_spark.sources.registry import load_table


def test_dashboard_panels_share_cached_scan(spark, sf_dir):
    panels = snapshot_dashboard(spark, sf_dir)
    try:
        # materialize the cache, then every panel reads InMemoryRelation
        panels["_events"].count()
        plan = checks.explain_str(panels["slow_sessions"], "simple")
        assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
        # cached results equal the uncached operator
        fresh = monitoring.slow_sessions(load_table(spark, sf_dir, "events"))
        assert sorted(map(tuple, panels["slow_sessions"].collect())) == sorted(
            map(tuple, fresh.collect())
        )
        assert panels["session_summary"].count() == 5
    finally:
        panels["_events"].unpersist()

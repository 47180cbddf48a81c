"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference `mdhasanmeraj/Real-time-database-monitoring-system`
(a Django + PostgreSQL monitoring dashboard), rebuilt Spark-first.

Layout
------
- ``session``    : SparkSession factory with scale-oriented defaults.
- ``sources``    : schema registry + parquet loaders for the test tables.
- ``functions``  : PostgreSQL-dialect scalar function layer (TO_CHAR,
                   AT TIME ZONE, pg_size_pretty, NULLIF, interval math).
- ``operators``  : the batch operator library — monitoring panels,
                   relational core (joins/aggs/windows/top-k), text
                   analysis, dedup (exact/MinHash/SimHash/Jaccard),
                   embedding similarity search, mutation emulation,
                   multimodal column plumbing.
- ``streaming``  : Structured Streaming layer (windowed rollups,
                   threshold alerting) replacing the reference's
                   poll-based refresh.
- ``plans``      : physical-plan assertions used by tests (pushdown,
                   broadcast, codegen checks).

Every operator is declared via the DataFrame API so Catalyst performs
predicate pushdown / column pruning / join selection; Python UDFs are
avoided in hot paths (Arrow-batched ``mapInPandas`` only for the
multimodal decode stub).
"""

__version__ = "0.1.0"

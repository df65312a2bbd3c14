"""station_data_ingestion_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
HCDP/station_data_ingestion pipeline (see SURVEY.md), built Spark-first:

- declarative DataFrame programs (Catalyst optimizes pruning/pushdown/joins)
- wide-matrix station CSV ingestion -> long observation table (unpivot)
- composite-key MERGE/upsert with create/replace/no-op/multi-match semantics
- pluggable chunked/retrying sinks via foreachPartition
- a broad batch query surface (joins, aggs, windows, set ops, rollup/cube)
- Structured Streaming ingestion with watermarks + windowed aggregation
- LLM-data-pipeline operators: dedup (exact/MinHash-LSH/SimHash/n-gram),
  similarity search over embeddings, text analysis, multimodal columns

Everything is designed for a 1000-executor / 100 TB deployment even though
tests run on local[32]: small dims broadcast, aggregations are partial
(map-side combine), filters and projections are pushed to the parquet scan,
and shuffle-heavy operators key on high-cardinality columns.
"""

from station_data_ingestion_spark.operators.merge import (  # noqa: F401
    MergeStats,
    RecordKeyError,
    merge_observations,
    merge_observed,
)
from station_data_ingestion_spark.plans.jobspec import (  # noqa: F401
    DataItemSpec,
    JobSpec,
)
from station_data_ingestion_spark.operators.matview import (  # noqa: F401
    MaterializedView,
)
from station_data_ingestion_spark.plans.catalog import Catalog  # noqa: F401
from station_data_ingestion_spark.plans.runner import run_job  # noqa: F401
from station_data_ingestion_spark.plans.snapshot_store import (  # noqa: F401
    SnapshotTable,
    read_table,
)
from station_data_ingestion_spark.session import get_spark  # noqa: F401
from station_data_ingestion_spark.sources.wide_csv import (  # noqa: F401
    ingest_wide_csv,
)

__version__ = "0.1.0"

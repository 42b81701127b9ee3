"""pumle_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference pipeline (gcpeixoto/PUMLE),
re-expressed Spark-first.

Canonical data model: long-format DataFrames keyed by (sim_hash, t, cell_id)
for simulation data; standard star-schema DataFrames for the analytics surface.
Dense tensors / CSV / npy / zarr are export sinks, never the compute
representation (SURVEY.md §7.0).

Subpackages
-----------
- ``session``    SparkSession factory tuned for large-scale batch analytics
- ``sources``    scans: JSON bronze states, GRDECL grids, INI configs, catalogs
- ``operators``  composite operators: scatter join, as-of join, dedup, ANN
- ``functions``  scalar function library: hashing, text analysis, physics
- ``plans``      plan inspection / optimization helpers
- ``streaming``  Structured Streaming ingestion of bronze / event data
"""

from pumle_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"

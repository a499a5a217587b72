"""PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
MapReduce course reference ``Xiaoyuan-Liu/MapReduce-Big-Data-Processing``
(surveyed in SURVEY.md), built idiomatically on the Spark DataFrame / SQL /
Catalyst stack. Nothing here is a port of Hadoop machinery: what the
reference hand-wires as chained MapReduce jobs (combiners, partitioners,
distributed-cache joins, sentinel records) is expressed as declarative
DataFrame plans and left to Catalyst/Tungsten/AQE to execute.

Layout:
    session     SparkSession factory with scale-aware defaults
    catalog     fixture-table schema registry + loaders
    sources     readers (text/kv/csv/json/parquet/jdbc/corpus-dir) and sinks
    functions   scalar/array helper column expressions
    operators   relational / text / window / graph / ml / dedup / similarity
    plans       multi-step pipeline helpers (iteration harness w/ checkpoints)
    streaming   Structured Streaming variants of the windowed operators
"""

from mapreduce_big_data_processing_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"

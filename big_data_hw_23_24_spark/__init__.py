"""big_data_hw_23_24_spark — a brand-new PySpark-native analytics engine.

Provides the query and data-processing capabilities of the
``Piero24/Big-Data_HW_23-24`` reference (University of Padua Big Data
Computing homeworks) re-expressed as idiomatic Spark DataFrame / SQL /
Structured Streaming pipelines, plus LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing) designed
for 100 TB scale.

Layout:
    session.py   SparkSession builder profiles (local test / cluster)
    sources/     readers for the testdata star schema + points CSV
    functions/   scalar/array helper expressions (distance, shingles, ...)
    operators/   the operator library (outliers, clustering, frequent
                 items, dedup, similarity, text stats, relational spine)
    streaming/   Structured Streaming harnesses (frequent items, distinct)
    plans/       plan-inspection helpers (explain checks used in tests)
"""

__version__ = "0.1.0"

"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference GraphRAG data pipeline
(pacoreyes/GraphRagPart1DataPipeline), re-expressed Spark-first.

Subpackages
-----------
- ``session``    : tuned SparkSession factory (AQE, Arrow, UTC).
- ``schemas``    : StructType constants mirroring the reference models
                   (reference: src/data_pipeline/models.py:16-202).
- ``sources``    : parquet/JSONL readers+writers, cache-table pattern.
- ``operators``  : relational operators (dedup, top-n, rollups, set ops).
- ``functions``  : scalar column functions (text normalize, ids, years).
- ``text``       : section split / chunking / analysis (lang-id, quality).
- ``dedup``      : exact / MinHash-LSH / SimHash / n-gram / embedding dedup.
- ``vector``     : brute-force + LSH-bucketed cosine top-k search.
- ``graph``      : nodes/edges graph tables, multi-hop, communities.
- ``streaming``  : event-time windows (tumbling/sliding/session) + watermark.
- ``multimodal`` : binary-column plumbing for image/audio payloads (stubs).
"""

__version__ = "0.1.0"

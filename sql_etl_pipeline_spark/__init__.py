"""sql_etl_pipeline_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
repo ``okeafeez/sql-etl-pipeline`` (see SURVEY.md): incremental extraction,
validation, idempotent upsert loading, and windowed analytics — rebuilt as

* a from-scratch transactional lake table format (``lakehouse``) over Parquet
  with an atomic JSON commit log, hash-bucket partitioning, additive schema
  evolution and snapshot-summary batch fencing (the role Iceberg plays in the
  north-star design; no lakehouse jars ship in this environment, so the
  format itself is part of the engine),
* a CDC apply pipeline (``cdc``): ordered change-event log -> salted,
  map-side-combining last-writer-wins dedup -> LSN-guarded MERGE into the
  lake table, exactly-once across replay via batch-id fencing,
* Structured Streaming micro-batch ingestion (``streaming``) with
  checkpointed offsets and crash-resume safety,
* a declarative validation rule engine (``validation``), the Spark analog of
  the reference's ``src/data_validator.py``,
* the reference's analytics query suite re-expressed as DataFrame pipelines
  (``analytics``), and
* large-scale training-data pipeline operators (``datapipe``): dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search, text statistics, multimodal column plumbing.

Everything is built on public PySpark 4.x APIs only.
"""

__version__ = "0.1.0"

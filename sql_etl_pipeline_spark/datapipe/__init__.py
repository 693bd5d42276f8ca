"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing — the large-scale corpus-curation layer the
100 TB engine needs beyond the reference's warehouse ETL."""

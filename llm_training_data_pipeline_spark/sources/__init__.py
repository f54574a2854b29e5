"""Sources & sinks (SURVEY.md §2.1): wiki-XML ingestion, parquet/JSONL IO."""

"""Table layer: snapshot/manifest parquet warehouse (Iceberg-semantics
fallback for environments without the Iceberg runtime jar) and the
reference event-directory reader."""

"""Sources & storage: synthetic corpus generator, docstore/posting-store
table IO (parquet-dir "Iceberg-style" tables with manifests — SURVEY.md
§1.4; real Iceberg needs a jar absent from this sandbox, so TableIO is a
thin seam over partitioned parquet)."""

"""Per-document RDF parsers (pure Python; run inside Arrow UDF workers)."""

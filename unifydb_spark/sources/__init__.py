"""Sources: connectors that expose external data as fact stores or
DataFrames (the reference's pluggable KV backends, src/unifydb/kvstore.clj,
reimagined as columnar-native virtual views)."""

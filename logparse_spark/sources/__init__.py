"""Sources: synthetic sequence datagen + table catalog (Parquet now,
Iceberg behind a capability probe)."""

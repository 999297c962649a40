"""Sources & sinks: table IO, snapshot-manifest commit protocol (Iceberg-style
atomic per-stage commits emulated over Parquet when no Iceberg jar is on the
classpath), and multimodal binary-column plumbing."""

"""Sources/sinks beyond parquet: the SQLite-shard bulk reader/writer that
lets a trough deployment migrate its existing segment files into (and out
of) the Spark-native engine.
"""

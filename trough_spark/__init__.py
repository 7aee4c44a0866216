"""trough_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of internetarchive/trough.

The reference (read-only at /root/reference) shards data into many small
SQLite files ("segments"), routes one SQL statement per HTTP request to one
shard, and manages replication/placement itself.  This engine re-expresses
that capability surface Spark-first:

- a segment        == one partition of a ``partitionBy("segment_id")`` table
- shard routing    == Catalyst static partition pruning
- the SQLite SELECT dialect per shard == Spark SQL after a small dialect shim
- write scripts    == batch DataFrame commits (partition-grained, atomic)
- replication / sync / locks / election  == deliberately dropped: the cluster
  filesystem and the Spark driver already provide those invariants
  (SURVEY.md §4.3).

Nothing here is a port: all planning and execution is delegated to
Catalyst/Tungsten, exactly as the reference delegated to SQLite
(reference: trough/read.py:63-67).
"""

from trough_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]

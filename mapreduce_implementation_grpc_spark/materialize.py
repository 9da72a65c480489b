"""Shared multi-consumer materialization with an executor-loss story.

Several operators compute a table once and feed it to two or more
downstream consumers (the sorted-shingle sets in the prefix join, the
distinct edge list under a wedge join, the `_ak`-keyed input of the
two-level ranking). Re-computing that lineage per consumer doubles the
dominant cost, so each site pins ONE materialization. Two mechanisms,
different failure semantics:

- ``reliable=False`` (default): ``localCheckpoint(eager=False)`` --
  partition blocks live on executors and the LINEAGE IS TRUNCATED.
  Fastest (no serialization to disk beyond the block store, no
  recompute on reuse), measured faster than persist at every site
  here. The cost on a REAL cluster: an executor lost mid-query takes
  its blocks with it and there is no lineage to rebuild them from --
  the job fails instead of recomputing. In single-JVM local mode the
  executor IS the driver, so the risk is zero.

- ``reliable=True``: ``persist(StorageLevel.DISK_ONLY)`` -- blocks on
  executor local disk WITH lineage retained, so a lost block is
  recomputed from upstream and the query survives executor loss. Costs
  serialization + disk and keeps the upstream plan alive. The right
  trade when the materialized table is corpus-sized executor state on
  a 1000-executor cluster (e.g. shingle sets over 100 TB, where SOME
  executor failing mid-query is the expected case, not the rare one).

The default can be flipped fleet-wide without touching call sites via
``SPARK_GRAFT_RELIABLE_MATERIALIZE=1`` (read per call, so a test can
monkeypatch the environment).

Deliberately NOT offered: ``DataFrame.checkpoint(reliable=True)`` to a
checkpoint dir. It writes to the (HDFS) checkpoint directory with an
extra job and is strictly slower than DISK_ONLY persist for
within-query reuse; its value is cross-query/cross-session restart,
which none of these sites need.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def materialize(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Pin one shared materialization of `df` for multiple consumers.

    `reliable=None` reads the SPARK_GRAFT_RELIABLE_MATERIALIZE env
    default ("1" -> True). Both paths are lazy: nothing runs until the
    first consumer acts. Results are identical either way -- only the
    executor-loss behavior differs (see module docstring).
    """
    if reliable is None:
        reliable = os.environ.get("SPARK_GRAFT_RELIABLE_MATERIALIZE", "") == "1"
    if reliable:
        return df.persist(StorageLevel.DISK_ONLY)
    return df.localCheckpoint(eager=False)

"""Plan cuts: the one place the engine materializes an intermediate.

Every multi-consumer intermediate in this engine is shared by CUTTING the
plan — ``localCheckpoint`` — because ``persist()`` under any lambda-bearing
plan (higher-order functions, UDFs) registers a cache entry that
CacheManager's canonicalized lookup can never match: the entry is created
but never filled or read, and every consumer silently recomputes the whole
upstream chain (measured r15; ``tests/test_plan_quality.py`` gates the
class).  ``localCheckpoint`` shares by RDD identity, which canonicalization
cannot defeat.

Resilience trade-off (stated per the r15 verdict): ``localCheckpoint``
TRUNCATES lineage and stores blocks on executors only, so a block lost
with its executor is unrecoverable — the job FAILS with a missing-block
SparkException rather than recomputing.  On a single-process `local[n]`
master this is moot (executor death == driver death).  On a cluster it is
usually still the right default: rerunning an occasionally-failed job
beats paying 2x the dominant compute on EVERY run.  Fault-sensitive
cluster runs can flip the mechanism without touching call sites:

- ``SPARK_GRAFT_CUT_MODE=local`` (default) — ``df.localCheckpoint(eager)``.
- ``SPARK_GRAFT_CUT_MODE=reliable`` — ``df.checkpoint(eager)`` to the
  durable checkpoint directory, surviving executor loss.  The directory
  must be set, either by the application via ``sc.setCheckpointDir`` or
  through ``SPARK_GRAFT_CHECKPOINT_DIR``; a reliable cut with no
  directory raises immediately with instructions rather than failing
  deep inside Spark.  Cost: each cut's rows are written to (and re-read
  from) durable storage, and plain ``checkpoint`` recomputes the cut's
  RDD once more than ``localCheckpoint`` does unless it is also cached —
  that is the price of durability, pay it only when reruns are dearer.

Unknown mode values fall back to ``local`` (a typo must not change
query semantics or crash query construction — same policy as the LSH
materialize-threshold env parse).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_VALID_MODES = ("local", "reliable")


def _mode() -> str:
    m = os.environ.get("SPARK_GRAFT_CUT_MODE", "local").strip().lower()
    return m if m in _VALID_MODES else "local"


def cut(df: DataFrame, eager: bool = False) -> DataFrame:
    """Materialize ``df`` as a shared, lineage-cut intermediate.

    ``eager=False`` defers execution to the first action (letting
    independent cuts be submitted concurrently from driver threads);
    ``eager=True`` materializes now.  See the module docstring for the
    mechanism and the cluster-resilience knob.
    """
    if _mode() == "reliable":
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            ckdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
            if not ckdir:
                raise RuntimeError(
                    "SPARK_GRAFT_CUT_MODE=reliable needs a durable checkpoint "
                    "directory: call sc.setCheckpointDir(...) or set "
                    "SPARK_GRAFT_CHECKPOINT_DIR"
                )
            sc.setCheckpointDir(ckdir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)

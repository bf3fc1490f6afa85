"""Query-result cache: results table keyed by (stage, params_hash).

Re-expresses the reference's merged-result cache — Query.java:795-824
caches finished query results under a canonical query id and
QueryController.java:233-299 dedups in-flight identical queries — as a
batch-engine artifact store:

* key = (stage name, sha256 of the canonically-JSON-encoded params);
* value = the result DataFrame, checkpointed as parquet;
* a result becomes visible only when its ``_COMMITTED`` marker lands
  (write to a temp dir, atomic rename, then marker) — a killed writer
  never publishes a half-written result, and two concurrent identical
  computations resolve to one winner (the loser's rename fails or is
  discarded), which is the batch analog of the in-flight dedup;
* ``get_or_compute`` returns the cached parquet WITHOUT recomputing when
  the key exists (tests assert no recompute via a side-effect counter).

Storage layout mirrors ccspark.checkpoint (local-filesystem semantics;
same deployment caveat documented there).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MARKER = "_COMMITTED"


def params_hash(params: dict) -> str:
    """Canonical hash of a params dict (sorted keys, JSON-encoded)."""
    blob = json.dumps(params, sort_keys=True, separators=(",", ":"), default=str)
    return hashlib.sha256(blob.encode("utf-8")).hexdigest()[:32]


class ResultCache:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str, phash: str) -> str:
        return os.path.join(self.root, stage, phash)

    def lookup(self, stage: str, params: dict) -> DataFrame | None:
        """Committed cached result for (stage, params), or None."""
        d = self._dir(stage, params_hash(params))
        if os.path.exists(os.path.join(d, _MARKER)):
            return self.spark.read.parquet(os.path.join(d, "data"))
        return None

    def put(self, stage: str, params: dict, df: DataFrame) -> DataFrame:
        """Materialize ``df`` under the cache key (atomic publish)."""
        d = self._dir(stage, params_hash(params))
        tmp = d + ".tmp-" + uuid.uuid4().hex[:8]
        os.makedirs(tmp, exist_ok=True)
        df.write.mode("overwrite").parquet(os.path.join(tmp, "data"))
        try:
            os.rename(tmp, d)  # atomic on POSIX; fails if a winner exists
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            if not os.path.exists(os.path.join(d, _MARKER)):
                # The incumbent is an orphan: a writer crashed after the
                # rename but before its marker landed.  Its data dir is
                # complete (rename happens only after the parquet write
                # finished), so reclaim it by writing the marker instead
                # of leaving the key permanently uncommitted.
                if os.path.exists(os.path.join(d, "data", "_SUCCESS")):
                    self._write_marker(d, params)
                else:
                    # incomplete orphan (shouldn't happen: rename follows a
                    # finished write) — evict and retry once with our result
                    shutil.rmtree(d, ignore_errors=True)
                    return self.put(stage, params, df)
        else:
            self._write_marker(d, params)
        return self.spark.read.parquet(os.path.join(d, "data"))

    def _write_marker(self, d: str, params: dict) -> None:
        with open(os.path.join(d, _MARKER), "w", encoding="utf-8") as fh:
            fh.write(params_hash(params))

    def get_or_compute(
        self, stage: str, params: dict, compute: Callable[[], DataFrame]
    ) -> DataFrame:
        """Cached result if committed, else compute + publish + return."""
        cached = self.lookup(stage, params)
        if cached is not None:
            return cached
        return self.put(stage, params, compute())

    def invalidate(self, stage: str, params: dict | None = None) -> None:
        """Drop one key, or a whole stage when params is None."""
        d = os.path.join(self.root, stage) if params is None else self._dir(stage, params_hash(params))
        shutil.rmtree(d, ignore_errors=True)

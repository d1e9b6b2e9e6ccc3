"""Versioned, atomically-committed parquet state table — the
transactional semantics SURVEY §8 left open (delta-spark is not in
this container; this is the minimal subset of a table format's commit
protocol that the reference's db.json semantics actually need,
cf. `dom-storage` write-through at etl.js:14-19).

Layout:

    root/
      v00000001/...parquet files...
      v00000002/...
      _manifest.json        <- single source of truth

Commit protocol: write the new version DIRECTORY first (never touched
again afterwards), then publish it by atomically replacing
``_manifest.json`` (write temp + ``os.replace``, atomic on POSIX).
Readers resolve the manifest and only ever scan a published,
immutable directory, so:

- a crashed writer leaves an orphan directory, never a torn table;
- concurrent readers see the old version until the instant of
  publish (snapshot isolation at directory granularity);
- every committed version stays readable -> time travel for free,
  until ``vacuum`` reclaims unpublished/old versions.

This is deliberately single-writer (like the reference's one-process
ETL). Multi-writer needs a log of commits with conflict detection —
that is the part a real table format adds.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from trello_github_etl_spark.plans.upserts import merge_state

MANIFEST = "_manifest.json"


@dataclass
class CommitInfo:
    version: int
    op: str
    n_rows: int
    ts: float


class VersionedStateStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def _read_manifest(self) -> dict:
        try:
            with open(self._manifest_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"current": 0, "history": []}

    def _publish(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path())  # the atomic commit point

    # -- API ---------------------------------------------------------
    def latest_version(self) -> int:
        return self._read_manifest()["current"]

    def history(self) -> list[CommitInfo]:
        return [CommitInfo(**h) for h in self._read_manifest()["history"]]

    def _dir(self, version: int) -> str:
        return os.path.join(self.root, f"v{version:08d}")

    def commit(self, df: DataFrame, op: str = "overwrite") -> int:
        """Write ``df`` as the next version and publish it."""
        m = self._read_manifest()
        version = m["current"] + 1
        path = self._dir(version)
        df.write.mode("errorifexists").parquet(path)
        n = df.sparkSession.read.parquet(path).count()
        m["current"] = version
        m["history"].append(
            {"version": version, "op": op, "n_rows": n, "ts": time.time()}
        )
        self._publish(m)
        return version

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Latest snapshot, or time-travel to any committed version."""
        m = self._read_manifest()
        v = m["current"] if version is None else version
        if v == 0:
            raise ValueError("state store has no committed version")
        committed = {h["version"] for h in m["history"]}
        if v not in committed:
            raise ValueError(f"version {v} was never committed")
        return spark.read.parquet(self._dir(v))

    def merge(self, applied: DataFrame, key: str = "entity_id") -> int:
        """MERGE: applied rows replace matching keys, everything else
        survives; the result is the next published version."""
        spark = applied.sparkSession
        state = self.read(spark)
        return self.commit(merge_state(state, applied, key), op="merge")

    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop unpublished orphans and all but the last ``keep_last``
        committed versions (rewrites history accordingly). Returns the
        removed version numbers."""
        import shutil

        m = self._read_manifest()
        keep = {
            h["version"] for h in m["history"][-keep_last:]
        } | {m["current"]}
        removed = []
        for name in sorted(os.listdir(self.root)):
            if not name.startswith("v") or name == MANIFEST:
                continue
            try:
                v = int(name[1:])
            except ValueError:
                continue
            if v not in keep:
                shutil.rmtree(os.path.join(self.root, name))
                removed.append(v)
        m["history"] = [h for h in m["history"] if h["version"] in keep]
        self._publish(m)
        return removed

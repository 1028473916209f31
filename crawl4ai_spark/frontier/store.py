"""WaveStore — atomic per-wave checkpoints of the crawl state.

The reference checkpoints BFS state as an in-memory dict snapshot
(``crawl4ai/deep_crawling/bfs_strategy.py:275-299`` resume_state /
export); the north rule upgrades that to "every frontier iteration
checkpoints frontier, seen-filter shards, and per-partition lineage +
metrics so a killed job resumes exactly".

Design — append-only tables + commit markers (an Iceberg-shaped protocol
over plain parquet, since no Iceberg runtime ships in this sandbox; on a
real cluster each ``write`` becomes ``writeTo(...).append()`` and the
marker becomes the Iceberg snapshot commit):

    store/
      tables/<name>/wave=K/  ← parquet dir (Spark _SUCCESS inside)
      _commits/wave-K.json   ← atomic marker (tmp + rename), written only
                               after every table of wave K is on disk

Tables are **append-only deltas** keyed by wave:
  results        one row per attempted URL (fetched / robots-denied / missing)
  frontier_delta URLs first discovered at wave K (unique by url_fp globally)
  seen_bloom     bloom shard generation built from wave K's frontier_delta
  host_state     full (small) politeness-state snapshot as of wave K
  metrics        one row per wave: stage counts + wall time
  lineage        per-partition row counts for results + discoveries

Recovery invariant: a reader only ever sees waves with commit markers;
a crashed wave K leaves orphan parquet dirs that the re-run of wave K
overwrites (mode=overwrite keyed by wave id ⇒ idempotent exactly-once).

Derived state (no in-place updates anywhere):
  seen(K)    = union of frontier_delta[0..K] keys
  pending(K) = seen(K) − results[0..K].url_fp
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

COMMIT_DIR = "_commits"
TABLES_DIR = "tables"
STAGING_DIR = "staging"


class WaveStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self._pending: dict[int, dict[str, int]] = {}
        os.makedirs(os.path.join(root, COMMIT_DIR), exist_ok=True)

    def recover(self) -> None:
        """Writer-side crash recovery: staging dirs left by a killed run
        are garbage (their wave will be rewritten) — reclaim the disk.
        Called by run_crawl at start; read-only consumers must NOT call
        this (it would race a live writer's in-flight wave)."""
        import shutil

        shutil.rmtree(os.path.join(self.root, STAGING_DIR), ignore_errors=True)

    # ── commit protocol ──────────────────────────────────────────────

    def _table_path(self, name: str, wave: int) -> str:
        return os.path.join(self.root, TABLES_DIR, name, f"wave={wave}")

    def _staging_path(self, name: str, wave: int) -> str:
        # outside the tables tree, so Spark's file readers (batch AND
        # streaming) over a table dir never see in-flight bytes: a wave's
        # tables reach their final path only via the atomic rename in
        # commit(). This makes `spark.readStream` over a table dir
        # marker-consistent without any filtering — uncommitted waves
        # simply aren't there yet.
        return os.path.join(self.root, STAGING_DIR, name, f"wave={wave}")

    def _marker_path(self, wave: int) -> str:
        return os.path.join(self.root, COMMIT_DIR, f"wave-{wave}.json")

    @staticmethod
    def _footer_row_count(path: str) -> int:
        """Row count from parquet footer metadata — no Spark job (the
        Iceberg-snapshot-metadata analog; previously a .count() job per
        table per wave, 6 jobs/wave of pure overhead)."""
        import pyarrow.parquet as pq

        total = 0
        for name in os.listdir(path):
            if name.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(path, name)).metadata.num_rows
        return total

    def write_table(self, name: str, wave: int, df: DataFrame) -> DataFrame:
        """Write one table of an in-flight wave to its staging dir;
        returns a reader over the written files (so later stages consume
        written bytes instead of recomputing the lineage). Not visible at
        the final path — to any reader — until commit() renames it."""
        path = self._staging_path(name, wave)
        df.write.mode("overwrite").parquet(path)
        self._pending.setdefault(wave, {})[name] = self._footer_row_count(path)
        return self.spark.read.parquet(path)

    def pending_count(self, wave: int, name: str) -> int:
        return self._pending.get(wave, {}).get(name, 0)

    def read_scalar(self, name: str, wave: int, column: str):
        """Driver-side read of a single-column value from a tiny written
        table (e.g. the one-row metrics delta) — pyarrow, no Spark job.
        Reads staging before commit, the final path after. Returns the
        first non-null value, or None if the table is empty."""
        import pyarrow.parquet as pq

        path = self._staging_path(name, wave)
        if not os.path.exists(path):
            path = self._table_path(name, wave)
        for fname in sorted(os.listdir(path)):
            if fname.endswith(".parquet"):
                col = pq.read_table(os.path.join(path, fname), columns=[column])[column]
                for v in col.to_pylist():
                    if v is not None:
                        return v
        return None

    def commit(self, wave: int, meta: dict | None = None) -> dict:
        """Atomically publish all tables written for this wave: rename
        each staging dir to its final ``wave=K`` path (atomic per table;
        a crash mid-commit leaves final dirs without a marker, which the
        re-run of wave K overwrites — same idempotent-replay invariant as
        before, now enforced at the file level too), then write the
        marker."""
        import shutil

        counts = self._pending.pop(wave, {})
        for name in counts:
            staging = self._staging_path(name, wave)
            final = self._table_path(name, wave)
            if os.path.exists(final):
                shutil.rmtree(final)  # orphan of a crashed commit replay
            os.makedirs(os.path.dirname(final), exist_ok=True)
            os.rename(staging, final)
        marker = {
            "wave": wave,
            "tables": sorted(counts),
            "counts": counts,
            "meta": meta or {},
            "committed_at": time.time(),
        }
        tmp = self._marker_path(wave) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(marker, fh)
        os.replace(tmp, self._marker_path(wave))  # atomic commit point
        return marker

    def write_wave(self, wave: int, tables: dict[str, DataFrame], meta: dict | None = None) -> dict:
        """Write all tables of one wave, then atomically commit the marker."""
        for name, df in tables.items():
            self.write_table(name, wave, df)
        return self.commit(wave, meta)

    def committed_waves(self) -> list[int]:
        out = []
        commit_dir = os.path.join(self.root, COMMIT_DIR)
        for name in os.listdir(commit_dir):
            if name.startswith("wave-") and name.endswith(".json"):
                out.append(int(name[len("wave-"):-len(".json")]))
        return sorted(out)

    def last_wave(self) -> int | None:
        waves = self.committed_waves()
        return waves[-1] if waves else None

    def marker(self, wave: int) -> dict:
        with open(self._marker_path(wave)) as fh:
            return json.load(fh)

    # ── readers (committed waves only) ───────────────────────────────

    def read_table(self, name: str, waves: list[int] | None = None) -> DataFrame | None:
        """Union of a table's committed wave deltas (None → all committed)."""
        if waves is None:
            waves = self.committed_waves()
        paths = [
            self._table_path(name, w)
            for w in waves
            if name in self.marker(w)["tables"] and self.marker(w)["counts"].get(name, 0) > 0
        ]
        paths = [p for p in paths if os.path.exists(p)]
        if not paths:
            return None
        # leaf wave=K dirs read as roots: no partition inference, so the
        # dir name never collides with the data wave column the wave-scoped
        # tables already carry (COLUMN_ALREADY_EXISTS warning otherwise)
        return self.spark.read.parquet(*paths)

    def read_latest(self, name: str) -> DataFrame | None:
        """Latest committed snapshot of a snapshot-style table (host_state)."""
        for wave in reversed(self.committed_waves()):
            m = self.marker(wave)
            if name in m["tables"] and m["counts"].get(name, 0) > 0:
                return self.spark.read.parquet(self._table_path(name, wave))
        return None

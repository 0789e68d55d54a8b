"""Iceberg-style snapshot/manifest layer over parquet.

No Iceberg runtime jar ships with this PySpark (SURVEY.md §7.2), so the
engine emulates the parts the north rule needs: snapshot commits, schema +
file manifests with per-file (≈ per-partition) row-count lineage, parent
chaining, and resume-from-checkpoint. The API is kept Catalog-shaped so a
real Iceberg catalog can be dropped in.

Layout:
    <root>/<table>/data/snap-<n>/part-*.parquet
    <root>/<table>/_snapshots/<n>.json        (written last = commit point)

A stage is "done" iff a committed snapshot exists whose ``stage_key``
(stage name + parameter fingerprint + parent snapshot id) matches — that
makes resumed pipelines idempotent even if parameters change upstream.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- paths ------------------------------------------------------------
    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _snapdir(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_snapshots")

    # ---- snapshot bookkeeping ----------------------------------------------
    def snapshots(self, name: str) -> list[dict]:
        d = self._snapdir(name)
        if not os.path.isdir(d):
            return []
        out = []
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".json"):
                try:
                    with open(os.path.join(d, fn)) as f:
                        out.append(json.load(f))
                except (json.JSONDecodeError, OSError):
                    continue  # torn write = uncommitted snapshot, ignored
        return sorted(out, key=lambda s: s["snapshot_id"])

    def latest_snapshot(self, name: str) -> dict | None:
        snaps = self.snapshots(name)
        return snaps[-1] if snaps else None

    def find_snapshot(self, name: str, stage_key: str) -> dict | None:
        for s in reversed(self.snapshots(name)):
            if s.get("stage_key") == stage_key:
                return s
        return None

    # ---- write / load -------------------------------------------------------
    def write_table(self, df: DataFrame, name: str, stage: str,
                    stage_key: str | None = None,
                    parent: dict | None = None,
                    metrics: dict | None = None) -> dict:
        snaps = self.snapshots(name)
        snap_id = (snaps[-1]["snapshot_id"] + 1) if snaps else 0
        data_dir = os.path.join(self._tdir(name), "data", f"snap-{snap_id}")
        t0 = time.perf_counter()
        df.write.mode("overwrite").parquet(data_dir)
        wall = time.perf_counter() - t0

        # per-file (= per-write-partition) row-count lineage from footers
        import pyarrow.parquet as pq
        files = []
        total = 0
        for fn in sorted(os.listdir(data_dir)):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(data_dir, fn)
            meta = pq.read_metadata(fp)
            files.append({"path": os.path.relpath(fp, self.root),
                          "rows": meta.num_rows,
                          "bytes": os.path.getsize(fp)})
            total += meta.num_rows

        manifest = {
            "snapshot_id": snap_id,
            "table": name,
            "stage": stage,
            "stage_key": stage_key or stage,
            "parent_snapshot": None if parent is None else parent["snapshot_id"],
            "parent_table": None if parent is None else parent["table"],
            "created_at": time.time(),
            "schema": df.schema.json(),
            "data_dir": os.path.relpath(data_dir, self.root),
            "files": files,
            "row_count": total,
            "write_wall_sec": wall,
            "metrics": metrics or {},
        }
        os.makedirs(self._snapdir(name), exist_ok=True)
        final = os.path.join(self._snapdir(name), f"{snap_id}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, final)  # atomic commit point
        return manifest

    def amend_metrics(self, name: str, snapshot_id: int,
                      metrics: dict) -> dict:
        """Merge metrics into an already-committed manifest (atomic rewrite).
        Used for wall-clock figures only known after the commit point —
        lineage fields are immutable."""
        final = os.path.join(self._snapdir(name), f"{snapshot_id}.json")
        with open(final) as f:
            manifest = json.load(f)
        manifest["metrics"].update(metrics)
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, final)
        return manifest

    def load_table(self, spark: SparkSession, name: str,
                   snapshot_id: int | None = None) -> DataFrame:
        if snapshot_id is None:
            snap = self.latest_snapshot(name)
        else:
            snap = next(s for s in self.snapshots(name)
                        if s["snapshot_id"] == snapshot_id)
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot for table {name}")
        return spark.read.parquet(os.path.join(self.root, snap["data_dir"]))

    def lineage(self, name: str) -> list[dict]:
        """Manifest chain newest→oldest following parent pointers."""
        chain = []
        snap = self.latest_snapshot(name)
        while snap is not None:
            chain.append(snap)
            pt, ps = snap.get("parent_table"), snap.get("parent_snapshot")
            if pt is None:
                break
            snap = next((s for s in self.snapshots(pt)
                         if s["snapshot_id"] == ps), None)
        return chain

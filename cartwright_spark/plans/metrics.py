"""Per-stage metrics: in-flight row counts via ``DataFrame.observe`` and a
wall-clock stage timer. Snapshot manifests (iceberg_lite) persist these,
giving the north-rule "row-count/latency metrics emitted per stage" without
any extra Spark jobs — Observation metrics ride the action that writes the
stage output.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class StageMetrics:
    """Collects {stage: {rows_in/rows_out/wall_sec/...}} across a pipeline run."""

    def __init__(self) -> None:
        self.stages: dict[str, dict] = {}
        self._observations: dict[str, Observation] = {}

    def observe(self, df: DataFrame, stage: str, suffix: str = "out") -> DataFrame:
        """Attach an Observation counting rows (+ null-free rows) flowing
        through this point of the plan; harvested after the next action."""
        obs = Observation(f"{stage}:{suffix}")
        self._observations[f"{stage}:{suffix}"] = obs
        return df.observe(obs, F.count(F.lit(1)).alias("rows"))

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.setdefault(name, {})["wall_sec"] = (
                time.perf_counter() - t0)

    def harvest(self) -> dict:
        """Pull observation values (only valid after their plans executed)."""
        for key, obs in list(self._observations.items()):
            stage, suffix = key.rsplit(":", 1)
            try:
                vals = obs.get
            except Exception:
                continue
            self.stages.setdefault(stage, {})[f"rows_{suffix}"] = vals.get("rows")
            del self._observations[key]
        return self.stages

    def as_dict(self) -> dict:
        self.harvest()
        return dict(self.stages)

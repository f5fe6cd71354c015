"""Thin named-stage pipeline runner.

The reference's Dagster asset DAG (definitions.py:20-31, deps via
function parameters) becomes a topologically-executed list of stages;
the per-asset Parquet handoffs become optional checkpoint tables (kept
— they are the test/verification seams; SURVEY §3.1). Catalyst replaces
the Polars lazy optimizer, so a stage that doesn't checkpoint simply
contributes its plan to downstream stages (whole-pipeline optimization
for free).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    deps: Sequence[str]
    fn: Callable[..., DataFrame]  # receives (spark, *dep_dataframes)
    checkpoint: str | None = None  # parquet path → materialize + re-scan


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)

    def stage(
        self,
        name: str,
        deps: Sequence[str] = (),
        checkpoint: str | None = None,
    ):
        def deco(fn: Callable[..., DataFrame]):
            self.stages.append(Stage(name, deps, fn, checkpoint))
            return fn

        return deco

    def run(self, spark: SparkSession) -> dict[str, DataFrame]:
        done: dict[str, DataFrame] = {}
        remaining = list(self.stages)
        while remaining:
            progressed = False
            for st in list(remaining):
                if all(d in done for d in st.deps):
                    out = st.fn(spark, *[done[d] for d in st.deps])
                    if st.checkpoint:
                        out.write.mode("overwrite").parquet(st.checkpoint)
                        out = spark.read.parquet(st.checkpoint)
                    done[st.name] = out
                    remaining.remove(st)
                    progressed = True
            if not progressed:
                missing = {d for st in remaining for d in st.deps} - set(done)
                raise ValueError(f"unresolvable stage deps: {sorted(missing)}")
        return done

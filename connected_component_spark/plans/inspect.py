"""Physical-plan inspection: make "explain and iterate" executable.

The scale rules this engine is built on (SURVEY.md §4, task brief)
are assertable properties of the formatted physical plan: filters
reach the parquet scan, dimension joins broadcast, no accidental
cartesian products, expressions stay inside whole-stage codegen.
``PlanSummary`` extracts them so tests (tests/test_plans.py) and
notebooks can assert plan quality instead of eyeballing explain
output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

__all__ = ["PlanSummary", "summarize_plan"]


@dataclass
class PlanSummary:
    """Counts and extracts from one formatted physical plan."""

    broadcast_hash_joins: int
    sort_merge_joins: int
    shuffled_hash_joins: int
    cartesian_products: int
    broadcast_nested_loop_joins: int
    exchanges: int
    wholestage_codegen_spans: int
    pushed_filters: list[str]
    partition_filters: list[str]
    read_schemas: list[str]
    python_evals: int

    @property
    def joins(self) -> int:
        return (
            self.broadcast_hash_joins
            + self.sort_merge_joins
            + self.shuffled_hash_joins
            + self.cartesian_products
            + self.broadcast_nested_loop_joins
        )

    def scan_columns(self) -> set[str]:
        """Union of column names materialized by all parquet scans —
        column-pruning checks assert this stays minimal."""
        cols: set[str] = set()
        for rs in self.read_schemas:
            cols.update(re.findall(r"(\w+):", rs))
        return cols


def summarize_plan(df: DataFrame) -> PlanSummary:
    """Summarize the (AQE-initial) formatted physical plan of ``df``."""
    jdf = df._jdf
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    text = jdf.queryExecution().explainString(mode)

    def op_count(name: str) -> int:
        # formatted mode renders each operator in the tree AND in a
        # "(N) Op" detail section — count unique detail ids
        ids = set(re.findall(rf"\((\d+)\) {name}\b", text))
        return len(ids) if ids else text.count(name)

    return PlanSummary(
        broadcast_hash_joins=op_count("BroadcastHashJoin"),
        sort_merge_joins=op_count("SortMergeJoin"),
        shuffled_hash_joins=op_count("ShuffledHashJoin"),
        cartesian_products=op_count("CartesianProduct"),
        broadcast_nested_loop_joins=op_count("BroadcastNestedLoopJoin"),
        # count operator detail headers "(N) Exchange" so the tree
        # rendering + detail section don't double-count
        exchanges=len(set(re.findall(r"\((\d+)\) Exchange", text))),
        # Spark 4 formatted mode annotates operators with
        # "[codegen id : N]" instead of WholeStageCodegen wrappers
        wholestage_codegen_spans=len(
            set(re.findall(r"codegen id : (\d+)", text))
            | set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
        ),
        pushed_filters=[
            line.split("PushedFilters:", 1)[1].strip()
            for line in text.splitlines()
            if "PushedFilters:" in line
        ],
        partition_filters=[
            line.split("PartitionFilters:", 1)[1].strip()
            for line in text.splitlines()
            if "PartitionFilters:" in line
        ],
        read_schemas=[
            line.split("ReadSchema:", 1)[1].strip()
            for line in text.splitlines()
            if "ReadSchema:" in line
        ],
        python_evals=text.count("BatchEvalPython") + text.count("ArrowEvalPython"),
    )

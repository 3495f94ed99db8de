"""Physical-plan audits.

The correctness gate proves queries return the right rows; these
checks prove they'd still be the *right plans* at 1000× the data:
filters pushed into the parquet scan, column pruning active, dim
joins broadcast, no row-at-a-time Python evaluation in the plan.
Tests (tests/test_plans.py) assert these properties per headline
query so a regression in plan shape fails CI, not the cluster.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanAudit:
    formatted: str
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    bnl_joins: int = 0
    has_python_eval: bool = False
    map_in_pandas: int = 0
    has_codegen: bool = False
    exchanges: int = 0

    def read_columns(self) -> set[str]:
        cols: set[str] = set()
        for schema in self.read_schemas:
            inner = schema.split("<", 1)[-1].rsplit(">", 1)[0]
            depth = 0
            name = ""
            for ch in inner:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                elif ch == "," and depth == 0:
                    if ":" in name:
                        cols.add(name.split(":")[0].strip())
                    name = ""
                    continue
                name += ch
            if ":" in name:
                cols.add(name.split(":")[0].strip())
        return cols


def audit_plan(df: DataFrame, execute: bool = False) -> PlanAudit:
    """``execute=True`` runs the query first so the audit sees the AQE
    *final* plan (runtime join strategy switches, coalesced partitions,
    codegen star markers — none of which exist pre-execution)."""
    if execute:
        # collect() executes THIS queryExecution (count() would build a
        # new one), so the audit then reads the AQE final plan
        df.collect()
    jvm = df._sc._jvm  # noqa: SLF001
    qe = df._jdf.queryExecution()  # noqa: SLF001
    plan = jvm.PythonSQLUtils.explainString(qe, "formatted")
    codegen_view = jvm.PythonSQLUtils.explainString(qe, "codegen")
    audit = PlanAudit(formatted=plan)
    audit.has_codegen = "WholeStageCodegen subtrees" in codegen_view and not (
        "Found 0 WholeStageCodegen" in codegen_view
    )
    for line in plan.splitlines():
        stripped = line.strip()
        if stripped.startswith("PushedFilters:"):
            payload = stripped.split(":", 1)[1].strip()
            if payload not in ("[]", ""):
                audit.pushed_filters.append(payload)
        if stripped.startswith("ReadSchema:"):
            audit.read_schemas.append(stripped.split(":", 1)[1].strip())
    # formatted mode prints each node twice (tree + "(n) Node" detail
    # header); count the detail headers so node counts are exact
    import re

    def _nodes(name: str) -> int:
        return len(re.findall(rf"^\(\d+\) {name}\b", plan, re.MULTILINE))

    audit.broadcast_joins = _nodes("BroadcastHashJoin")
    audit.sortmerge_joins = _nodes("SortMergeJoin")
    audit.bnl_joins = _nodes("BroadcastNestedLoopJoin")
    audit.has_python_eval = ("BatchEvalPython" in plan) or ("ArrowEvalPython" in plan)
    # Arrow-batched whole-partition Python (decode kernels) — tracked
    # separately from row-at-a-time eval; allowlisted per-query in tests
    audit.map_in_pandas = _nodes("MapInPandas")
    audit.exchanges = _nodes("Exchange") + _nodes("BroadcastExchange") + _nodes("AQEShuffleRead")
    return audit

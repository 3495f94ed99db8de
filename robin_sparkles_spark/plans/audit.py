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
    shuffled_hash_joins: int = 0
    bnl_joins: int = 0
    has_python_eval: bool = False
    map_in_pandas: int = 0
    has_codegen: bool = False
    exchanges: int = 0
    # Window nodes with an EMPTY partition spec whose input subtree
    # contains no limiting node — the "move everything to one task"
    # shape (VERDICT r5 ask #4). Each entry is the node's detail
    # header + Arguments line for the failure message.
    unbounded_global_windows: list[str] = field(default_factory=list)

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
    audit.shuffled_hash_joins = _nodes("ShuffledHashJoin")
    audit.bnl_joins = _nodes("BroadcastNestedLoopJoin")
    audit.has_python_eval = ("BatchEvalPython" in plan) or ("ArrowEvalPython" in plan)
    # Arrow-batched whole-partition Python (decode kernels) — tracked
    # separately from row-at-a-time eval; allowlisted per-query in tests
    audit.map_in_pandas = _nodes("MapInPandas")
    audit.exchanges = _nodes("Exchange") + _nodes("BroadcastExchange") + _nodes("AQEShuffleRead")
    audit.unbounded_global_windows = _find_unbounded_global_windows(plan)
    return audit


# Physical nodes that bound the row count flowing into a downstream
# unpartitioned Window: an explicit limit, Spark's top-K fusion, or
# the rank-limit rewrite (InferWindowGroupLimit keeps ≤ K rows per
# partition ahead of the final window — VERDICT r5 "not wrong" #3).
_LIMITING_NODES = (
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "WindowGroupLimit",
)


def _windowspec_is_unpartitioned(arguments: str) -> bool:
    """True iff the first ``windowspecdefinition(...)`` in a Window
    node's Arguments line has an EMPTY partition spec. The spec's
    printed args are ``part cols..., order cols..., frame`` where
    order cols carry a sort direction — so the spec is unpartitioned
    exactly when its first argument is the frame itself or carries
    ``ASC``/``DESC`` (partitioned-but-unordered specs print the bare
    partition column first, with no direction)."""
    marker = "windowspecdefinition("
    start = arguments.find(marker)
    if start < 0:
        return False
    inner = arguments[start + len(marker) :]
    frame_at = inner.find("specifiedwindowframe(")
    head = inner[: frame_at if frame_at >= 0 else len(inner)].strip().rstrip(",")
    if not head:
        return True  # windowspecdefinition(specifiedwindowframe(...))
    # first top-level comma-separated argument
    depth = 0
    first = head
    for i, ch in enumerate(head):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            first = head[:i]
            break
    return " ASC" in first or " DESC" in first


def _find_unbounded_global_windows(plan: str) -> list[str]:
    """Scan a *formatted* physical plan for Window nodes that (a) have
    an empty partition spec in their ``windowspecdefinition`` and (b)
    have no limiting node anywhere in their input subtree (located via
    tree-section indentation). Those are the plans that funnel the
    full input through ONE task."""
    import re

    lines = plan.splitlines()
    # detail section: "(n) Window" header, Arguments a couple lines on
    global_ids: dict[int, str] = {}
    for i, line in enumerate(lines):
        m = re.match(r"^\((\d+)\) Window\b", line.strip())
        if not m:
            continue
        for detail in lines[i + 1 : i + 6]:
            detail = detail.strip()
            if detail.startswith("Arguments:"):
                if _windowspec_is_unpartitioned(detail):
                    global_ids[int(m.group(1))] = f"{line.strip()} | {detail}"
                break
    if not global_ids:
        return []
    # tree section: indentation defines subtrees; a node's children are
    # the following deeper-indented lines
    tree: list[tuple[int, str, int]] = []  # (depth, node name, node id)
    for line in lines:
        m = re.match(r"^([:+\-*\s]*)([A-Za-z][\w .]*?)\s+\((\d+)\)\s*$", line)
        if not m:
            continue
        depth = len(m.group(1))
        tree.append((depth, m.group(2), int(m.group(3))))
    offenders: list[str] = []
    for idx, (depth, name, nid) in enumerate(tree):
        if nid not in global_ids:
            continue
        bounded = False
        for d2, name2, _ in tree[idx + 1 :]:
            if d2 <= depth:
                break
            if any(lim in name2 for lim in _LIMITING_NODES):
                bounded = True
                break
        if not bounded:
            offenders.append(global_ids[nid])
    return offenders

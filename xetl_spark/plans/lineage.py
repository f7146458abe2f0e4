"""Column-level lineage extraction from Catalyst analyzed plans.

``column_lineage(df)`` maps every output column of a DataFrame to the
set of ``(source, column)`` leaf columns it derives from — the
governance artifact (impact analysis, PII propagation, audit) that a
100 TB platform needs and that Spark computes internally but does not
expose. No execution happens: the walk is over the ANALYZED logical
plan, so lineage of an arbitrarily expensive query is free.

How: ``queryExecution().analyzed().toJSON()`` serializes the plan as a
flat preorder list of nodes; expression fields are themselves flat
preorder lists. Dependency extraction doesn't need the exact tree
shape — an output column depends on every AttributeReference anywhere
in its defining expression — so each named expression contributes
``alias exprId → {referenced exprIds}`` and leaves contribute
``exprId → (source, column)``. The transitive closure over those maps
is the lineage. Attributes keep their exprId through Filter / Join /
Sort / Union (Spark reuses the first child's ids), so pass-through
nodes need no handling.

Handled definition sites: Project/Aggregate/Window named expressions,
Generate (explode &c. — generator outputs depend on the generator's
inputs), Expand (cube/rollup/grouping sets — position-wise across
projections). Leaf labels come from the JVM relation when available
(parquet root paths, DSv2 table name), else the leaf's class name.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

# expression-list fields that define named outputs
_NAMED_EXPR_FIELDS = ("projectList", "aggregateExpressions", "windowExpressions")

ExprKey = tuple[int, str]  # (exprId.id, jvmId)


def _expr_key(node: dict[str, Any]) -> ExprKey | None:
    e = node.get("exprId")
    if not isinstance(e, dict):
        return None
    return (e.get("id"), e.get("jvmId"))


def _attr_refs(nodes: list[dict[str, Any]]) -> set[ExprKey]:
    """All AttributeReference keys in a flattened expression tree."""
    out = set()
    for n in nodes:
        if n.get("class", "").endswith(".AttributeReference"):
            k = _expr_key(n)
            if k:
                out.add(k)
    return out


def _as_expr_lists(field: Any) -> list[list[dict[str, Any]]]:
    """Normalize an expression field to a list of flattened trees."""
    if not isinstance(field, list) or not field:
        return []
    if isinstance(field[0], dict):  # single flattened tree
        return [field]  # type: ignore[list-item]
    return [t for t in field if isinstance(t, list) and t]


def _leaf_label(jvm_leaf: Any) -> str:
    """Best-effort human label for a leaf relation via py4j."""
    try:
        return str(jvm_leaf.relation().location().rootPaths().mkString(","))
    except Exception:
        pass
    try:
        return str(jvm_leaf.table().name())
    except Exception:
        pass
    try:
        return str(jvm_leaf.toString()).split("\n", 1)[0][:120]
    except Exception:
        return "unknown"


def column_lineage(df: DataFrame) -> dict[str, set[tuple[str, str]]]:
    """Output column name → {(source, source_column), ...}.

    Pure plan analysis — nothing is executed. Columns synthesized from
    literals only (no attribute inputs) map to an empty set.
    """
    qe = df._jdf.queryExecution()
    plan = qe.analyzed()
    nodes = json.loads(plan.toJSON())

    defs: dict[ExprKey, set[ExprKey]] = {}
    leaf_cols: dict[ExprKey, tuple[str, str]] = {}

    # leaf labels, matched to JSON leaves in preorder (collectLeaves is
    # left-to-right, as is the flattened JSON)
    jvm_leaves = plan.collectLeaves()
    labels = [_leaf_label(jvm_leaves.apply(i)) for i in range(jvm_leaves.size())]
    leaf_i = 0

    for node in nodes:
        cls = node.get("class", "")
        # named-expression definition sites
        for field in _NAMED_EXPR_FIELDS:
            for tree in _as_expr_lists(node.get(field)):
                root = tree[0]
                if root.get("class", "").endswith(".Alias"):
                    k = _expr_key(root)
                    if k:
                        defs[k] = _attr_refs(tree[1:])
        if cls.endswith(".Generate"):
            gen_deps: set[ExprKey] = set()
            for tree in _as_expr_lists(node.get("generator")):
                gen_deps |= _attr_refs(tree)
            for tree in _as_expr_lists(node.get("generatorOutput")):
                k = _expr_key(tree[0])
                if k:
                    defs[k] = set(gen_deps)
        if cls.endswith(".Expand"):
            out_attrs = [t[0] for t in _as_expr_lists(node.get("output"))]
            projections = node.get("projections") or []
            for i, attr in enumerate(out_attrs):
                k = _expr_key(attr)
                if not k:
                    continue
                deps: set[ExprKey] = set()
                for proj in projections:
                    trees = _as_expr_lists(proj)
                    if i < len(trees):
                        deps |= _attr_refs(trees[i])
                # grouping attrs keep their own ids; don't clobber leaves
                if k not in leaf_cols:
                    defs.setdefault(k, set()).update(deps - {k})
        # leaf relations: map output attrs to (label, name)
        if node.get("num-children", 0) == 0 and isinstance(node.get("output"), list):
            label = labels[leaf_i] if leaf_i < len(labels) else cls.rsplit(".", 1)[-1]
            leaf_i += 1
            for tree in _as_expr_lists(node["output"]):
                attr = tree[0]
                k = _expr_key(attr)
                if k and k not in leaf_cols:
                    leaf_cols[k] = (label, attr.get("name", "?"))

    def resolve(k: ExprKey, seen: frozenset[ExprKey] = frozenset()) -> set[tuple[str, str]]:
        if k in leaf_cols:
            return {leaf_cols[k]}
        if k in seen:
            return set()
        out: set[tuple[str, str]] = set()
        for dep in defs.get(k, ()):  # unknown ids resolve to nothing
            out |= resolve(dep, seen | {k})
        return out

    result: dict[str, set[tuple[str, str]]] = {}
    outputs = plan.output()
    for i in range(outputs.size()):
        a = outputs.apply(i)
        k = (a.exprId().id(), str(a.exprId().jvmId()))
        result[str(a.name())] = resolve(k)
    return result


def lineage_report(df: DataFrame) -> str:
    """Render lineage as stable, diff-friendly text (one line per
    output column, sources sorted)."""
    lines = []
    for col, srcs in column_lineage(df).items():
        rendered = ", ".join(f"{s}::{c}" for s, c in sorted(srcs)) or "<literal>"
        lines.append(f"{col} <- {rendered}")
    return "\n".join(lines)


def sensitive_columns(
    df: DataFrame, sensitive: set[str] | dict[str, set[str]]
) -> dict[str, set[tuple[str, str]]]:
    """Which output columns derive from sensitive source columns?

    ``sensitive`` is either a set of column names (matched in any
    source) or a mapping of source-label substring → column names.
    Returns {output_column: {(source, column) that tainted it}} for
    tainted outputs only — the PII-propagation check a governance
    gate runs before a sink stage, at zero execution cost.
    """
    lin = column_lineage(df)
    out: dict[str, set[tuple[str, str]]] = {}
    for col, srcs in lin.items():
        hits = set()
        for s, c in srcs:
            if isinstance(sensitive, dict):
                for label_part, cols in sensitive.items():
                    if label_part in s and c in cols:
                        hits.add((s, c))
            elif c in sensitive:
                hits.add((s, c))
        if hits:
            out[col] = hits
    return out

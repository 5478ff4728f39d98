"""Declarative filter documents → Column predicates.

The reference's Mongo connector accepts user filter documents and merges
them with the incremental filter, rejecting conflicts with the cursor
operators (reference sources/mongodb/helpers.py:98-120, 195-197,
628-647).  This module gives the engine the same declarative predicate
surface — a dict DSL that compiles to Catalyst Column expressions (and
therefore pushes down to any scan that supports it):

    {"age": {"$gte": 21, "$lt": 65}, "status": "active",
     "$or": [{"seg": "A"}, {"seg": "B"}]}

Also implements the projection include/exclude rules with key
preservation (helpers.py:122-157): exclusion projections may not drop the
primary key; inclusion projections always re-add it.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

_OPS = {
    "$eq": lambda c, v: c == v,
    "$ne": lambda c, v: c != v,
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
    "$in": lambda c, v: c.isin(list(v)),
    "$nin": lambda c, v: ~c.isin(list(v)),
    "$exists": lambda c, v: c.isNotNull() if v else c.isNull(),
    "$regex": lambda c, v: c.rlike(v),
}


def filter_doc_to_column(doc: dict[str, Any]) -> Column:
    """Compile a Mongo-style filter document to one Column predicate."""
    clauses: list[Column] = []
    for key, spec in doc.items():
        if key == "$or":
            clauses.append(reduce(lambda a, b: a | b, [filter_doc_to_column(d) for d in spec]))
        elif key == "$and":
            clauses.append(reduce(lambda a, b: a & b, [filter_doc_to_column(d) for d in spec]))
        elif key == "$nor":
            clauses.append(~reduce(lambda a, b: a | b, [filter_doc_to_column(d) for d in spec]))
        elif isinstance(spec, dict) and any(k.startswith("$") for k in spec):
            col = F.col(key)
            for op, v in spec.items():
                if op not in _OPS:
                    raise ValueError(f"unsupported operator: {op}")
                clauses.append(_OPS[op](col, v))
        else:
            clauses.append(F.col(key) == spec)
    if not clauses:
        return F.lit(True)
    return reduce(lambda a, b: a & b, clauses)


def apply_filter_doc(
    df: DataFrame, doc: dict[str, Any], cursor_field: str | None = None
) -> DataFrame:
    """Filter by document; rejects user filters that touch the incremental
    cursor field with range operators (they would conflict with the
    engine-managed cursor window — reference helpers.py:628-647)."""
    if cursor_field and cursor_field in doc:
        spec = doc[cursor_field]
        if isinstance(spec, dict) and any(k in ("$gt", "$gte", "$lt", "$lte") for k in spec):
            raise ValueError(
                f"user filter on cursor field {cursor_field!r} conflicts with incremental window"
            )
    return df.filter(filter_doc_to_column(doc))


def apply_projection(
    df: DataFrame,
    include: Sequence[str] | None = None,
    exclude: Sequence[str] | None = None,
    key_cols: Sequence[str] = (),
) -> DataFrame:
    """Mongo-style projection with key preservation: include-mode always
    keeps keys; exclude-mode refuses to drop them."""
    if include and exclude:
        raise ValueError("projection cannot both include and exclude")
    if include:
        cols = list(dict.fromkeys([*key_cols, *include]))
        return df.select(*[c for c in cols if c in df.columns])
    if exclude:
        dropped_keys = set(exclude) & set(key_cols)
        if dropped_keys:
            raise ValueError(f"cannot exclude key columns: {sorted(dropped_keys)}")
        return df.drop(*[c for c in exclude if c in df.columns])
    return df

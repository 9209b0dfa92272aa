"""Output-ordering propagation and sort elision.

Capability analog of the reference's ordering-equivalence framework
(datafusion/physical-expr/src/equivalence/ordering.rs:55 consumed by
EnforceSorting): every sort-based TPU operator EMITS rows in a known order —
sorted-path aggregation and DISTINCT produce groups ascending by key
(nulls last), joins emit matched rows in probe order, windows scatter back
to input order — so a SortExec whose specs are already satisfied by its
input's ordering is pure waste (one full sort of the result set) and is
elided at physical planning time; with a fetch it degrades to a LimitExec.

Orderings are (schema_index, asc, nulls_first) prefixes over each
operator's OWN output schema.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from ..expr import nodes as E
from . import plan as P

Ordering = List[Tuple[int, bool, bool]]


def output_ordering(p: P.PhysicalPlan) -> Optional[Ordering]:
    from .planner import AliasExec
    from .window import WindowExec

    if isinstance(p, P.AggregateExec):
        if not p.group_exprs:
            return None  # single row: trivially sorted, nothing to elide
        # both the sorted path and the dense path emit groups ascending by
        # key (codes are order-preserving), NULL keys last
        return [(j, True, False) for j in range(len(p.group_exprs))]
    if isinstance(p, P.DistinctExec):
        return [(j, True, False) for j in range(len(p.schema))]
    if isinstance(p, P.SortExec):
        out: Ordering = []
        for s in p.specs:
            idx = _column_index(s.expr, p.schema)
            if idx is None:
                break
            out.append((idx, s.asc, s.nulls_first))
        return out or None
    if isinstance(p, (P.FilterExec, P.LimitExec, P.CompactExec, AliasExec)):
        return output_ordering(p.input)
    if isinstance(p, P.UnnestExec):
        inner = output_ordering(p.input)
        if inner is None:
            return None
        n = len(p.input.schema)
        return [o for o in inner if o[0] < n] or None
    if isinstance(p, WindowExec):
        # windows scatter results back to input row order (window.py)
        inner = output_ordering(p.input)
        if inner is None:
            return None
        n = len(p.input.schema)
        return [o for o in inner if o[0] < n] or None
    from .window import WindowTopKExec

    if isinstance(p, WindowTopKExec):
        # emits survivors in (partition asc nulls-last, order spec) order;
        # the rank column may be claimed BEFORE the order keys because equal
        # ranks imply equal order-key values (peers), so
        # [pcols, rank, ocols] is an emitted ordering too — and it matches
        # the common `QUALIFY rn <= k ... ORDER BY g, rn` tail
        w = p.wfn
        out: Ordering = []
        for pe in w.partition_by:
            idx = _column_index(pe, p.input.schema)
            if idx is None:
                return out or None
            out.append((idx, True, False))
        out.append((len(p.schema) - 1, True, False))
        for s in w.order_by:
            idx = _column_index(s.expr, p.input.schema)
            if idx is None:
                return out or None
            out.append((idx, s.asc, s.nulls_first))
        return out or None
    if isinstance(p, P.ProjectionExec):
        inner = output_ordering(p.input)
        if inner is None:
            return None
        # map input field index -> first output position projecting it
        mapping = {}
        for j, e in enumerate(p.exprs):
            base = e.expr if isinstance(e, E.Alias) else e
            if isinstance(base, E.Column):
                idx = _find(p.input.schema, base.flat_name)
                if idx is not None and idx not in mapping:
                    mapping[idx] = j
        out = []
        for idx, asc, nf in inner:
            if idx not in mapping:
                break
            out.append((mapping[idx], asc, nf))
        return out or None
    if isinstance(p, P.JoinExec):
        from ..logical.plan import JoinType

        if p.join_type in (JoinType.LEFT_SEMI, JoinType.LEFT_ANTI):
            # output = masked probe relation, order untouched
            return output_ordering(p.left)
        if p.join_type in (JoinType.RIGHT_SEMI, JoinType.RIGHT_ANTI):
            return output_ordering(p.right)
        if p.join_type is JoinType.INNER:
            # matched block is emitted sorted by probe row index (residual
            # filters only mask), so the probe (left) side's ordering
            # survives non-strictly
            return output_ordering(p.left)
        return None
    return None


def _find(schema, name: str) -> Optional[int]:
    try:
        return schema.find(name)
    except Exception:  # ambiguous
        return None


def _column_index(e: E.Expr, schema) -> Optional[int]:
    base = e.expr if isinstance(e, E.Alias) else e
    if not isinstance(base, E.Column):
        return None
    return _find(schema, base.flat_name)


def ordering_satisfies(p: P.PhysicalPlan,
                       specs: Sequence[E.SortSpec]) -> bool:
    """True when p's output is already ordered by `specs` (prefix match on
    column positions, direction, and null placement)."""
    have = output_ordering(p)
    if have is None or len(specs) > len(have):
        return False
    for (idx, asc, nf), s in zip(have, specs):
        sidx = _column_index(s.expr, p.schema)
        if sidx is None or sidx != idx or s.asc != asc or s.nulls_first != nf:
            return False
    return True

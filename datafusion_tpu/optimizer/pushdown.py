"""Filter pushdown, cross-join elimination, projection (column) pruning,
limit-into-sort.

Capability analogs of the reference rules PushDownFilter, EliminateCrossJoin,
ExtractEquijoinPredicate, OptimizeProjections and PushDownLimit
(datafusion/optimizer/src/{push_down_filter,eliminate_cross_join,
extract_equijoin_predicate,optimize_projections,push_down_limit}.rs).

Column pruning matters doubly here: pruned columns never get
dictionary-encoded or shipped to HBM (TPC-H comment columns are ~40% of bytes).
"""
from __future__ import annotations

from typing import List, Optional, Set, Tuple

from ..common.errors import PlanError
from ..expr import nodes as E
from ..logical import plan as L
from .decorrelate import conjoin, split_conjuncts


def _resolvable(e: E.Expr, schema) -> bool:
    """Every column in e resolves (unambiguously) against schema."""
    for c in E.collect_columns(e):
        try:
            if schema.find(c.flat_name) is None:
                return False
        except PlanError:
            return False
    return True


def push_filters_rule(plan: L.LogicalPlan, max_passes: int = 5) -> L.LogicalPlan:
    for _ in range(max_passes):
        new = L.transform_down(plan, _push_filter_node)
        if new.display() == plan.display():
            return new
        plan = new
    return plan


def _split_disjuncts(e: E.Expr) -> List[E.Expr]:
    if isinstance(e, E.BinaryOp) and e.op is E.Op.OR:
        return _split_disjuncts(e.left) + _split_disjuncts(e.right)
    return [e]


def _factor_or(conjunct: E.Expr) -> List[E.Expr]:
    """(a AND x1) OR (a AND x2) -> a AND (x1 OR x2): hoist conjuncts common
    to every OR branch (reference: EliminateCrossJoin's join-key recovery
    from ORs, optimizer/src/eliminate_cross_join.rs). Critical for TPC-H Q19
    where the equi-join key hides inside each OR branch."""
    branches = _split_disjuncts(conjunct)
    if len(branches) < 2:
        return [conjunct]
    branch_sets = [split_conjuncts(b) for b in branches]
    common = [c for c in branch_sets[0]
              if all(any(c == d for d in bs) for bs in branch_sets[1:])]
    if not common:
        return [conjunct]
    residuals = []
    for bs in branch_sets:
        rest = [c for c in bs if not any(c == k for k in common)]
        residuals.append(conjoin(rest) or E.lit(True))
    out = list(common)
    disj = None
    for r in residuals:
        disj = r if disj is None else E.BinaryOp(E.Op.OR, disj, r)
    if disj is not None and not (isinstance(disj, E.Literal) and disj.value is True):
        out.append(disj)
    return out


def _push_filter_node(plan: L.LogicalPlan) -> L.LogicalPlan:
    if not isinstance(plan, L.Filter):
        return plan
    child = plan.input
    conjuncts = []
    for c in split_conjuncts(plan.predicate):
        conjuncts.extend(_factor_or(c))

    if isinstance(child, L.Filter):
        return L.Filter(child.input, conjoin(conjuncts + split_conjuncts(child.predicate)))

    if isinstance(child, L.Join):
        return _push_into_join(conjuncts, child)

    if isinstance(child, L.TableScan):
        # sink conjuncts into the scan: providers use them for file/row-group
        # pruning (inexact), and the physical planner re-applies each as an
        # exact FilterExec above the scan (reference: push_down_filter.rs
        # TableScan case + TableProviderFilterPushDown::Inexact)
        merged = list(child.filters)
        merged.extend(c for c in conjuncts if c not in merged)
        return L.TableScan(child.name, child.source, child.projection,
                           merged, child.alias)

    if isinstance(child, L.SubqueryAlias):
        # cannot cross alias boundary without re-qualification; leave.
        return plan
    if isinstance(child, (L.Sort, L.Limit)):
        if isinstance(child, L.Limit) or child.fetch is not None:
            return plan  # filter past a limit changes results
        return L.Sort(L.Filter(child.input, plan.predicate), child.sort_specs, child.fetch)
    return plan


def _push_into_join(conjuncts: List[E.Expr], join: L.Join) -> L.LogicalPlan:
    jt = join.join_type
    lsch, rsch = join.left.schema, join.right.schema
    left_ok = jt in (L.JoinType.INNER, L.JoinType.CROSS, L.JoinType.LEFT,
                     L.JoinType.LEFT_SEMI, L.JoinType.LEFT_ANTI)
    right_ok = jt in (L.JoinType.INNER, L.JoinType.CROSS, L.JoinType.RIGHT)
    can_equi = jt in (L.JoinType.INNER, L.JoinType.CROSS)

    to_left: List[E.Expr] = []
    to_right: List[E.Expr] = []
    new_on: List[Tuple[E.Expr, E.Expr]] = list(join.on)
    stay: List[E.Expr] = []

    for c in conjuncts:
        if left_ok and _resolvable(c, lsch):
            to_left.append(c)
        elif right_ok and _resolvable(c, rsch):
            to_right.append(c)
        elif can_equi and isinstance(c, E.BinaryOp) and c.op is E.Op.EQ:
            l, r = c.left, c.right
            if _resolvable(l, lsch) and _resolvable(r, rsch):
                new_on.append((l, r))
            elif _resolvable(r, lsch) and _resolvable(l, rsch):
                new_on.append((r, l))
            else:
                stay.append(c)
        else:
            stay.append(c)

    if not (to_left or to_right or len(new_on) > len(join.on)):
        pred = conjoin(conjuncts)
        return L.Filter(join, pred)

    left = L.Filter(join.left, conjoin(to_left)) if to_left else join.left
    right = L.Filter(join.right, conjoin(to_right)) if to_right else join.right
    njt = L.JoinType.INNER if (jt is L.JoinType.CROSS and new_on) else jt
    new_join = L.Join(left, right, new_on, njt, join.filter)
    pred = conjoin(stay)
    return L.Filter(new_join, pred) if pred is not None else new_join


# ---------------------------------------------------------------------------
# projection pruning
# ---------------------------------------------------------------------------


def projection_pruning_rule(plan: L.LogicalPlan) -> L.LogicalPlan:
    refs: Set[Tuple[Optional[str], str]] = set()

    def collect(p: L.LogicalPlan):
        for e in p.exprs():
            for c in E.collect_columns(e):
                refs.add((c.qualifier, c.cname))
        for k in p.children():
            collect(k)

    collect(plan)
    for f in plan.schema.fields:
        refs.add((f.qualifier, f.name))

    protected: Set[int] = set()

    def mark_protected(p: L.LogicalPlan, protect: bool):
        if isinstance(p, (L.Projection, L.Aggregate)):
            protect = False
        if isinstance(p, (L.Distinct, L.Union)):
            protect = True
        if isinstance(p, L.TableScan) and protect:
            protected.add(id(p))
        for k in p.children():
            mark_protected(k, protect)

    mark_protected(plan, False)

    def rewrite(p: L.LogicalPlan) -> L.LogicalPlan:
        if isinstance(p, L.TableScan) and id(p) not in protected:
            base = p.source.schema()
            keep = []
            for f in base.fields:
                if (p.alias, f.name) in refs or (None, f.name) in refs:
                    keep.append(f.name)
            if not keep:
                keep = [base.fields[0].name]
            if p.projection is None and len(keep) < len(base.fields):
                return L.TableScan(p.name, p.source, keep, p.filters, p.alias)
        return p

    return L.transform_up(plan, rewrite)


def reorder_joins_rule(plan: L.LogicalPlan) -> L.LogicalPlan:
    """Reorder chains of INNER/CROSS joins so every step is connected by an
    equi-predicate when one exists (reference: EliminateCrossJoin,
    optimizer/src/eliminate_cross_join.rs). The written FROM order of e.g.
    TPC-H Q8/Q9 ('FROM part, supplier, lineitem, ...') otherwise produces a
    part x supplier cartesian product."""

    def rewrite(p: L.LogicalPlan) -> L.LogicalPlan:
        if not isinstance(p, L.Join) or p.join_type not in (L.JoinType.INNER, L.JoinType.CROSS):
            return p
        leaves: List[L.LogicalPlan] = []
        pairs: List[Tuple[E.Expr, E.Expr]] = []  # equi pairs (either direction)
        filters: List[E.Expr] = []

        def flatten(n: L.LogicalPlan):
            if isinstance(n, L.Join) and n.join_type in (L.JoinType.INNER, L.JoinType.CROSS):
                flatten(n.left)
                flatten(n.right)
                pairs.extend(n.on)
                if n.filter is not None:
                    filters.extend(split_conjuncts(n.filter))
            else:
                leaves.append(n)

        flatten(p)
        if len(leaves) <= 2:
            return p

        current = leaves[0]
        remaining = leaves[1:]
        unused_pairs = list(pairs)
        while remaining:
            chosen = None
            chosen_on: List[Tuple[E.Expr, E.Expr]] = []
            for leaf in remaining:
                on_here = []
                for (a, b) in unused_pairs:
                    if _resolvable(a, current.schema) and _resolvable(b, leaf.schema):
                        on_here.append((a, b))
                    elif _resolvable(b, current.schema) and _resolvable(a, leaf.schema):
                        on_here.append((b, a))
                if on_here:
                    chosen = leaf
                    chosen_on = on_here
                    break
            if chosen is None:  # genuinely unconnected: cross join
                chosen = remaining[0]
            remaining.remove(chosen)
            jt = L.JoinType.INNER if chosen_on else L.JoinType.CROSS
            current = L.Join(current, chosen, chosen_on, jt, None)
            for pr in chosen_on:
                for orig in list(unused_pairs):
                    if orig == pr or (orig[1], orig[0]) == pr:
                        unused_pairs.remove(orig)
                        break
        # anything left (pairs across >2 relations resolved late, residuals)
        extra = [E.BinaryOp(E.Op.EQ, a, b) for a, b in unused_pairs] + filters
        pred = conjoin(extra)
        return L.Filter(current, pred) if pred is not None else current

    return L.transform_up(plan, rewrite)


def limit_into_sort_rule(plan: L.LogicalPlan) -> L.LogicalPlan:
    def rewrite(p: L.LogicalPlan) -> L.LogicalPlan:
        if isinstance(p, L.Limit) and p.fetch is not None and isinstance(p.input, L.Sort):
            s = p.input
            fetch = p.skip + p.fetch
            if s.fetch is None or s.fetch > fetch:
                s = L.Sort(s.input, s.sort_specs, fetch)
            return L.Limit(s, p.skip, p.fetch) if p.skip else s if p.fetch == fetch else L.Limit(s, 0, p.fetch)
        return p

    return L.transform_up(plan, rewrite)

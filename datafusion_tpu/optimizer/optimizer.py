"""Logical optimizer driver.

Capability analog of the reference's Analyzer + Optimizer
(datafusion/optimizer/src/{analyzer/mod.rs:88, optimizer.rs:255}): a fixed
sequence of rewrite rules applied until fixpoint (bounded passes).  Rules are
plain functions LogicalPlan -> LogicalPlan."""
from __future__ import annotations

from typing import Callable, List

from ..expr import nodes as E
from ..logical import plan as L
from .simplify import fold_expr


def rewrite_exprs(plan: L.LogicalPlan, fn: Callable[[E.Expr], E.Expr]) -> L.LogicalPlan:
    """Apply an expression rewrite to every expression of one plan node."""
    if isinstance(plan, L.Projection):
        return L.Projection(plan.input, [fn(e) for e in plan.proj_exprs])
    if isinstance(plan, L.Filter):
        return L.Filter(plan.input, fn(plan.predicate))
    if isinstance(plan, L.Aggregate):
        return L.Aggregate(plan.input, [fn(e) for e in plan.group_exprs],
                           [fn(e) for e in plan.aggr_exprs])
    if isinstance(plan, L.Sort):
        specs = []
        for s in plan.sort_specs:
            ns = fn(s)
            specs.append(ns if isinstance(ns, E.SortSpec) else E.SortSpec(ns, s.asc, s.nulls_first))
        return L.Sort(plan.input, specs, plan.fetch)
    if isinstance(plan, L.Join):
        on = [(fn(l), fn(r)) for l, r in plan.on]
        filt = fn(plan.filter) if plan.filter is not None else None
        return L.Join(plan.left, plan.right, on, plan.join_type, filt)
    if isinstance(plan, L.Window):
        return L.Window(plan.input, [fn(e) for e in plan.window_exprs])
    if isinstance(plan, L.TableScan) and plan.filters:
        return L.TableScan(plan.name, plan.source, plan.projection,
                           [fn(f) for f in plan.filters], plan.alias)
    return plan


def simplify_rule(plan: L.LogicalPlan) -> L.LogicalPlan:
    return L.transform_up(plan, lambda p: rewrite_exprs(p, fold_expr))


def optimize(plan: L.LogicalPlan, catalog=None) -> L.LogicalPlan:
    from .decorrelate import decorrelate_rule
    from .dedup import dedup_rule
    from .pushdown import (eliminate_outer_joins_rule, limit_into_sort_rule,
                           or_implication_rule, projection_pruning_rule,
                           push_filters_rule, reorder_joins_rule)

    rules: List[Callable] = [
        simplify_rule,
        decorrelate_rule,
        simplify_rule,
        dedup_rule,  # unify sub-plans duplicated by subquery lifting (Q15)
        eliminate_outer_joins_rule,  # LEFT/RIGHT/FULL -> INNER under strict filters
        or_implication_rule,  # derive pushable per-column predicates (Q7/Q19)
        push_filters_rule,
        reorder_joins_rule,
        push_filters_rule,
        projection_pruning_rule,
        limit_into_sort_rule,
        dedup_rule,
    ]
    for rule in rules:
        plan = rule(plan)
    return plan

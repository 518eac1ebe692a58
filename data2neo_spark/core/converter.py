"""Converter — the two-pass schema-driven conversion pipeline.

Reference lifecycle (/root/reference/data2neo/core/converter.py:374-419):
pass 1 streams all resources through node supply-chains and commits nodes;
pass 2 re-streams the same resources through relationship chains so every
MATCH target exists. We keep the two-pass structure but each pass is a
DataFrame job:

  pass 1:  sources → per-rule selects → union → keyed last-writer-wins
           merge-agg → node table materialized (the barrier + checkpoint)
  pass 2:  sources ⋈ node table (per MATCH) → per-rule edge selects →
           union → keyed dedup-agg → edge table

No global write lock (reference converter.py:101-127 serializes merges);
merge semantics come from the aggregation itself, with a DETERMINISTIC
outcome (ordered by (source, row) sequence) — strictly stronger than the
reference's racy imap_unordered order (converter.py:338).

Parallelism knobs (num_workers/batch_size) exist for API familiarity but map
to Spark config; ``serialize=True`` coalesces to one partition for ordered
debugging runs (reference converter.py:394-419).
"""

from __future__ import annotations

import logging
import time
from typing import Dict, List, Optional, Tuple, Union

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import dynamic as dyn
from ..plans import lowering as L
from ..plans.rules import CompiledSchema
from ..schema.compiler import compile_schema
from ..sources.iterators import ResourceIterator
from ..core.types import union_wide
from .store import GraphStore

logger = logging.getLogger(__name__)

# below this many nodes the MATCH join broadcasts the node table
BROADCAST_NODE_LIMIT = 2_000_000


class Converter:
    """Compile a schema and convert typed resource streams into a GraphStore.

    Args:
        schema: conversion-schema DSL text (or a pre-compiled CompiledSchema).
        iterator: a ResourceIterator, or a dict {entity_type: DataFrame}, or
            a list of (entity_type, DataFrame) pairs (order = merge order).
        store: GraphStore to merge into (created in-memory if omitted).
        serialize: single-partition ordered mode (debugging; reference
            converter.py:394-419).
    """

    def __init__(
        self,
        schema: Union[str, CompiledSchema],
        iterator: Union[ResourceIterator, Dict[str, DataFrame], List[Tuple[str, DataFrame]]],
        store: Optional[GraphStore] = None,
        serialize: bool = False,
        num_workers: Optional[int] = None,
        batch_size: Optional[int] = None,
        run_id: int = 0,
        match_salt_buckets: int = 0,
    ) -> None:
        if serialize and num_workers is not None and num_workers > 1:
            raise ValueError(
                "Serialize and num_workers are mutually exclusive: can't run "
                "serialized with more than 1 worker"
            )
        self.schema = (
            schema if isinstance(schema, CompiledSchema) else compile_schema(schema)
        )
        self.iterator = iterator
        self.store = store
        self.serialize = serialize
        self._num_workers = num_workers
        self._batch_size = batch_size
        # run_id namespaces the deterministic sequence used for surrogate ids
        # of CREATE-mode elements: re-running the SAME run_id is idempotent
        # (checkpoint/resume semantics, north rule); appending genuinely new
        # batches should use a fresh run_id so parallel create-edges from
        # different runs never collide.
        self.run_id = run_id
        # A7: salt MATCH joins when the node table is too big to broadcast
        # and hub keys would otherwise produce straggler reducers
        self.match_salt_buckets = match_salt_buckets

    # --------------------------------------------------------------------

    @staticmethod
    def _plan_has_shuffle(df: DataFrame) -> bool:
        try:
            plan = df._jdf.queryExecution().toString()
        except Exception:
            logger.warning(
                "could not inspect the source plan for shuffles (API drift?); "
                "persisting defensively — row-id determinism across passes "
                "depends on it"
            )
            return True
        return "Exchange" in plan

    def _resolve_sources(self, spark: SparkSession) -> List[Tuple[str, DataFrame]]:
        it = self.iterator
        if isinstance(it, ResourceIterator):
            pairs = it.resolve(spark)
        elif isinstance(it, dict):
            pairs = list(it.items())
        else:
            pairs = list(it)
        out = []
        for i, (etype, df) in enumerate(pairs):
            if self.serialize:
                df = df.coalesce(1)
            df = df.withColumn(
                L.SEQ_SRC, F.lit(self.run_id * 1_000_000 + i).cast("long")
            ).withColumn(L.SEQ_ROW, F.monotonically_increasing_id())
            # a shuffle in the source lineage makes per-row sequence numbers
            # execution-dependent: pass 2 (and identifier references) could
            # recompute DIFFERENT row ids than pass 1 → dangling edges for
            # CREATE-mode elements. Persisting the sequenced source freezes
            # the ids (and saves the recompute). File scans — the 100TB hot
            # path — have no shuffle and stay unpersisted.
            rules = self.schema.entities.get(etype)
            if (
                rules is not None
                and rules.rel_rules
                and self._plan_has_shuffle(df)
            ):
                df = df.persist()
            out.append((etype, df))
        return out

    def __call__(
        self,
        spark: Optional[SparkSession] = None,
        skip_nodes: bool = False,
        skip_relationships: bool = False,
    ) -> GraphStore:
        return self.run(spark, skip_nodes=skip_nodes,
                        skip_relationships=skip_relationships)

    def run(
        self,
        spark: Optional[SparkSession] = None,
        skip_nodes: bool = False,
        skip_relationships: bool = False,
    ) -> GraphStore:
        if spark is None:
            spark = SparkSession.getActiveSession()
        if self.store is None:
            self.store = GraphStore(spark)
        store = self.store
        sources = self._resolve_sources(spark)

        # ---------------- pass 1: nodes --------------------------------
        t0 = time.time()
        node_parts: List[DataFrame] = []          # (df, needs_merge) pairs
        node_merge_flags: List[bool] = []
        dyn_edge_parts: List[DataFrame] = []
        enriched: List[Tuple[str, DataFrame]] = []
        for etype, df in sources:
            rules = self.schema.entities.get(etype)
            if rules is None:
                enriched.append((etype, df))
                continue
            current = df
            if etype in self.schema.node_mask and not skip_nodes:
                for rule in rules.node_rules:
                    if dyn.needs_dynamic(rule):
                        long_df = dyn.lower_node_rule_dynamic(current, rule).persist()
                        nodes_part, extra_edges = dyn.dynamic_to_canonical(long_df, rule)
                        node_parts.append(nodes_part)
                        # dynamic rules may merge via wrapper-assigned pks
                        node_merge_flags.append(True)
                        if extra_edges is not None:
                            dyn_edge_parts.append(extra_edges)
                    else:
                        node_parts.append(L.lower_node_rule(current, rule))
                        node_merge_flags.append(rule.primary_key is not None)
                    # preprocessor mutations persist for later rules + pass 2
                    current = L.propagate_sg_pre_mutations(current, rule.wrappers)
            # attach same-row identifier columns (supplies) for pass 2
            enriched_df = current
            for rule in rules.node_rules:
                enriched_df = L.attach_identifier_columns(enriched_df, rule)
            enriched.append((etype, enriched_df))

        if node_parts or store.nodes is not None:
            existing = None
            if store.nodes is not None:
                # previous graph contents participate with the lowest
                # sequence → new values overwrite (upsert, reference
                # test_end_to_end.py:55-68)
                existing = store.nodes.withColumn(
                    L.SEQ_SRC, F.lit(-1).cast("long")
                ).withColumn(L.SEQ_ROW, F.col(L.SEQ_ROW))
            if existing is None:
                # shuffle-avoidance: CREATE-mode rows (no pk) have unique
                # uids by construction — on a fresh store they bypass the
                # merge aggregation entirely (A2). Only merge-mode rows pay
                # the groupBy shuffle. With an existing store everything
                # participates (resume-idempotence dedup by uid).
                merge_parts = [p for p, m in zip(node_parts, node_merge_flags) if m]
                create_parts = [p for p, m in zip(node_parts, node_merge_flags) if not m]
                pieces = []
                if merge_parts:
                    pieces.append(
                        L.merge_elements(union_wide(merge_parts), L.NODE_META, L.UID)
                    )
                pieces.extend(create_parts)
                merged = union_wide(pieces)
            else:
                union = union_wide([existing] + node_parts)
                merged = L.merge_elements(union, L.NODE_META, L.UID)
            # the node-table materialization is the pass-1/pass-2 barrier —
            # required only when some MATCH matcher joins against it, or the
            # store persists to disk (checkpoint/resume). Identifier-only
            # schemas skip it: the whole conversion collapses into one
            # lazily-evaluated plan (no extra actions, no cache)
            needs_barrier = store.path is not None or any(
                (not m.is_identifier)
                for etype, _ in enriched
                if etype in self.schema.entities
                for rule in self.schema.entities[etype].rel_rules
                for m in (rule.from_match, rule.to_match)
            )
            if needs_barrier:
                # observe(): rows-in metric rides the materialization action
                # itself — no extra job (A6 counters, reference converter.py
                # :67-70 shared-mp.Value counters)
                from pyspark.sql import Observation

                obs = Observation()
                merged = merged.observe(obs, F.count(F.lit(1)).alias("rows"))
            store.set_nodes(merged, materialize=needs_barrier)
            if needs_barrier:
                store.log_stage(
                    "nodes",
                    n_nodes=obs.get.get("rows"),
                    wall_s=round(time.time() - t0, 3),
                )

        # ---------------- pass 2: relationships ------------------------
        t1 = time.time()
        broadcast_nodes = (
            store.nodes is not None
            and store.is_materialized
            and store.node_count <= BROADCAST_NODE_LIMIT
        )
        edge_parts: List[DataFrame] = list(dyn_edge_parts)
        edge_merge_flags: List[bool] = [True] * len(dyn_edge_parts)
        if skip_relationships:
            store.log_stage("run", wall_s=round(time.time() - t0, 3))
            return store
        for etype, df in enriched:
            rules = self.schema.entities.get(etype)
            if rules is None or etype not in self.schema.relationship_mask:
                continue
            for rule in rules.rel_rules:
                part = L.lower_rel_rule(
                    df, rule, store.nodes, broadcast_nodes,
                    self.match_salt_buckets,
                )
                part = dyn.apply_rel_postprocessors_dynamic(part, rule)
                edge_parts.append(part)
                edge_merge_flags.append(
                    rule.primary_key is not None or rule.ghost_primary_key
                )

        if edge_parts or store.edges is not None:
            if store.edges is None:
                # same shuffle-avoidance as nodes: CREATE-mode edges (A5,
                # parallel rels) append without the dedup shuffle
                merge_parts = [p for p, m in zip(edge_parts, edge_merge_flags) if m]
                create_parts = [p for p, m in zip(edge_parts, edge_merge_flags) if not m]
                pieces = []
                if merge_parts:
                    pieces.append(
                        L.merge_elements(union_wide(merge_parts), L.EDGE_META, L.EID)
                    )
                pieces.extend(create_parts)
                merged_e = union_wide(pieces)
            else:
                existing_e = store.edges.withColumn(
                    L.SEQ_SRC, F.lit(-1).cast("long")
                )
                union_e = union_wide([existing_e] + edge_parts)
                merged_e = (
                    L.merge_elements(union_e, L.EDGE_META, L.EID)
                    if union_e is not None else None
                )
            if merged_e is not None:
                # edges only need materializing for persistent stores; for
                # in-memory stores the caller's first action computes them
                store.set_edges(merged_e, materialize=store.path is not None)
                if store.path is not None:
                    store.log_stage(
                        "edges",
                        n_edges=store.edges.count(),
                        wall_s=round(time.time() - t1, 3),
                    )

        store.log_stage("run", wall_s=round(time.time() - t0, 3))
        return store

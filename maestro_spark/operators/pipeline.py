"""Maestro pipeline semantics re-expressed as DataFrame operators
(SURVEY.md §7.1 M7): exclusion rules, conflict detection, idempotent
upsert with source-set merge, delete, and incremental re-index.

Reference parity anchors:
  * exclusion rules — ExclusionRulesEvaluator.shouldExcludeAnalysis:34-43 +
    IDExclusionRule.applies:49-78 (config-driven id blacklists, any-level
    match drops the record). Here: broadcast-friendly isin predicates.
  * conflict detection — DefaultIndexer.getAlreadyIndexed:744-757,
    findConflicts:759-768, FileCentricDocument.isValidReplica:96-110 (same
    id, differing identity fields → conflict; conflicting newcomers are
    dropped and reported, removeConflictingFromInputFilesList:820-826).
    Here: inner join on key + content-hash inequality → conflicts frame;
    left_anti to drop (F3/U3).
  * upsert — SearchAdapterHelper painless scripts :211-251: replace all
    fields, SET-MERGE the repositories[] array (:216-218,241-243). Here:
    full-outer merge keyed by doc key, array_union + array_sort for the
    source set (U1).
  * delete — FileCentricElasticSearchAdapter.deleteByAnalysisId:190-200 /
    :210-229 → anti-join (K2/K3).
  * incremental re-index — bulk upsert of only affected docs (K1) → merge
    into the docstore + build_index(resume=True): only shards whose
    fingerprint changed are rebuilt (partition-local work at any scale).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maestro_spark.operators.build import IndexConfig, build_index


@dataclass
class ExclusionRules:
    """Config-driven blacklists: column -> excluded values (IDExclusionRule
    analogue — each entry is one '@ExclusionId field in [ids]' rule)."""

    by_column: dict[str, list] = field(default_factory=dict)

    def predicate(self):
        """Column expr that is True when a row must be EXCLUDED (any rule
        matches — the evaluator's short-circuit OR, ExclusionRulesEvaluator
        :34-43)."""
        pred = F.lit(False)
        for col, values in self.by_column.items():
            if values:
                pred = pred | F.col(col).isin(list(values))
        return pred


def apply_exclusions(docs: DataFrame, rules: ExclusionRules) -> DataFrame:
    """Keep only non-excluded rows. Values ship as literal isin lists
    (broadcast-equivalent; rules are config-sized, J1)."""
    return docs.where(~rules.predicate())


def excluded(docs: DataFrame, rules: ExclusionRules) -> DataFrame:
    """The complement — Maestro notifies excluded/conflicting ids rather
    than silently dropping them (notifyConflicts:894-903 pattern)."""
    return docs.where(rules.predicate())


def detect_conflicts(stored: DataFrame, incoming: DataFrame,
                     key_cols: list[str],
                     content_col: str = "content") -> DataFrame:
    """Same key, different content hash → conflict (isValidReplica
    inequality). Returns (key_cols..., stored_hash, incoming_hash)."""
    s = stored.select(*key_cols, F.md5(F.col(content_col)).alias("stored_hash"))
    i = incoming.select(*key_cols, F.md5(F.col(content_col)).alias("incoming_hash"))
    return (
        s.join(i, key_cols, "inner")
        .where(F.col("stored_hash") != F.col("incoming_hash"))
    )


def drop_conflicting(incoming: DataFrame, conflicts: DataFrame,
                     key_cols: list[str]) -> DataFrame:
    """F3: remove conflicting newcomers before upsert (left_anti — U3)."""
    return incoming.join(conflicts.select(*key_cols), key_cols, "left_anti")


def upsert_docs(stored: DataFrame, incoming: DataFrame, key_cols: list[str],
                payload_cols: list[str],
                sources_col: str = "sources") -> DataFrame:
    """Idempotent upsert: incoming payload wins, source sets set-merge
    (array_union, sorted for determinism — the painless repositories[]
    merge, U1). Full-outer keyed merge = Iceberg MERGE INTO on plain
    DataFrames."""
    s = stored.select(*key_cols, *[F.col(c).alias(f"_s_{c}") for c in payload_cols],
                      F.col(sources_col).alias("_s_src"))
    i = incoming.select(*key_cols, *[F.col(c).alias(f"_i_{c}") for c in payload_cols],
                        F.col(sources_col).alias("_i_src"))
    merged = s.join(i, key_cols, "full_outer")
    out_cols = [F.col(k) for k in key_cols]
    for c in payload_cols:
        out_cols.append(F.coalesce(F.col(f"_i_{c}"), F.col(f"_s_{c}")).alias(c))
    out_cols.append(
        F.array_sort(
            F.array_union(
                F.coalesce(F.col("_s_src"), F.array().cast("array<string>")),
                F.coalesce(F.col("_i_src"), F.array().cast("array<string>")),
            )
        ).alias(sources_col)
    )
    return merged.select(*out_cols)


def delete_docs(stored: DataFrame, delete_keys: DataFrame,
                key_cols: list[str]) -> DataFrame:
    """K2/K3 delete-by-key: anti-join."""
    return stored.join(delete_keys.select(*key_cols), key_cols, "left_anti")


def upsert_and_reindex(spark: SparkSession, index_dir: str,
                       updated_docs: DataFrame, cfg: IndexConfig,
                       id_col: str | None = None) -> dict:
    """Apply a FULL-corpus doc-table change and rebuild ONLY affected
    shards: the build's per-shard fingerprints make resume=True skip every
    shard whose docs are byte-identical (M5+M7). Returns the new manifest;
    its `skipped_shards` is the untouched set.

    This is the whole-table path (input = the complete new corpus; it
    still fingerprints every shard). For DELTA-shaped changes (a batch of
    upserts/deletes) use operators.incremental.incremental_update, which
    keeps doc ids stable and never scans untouched shards."""
    return build_index(spark, updated_docs, index_dir, cfg, resume=True,
                       id_col=id_col)

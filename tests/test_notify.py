"""K5 notification-channel tests (Notifier.java / Slack.java /
FileBasedFailuresLogger / NotificationName semantics) and the
termdict-only prefix-scan guarantee."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators import notify
from maestro_spark.operators import pipeline as pl
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs
from maestro_spark.streaming import commands as sc


class _Recorder(notify.NotificationChannel):
    def __init__(self, subscriptions=None):
        super().__init__(subscriptions)
        self.sent = []

    def send(self, n):
        self.sent.append(n)
        return True


class _Broken(notify.NotificationChannel):
    def send(self, n):
        raise RuntimeError("channel down")


def test_notifier_fanout_subscriptions_and_isolation():
    rec_all = _Recorder()
    rec_conflicts = _Recorder({"ANALYSIS_CONFLICT"})
    notifier = notify.Notifier([_Broken(), rec_all, rec_conflicts])
    # a broken channel must not poison the others (Notifier.java
    # onErrorResume semantics)
    notifier.notify("ANALYSIS_CONFLICT", n=2)
    notifier.notify("INDEX_REQ_FAILED", err="boom")
    assert [n.name for n in rec_all.sent] == ["ANALYSIS_CONFLICT", "INDEX_REQ_FAILED"]
    assert [n.name for n in rec_conflicts.sent] == ["ANALYSIS_CONFLICT"]
    assert rec_all.sent[0].category == notify.WARN
    assert rec_all.sent[1].category == notify.ERROR


def test_webhook_channel_templates():
    posts = []
    ch = notify.WebhookChannel("http://hook", lambda url, payload:
                               posts.append((url, payload)) or True)
    notify.Notifier([ch]).notify("INDEX_REQ_FAILED", id="x")
    assert posts[0][0] == "http://hook"
    assert "INDEX_REQ_FAILED" in posts[0][1]["text"]
    assert posts[0][1]["text"].startswith(":warning:")


def test_file_channel_jsonl(tmp_path):
    path = str(tmp_path / "failures.log")
    notifier = notify.Notifier([notify.FileChannel(path)])
    notifier.notify("INDEX_FILE_CONFLICT", object_id="o1")
    notifier.notify("UNHANDLED_ERROR", err="x")
    lines = [json.loads(line) for line in open(path)]
    assert [ln["name"] for ln in lines] == ["INDEX_FILE_CONFLICT", "UNHANDLED_ERROR"]
    assert lines[0]["attributes"]["object_id"] == "o1"


def test_notify_conflicts_bounded(spark):
    """Conflicts are REPORTED not silently dropped (notifyConflicts
    :894-903) — and only a bounded sample reaches the driver."""
    stored = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("a").alias("content"))
    incoming = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "b").otherwise("a").alias("content"))
    conflicts = pl.detect_conflicts(stored, incoming, ["doc_id"])
    rec = _Recorder()
    n = notify.notify_conflicts(notify.Notifier([rec]), conflicts, sample_cap=5)
    assert n == 25
    note = rec.sent[0]
    assert note.name == "ANALYSIS_CONFLICT" and note.category == notify.WARN
    assert note.attributes["total_conflicts"] == 25
    assert len(note.attributes["sample"]) == 5
    assert note.attributes["truncated"] is True


def test_command_batch_notifies_rejects(spark, tmp_path):
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(shard_size=100, n_buckets=4, n_salts=2, sample_fraction=1.0)
    batch = spark.createDataFrame(
        [(0, "upsert", "r", "p", "c", "py", "hello world"),
         (1, "upsert", "r", None, "c", "py", "bad key"),
         (2, "nonsense", "r", "q", "c", None, None)],
        sc.COMMAND_SCHEMA)
    rec = _Recorder()
    m = sc.apply_command_batch(spark, batch, idx, cfg,
                               reject_dir=str(tmp_path / "dlq"),
                               notifier=notify.Notifier([rec]))
    assert m["n_docs"] == 1
    assert rec.sent[0].name == "COMMAND_REJECTED"
    assert rec.sent[0].attributes["n_rejected"] == 2


def test_prefix_terms_reads_only_termdict(spark, tmp_path):
    """ROADMAP #4 / VERDICT #5: prefix lookup must not touch posting
    payloads — prove it by removing the posting store entirely."""
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(shard_size=100, n_buckets=4, n_salts=2, sample_fraction=1.0)
    build_index(spark, synth_docs(spark, 120, seed=3, partitions=2), idx, cfg)
    reader = IndexReader(spark, idx)
    with_postings = {r["term"]: r["df"] for r in reader.prefix_terms("re").collect()}
    assert with_postings, "fixture must contain terms starting with 're'"
    shutil.rmtree(os.path.join(idx, "postings"))
    reader2 = IndexReader(spark, idx)
    without_postings = {r["term"]: r["df"] for r in reader2.prefix_terms("re").collect()}
    assert without_postings == with_postings

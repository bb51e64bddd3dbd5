"""Streaming tests: command-stream ingest (upsert/delete routing, DLQ,
incremental rebuild, checkpointed restart) and watermarked windowed
aggregation. All use availableNow triggers — bounded, deterministic."""

import os

import pytest
from pyspark.sql import functions as F

from maestro_spark.operators.build import IndexConfig
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.corpus import synth_docs
from maestro_spark.streaming import commands as sc
from maestro_spark.streaming import windows as sw

CFG = IndexConfig(shard_size=200, n_buckets=8, n_salts=4,
                  hot_df_fraction=0.05, sample_fraction=1.0)


def _write_commands(spark, cmd_dir, rows, fname):
    df = spark.createDataFrame(rows, sc.COMMAND_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(os.path.join(cmd_dir))
    del fname


def test_command_stream_end_to_end(spark, tmp_path):
    cmd_dir = str(tmp_path / "cmds")
    idx_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    reject = str(tmp_path / "reject")
    os.makedirs(cmd_dir)

    base = synth_docs(spark, 150, seed=42, partitions=3).collect()
    ups = [(i, "upsert", r["repo"], r["path"], r["commit"], r["lang"], r["content"])
           for i, r in enumerate(base)]
    _write_commands(spark, cmd_dir, ups, "b0")
    sc.run_command_stream(spark, cmd_dir, idx_dir, CFG, ckpt, reject)

    reader = IndexReader(spark, idx_dir)
    assert reader.manifest["n_docs"] == 150
    assert reader.search_pandas("zzqmarkerzzq", k=3).empty

    # batch 2: delete 1 doc, modify 1 doc, add a bad command (DLQ).
    # The edited doc's key also gets a LOWER-seq delete — the max-seq
    # upsert must win (log-compaction ordering, not file order).
    victim, edited = base[0], base[1]
    batch2 = [
        (200, "delete", victim["repo"], victim["path"], victim["commit"], None, None),
        (201, "delete", edited["repo"], edited["path"], edited["commit"], None, None),
        (202, "upsert", edited["repo"], edited["path"], edited["commit"],
         edited["lang"], edited["content"] + " zzqmarkerzzq"),
        (203, "upsert", "org/bad", "p", "c", "java", None),  # invalid: no content
    ]
    _write_commands(spark, cmd_dir, batch2, "b1")
    sc.run_command_stream(spark, cmd_dir, idx_dir, CFG, ckpt, reject)

    reader2 = IndexReader(spark, idx_dir)
    assert reader2.manifest["n_docs"] == 149
    hits = reader2.search_pandas("zzqmarkerzzq", k=3)
    assert len(hits) == 1
    stored = spark.read.parquet(f"{idx_dir}/docs")
    assert stored.where(
        (F.col("repo") == victim["repo"]) & (F.col("path") == victim["path"])
        & (F.col("commit") == victim["commit"])).count() == 0
    # DLQ captured the malformed command
    assert spark.read.parquet(reject).count() == 1
    # checkpoint: re-running with no new files is a no-op
    m_before = reader2.manifest["shards"]
    sc.run_command_stream(spark, cmd_dir, idx_dir, CFG, ckpt, reject)
    assert IndexReader(spark, idx_dir).manifest["shards"] == m_before


def test_command_stream_versioned(spark, tmp_path):
    """versioned=True: each micro-batch lands blue/green behind the alias;
    a reader opened on the base dir follows the flips, and a reader
    pinned to the pre-batch version is isolated from the batch."""
    from maestro_spark.sources.tableio import resolve_alias

    cmd_dir = str(tmp_path / "cmds")
    base_dir = str(tmp_path / "idx_versioned")
    ckpt = str(tmp_path / "ckpt_v")
    os.makedirs(cmd_dir)

    base = synth_docs(spark, 120, seed=9, partitions=3).collect()
    ups = [(i, "upsert", r["repo"], r["path"], r["commit"], r["lang"],
            r["content"]) for i, r in enumerate(base)]
    _write_commands(spark, cmd_dir, ups, "b0")
    sc.run_command_stream(spark, cmd_dir, base_dir, CFG, ckpt,
                          versioned=True)
    assert resolve_alias(base_dir).endswith("v1")
    reader = IndexReader(spark, base_dir)
    pinned = IndexReader(spark, resolve_alias(base_dir))
    assert reader.manifest["n_docs"] == 120

    ed = base[2]
    _write_commands(spark, cmd_dir, [
        (500, "upsert", ed["repo"], ed["path"], ed["commit"], ed["lang"],
         ed["content"] + " zzqveredit"),
    ], "b1")
    sc.run_command_stream(spark, cmd_dir, base_dir, CFG, ckpt,
                          versioned=True)
    assert resolve_alias(base_dir).endswith("v2")
    assert reader.count_local("zzqveredit") == 1   # alias reader follows
    assert pinned.count_local("zzqveredit") == 0   # snapshot isolation


def test_windowed_counts_match_batch(spark, tmp_path):
    """Streaming windowed agg over the events table == the same agg run as
    a plain batch query (completed windows only — append mode drops the
    final non-finalized window(s), so compare on the intersection)."""
    events_src = "/root/testdata/sf0.001/events.parquet"
    ckpt = str(tmp_path / "ckpt_w")
    ev_dir = str(tmp_path / "events_stream")
    spark.read.parquet(events_src).coalesce(2).write.parquet(ev_dir)

    q = sw.run_windowed_stream(spark, ev_dir, ckpt, query_name="evw")
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in spark.sql("select * from evw").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in sw.windowed_event_counts(spark.read.parquet(ev_dir)).collect()
    }
    assert got, "no finalized windows emitted"
    for k, v in got.items():
        assert want[k] == v
    # append-mode completeness: every window strictly older than the max
    # watermark must have been emitted
    max_start = max(k[0] for k in want)
    missing = {k for k in want if k not in got and k[0] < max_start}
    # windows within the trailing watermark horizon may legitimately be
    # held back; everything older must be present
    horizon = sorted({k[0] for k in want})[-3]
    assert not {k for k in missing if k[0] < horizon}


# ---------------------------------------------------------------- sessions

def _batch_sessions(rows, gap_s):
    """Reference sessionizer: plain python over (user, ts_ms, value)."""
    import collections
    by_user = collections.defaultdict(list)
    for user, ms, val in rows:
        by_user[user].append((ms, val))
    out = []
    for user, evs in by_user.items():
        evs.sort()
        s0 = l0 = None
        n = 0
        tot = 0.0
        for ms, val in evs:
            if n and ms - l0 > gap_s * 1000:
                out.append((user, s0, l0, n, round(tot, 4)))
                n, tot = 0, 0.0
            if n == 0:
                s0 = ms
            l0 = ms
            n += 1
            tot += val
        out.append((user, s0, l0, n, round(tot, 4)))
    return sorted(out)


def test_stateful_sessionize_stream(spark, tmp_path):
    """Gap sessionization with applyInPandasWithState: sessions closed by
    a newer event (within and ACROSS micro-batches) and sessions closed
    by watermark timeout must all emit exactly once, matching the batch
    reference. One file per micro-batch forces cross-batch state."""
    from maestro_spark.streaming import sessions as ss
    import datetime as dt

    gap_s = 600  # 10 min
    base = dt.datetime(2026, 1, 1, 8, 0, 0)

    def ev(eid, user, offset_s, value):
        return (eid, base + dt.timedelta(seconds=offset_s), user,
                "click", value, "{}")

    # user 1: sessions [0..300], [1200..1300], [9000]
    # user 2: sessions [100..800 (split across files)], [8000]
    batch1 = [ev(1, 1, 0, 1.0), ev(2, 1, 300, 2.0), ev(3, 2, 100, 5.0),
              ev(4, 2, 500, 1.5)]
    batch2 = [ev(5, 1, 1200, 0.5), ev(6, 1, 1300, 0.25),
              ev(7, 2, 800, 2.0), ev(8, 2, 8000, 1.0)]
    batch3 = [ev(9, 1, 9000, 4.0)]
    # sentinel far-future event advances the watermark past every gap
    # deadline above so trailing sessions emit via EventTimeTimeout
    batch4 = [ev(99, 999, 500_000, 0.0)]

    ev_dir = str(tmp_path / "events")
    for i, rows in enumerate([batch1, batch2, batch3, batch4]):
        df = spark.createDataFrame(rows, sw.EVENT_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(ev_dir)
        del i

    ss.run_session_stream(spark, ev_dir, str(tmp_path / "ckpt"),
                          query_name="sess_t", gap_s=gap_s,
                          watermark="0 seconds")
    got = spark.sql("SELECT * FROM sess_t").collect()
    got_rows = sorted(
        (r["user_id"],
         int(r["session_start"].timestamp() * 1000),
         int(r["session_end"].timestamp() * 1000),
         r["n_events"], round(r["session_value"], 4))
        for r in got)

    all_events = []
    for rows in [batch1, batch2, batch3]:
        for eid, ts, user, _typ, val, _p in rows:
            all_events.append((user, int(ts.timestamp() * 1000), val))
    want = _batch_sessions(all_events, gap_s)

    assert got_rows == want
    # exactly-once: no duplicate sessions
    assert len(got_rows) == len(set(got_rows))


def test_command_stream_crash_replay_exactly_once(spark, tmp_path):
    """VERDICT r3 #8 (failure injection): foreachBatch is at-least-once —
    a crash AFTER the batch's side effect but BEFORE the checkpoint
    commit replays that batch on restart. Exactly-once INDEX STATE then
    rests on apply_command_batch being idempotent (stable ids, same-
    content rebuild). Inject exactly that crash, resume from the same
    checkpoint, and require the final index bit-identical (docstore rows
    AND doc ids AND search results) to an uninterrupted control run over
    the same micro-batches."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    cmd_dir = str(tmp_path / "cmds")
    os.makedirs(cmd_dir)
    base = synth_docs(spark, 120, seed=7, partitions=3).collect()
    # three files → three micro-batches under maxFilesPerTrigger=1
    _write_commands(spark, cmd_dir, [
        (i, "upsert", r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for i, r in enumerate(base[:80])], "f0")
    _write_commands(spark, cmd_dir, [
        (200, "delete", base[0]["repo"], base[0]["path"], base[0]["commit"],
         None, None),
        (201, "upsert", base[1]["repo"], base[1]["path"], base[1]["commit"],
         base[1]["lang"], base[1]["content"] + " zzqcrashmarker"),
    ], "f1")
    _write_commands(spark, cmd_dir, [
        (300 + i, "upsert", r["repo"], r["path"], r["commit"], r["lang"],
         r["content"]) for i, r in enumerate(base[80:])], "f2")

    def run(idx_dir, ckpt, crash_after=None, applied=None):
        stream = sc.read_command_stream(spark, cmd_dir, max_files_per_trigger=1)

        def process(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            sc.apply_command_batch(spark, batch_df, idx_dir, CFG)
            if applied is not None:
                applied.append(batch_id)
            if crash_after is not None and batch_id == crash_after:
                raise RuntimeError("injected crash before checkpoint commit")

        q = (stream.writeStream.foreachBatch(process)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    # control: uninterrupted
    ctl_idx, ctl_ckpt = str(tmp_path / "ctl_idx"), str(tmp_path / "ctl_ckpt")
    ctl_applied = []
    run(ctl_idx, ctl_ckpt, applied=ctl_applied)
    assert ctl_applied == [0, 1, 2]

    # failure run: crash after batch 1's side effect landed
    f_idx, f_ckpt = str(tmp_path / "f_idx"), str(tmp_path / "f_ckpt")
    f_applied = []
    with pytest.raises(StreamingQueryException, match="injected crash"):
        run(f_idx, f_ckpt, crash_after=1, applied=f_applied)
    assert f_applied == [0, 1]

    # resume from the SAME checkpoint: batch 1 must REPLAY (its commit
    # never landed), then batch 2 runs — at-least-once delivery
    run(f_idx, f_ckpt, applied=f_applied)
    assert f_applied == [0, 1, 1, 2], f_applied

    # exactly-once STATE: docstore (keys, content hash, doc ids) and
    # search results bit-identical to the control
    cols = ["repo", "path", "commit", "doc_id", "content_sha256"]
    ctl = sorted(map(tuple, spark.read.parquet(f"{ctl_idx}/docs")
                     .select(*cols).collect()))
    got = sorted(map(tuple, spark.read.parquet(f"{f_idx}/docs")
                     .select(*cols).collect()))
    assert got == ctl
    r_ctl = IndexReader(spark, ctl_idx)
    r_f = IndexReader(spark, f_idx)
    for q in ("zzqcrashmarker", "def return"):
        a = r_ctl.search_pandas(q, k=10)
        b = r_f.search_pandas(q, k=10)
        assert list(a["doc_id"]) == list(b["doc_id"])
        assert list(a["score"]) == list(b["score"])
    assert len(r_f.search_pandas("zzqcrashmarker", k=10)) == 1


def test_percolate_stream_alerts(spark, tmp_path):
    """Streaming percolation: upserts matched against registered queries
    per micro-batch; the batch_id-partitioned sink is replay-idempotent."""
    import re

    from maestro_spark.streaming import alerts as sa

    cmd_dir = str(tmp_path / "cmds")
    alerts_dir = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt_alerts")
    os.makedirs(cmd_dir)

    queries = spark.createDataFrame(
        [(1, "def return", "and", 1), (2, "index merge", "or", 2)],
        "query_id long, query string, mode string, min_match int")

    base = synth_docs(spark, 80, seed=9, partitions=2).collect()
    ups = [(i, "upsert", r["repo"], r["path"], r["commit"], r["lang"],
            r["content"]) for i, r in enumerate(base)]
    # a delete and a malformed upsert must never alert
    ups.append((900, "delete", base[0]["repo"], base[0]["path"],
                base[0]["commit"], None, None))
    ups.append((901, "upsert", "org/bad", "p", "c", "java", None))
    _write_commands(spark, cmd_dir, ups, "b0")
    sa.run_percolate_stream(spark, cmd_dir, queries, alerts_dir, ckpt)

    got = spark.read.parquet(alerts_dir).toPandas()
    want = set()
    for r in base:
        toks = set(re.findall(r"[a-z0-9]+", r["content"].lower()))
        if {"def", "return"} <= toks:
            want.add((r["repo"], r["path"], r["commit"], 1))
        if len({"index", "merge"} & toks) >= 2:
            want.add((r["repo"], r["path"], r["commit"], 2))
    assert set(map(tuple, got[["repo", "path", "commit",
                               "query_id"]].itertuples(index=False))) == want
    assert len(got) == len(want)

    # second batch: one new matching doc -> exactly one new alert row,
    # in a NEW batch partition; old partitions untouched
    _write_commands(spark, cmd_dir,
                    [(1000, "upsert", "org/x", "pp", "cc", "py",
                      "def f(): return index merge")], "b1")
    sa.run_percolate_stream(spark, cmd_dir, queries, alerts_dir, ckpt)
    got2 = spark.read.parquet(alerts_dir).toPandas()
    assert len(got2) == len(want) + 2  # matches both queries
    assert set(got2["batch_id"].unique()) >= {0, 1}

    # drained stream: re-run is a no-op (checkpoint)
    sa.run_percolate_stream(spark, cmd_dir, queries, alerts_dir, ckpt)
    assert len(spark.read.parquet(alerts_dir).toPandas()) == len(got2)

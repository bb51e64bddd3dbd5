"""Shard-parallel serving tier — the ES *cluster* analogue.

The reference's query side is a 3-shard Elasticsearch cluster
(maestro-app/src/main/resources/file_centric.json:6): a coordinator
fans each query across data nodes that own disjoint shard subsets and
merges their k-bounded partial results. This repo's single-process
serving path (IndexReader.search_local) walks every shard in one
interpreter, so p95 grows with shard count (measured 0.49 s → 1.59 s
at 10× corpus / 245 shards, BENCH.md) even though per-shard work is
constant.

ServingPool reproduces the cluster shape with OS processes:

  - W worker processes ("data nodes"), each holding a serving-only
    ``IndexReader(None, index_dir, shard_subset=(w, W))`` — posting
    fetches are partition-pruned to shards s ≡ w (mod W), so each
    worker reads, caches (posting-row LRU + doclens LRU), and scores
    ONLY its own shards. Memory and I/O shard across workers exactly
    like ES shard allocation; no cache is duplicated.
  - a coordinator (this process) that broadcasts the request to every
    worker and merges the per-worker top-k with the SAME
    ``np.lexsort((ids, -scores))[:k]`` rule search_local uses — the
    merge is associative, so results are bit-identical to the
    sequential walk (parity-tested in tests/test_serving_pool.py).
  - scaling axis: workers score concurrently in separate interpreters
    (true parallelism — no GIL), so latency tracks
    ceil(n_shards / W) · per-shard-cost instead of n_shards. The
    benched serving row (bench_serving.py) records p50/p95 at several
    W on the same index.

Workers are long-lived (the ES node model): caches stay warm across
queries, and each worker re-resolves the index alias per request, so a
blue/green flip retargets the whole pool without restarts. Requests
and responses cross process boundaries as small picklable payloads
(query strings / kwargs down, ≤k rows per worker up) — never posting
bytes.

Fanned-out surface: search / msearch / count — their plans come from
GLOBAL statistics (manifest field stats + termdict dfs), which every
worker shares, so subset scoring is bit-identical by construction.
phrase_search_local is deliberately NOT fanned out: its phrase
pseudo-term df is counted across ALL shards before scoring, so a
subset worker would score with a partial df — distributing it needs
the dfs_query_then_fetch two-phase protocol (phase 1: per-worker
match counts; phase 2: score with the summed global df), the same
seam federated_global_plans already implements across indexes.

Start method: ``spawn`` by default — fork would duplicate the parent's
arbitrary state (a Spark JVM in tests) into scoring processes; a clean
interpreter per worker matches production (workers on other hosts).
Pool construction is a one-time cost (~1 s/worker interpreter +
manifest read), irrelevant at ES-node lifetimes.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import traceback

import numpy as np
import pandas as pd

__all__ = ["ServingPool"]


def _worker_main(index_dir: str, worker_id: int, n_workers: int,
                 task_q, result_q) -> None:
    """Data-node loop: bind a serving-only subset reader, then serve
    (seq, method, kwargs) requests until the None sentinel. Every reply
    is (seq, worker_id, ok, payload); exceptions travel back as the
    formatted traceback string so the coordinator can re-raise with
    context instead of deadlocking on a missing reply."""
    from maestro_spark.operators.search import IndexReader

    reader = IndexReader(None, index_dir,
                         shard_subset=(worker_id, n_workers))
    phrase_cache = None   # (docs, tfs, dls) from the last phrase_count
    while True:
        msg = task_q.get()
        if msg is None:
            return
        seq, method, kwargs = msg
        try:
            if method == "search":
                out = reader.search_local(**kwargs)
            elif method == "msearch":
                out = reader.search_many_local(**kwargs)
            elif method == "count":
                out = reader.count_local(**kwargs)
            elif method == "phrase_count":
                # dfs_query_then_fetch phase 1: match this worker's
                # shard subset, cache the arrays, return the local df
                m = reader._phrase_match_arrays(**kwargs)
                if m is None:           # single bare term: BM25 path
                    phrase_cache = None
                    out = {"fallback": True}
                else:
                    phrase_cache = m
                    out = {"df": int(m[0].size)}
            elif method == "phrase_score":
                # phase 2: score the cached match with the GLOBAL df
                if phrase_cache is None:
                    raise RuntimeError(
                        "phrase_score without a preceding phrase_count")
                out = reader._phrase_score_topk(
                    *phrase_cache, k=kwargs["k"],
                    df_override=kwargs["df"])
                phrase_cache = None
            elif method == "stats":
                out = {
                    "pid": os.getpid(),
                    "worker_id": worker_id,
                    "shards": sorted(
                        int(s) for s in reader.manifest["shards"]
                        if int(s) % n_workers == worker_id),
                    "posting_cache_terms": len(reader._posting_rows_cache),
                    "posting_cache_bytes": reader._posting_cache_bytes,
                }
            else:
                raise ValueError(f"unknown method {method!r}")
            result_q.put((seq, worker_id, True, out))
        except BaseException:
            result_q.put((seq, worker_id, False, traceback.format_exc()))


class ServingPool:
    """Coordinator + W shard-owning worker processes over one index.

    Usage::

        with ServingPool(index_dir, n_workers=4) as pool:
            hits = pool.search("user merge", k=10)          # == search_local
            many = pool.msearch({"a": "q1", "b": "q2"}, k=5)  # == search_many_local

    Results are bit-identical to the single-process serving path; only
    the wall-clock changes. kwargs pass through to the underlying
    reader methods (mode/prune/boosts/exclude/require/min_match/...).
    """

    def __init__(self, index_dir: str, n_workers: int | None = None,
                 start_method: str = "spawn"):
        self.index_dir = index_dir
        self.n_workers = int(n_workers or min(8, os.cpu_count() or 1))
        if self.n_workers < 1:
            raise ValueError("n_workers must be >= 1")
        ctx = mp.get_context(start_method)
        self._task_qs = [ctx.Queue() for _ in range(self.n_workers)]
        self._result_q = ctx.Queue()
        self._seq = 0
        self._procs = [
            ctx.Process(
                target=_worker_main,
                args=(index_dir, w, self.n_workers,
                      self._task_qs[w], self._result_q),
                daemon=True,
            )
            for w in range(self.n_workers)
        ]
        for p in self._procs:
            p.start()
        self._closed = False

    # ------------------------------------------------------------ plumbing

    def _broadcast(self, method: str, kwargs: dict) -> list:
        """Send one request to every worker; gather every reply (order
        by worker does not matter — the merge is associative). A worker
        error aborts the request with its remote traceback."""
        if self._closed:
            raise RuntimeError("ServingPool is closed")
        self._seq += 1
        seq = self._seq
        for q in self._task_qs:
            q.put((seq, method, kwargs))
        outs, err = [None] * self.n_workers, None
        for _ in range(self.n_workers):
            got_seq, wid, ok, payload = self._result_q.get()
            if got_seq != seq:       # stale reply from an aborted request
                continue
            if ok:
                outs[wid] = payload
            else:
                err = (wid, payload)
        if err is not None:
            raise RuntimeError(
                f"serving worker {err[0]} failed:\n{err[1]}")
        return outs

    @staticmethod
    def _merge_hits(parts: list[pd.DataFrame], k: int) -> pd.DataFrame:
        """The coordinator merge — same (score desc, doc_id asc) lexsort
        rule as IndexReader._merge_topk over the ≤ W·k candidate rows."""
        ids = np.concatenate(
            [p["doc_id"].to_numpy(np.int64) for p in parts])
        scores = np.concatenate(
            [p["score"].to_numpy(np.float64) for p in parts])
        if ids.size == 0:
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                 "score": pd.array([], dtype="float64")})
        order = np.lexsort((ids, -scores))[:k]
        return pd.DataFrame({"doc_id": ids[order],
                             "score": scores[order]})

    # ------------------------------------------------------------- surface

    def search(self, query: str, k: int = 10, **kwargs) -> pd.DataFrame:
        """Fan-out search_local: each worker returns its shard subset's
        top-k; the coordinator merges. Bit-identical to
        IndexReader.search_local(query, k, **kwargs)."""
        outs = self._broadcast("search",
                               dict(query=query, k=k, **kwargs))
        return self._merge_hits(outs, k)

    def msearch(self, queries: dict[str, str], k: int = 10,
                **kwargs) -> pd.DataFrame:
        """Fan-out search_many_local: ONE broadcast moves the whole
        batch, so N queries cost one fan-out round instead of N.
        Returns DataFrame(qid, doc_id, score), per-qid top-k, identical
        to the single-process msearch."""
        outs = self._broadcast("msearch",
                               dict(queries=queries, k=k, **kwargs))
        parts = []
        for qid in sorted(queries):
            per_q = [o[o["qid"] == qid] for o in outs]
            per_q = [p for p in per_q if len(p)]
            if not per_q:
                continue
            top = self._merge_hits(per_q, k)
            if not len(top):
                continue
            top.insert(0, "qid", qid)
            parts.append(top)
        if not parts:
            return pd.DataFrame({"qid": pd.array([], dtype="string"),
                                 "doc_id": pd.array([], dtype="int64"),
                                 "score": pd.array([], dtype="float64")})
        return pd.concat(parts, ignore_index=True)

    def phrase(self, phrase: str, k: int = 10, slop: int = 0,
               prefix_last: bool = False, max_expansions: int = 50,
               first_n: int | None = None) -> pd.DataFrame:
        """Fan-out phrase search via dfs_query_then_fetch (the ES
        cross-node protocol): phase 1 broadcasts the match — each
        worker intersects positions over its shard subset, caches the
        (docs, tfs, dls) arrays worker-side, and returns only its LOCAL
        match count; the coordinator sums them into the GLOBAL phrase
        df; phase 2 broadcasts that df and workers score their cached
        match with the global idf, returning top-k. Bit-identical to
        IndexReader.phrase_search_local (which computes the same global
        df by concatenating all shards in one process). Match arrays
        never cross a process boundary — only counts and ≤k rows."""
        params = dict(phrase=phrase, slop=slop, prefix_last=prefix_last,
                      max_expansions=max_expansions, first_n=first_n)
        counts = self._broadcast("phrase_count", params)
        if any(c.get("fallback") for c in counts):
            # single bare term: same fallback as phrase_search_local
            from maestro_spark.functions.tokenize import phrase_terms
            terms = phrase_terms(
                phrase, tokenizer=self._meta_reader().cfg.get(
                    "tokenizer", "code"))
            return self.search(terms[0], k=k)
        df = int(sum(c["df"] for c in counts))
        if df == 0:
            # release the workers' cached (empty) matches
            self._broadcast("phrase_score", {"k": k, "df": 0})
            return pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                                 "score": pd.array([], dtype="float64")})
        outs = self._broadcast("phrase_score", {"k": k, "df": df})
        return self._merge_hits(outs, k)

    def _meta_reader(self):
        """Coordinator-side manifest/cfg handle (no posting reads)."""
        if getattr(self, "_meta", None) is None:
            from maestro_spark.operators.search import IndexReader
            self._meta = IndexReader(None, self.index_dir)
        return self._meta

    def count(self, query: str, **kwargs) -> int:
        """Fan-out count_local; counts over disjoint shard subsets sum."""
        return int(sum(self._broadcast("count",
                                       dict(query=query, **kwargs))))

    def stats(self) -> list[dict]:
        """Per-worker shard ownership + cache occupancy (ops surface)."""
        return self._broadcast("stats", {})

    # ----------------------------------------------------------- lifecycle

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        for q in self._task_qs:
            try:
                q.put(None)
            except ValueError:
                pass
        for p in self._procs:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()

    def __enter__(self) -> "ServingPool":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def __del__(self):  # best-effort; explicit close() is the contract
        try:
            self.close()
        except Exception:
            pass

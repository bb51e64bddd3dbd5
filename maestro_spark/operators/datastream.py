"""ES data streams + ILM rollover, re-expressed on the engine's
versioned-index + federated-search toolkit.

The reference operates time-based ES indexes behind aliases
(application.yml:59-67; docs/usage/03-index-mappings.md); the modern ES
form is a DATA STREAM: writes land in the newest backing index
(`.ds-<stream>-NNNNNN`), a rollover condition (max_docs / max_size /
max_age — public ES _rollover API) seals it and opens the next, and a
search over the stream name fans out across every backing index. Here:

  * a stream is a base dir with an atomic `stream.json` manifest
    (backing list + write pointer + rollover condition),
  * `append` routes a batch into the write index (first write creates —
    K4 — and incremental_update's affected-shard path applies within a
    backing index), then seals it when the condition trips,
  * `search_stream` runs the dfs_query_then_fetch federated path over
    the backing readers — GLOBAL df/N/avgdl, so scores are bit-identical
    to one combined index (the property tests/test_federated.py proves)
    and rollover is invisible to relevance,
  * `count_stream` is the multi-index _count.

Scale notes: backing indexes are independent — append cost is bounded by
the WRITE index (old backing indexes are immutable, exactly ES's sealed
segments), and the federated stats round moves only termdict integers.
At 100 TB the stream is how ingest stays O(batch) while history grows
unbounded; time/range metadata per backing index (min/max ingest key in
stream.json) gives query-time backing-index pruning the way ES skips
frozen indices by range — recorded here per backing at seal time.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from maestro_spark.operators.build import IndexConfig
from maestro_spark.operators.incremental import incremental_update
from maestro_spark.operators.search import IndexReader
from maestro_spark.sources.tableio import read_manifest, write_manifest

STREAM_FILE = "stream.json"


def _stream_path(base_dir: str) -> str:
    return os.path.join(base_dir, STREAM_FILE)


def _backing_name(i: int) -> str:
    return f"ds-{i:06d}"


def create_stream(base_dir: str, max_docs: int = 1_000_000) -> dict:
    """Create an empty data stream (refused if one exists). max_docs is
    the rollover condition (the ES max_docs analogue — the only
    condition that is deterministic in this sandbox; size/age hang off
    the same seal check)."""
    if read_manifest(_stream_path(base_dir)) is not None:
        raise ValueError(f"stream already exists at {base_dir}")
    m = {"backing": [_backing_name(1)], "write": _backing_name(1),
         "max_docs": int(max_docs), "sealed": {}}
    write_manifest(_stream_path(base_dir), m)
    return m


def _doc_count(base_dir: str, backing: str) -> int:
    man = read_manifest(os.path.join(base_dir, backing, "manifest.json"))
    if man is None:
        return 0
    return sum(int(s["n_docs"]) for s in man["shards"].values())


def rollover(base_dir: str) -> dict:
    """Seal the write index and open the next backing index — the ES
    `POST /<stream>/_rollover` (manual form). Records the sealed
    index's doc count in stream.json (the pruning metadata hook)."""
    m = read_manifest(_stream_path(base_dir))
    if m is None:
        raise ValueError(f"no stream at {base_dir}")
    cur = m["write"]
    m["sealed"][cur] = {"n_docs": _doc_count(base_dir, cur)}
    nxt = _backing_name(len(m["backing"]) + 1)
    m["backing"].append(nxt)
    m["write"] = nxt
    write_manifest(_stream_path(base_dir), m)
    return m


def append(spark: SparkSession, base_dir: str, batch: DataFrame,
           cfg: IndexConfig | None = None) -> dict:
    """Write a batch into the stream's WRITE index (first write creates,
    later writes take incremental_update's affected-shard path — within
    one backing index a repeated key is an upsert, the ES data-stream
    `op_type=create` relaxation this engine's K1 semantics give for
    free), then roll over when the condition trips. Returns stream.json
    after the append; the caller can inspect `rolled`."""
    m = read_manifest(_stream_path(base_dir))
    if m is None:
        raise ValueError(f"no stream at {base_dir} (create_stream first)")
    idx = os.path.join(base_dir, m["write"])
    incremental_update(spark, idx, batch, None, cfg)
    rolled = False
    if _doc_count(base_dir, m["write"]) >= m["max_docs"]:
        m = rollover(base_dir)
        rolled = True
    m = dict(m)
    m["rolled"] = rolled
    return m


def stream_readers(spark: SparkSession | None,
                   base_dir: str) -> dict[str, IndexReader]:
    """One IndexReader per NON-EMPTY backing index (the write index may
    be freshly opened and empty)."""
    m = read_manifest(_stream_path(base_dir))
    if m is None:
        raise ValueError(f"no stream at {base_dir}")
    out = {}
    for b in m["backing"]:
        if read_manifest(os.path.join(base_dir, b,
                                      "manifest.json")) is not None:
            out[b] = IndexReader(spark, os.path.join(base_dir, b))
    return out


def search_stream(base_dir: str, query: str, k: int = 10,
                  mode: str = "or", min_match: int = 1) -> pd.DataFrame:
    """Search the whole stream with GLOBAL statistics
    (dfs_query_then_fetch over the backing readers): scores are
    bit-identical to one combined index, so a rollover never changes
    relevance — the invariant the data-stream abstraction owes its
    users. Returns (index, doc_id, score)."""
    from maestro_spark.operators.search import search_federated_dfs_local

    return search_federated_dfs_local(
        stream_readers(None, base_dir), query, k=k, mode=mode,
        min_match=min_match)


def count_stream(base_dir: str, query: str, mode: str = "or") -> dict:
    """Per-backing-index hit counts (the multi-index _count)."""
    from maestro_spark.operators.search import count_federated_local

    return count_federated_local(stream_readers(None, base_dir), query,
                                 mode=mode)

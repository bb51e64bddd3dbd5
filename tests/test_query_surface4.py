"""Round-3 aggregation-surface extensions (batch: matrix/metric/pipeline
aggs), each checked against an independent brute-force oracle on the
same corpus:

  - search_mad (ES median_absolute_deviation agg): exact two-phase
    median + median absolute deviation
  - search_matrix_stats (ES matrix_stats agg): pairwise sample
    covariance + Pearson correlation, one mergeable-moments agg
  - search_top_metrics (ES top_metrics agg): metric values at the
    top-N docs by a sort field, doc_id-pinned ties
  - search_auto_date_histogram (ES auto_date_histogram): finest
    calendar rung with bucket count <= target
  - search_cumulative_cardinality (ES cumulative_cardinality pipeline
    agg): exact via the first-occurrence identity
  - search_bucket_script (ES bucket_script + normalize pipelines):
    derived per-bucket metric + percent_of_sum
  - search_diversified_sampler (ES diversified_sampler agg): per-shard
    top-N with a per-value cap == ES's score-order walk that skips
    values at their cap
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.functions.tokenize import code_tokens
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader

N_DOCS = 300
CFG = IndexConfig(
    shard_size=128,
    n_buckets=8,
    n_salts=4,
    hot_df_fraction=0.02,
    sample_fraction=1.0,
)
Q = "index merge query"


@pytest.fixture(scope="module")
def corpus():
    from maestro_spark.sources.corpus import synth_docs_pandas
    return synth_docs_pandas(N_DOCS, seed=23).reset_index(names="doc_id")


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("idx_qs4"))
    build_index(spark, spark.createDataFrame(corpus), out, CFG,
                id_col="doc_id")
    return out


@pytest.fixture(scope="module")
def reader(spark, built):
    return IndexReader(spark, built)


@pytest.fixture(scope="module")
def match_ids(corpus):
    qt = set(Q.split())
    toks = list(code_tokens(corpus["content"]))
    return {i for i, ts in enumerate(toks) if qt & set(ts)}


@pytest.fixture(scope="module")
def mdf(corpus, match_ids):
    sub = corpus[corpus["doc_id"].isin(match_ids)].copy()
    sub["dlen"] = sub["content"].str.len().astype(np.float64)
    sub["idm"] = (sub["doc_id"] % 7).astype(np.float64)
    sub["ts"] = pd.Timestamp("2025-01-01") + pd.to_timedelta(
        sub["doc_id"] % 30, unit="h")
    return sub


def _MT():
    return F.expr("timestamp'2025-01-01 00:00:00' + make_interval("
                  "0, 0, 0, 0, CAST(doc_id % 30 AS INT), 0, 0)")


def test_mad(reader, mdf):
    got = reader.search_mad(Q, F.length("content")).collect()[0]
    v = mdf["dlen"].to_numpy()
    med = float(np.median(v))
    assert got["median_v"] == round(med, 6)
    assert got["mad"] == round(float(np.median(np.abs(v - med))), 6)


def test_matrix_stats(reader, mdf):
    rows = reader.search_matrix_stats(
        Q, {"dlen": F.length("content"),
            "idm": (F.col("doc_id") % 7).cast("double")}).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["field_a"], r["field_b"]) == ("dlen", "idm")
    assert r["n"] == len(mdf)
    assert r["mean_a"] == round(float(mdf["dlen"].mean()), 6)
    assert r["mean_b"] == round(float(mdf["idm"].mean()), 6)
    assert r["covariance"] == pytest.approx(
        float(mdf["dlen"].cov(mdf["idm"])), abs=2e-6)
    assert r["correlation"] == pytest.approx(
        float(mdf["dlen"].corr(mdf["idm"])), abs=2e-6)


def test_matrix_stats_needs_two_fields(reader):
    with pytest.raises(ValueError):
        reader.search_matrix_stats(Q, {"only": F.length("content")})


def test_top_metrics(reader, mdf):
    got = reader.search_top_metrics(
        Q, F.length("content"), {"idm": (F.col("doc_id") % 7)},
        size=4, ascending=False).toPandas()
    want = mdf.sort_values(["dlen", "doc_id"],
                           ascending=[False, True]).head(4)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert list(got["sort_v"]) == list(want["dlen"])
    assert list(got["idm"]) == list(want["idm"])


@pytest.mark.parametrize("target,rung", [(10, "day"), (48, "minute")])
def test_auto_date_histogram(reader, mdf, target, rung):
    # ts = origin + (doc_id % 30) hours: minute==hour count (whole
    # hours) <= 30, day count == 2 -> target 10 picks day, 48 minute
    got = reader.search_auto_date_histogram(
        Q, _MT(), target_buckets=target).toPandas()
    assert set(got["interval"]) == {rung}
    trunc = mdf["ts"].dt.floor("min" if rung == "minute" else "D")
    want = trunc.dt.strftime("%Y-%m-%d %H:%M:%S") \
        .value_counts().sort_index()
    assert list(got["bucket"]) == list(want.index)
    assert list(got["n_docs"]) == list(want.values)


def test_cum_cardinality(reader, mdf):
    got = reader.search_cumulative_cardinality(
        Q, _MT(), F.col("lang"), interval="hour").toPandas()
    b = mdf.assign(bucket=mdf["ts"].dt.strftime("%Y-%m-%d %H:%M:%S"))
    histo = b.groupby("bucket").size().sort_index()
    assert list(got["bucket"]) == list(histo.index)
    assert list(got["n_docs"]) == list(histo.values)
    seen, cum = set(), []
    for bk in histo.index:
        seen |= set(b.loc[b["bucket"] == bk, "lang"])
        cum.append(len(seen))
    assert list(got["cum_distinct"]) == cum


def test_bucket_script(reader, mdf):
    got = reader.search_bucket_script(
        Q, F.length("content"), 500).toPandas()
    b = mdf.assign(bucket=np.floor(mdf["dlen"] / 500) * 500)
    g = b.groupby("bucket")["dlen"].agg(["count", "sum", "mean"])
    assert list(got["bucket"]) == list(g.index)
    assert list(got["n_docs"]) == list(g["count"])
    assert list(got["avg_v"]) == [round(x, 6) for x in g["mean"]]
    assert list(got["pct_docs"]) == [
        round(c / g["count"].sum() * 100.0, 6) for c in g["count"]]


def _walk_diversified(scored: pd.DataFrame, cap: int, n: int
                      ) -> pd.DataFrame:
    """ES's documented semantics: walk docs in (score desc, doc_id asc)
    order, skip docs whose dedup value already has `cap` picks, stop at
    `n` — per shard."""
    out = []
    for _, sub in scored.groupby("shard"):
        sub = sub.sort_values(["score", "doc_id"],
                              ascending=[False, True], kind="mergesort")
        counts, picks = {}, []
        for _, r in sub.iterrows():
            if counts.get(r["value"], 0) >= cap:
                continue
            counts[r["value"]] = counts.get(r["value"], 0) + 1
            picks.append(r)
            if len(picks) >= n:
                break
        out.extend(picks)
    return pd.DataFrame(out)


@pytest.mark.parametrize("cap,n", [(1, 5), (2, 8)])
def test_diversified_sampler_walk_equivalence(reader, corpus, cap, n):
    got = reader.search_diversified_sampler(
        Q, sample_top=n, dedup_col=F.col("lang"), max_per_value=cap,
        score_round=6).toPandas()
    scored = reader.scored_matches(Q).toPandas()
    scored["score"] = scored["score"].round(6)
    scored = scored.merge(
        corpus[["doc_id", "lang"]].rename(columns={"lang": "value"}),
        on="doc_id")
    want = _walk_diversified(scored, cap, n)
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    # cap is respected per (shard, value)
    assert got.merge(scored[["doc_id", "shard"]], on="doc_id") \
              .groupby(["shard", "value"]).size().max() <= cap


def test_geotile_grid(reader, mdf):
    got = reader.search_geotile_grid(
        Q, (F.col("doc_id") % 120 - 60).cast("double"),
        (F.col("doc_id") % 340 - 170).cast("double"), zoom=3).toPandas()
    lat = (mdf["doc_id"] % 120 - 60).astype(float)
    lon = (mdf["doc_id"] % 340 - 170).astype(float)
    x = np.floor((lon + 180.0) / 360.0 * 8.0).astype(int)
    phi = np.radians(lat)
    merc = (1.0 - np.log(np.tan(phi) + 1.0 / np.cos(phi))
            / np.pi) / 2.0 * 8.0
    y = np.floor(np.round(merc, 9)).astype(int)
    tiles = pd.Series([f"3/{a}/{b}" for a, b in zip(x, y)])
    want = tiles.value_counts()
    gm = dict(zip(got["tile"], got["n_docs"]))
    assert gm == want.to_dict()
    # ordered (n_docs desc, tile asc)
    assert list(got.sort_values(["n_docs", "tile"],
                                ascending=[False, True])["tile"]) \
        == list(got["tile"])


def test_geo_centroid(reader, mdf):
    got = reader.search_geo_centroid(
        Q, (F.col("doc_id") % 120 - 60).cast("double"),
        (F.col("doc_id") % 340 - 170).cast("double")).collect()[0]
    lat = (mdf["doc_id"] % 120 - 60).astype(float)
    lon = (mdf["doc_id"] % 340 - 170).astype(float)
    assert got["centroid_lat"] == round(float(lat.mean()), 6)
    assert got["centroid_lon"] == round(float(lon.mean()), 6)
    assert got["n_docs"] == len(mdf)


def test_geo_bounds(reader, mdf):
    got = reader.search_geo_bounds(
        Q, (F.col("doc_id") % 120 - 60).cast("double"),
        (F.col("doc_id") % 340 - 170).cast("double")).collect()[0]
    lat = (mdf["doc_id"] % 120 - 60).astype(float)
    lon = (mdf["doc_id"] % 340 - 170).astype(float)
    assert got["top"] == round(float(lat.max()), 6)
    assert got["bottom"] == round(float(lat.min()), 6)
    assert got["left"] == round(float(lon.min()), 6)
    assert got["right"] == round(float(lon.max()), 6)
    assert got["n_docs"] == len(mdf)


def test_rate_agg_calendar_divisor(reader, mdf):
    # 90-day runtime ts spread: Feb's rate divides by 28, Jan/Mar by 31
    ts = F.expr("timestamp'2025-01-01 00:00:00' + make_interval("
                "0, 0, 0, 0, CAST(doc_id * 8 % 2160 AS INT), 0, 0)")
    got = reader.search_rate(Q, ts, interval="month",
                             unit="day").toPandas()
    t = (pd.Timestamp("2025-01-01")
         + pd.to_timedelta(mdf["doc_id"] * 8 % 2160, unit="h"))
    per = t.dt.strftime("%Y-%m").value_counts().sort_index()
    days = {"2025-01": 31, "2025-02": 28, "2025-03": 31}
    assert list(got["bucket"]) == list(per.index)
    for _, r in got.iterrows():
        assert r["n_docs"] == per[r["bucket"]]
        assert r["rate_per_day"] == round(
            per[r["bucket"]] / days[r["bucket"]], 6)
    assert set(got["bucket"]) == set(days)   # all three months hit


def test_rate_agg_rejects_unsupported_units(reader):
    with pytest.raises(ValueError, match="calendar-aware"):
        reader.search_rate(Q, F.lit("2025-01-01").cast("timestamp"),
                           interval="week", unit="day")


# ------------------------------------------------------- geohash_grid

def _py_geohash(lat: float, lon: float, p: int) -> str:
    """Independent reference: the classic interval-halving geohash."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = [], [], True
    while len(out) < p:
        rng = lon_r if even else lat_r
        v = lon if even else lat
        mid = (rng[0] + rng[1]) / 2
        if v >= mid:
            bits.append(1)
            rng[0] = mid
        else:
            bits.append(0)
            rng[1] = mid
        even = not even
        if len(bits) == 5:
            out.append(b32[int("".join(map(str, bits)), 2)])
            bits = []
    return "".join(out)


def test_geohash_col_known_vectors(spark):
    from maestro_spark.operators.search import geohash_col
    pts = [(42.6, -5.6, 5, "ezs42"),
           (57.64911, 10.40744, 11, "u4pruydqqvj"),
           (-25.382708, -49.265506, 8, "6gkzwgjz"),
           (0.0, 0.0, 3, "s00"),
           (-89.9, -179.9, 4, "0000"),
           (89.9, 179.9, 4, "zzzz")]
    df = spark.createDataFrame([(la, lo) for la, lo, _, _ in pts],
                               "lat double, lon double").toPandas()
    for (la, lo, p, want) in pts:
        got = (spark.createDataFrame([(la, lo)], "lat double, lon double")
               .select(geohash_col(F.col("lat"), F.col("lon"), p)
                       .alias("g")).head()["g"])
        assert got == want == _py_geohash(la, lo, p), (la, lo, p)
    assert len(df) == len(pts)  # keep the frame referenced


def test_geohash_col_randomized(spark):
    from maestro_spark.operators.search import geohash_col
    # the 0.0503717 offset keeps every point far (>> 1 ulp) from any
    # geohash cell boundary: a point within one ulp of a boundary can
    # legitimately land on either side depending on whether the
    # algorithm quantizes (closed form, both engines identically) or
    # halves intervals (this reference) — e.g. lon=11.24999999999999
    # where (lon+180.0) correctly rounds to exactly 191.25
    rows = [(((i * 37) % 1800) / 10.0 - 90.0 + 0.0503717,
             ((i * 53) % 3600) / 10.0 - 180.0 + 0.0503717)
            for i in range(200)]
    for p in (1, 4, 7):
        got = (spark.createDataFrame(rows, "lat double, lon double")
               .select("lat", "lon",
                       geohash_col(F.col("lat"), F.col("lon"), p)
                       .alias("g")).collect())
        for r in got:
            assert r["g"] == _py_geohash(r["lat"], r["lon"], p), (r, p)


def test_geohash_grid(reader, mdf):
    got = reader.search_geohash_grid(
        Q, (F.col("doc_id") % 120 - 60).cast("double"),
        (F.col("doc_id") % 340 - 170).cast("double"),
        precision=3).toPandas()
    lat = (mdf["doc_id"] % 120 - 60).astype(float)
    lon = (mdf["doc_id"] % 340 - 170).astype(float)
    cells = pd.Series([_py_geohash(a, o, 3) for a, o in zip(lat, lon)])
    want = cells.value_counts()
    assert dict(zip(got["geohash"], got["n_docs"])) == want.to_dict()
    # ordered (n_docs desc, geohash asc) and the size cap keeps the head
    assert list(got.sort_values(["n_docs", "geohash"],
                                ascending=[False, True])["geohash"]) \
        == list(got["geohash"])
    capped = reader.search_geohash_grid(
        Q, (F.col("doc_id") % 120 - 60).cast("double"),
        (F.col("doc_id") % 340 - 170).cast("double"),
        precision=3, size=5).toPandas()
    assert list(capped["geohash"]) == list(got["geohash"][:5])


# --------------------------------------- terms_lookup + global agg

def test_terms_lookup_fetch(reader, corpus):
    row = corpus[corpus["doc_id"] == 5].iloc[0]
    got = reader.terms_lookup(5, F.array(F.col("lang"), F.col("repo")))
    assert got == [row["lang"], row["repo"]]
    # scalar path wraps to a 1-list; missing doc -> []
    assert reader.terms_lookup(5, F.col("lang")) == [row["lang"]]
    assert reader.terms_lookup(10 ** 9, F.col("lang")) == []


def test_global_agg(reader, corpus, match_ids):
    got = reader.search_global_agg(Q, "lang").toPandas()
    want_g = corpus["lang"].value_counts()
    want_m = corpus[corpus["doc_id"].isin(match_ids)]["lang"].value_counts()
    assert list(got["lang"]) == sorted(want_g.index)
    for _, r in got.iterrows():
        assert r["n_global"] == want_g[r["lang"]]
        assert r["n_matched"] == want_m.get(r["lang"], 0)


def test_global_agg_empty_query_keeps_global(reader, corpus):
    got = reader.search_global_agg("zzznopeterm", "lang").toPandas()
    assert (got["n_matched"] == 0).all()
    assert got["n_global"].sum() == len(corpus)


# --------------------------- moving_percentiles + scripted_metric

def test_moving_percentiles(reader, mdf):
    got = reader.search_moving_percentiles(
        Q, F.length("content"), 500.0, window=2,
        pcts=(0.5, 0.9)).toPandas()
    b = mdf.assign(bucket=np.floor(mdf["dlen"] / 500) * 500)
    hist = b.groupby("bucket").size().sort_index()
    assert list(got["bucket"]) == list(hist.index)
    assert list(got["n_docs"]) == list(hist.values)
    for _, r in got.iterrows():
        win = b[(b["bucket"] >= r["bucket"] - 500.0)
                & (b["bucket"] <= r["bucket"])]["dlen"].to_numpy()
        assert r["p50"] == round(
            float(np.percentile(win, 50, method="linear")), 6), r["bucket"]
        assert r["p90"] == round(
            float(np.percentile(win, 90, method="linear")), 6), r["bucket"]


def test_scripted_metric_multi_shard(reader, mdf):
    signed = (F.when(F.col("lang") == "java", F.length("content"))
              .otherwise(-F.length("content"))).cast("double")
    combined = reader.search_scripted_metric(
        Q, {"sv": signed},
        [F.sum("sv").alias("ssum"), F.count("*").alias("sn")]).toPandas()
    # per-shard combine states (the ES _shards view): 300 docs at
    # shard_size=128 -> matches spread over >= 2 shards
    assert len(combined) >= 2
    b = mdf.assign(sv=np.where(mdf["lang"] == "java",
                               mdf["dlen"], -mdf["dlen"]),
                   shard=mdf["doc_id"] // 128)
    want = b.groupby("shard")["sv"].agg(["sum", "count"]).sort_index()
    assert list(combined["shard"]) == list(want.index)
    assert list(combined["ssum"]) == list(want["sum"])
    assert list(combined["sn"]) == list(want["count"])
    reduced = reader.search_scripted_metric(
        Q, {"sv": signed},
        [F.sum("sv").alias("ssum")],
        [F.round(F.sum("ssum"), 6).alias("total"),
         F.count("*").cast("long").alias("n_shards")]).collect()[0]
    assert reduced["total"] == round(float(b["sv"].sum()), 6)
    assert reduced["n_shards"] == len(want)


# ------------------------------------------------ geo_polygon query

def _py_point_in_poly(lat, lon, poly):
    inside = False
    n = len(poly)
    for i in range(n):
        yi, xi = poly[i]
        yj, xj = poly[(i + 1) % n]
        if yi == yj:
            continue
        if ((yi > lat) != (yj > lat)) and \
                lon < (xj - xi) * (lat - yi) / (yj - yi) + xi:
            inside = not inside
    return inside


@pytest.mark.parametrize("poly", [
    [(40.0, -50.0), (40.0, 50.0), (-40.0, 50.0), (-40.0, -50.0)],  # box
    [(50.0, -60.0), (55.0, 30.0), (0.0, 70.0),
     (-45.0, 20.0), (-30.0, -70.0)],                               # pentagon
    [(30.0, -30.0), (30.0, 30.0), (-30.0, 0.0),
     (10.0, -60.0), (10.0, 60.0)],                                 # star (self-intersecting, even-odd)
])
def test_geo_polygon_vs_brute(reader, mdf, poly):
    lat_e = (F.col("doc_id") % 120 - 60).cast("double")
    lon_e = (F.col("doc_id") % 340 - 170).cast("double")
    got = [r["doc_id"] for r in reader.search_geo_polygon(
        Q, lat_e, lon_e, poly, k=10 ** 6).collect()]
    want = sorted(
        int(d) for d in mdf["doc_id"]
        if _py_point_in_poly(float(d % 120 - 60), float(d % 340 - 170),
                             poly))
    assert got == want and want


def test_geo_polygon_box_equals_bbox(reader):
    lat_e = (F.col("doc_id") % 120 - 60).cast("double")
    lon_e = (F.col("doc_id") % 340 - 170).cast("double")
    # a rectangle polygon must agree with the bounding-box query on
    # interior points (edges differ: bbox is inclusive, crossing strict)
    poly = [(40.0, -50.0), (40.0, 50.0), (-40.0, 50.0), (-40.0, -50.0)]
    pg = {r["doc_id"] for r in reader.search_geo_polygon(
        Q, lat_e, lon_e, poly, k=10 ** 6).collect()}
    bb = {r["doc_id"] for r in reader.search_geo_bounding_box(
        Q, lat_e, lon_e, top=40.0, left=-50.0, bottom=-40.0,
        right=50.0, k=10 ** 6).collect()}
    assert pg <= bb
    border = {d for d in bb - pg
              if abs(d % 120 - 60) == 40 or abs(d % 340 - 170) == 50}
    assert border == bb - pg


def test_geo_polygon_rejects_degenerate(reader):
    with pytest.raises(ValueError):
        reader.search_geo_polygon(Q, "lang", "lang", [(0.0, 0.0),
                                                      (1.0, 1.0)])


# ------------------------------------- approximate terms agg (ES mode)

def _es_terms_approx(per: pd.DataFrame, shard_size: int, size: int):
    """Reference: ES's per-shard top-shard_size merge with the
    documented doc_count_error_upper_bound."""
    kept, floors = [], {}
    for s, sub in per.groupby("shard"):
        sub = sub.sort_values(["cnt", "value"],
                              ascending=[False, True], kind="mergesort")
        top = sub.head(shard_size)
        kept.append(top)
        floors[s] = 0 if len(sub) <= shard_size else int(top["cnt"].min())
    k = pd.concat(kept)
    rows = []
    for v, sub in k.groupby("value"):
        present = set(sub["shard"])
        err = sum(f for s, f in floors.items() if s not in present)
        rows.append((v, int(sub["cnt"].sum()), err))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:size]


@pytest.mark.parametrize("shard_size,size", [(1, 5), (2, 4), (50, 10)])
def test_terms_approx_vs_reference(reader, mdf, shard_size, size):
    got = [(r["value"], int(r["n_docs"]), int(r["err_bound"]))
           for r in reader.search_terms_approx(
               Q, "lang", size=size, shard_size=shard_size).collect()]
    per = (mdf.assign(shard=mdf["doc_id"] // 128)
           .groupby(["shard", "lang"]).size().rename("cnt")
           .reset_index().rename(columns={"lang": "value"}))
    assert per["shard"].nunique() >= 2  # genuinely multi-shard
    assert got == _es_terms_approx(per, shard_size, size)


def test_terms_approx_exhaustive_equals_exact(reader, mdf):
    """shard_size >= distinct values per shard -> exact counts and a
    zero error bound on every bucket (ES's exhausted-shard rule)."""
    got = reader.search_terms_approx(Q, "lang", size=100,
                                     shard_size=10 ** 6).toPandas()
    want = mdf["lang"].value_counts()
    assert dict(zip(got["value"], got["n_docs"])) == want.to_dict()
    assert (got["err_bound"] == 0).all()


# --------------------------- min_score + random_sampler quick checks

def test_search_min_score_equals_postfilter(reader):
    full = reader.search(Q, k=10).toPandas()
    thr = float(full["score"].iloc[4]) + 1e-12
    got = reader.search_min_score(Q, thr, k=10).toPandas()
    want = full[full["score"] >= thr]
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert 0 < len(got) < len(full)


def test_random_sampler_deterministic_and_scaled(reader, mdf):
    a = reader.search_random_sampler(Q, 0.5, "lang").toPandas()
    b = reader.search_random_sampler(Q, 0.5, "lang").toPandas()
    assert a.equals(b)                       # no RNG state
    assert (a["est_docs"] == a["sampled_docs"] / 0.5).all()
    # p=1 degenerates to the exact terms agg
    full = reader.search_random_sampler(Q, 1.0, "lang").toPandas()
    want = mdf["lang"].value_counts()
    assert dict(zip(full["value"], full["sampled_docs"])) == want.to_dict()
    with pytest.raises(ValueError):
        reader.search_random_sampler(Q, 0.0, "lang")

"""Golden tests for the nested document model (P1-P5, X7) — mirrors the
reference's fixture tests: CRAM/BAM/VCF index-file association
(DefaultIndexerTest.java:363-414), donor-tree grouping
(DocumentConverterHelperTest.java:22,42), data-file predicates
(FileCentricDocumentConverter.java:189-250), and the same-element nested
query semantics plus the filtered-BM25 engine path."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from maestro_spark.operators import nested
from maestro_spark.operators.build import IndexConfig, build_index
from maestro_spark.operators.search import IndexReader


FILES = [
    # (object_id, name, size, md5sum, data_type)
    ("o1", "c1.cram", 10, "m1", "aln"),
    ("o2", "c1.cram.crai", 1, "m2", "aln"),
    ("o3", "v1.vcf.gz", 20, "m3", "var"),
    ("o4", "v1.vcf.gz.TBI", 2, "m4", "var"),      # case-insensitive match
    ("o5", "b1.bam", 30, "m5", "aln"),
    ("o6", "B1.BAM.bai", 3, "m6", "aln"),
    ("o7", "report.xml", 5, "m7", "meta"),
    ("o8", "d1.txt", 7, "m8", "other"),
]
SAMPLES = [
    # (donor_id, gender, specimen_id, specimen_type, sample_id, sample_type)
    ("d1", "Female", "sp1", "Normal", "sm1", "DNA"),
    ("d1", "Female", "sp1", "Normal", "sm2", "RNA"),
    ("d1", "Female", "sp2", "Tumour", "sm3", "DNA"),
    ("d2", "Male", "sp3", "Normal", "sm4", "DNA"),
]


@pytest.fixture(scope="module")
def analysis_df(spark):
    row = {
        "analysis_id": "an1", "analysis_state": "PUBLISHED",
        "analysis_type": "sequencing", "study_id": "ST1",
        "files": [dict(zip(("object_id", "name", "size", "md5sum", "data_type"), f))
                  for f in FILES],
        "samples": [dict(zip(("donor_id", "gender", "specimen_id",
                              "specimen_type", "sample_id", "sample_type"), s))
                    for s in SAMPLES],
        "repository": {"code": "repo1", "organization": "org",
                       "name": "Repo", "url": "http://r", "country": "CA",
                       "storage_type": "S3"},
    }
    return spark.createDataFrame(
        [row],
        "analysis_id string, analysis_state string, analysis_type string, "
        "study_id string, "
        "files array<struct<object_id:string,name:string,size:long,"
        "md5sum:string,data_type:string>>, "
        "samples array<struct<donor_id:string,gender:string,"
        "specimen_id:string,specimen_type:string,sample_id:string,"
        "sample_type:string>>, "
        "repository struct<code:string,organization:string,name:string,"
        "url:string,country:string,storage_type:string>",
    )


def test_file_predicates_golden(spark):
    cases = [
        # (name, is_data, is_index)  — reference hasExtension quirks incl.
        # compression suffixes on either side
        ("c1.cram", True, False),
        ("c1.cram.crai", False, True),
        ("v1.vcf.gz", True, False),
        ("v1.vcf.gz.tbi", False, True),
        ("X.BAM.BAI", False, True),
        ("x.bai.gz", False, True),        # ext + compression suffix
        ("x.gzbai", False, True),         # suffix + ext (endsWith(s+ext))
        ("report.xml", False, False),     # xml: neither data nor index
        ("archive.xml.gz", False, False),
        ("d1.txt", True, False),
        ("v2.vcf.tcg", True, False),      # .tcg NOT in isIndexFile (quirk)
    ]
    df = spark.createDataFrame([(n,) for n, _, _ in cases], "name string")
    got = df.select(
        "name",
        nested.is_data_file(F.col("name")).alias("d"),
        nested.is_index_file(F.col("name")).alias("i"),
    ).collect()
    for (name, want_d, want_i), r in zip(cases, got):
        assert r["d"] == want_d, f"is_data_file({name})"
        assert r["i"] == want_i, f"is_index_file({name})"


def test_build_file_docs_golden(analysis_df):
    out = nested.build_file_docs(analysis_df).orderBy("object_id").collect()
    # only data files survive (cram, vcf, bam, txt — not crai/tbi/bai/xml)
    assert [r["object_id"] for r in out] == ["o1", "o3", "o5", "o8"]
    by_id = {r["object_id"]: r for r in out}
    # CRAM → .crai (DefaultIndexerTest CRAM case)
    assert by_id["o1"]["file"]["index_file"]["object_id"] == "o2"
    assert by_id["o1"]["file"]["index_file"]["file_type"] == "CRAI"
    # VCF → .tbi, matched case-insensitively
    assert by_id["o3"]["file"]["index_file"]["object_id"] == "o4"
    assert by_id["o3"]["file"]["index_file"]["file_type"] == "TBI"
    # BAM → .bai, candidate name built from data-file name, equalsIgnoreCase
    assert by_id["o5"]["file"]["index_file"]["object_id"] == "o6"
    # plain data file: no index association
    assert by_id["o8"]["file"]["index_file"] is None
    # nested analysis + repositories
    assert by_id["o1"]["analysis"]["analysis_id"] == "an1"
    assert by_id["o1"]["repositories"][0]["code"] == "repo1"
    # donor tree: d1{sp1[sm1,sm2], sp2[sm3]}, d2{sp3[sm4]}
    donors = by_id["o1"]["donors"]
    assert [d["donor_id"] for d in donors] == ["d1", "d2"]
    d1 = donors[0]
    assert [sp["specimen_id"] for sp in d1["specimens"]] == ["sp1", "sp2"]
    assert [sm["sample_id"] for sm in d1["specimens"][0]["samples"]] == ["sm1", "sm2"]
    assert [sm["sample_id"] for sm in d1["specimens"][1]["samples"]] == ["sm3"]
    assert donors[1]["specimens"][0]["samples"][0]["sample_id"] == "sm4"


def test_build_analysis_docs(analysis_df):
    out = nested.build_analysis_docs(analysis_df).collect()
    assert len(out) == 1
    doc = out[0]
    assert [f["object_id"] for f in doc["files"]] == ["o1", "o3", "o5", "o8"]
    assert len(doc["donors"]) == 2


def test_nested_exists_same_element(spark):
    df = spark.createDataFrame(
        [("A", [{"x": 1, "y": 2}]),
         ("B", [{"x": 1, "y": 9}, {"x": 5, "y": 2}])],
        "id string, els array<struct<x:long,y:long>>",
    )
    same = df.where(nested.nested_exists(
        F.col("els"), lambda e: e["x"] == 1, lambda e: e["y"] == 2))
    assert [r["id"] for r in same.collect()] == ["A"]
    # flattened per-field exists (the WRONG semantics) would match B too
    flat = df.where(
        F.exists(F.col("els"), lambda e: e["x"] == 1)
        & F.exists(F.col("els"), lambda e: e["y"] == 2))
    assert {r["id"] for r in flat.collect()} == {"A", "B"}


def test_search_doc_filter_exact(spark, tmp_path):
    """Filtered BM25 (X7 + doc_filter) == brute-force filter of the FULL
    score table — the true filtered top-k, incl. same-element nested
    predicates on a stored array<struct> column."""
    idx = str(tmp_path / "idx")
    n = 120
    rows = []
    for i in range(n):
        words = ["alpha"] * (i % 3 + 1) + ["beta"] * (i % 5) + ["gamma"]
        tags = [{"k": "t%d" % (i % 4), "v": "v%d" % (i % 3)}]
        if i % 7 == 0:
            tags.append({"k": "special", "v": "gold"})
        rows.append(("r%d" % (i % 4), "p%d.py" % i, "c0", "py",
                     " ".join(words), tags))
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, tags array<struct<k:string,v:string>>")
    cfg = IndexConfig(shard_size=40, n_buckets=4, n_salts=2,
                      sample_fraction=1.0, stored_columns=("tags",))
    build_index(spark, docs, idx, cfg)
    reader = IndexReader(spark, idx)
    pred = nested.nested_exists(
        F.col("tags"), lambda t: t["k"] == "special", lambda t: t["v"] == "gold")

    got = reader.search("alpha beta", k=10, doc_filter=pred).toPandas()
    full = reader.search("alpha beta", k=n).toPandas()
    allowed_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{idx}/docs").where(pred).collect()
    }
    want = (
        full[full["doc_id"].isin(allowed_ids)]
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_exact=True)
    assert len(got) == 10 and set(got["doc_id"]) <= allowed_ids

    # AND mode with filter
    got_and = reader.search("alpha beta", k=10, mode="and",
                            doc_filter=pred).toPandas()
    full_and = reader.search("alpha beta", k=n, mode="and").toPandas()
    want_and = (
        full_and[full_and["doc_id"].isin(allowed_ids)]
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(10).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_and.reset_index(drop=True), want_and,
                                  check_exact=True)


def test_search_many_matches_single(spark, tmp_path):
    """search_many (msearch, one Spark job) returns EXACTLY what N
    separate search() calls return — same docs, bit-identical scores."""
    idx = str(tmp_path / "idxm")
    rows = [("r0", "p%d" % i, "c0", "py",
             " ".join(["alpha"] * (i % 3 + 1) + ["beta"] * (i % 5)
                      + ["gamma", "delta"][: i % 2 + 1]))
            for i in range(100)]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    cfg = IndexConfig(shard_size=40, n_buckets=4, n_salts=2, sample_fraction=1.0)
    build_index(spark, docs, idx, cfg)
    reader = IndexReader(spark, idx)
    queries = {"q1": "alpha beta", "q2": "gamma delta", "q3": "beta",
               "q4": "zzz_absent"}
    many = reader.search_many(queries, k=7).toPandas()
    for qid, q in queries.items():
        single = reader.search(q, k=7).toPandas().reset_index(drop=True)
        got = many[many["qid"] == qid][["doc_id", "score"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, single, check_exact=True)
    assert set(many["qid"]) == {"q1", "q2", "q3"}  # q4 has no hits


def test_search_boosts_rank_identical(spark, tmp_path):
    """BM25F boosts == brute-force per-field weighted sum (rank-identical
    on exact float64 scores)."""
    idx = str(tmp_path / "idxb")
    rows = []
    langs = ["py", "java", "go"]
    for i in range(90):
        content = " ".join(["stream"] * (i % 4) + ["merge"] * (i % 3) + ["base"])
        rows.append(("r0", "p%d" % i, "c0", langs[i % 3], content))
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string")
    cfg = IndexConfig(shard_size=30, n_buckets=4, n_salts=2,
                      sample_fraction=1.0, index_fields=("content", "lang"))
    build_index(spark, docs, idx, cfg)
    reader = IndexReader(spark, idx)
    boosts = {"lang": 2.5, "content": 1.0}
    got = reader.search("lang:java stream merge", k=90, boosts=boosts).toPandas()

    # brute force: unboosted per-field scores recombined with weights
    content_only = reader.search("stream merge", k=90).toPandas().set_index("doc_id")
    lang_only = reader.search("lang:java", k=90).toPandas().set_index("doc_id")
    ids = sorted(set(content_only.index) | set(lang_only.index))
    import numpy as np
    want = pd.DataFrame({
        "doc_id": ids,
        "score": [1.0 * content_only["score"].get(i, 0.0)
                  + 2.5 * lang_only["score"].get(i, 0.0) for i in ids],
    })
    want = want.sort_values(["score", "doc_id"], ascending=[False, True]
                            ).reset_index(drop=True)
    got = got.reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert np.allclose(got["score"], want["score"], rtol=0, atol=1e-12)

"""Nested document model — first-class operators for the reference's
document-build pipeline (SURVEY.md §2.3 P1-P5, §2.10 X7), Spark-first:

  * P3  is_data_file / is_index_file / is_xml_file — column predicates
        mirroring FileCentricDocumentConverter.isDataFile/hasExtension
        (FileCentricDocumentConverter.java:189-250): extension match is
        case-insensitive and tolerant of .gz/.zip/.b2zip compression
        suffixes on EITHER side of the extension (the reference checks
        endsWith(ext+suffix) and endsWith(suffix+ext)).
  * P4  index_file_for — within-analysis index-file association
        (getIndexFile/findIndexFile, FileCentricDocumentConverter.java:
        148-187): BAM→name+".bai", CRAM→name+".crai", VCF→first of
        name+".tbi"/".idx"/".tcg", matched equalsIgnoreCase against the
        SAME analysis's file array. Pure array higher-order functions —
        zero shuffle, exactly the per-group lookup the reference runs
        in memory per analysis.
  * P5  two_level_tree — the donor→specimen→sample group-merge
        (DocumentConverterHelper.getDonors:133-141, mergeDonorBySpecimen
        :71-107, groupSpecimensBySample:109-131) generalized: rows →
        groupBy(root, mid) collect leaf structs → groupBy(root) collect
        mid structs. Arrays are array_sort-ed: the reference's
        HashMap-valued groupingBy leaves order unspecified, we pin a
        deterministic one (sorted by struct fields ascending).
  * P1/P2 build_file_docs — analysis rows → one nested-struct document
        per DATA file (FileCentricDocumentConverter.fromAnalysis:69-126):
        explode(files) → filter(is_data_file) → project file struct with
        its index_file + analysis struct + repositories[1] + donors tree.
  * X7  nested same-element predicates — per-element semantics over
        array<struct> (ES `nested` queries, file_centric.json:152-226):
        F.exists/F.filter lambdas keep ALL conjuncts on the SAME array
        element, unlike flattened per-field exists. Combined with BM25
        ranking via IndexReader.search(doc_filter=...) (operators/
        search.py), which intersects the predicate's doc set inside the
        per-shard scorer.

Scale notes: P1-P4 are narrow (explode + HOFs — no shuffle beyond the
source scan); P5 is two hash-partitioned groupBys on (root, mid) then
(root) — the same shuffle shape as any aggregation, skew-bounded by the
fan-out of one root key. Nothing here is a Python UDF; everything stays
in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# FileCentricDocumentConverter.java:42-59 constants (public format names)
INDEX_EXTS = ("bai", "crai", "tbi", "idx")
COMPRESSION_SUFFIXES = ("", ".gz", ".zip", ".b2zip")


def has_extension(name: Column, ext: str) -> Column:
    """hasExtension(filename, ext) — FileCentricDocumentConverter.java:
    237-250: lowercase; true if the name ends with ext+suffix OR
    suffix+ext for any compression suffix in {"", .gz, .zip, .b2zip}."""
    f = F.lower(name)
    e = ext.lower()
    pred = F.lit(False)
    for s in COMPRESSION_SUFFIXES:
        pred = pred | f.endswith(e + s) | f.endswith(s + e)
    return pred


def is_xml_file(name: Column) -> Column:
    return has_extension(name, "xml")


def is_index_file(name: Column) -> Column:
    """BAI/CRAI/TBI/IDX (note: .tcg is associated as a VCF index but is
    NOT in the reference's isIndexFile set — mirrored verbatim,
    FileCentricDocumentConverter.java:214-219)."""
    pred = F.lit(False)
    for ext in INDEX_EXTS:
        pred = pred | has_extension(name, ext)
    return pred


def is_data_file(name: Column) -> Column:
    """P3: a data file is anything that is neither an index file nor XML
    (FileCentricDocumentConverter.java:189-192)."""
    return ~(is_index_file(name) | is_xml_file(name))


def index_file_format(name: Column) -> Column:
    """indexFileFormat — first matching format name, uppercased
    (FileCentricDocumentConverter.java:221-235)."""
    out = F.lit(None).cast("string")
    expr = F.when(has_extension(name, "bai"), F.lit("BAI"))
    for ext, label in (("crai", "CRAI"), ("tbi", "TBI"), ("idx", "IDX")):
        expr = expr.when(has_extension(name, ext), F.lit(label))
    return expr.otherwise(out)


def _find_file(files: Column, name: Column) -> Column:
    """findIndexFile: first element of the analysis's file array whose
    name equalsIgnoreCase the candidate (FileCentricDocumentConverter.
    java:182-187). element_at(filter(...), 1) — null when absent."""
    return F.element_at(
        F.filter(files, lambda g: F.lower(g["name"]) == F.lower(name)), 1)


def index_file_for(files: Column, name: Column) -> Column:
    """P4: the index-file struct associated with data file `name` inside
    the same analysis's `files` array, or null (getIndexFile,
    FileCentricDocumentConverter.java:148-170): BAM→.bai, CRAM→.crai,
    VCF→first present of .tbi/.idx/.tcg."""
    bam = _find_file(files, F.concat(name, F.lit(".bai")))
    crai = _find_file(files, F.concat(name, F.lit(".crai")))
    vcf = F.coalesce(
        *[_find_file(files, F.concat(name, F.lit(ext)))
          for ext in (".tbi", ".idx", ".tcg")])
    return (
        F.when(has_extension(name, "bam"), bam)
        .when(has_extension(name, "cram"), crai)
        .when(has_extension(name, "vcf"), vcf)
    )


def two_level_tree(
    rows: DataFrame,
    root_keys: list[str],
    mid_keys: list[str],
    mid_payload: list[str],
    leaf_cols: list[str],
    mid_name: str,
    leaf_name: str,
) -> DataFrame:
    """P5/A1: (root, mid, leaf) rows → one row per root with a sorted
    array of mid structs, each carrying its sorted array of leaf structs.

    The distributed donor-tree assembly: groupBy(root, mid) collects the
    leaf level map-side-combined, groupBy(root) collects the mid level —
    two shuffles total, both on uniform grouping keys."""
    leaf_struct = F.struct(*[F.col(c) for c in leaf_cols])
    lvl1 = rows.groupBy(*root_keys, *mid_keys).agg(
        F.array_sort(F.collect_list(leaf_struct)).alias(leaf_name),
        *[F.first(c).alias(c) for c in mid_payload],
    )
    mid_struct = F.struct(
        *[F.col(c) for c in mid_keys + mid_payload], F.col(leaf_name))
    return lvl1.groupBy(*root_keys).agg(
        F.array_sort(F.collect_list(mid_struct)).alias(mid_name))


def assemble_donor_tree(analyses: DataFrame,
                        samples_col: str = "samples") -> DataFrame:
    """getDonors (DocumentConverterHelper.java:133-141): per analysis,
    explode the flat sample rows (each carrying its donor + specimen,
    Sample.java field shape) and regroup donor→specimens→samples.
    Returns (analysis_id, donors array<struct>)."""
    rows = analyses.select(
        "analysis_id", F.explode(samples_col).alias("s")
    ).select(
        "analysis_id",
        F.col("s.donor_id").alias("donor_id"),
        F.col("s.gender").alias("gender"),
        F.col("s.specimen_id").alias("specimen_id"),
        F.col("s.specimen_type").alias("specimen_type"),
        F.col("s.sample_id").alias("sample_id"),
        F.col("s.sample_type").alias("sample_type"),
    )
    return two_level_tree(
        rows,
        # gender rides in the grouping key (functionally dependent on
        # donor_id) so the donor payload survives the two-level merge
        root_keys=["analysis_id", "donor_id", "gender"],
        mid_keys=["specimen_id"],
        mid_payload=["specimen_type"],
        leaf_cols=["sample_id", "sample_type"],
        mid_name="specimens",
        leaf_name="samples",
    ).groupBy("analysis_id").agg(
        F.array_sort(F.collect_list(F.struct(
            F.col("donor_id"), F.col("gender"), F.col("specimens")
        ))).alias("donors")
    )


def build_file_docs(analyses: DataFrame) -> DataFrame:
    """P1: analysis rows → one nested document per DATA file
    (FileCentricDocumentConverter.fromAnalysis/extractFiles/
    buildFileDocument:69-126). Expected input columns:
      analysis_id, analysis_state, analysis_type, study_id,
      files   array<struct<object_id,name,size,md5sum,data_type>>,
      samples array<struct<donor_id,gender,specimen_id,specimen_type,
                           sample_id,sample_type>>,
      repository struct<code,organization,name,url,country,storage_type>
    Output: one row per data file with nested analysis / file(+index_file)
    / repositories[] / donors[] — the FileCentricDocument shape."""
    donors = assemble_donor_tree(analyses)
    exploded = analyses.select(
        "analysis_id", "analysis_state", "analysis_type", "study_id",
        "repository", "files", F.explode("files").alias("f"),
    ).where(is_data_file(F.col("f.name")))
    idx = index_file_for(F.col("files"), F.col("f.name"))
    docs = exploded.select(
        F.col("f.object_id").alias("object_id"),
        F.col("study_id"),
        F.col("f.data_type").alias("data_type"),
        F.struct(
            F.col("analysis_id"), F.col("analysis_state"),
            F.col("analysis_type"),
        ).alias("analysis"),
        F.struct(
            F.col("f.name").alias("name"),
            F.col("f.size").alias("size"),
            F.col("f.md5sum").alias("md5sum"),
            F.col("f.data_type").alias("data_type"),
            F.when(idx.isNotNull(), F.struct(
                idx["object_id"].alias("object_id"),
                idx["name"].alias("name"),
                index_file_format(idx["name"]).alias("file_type"),
                idx["size"].alias("size"),
                idx["md5sum"].alias("md5sum"),
            )).alias("index_file"),
        ).alias("file"),
        F.array(F.col("repository")).alias("repositories"),
        F.col("analysis_id").alias("_aid"),
    )
    return (
        docs.join(donors.withColumnRenamed("analysis_id", "_aid"), "_aid", "left")
        .drop("_aid")
    )


def build_analysis_docs(analyses: DataFrame) -> DataFrame:
    """P2: one document per analysis with its DATA files as a nested
    array (AnalysisCentricDocumentConverter.java:22-74)."""
    donors = assemble_donor_tree(analyses)
    data_files = F.array_sort(F.filter(
        F.col("files"), lambda f: is_data_file(f["name"])))
    docs = analyses.select(
        "analysis_id", "analysis_state", "analysis_type", "study_id",
        data_files.alias("files"),
        F.array(F.col("repository")).alias("repositories"),
    )
    return docs.join(donors, "analysis_id", "left")


def nested_exists(array_col: Column, *conjuncts) -> Column:
    """X7 same-element semantics: ALL conjuncts must hold on ONE array
    element (the ES `nested` query contract — a flattened per-field
    exists() would accept documents where different elements satisfy
    different conjuncts). Each conjunct is a fn(element) -> Column."""
    def pred(el):
        c = F.lit(True)
        for fn in conjuncts:
            c = c & fn(el)
        return c
    return F.exists(array_col, pred)

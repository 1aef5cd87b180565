"""Sources/sinks (SURVEY.md §2.1).

The reference reads raw text ("docId \\t w1 w2 ..." one doc per line,
README.md:38-43) and SequenceFiles; all persisted tables here are
Parquet (snappy) — the S2/S3 mapping in SURVEY.md §2.1.  Multi-sink
jobs (S5, MultipleOutputs) become several ``df.write`` calls off one
cached lineage; empty-output suppression (S4) and small-file merge
(S7) are moot under Parquet + AQE coalesce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_raw_corpus(spark: SparkSession, path: str) -> DataFrame:
    """S1: text corpus scan — one document per line ``title\\tbody``.

    Mirrors ParseCorpus.java:167-183 (tab-split projection P1: malformed
    lines without a tab are dropped rather than throwing — the filter is
    pushed into the scan).
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t", 2)
    return (
        lines.filter(F.col("value").contains("\t"))
        .select(
            F.trim(parts.getItem(0)).alias("title"),
            parts.getItem(1).alias("body"),
        )
    )


def read_raw_corpus_poly(spark: SparkSession, path: str, n_languages: int) -> DataFrame:
    """Polylingual raw scan: ``docId \\t text_lang0 \\t text_lang1 ...``
    with literal ``null`` for a missing language
    (polylda/ParseCorpus.java:309-323 → P6 missing-language filter).

    Returns one row per (title, lang, body) with absent languages dropped.
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    per_lang = [
        F.struct(
            F.lit(i).alias("lang"),
            F.when(parts.getItem(i + 1) == F.lit("null"), F.lit(None))
            .otherwise(parts.getItem(i + 1))
            .alias("body"),
        )
        for i in range(n_languages)
    ]
    return (
        lines.select(
            F.trim(parts.getItem(0)).alias("title"),
            F.explode(F.array(*per_lang)).alias("lb"),
        )
        .select("title", F.col("lb.lang").alias("lang"), F.col("lb.body").alias("body"))
        .filter(F.col("body").isNotNull())
    )


def write_table(df: DataFrame, path: str, mode: str = "overwrite", partition_by=None) -> None:
    """S3 sink: Parquet, snappy (block-compressed SequenceFile equivalent)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_multi(df: DataFrame, sinks: dict) -> None:
    """S5: several logical sinks off ONE lineage (the reference's
    MultipleOutputs — document/title side outputs in one parse job,
    beta/gamma side outputs in one inference job,
    ParseCorpus.java:360-363, VariationalInference.java:222-235).

    ``sinks`` maps path → a projection function (DataFrame →
    DataFrame).  The source is persisted so the upstream computation
    runs once regardless of the number of sinks, then released.
    """
    df = df.persist()
    try:
        df.count()  # materialize once
        for path, project in sinks.items():
            write_table(project(df), path)
    finally:
        df.unpersist()


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    id_field: str = "id",
) -> DataFrame:
    """JSONL corpus scan — the de-facto interchange format of LLM
    training-data pipelines (one JSON object per line).  Schema is
    pinned (never inferred: inference would scan the 100 TB input
    twice), malformed lines surface as nulls and are dropped, extra
    fields are preserved under a ``meta`` map for lineage.
    """
    jsonschema = (
        f"`{id_field}` string, `{text_field}` string, meta map<string,string>"
    )
    raw = spark.read.text(path)
    parsed = raw.select(
        F.from_json(
            F.col("value"),
            jsonschema,
            {"mode": "PERMISSIVE"},
        ).alias("j")
    )
    return (
        parsed.select(
            F.col(f"j.`{id_field}`").alias("title"),
            F.col(f"j.`{text_field}`").alias("body"),
            F.col("j.meta").alias("meta"),
        )
        .filter(F.col("title").isNotNull() & F.col("body").isNotNull())
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSONL sink (gzip) — the interchange-format counterpart of the
    Parquet sink; compression keeps the 100 TB egress bounded."""
    df.write.mode(mode).option("compression", "gzip").json(path)


def write_ldac_corpus(corpus_doc: DataFrame, path: str) -> None:
    """Write the encoded corpus in Blei's lda-c DATA format
    (`lda-c/readme.txt`): one doc per line, ``N id1:c1 id2:c2 ...``
    with 0-BASED term ids (this engine's dictionary is 1-based, the
    reference's convention — the shift is undone on read).

    lda-c is an inherently single-file, line-ordered format (doc
    identity IS the line number), so the writer sorts by doc_id and
    coalesces to one file — an interop export like the reference's
    DisplayTopic driver outputs, not a sharded 100 TB sink (that is
    what the parquet/SequenceFile sinks are for).
    """
    line = F.concat_ws(
        " ",
        F.size("term_ids").cast("string"),
        F.concat_ws(
            " ",
            F.expr(
                "transform(arrays_zip(term_ids, term_counts), "
                "p -> concat(p.term_ids - 1, ':', p.term_counts))"
            ),
        ),
    )
    (
        corpus_doc.orderBy("doc_id")
        .select(line.alias("value"))
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )


def read_ldac_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read a Blei lda-c data file back into the tall encoded relation
    (line, term_id, term_count), term ids re-shifted to this engine's
    1-based convention.  Line numbers come from ``zipWithIndex`` —
    deterministic for the single file the format implies."""
    rdd = (
        spark.read.text(path)
        .rdd.zipWithIndex()
        .map(lambda t: (t[1], t[0]["value"]))
    )
    lines = spark.createDataFrame(rdd, "line long, value string")
    pairs = lines.select(
        "line",
        F.explode(F.slice(F.split("value", " "), 2, 1_000_000)).alias("p"),
    ).filter(F.col("p") != "")
    return pairs.select(
        "line",
        (F.split("p", ":").getItem(0).cast("int") + 1).alias("term_id"),
        F.split("p", ":").getItem(1).cast("int").alias("term_count"),
    )

"""Named analyzers for the U1 pluggable-tokenizer extension point.

The reference ships reflective Lucene analyzers, including
SmartChineseAnalyzer for CJK text (ParseCorpusOptions.java:147-169,
pom.xml:132-136).  This module provides the PySpark counterpart: a
unicode-script-aware CJK tokenizer in two equivalent forms —

- ``cjk_bigram``: a plain ``str -> list[str]`` Python callable for
  ``parse.tokenize(docs, analyzer=cjk_bigram)`` (the U1 UDF path, same
  trade-off the reference documents for its reflective analyzers);
- ``cjk_tokens``: the same tokenization as a pure codegen Column
  expression (regexp run extraction + higher-order bigram stitch) —
  zero Python in the hot path, the form a 100 TB parse should use.

Semantics (Lucene CJKAnalyzer-style bigramming): Latin/digit runs are
lowercased word tokens; consecutive CJK characters (Han, Hiragana,
Katakana, Hangul) emit overlapping bigrams; an isolated CJK character
emits itself.  "spark 数据处理" → [spark, 数据, 据处, 处理].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unicode ranges: Han (incl. Ext-A), Hiragana, Katakana, Hangul.
_CJK_RANGES = (
    (0x3400, 0x4DBF),
    (0x4E00, 0x9FFF),
    (0x3040, 0x309F),
    (0x30A0, 0x30FF),
    (0xAC00, 0xD7AF),
)
# Java-regex char class for the same ranges (codegen side).
_CJK_CLASS = (
    "[\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}]"
)


def _is_cjk_char(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def cjk_bigram(text: str) -> list[str]:
    """U1 analyzer callable: script-aware tokens with CJK bigramming."""
    out: list[str] = []
    cjk_run: list[str] = []
    latin_run: list[str] = []

    def flush_cjk() -> None:
        if len(cjk_run) == 1:
            out.append(cjk_run[0])
        else:
            out.extend(
                cjk_run[i] + cjk_run[i + 1] for i in range(len(cjk_run) - 1)
            )
        cjk_run.clear()

    def flush_latin() -> None:
        if latin_run:
            out.append("".join(latin_run))
            latin_run.clear()

    for ch in (text or "").lower():
        if _is_cjk_char(ch):
            flush_latin()
            cjk_run.append(ch)
        elif ch.isascii() and ch.isalnum():
            if cjk_run:
                flush_cjk()
            latin_run.append(ch)
        else:
            if cjk_run:
                flush_cjk()
            flush_latin()
    if cjk_run:
        flush_cjk()
    flush_latin()
    return out


def cjk_tokens(text: Column) -> Column:
    """Codegen twin of ``cjk_bigram``: array<string> of tokens.

    Plan: one ``regexp_extract_all`` pulls Latin runs and single CJK
    chars in document order; a higher-order ``transform`` stitches
    adjacent CJK singles into bigrams (array ops, no shuffle, no
    Python).  Equivalence with the callable is pinned by tests.
    """
    units = F.regexp_extract_all(
        F.lower(text), F.lit(f"[a-z0-9]+|{_CJK_CLASS}"), 0
    )

    def is_cjk(c: Column) -> Column:
        return c.rlike(f"^{_CJK_CLASS}$")

    n = F.size(units)
    idx = F.when(n < 1, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)))
    )

    def emit(i: Column) -> Column:
        cur = F.element_at(units, i)
        nxt = F.try_element_at(units, i + 1)
        prv = F.when(i > 1, F.try_element_at(units, i - 1))
        cur_cjk = is_cjk(cur)
        nxt_cjk = nxt.isNotNull() & is_cjk(nxt)
        prv_cjk = prv.isNotNull() & is_cjk(prv)
        return (
            F.when(cur_cjk & nxt_cjk, F.array(F.concat(cur, nxt)))
            .when(cur_cjk & ~nxt_cjk & ~prv_cjk, F.array(cur))  # isolated
            .when(~cur_cjk, F.array(cur))  # latin run
            .otherwise(F.array().cast("array<string>"))  # run tail
        )

    return F.flatten(F.transform(idx, emit))


def tokenize_cjk(
    docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> DataFrame:
    """Codegen CJK tokenization to the engine's (doc_id, term) token
    relation — drop-in for ``parse.tokenize`` on CJK corpora."""
    return docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(cjk_tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")


# --------------------------------------------------------------------------
# Named-analyzer registry (the reference's reflective `-analyzer` flag,
# ParseCorpusOptions.java:147-169: a class NAME is resolved at runtime).
# Short engine names and the Lucene class names a migrating user would
# pass verbatim both resolve; all map to Column-native implementations
# (zero Python in the tokenize plan).
# --------------------------------------------------------------------------


def _standard_tokens(text: Column) -> Column:
    """Lucene StandardAnalyzer-flavored default: lowercase word chars
    (letters/digits, unicode-aware) split on everything else."""
    return F.regexp_extract_all(F.lower(text), F.lit(r"[\p{L}\p{N}]+"), 0)


def _whitespace_tokens(text: Column) -> Column:
    return F.split(text, r"\s+")


NAMED_ANALYZERS = {
    "standard": _standard_tokens,
    "whitespace": _whitespace_tokens,
    "cjk": cjk_tokens,
    # Lucene class names accepted verbatim for migration parity.
    "org.apache.lucene.analysis.standard.StandardAnalyzer": _standard_tokens,
    "org.apache.lucene.analysis.core.WhitespaceAnalyzer": _whitespace_tokens,
    "org.apache.lucene.analysis.cjk.CJKAnalyzer": cjk_tokens,
    "org.apache.lucene.analysis.cn.smart.SmartChineseAnalyzer": cjk_tokens,
}


def by_name(name: str):
    """Resolve an analyzer name (engine short name or Lucene class
    name) to a Column-native analyzer for ``parse.tokenize``."""
    try:
        return NAMED_ANALYZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown analyzer {name!r}; known: {sorted(NAMED_ANALYZERS)}"
        ) from None

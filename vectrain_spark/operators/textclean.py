"""Corpus-hygiene operators every LLM training pipeline runs before the
data ships: benchmark decontamination (drop training docs that share long
n-grams with an evaluation set) and cross-corpus boilerplate line removal
(drop lines that repeat across many documents — nav bars, footers,
licence blurbs).

Both are exact (no sketching), pure JVM, and carry DuckDB oracles.

Scale design (100 TB):
* decontaminate: the BENCHMARK side is tiny by definition (eval suites
  are ~10^4-10^6 grams) — its distinct hashed grams broadcast to every
  executor, so the corpus side streams through a broadcast semi-join
  with no shuffle; candidates verify on the gram string (hash equality
  alone would admit xxhash64 collisions), and only the per-doc hit count
  shuffles (map-side partial agg).
* boilerplate lines: one explode + one (line-hash) shuffle to count
  global line frequencies, then a shuffle join back on the hash — the
  join carries (hash, cnt) longs, never a second copy of the line text.
  Line order inside each doc survives via posexplode + sort_array, so
  the cleaned text is reassembled deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col, spread

DECON_NGRAM = 8  # grams this long essentially never collide by chance
BOILER_MIN_DOCS = 2  # a line seen in >= this many docs is boilerplate


def decontaminate(
    corpus: DataFrame, benchmark: DataFrame, n: int = DECON_NGRAM
) -> DataFrame:
    """Training-vs-benchmark contamination scan: for every corpus doc that
    shares at least one word ``n``-gram with any benchmark doc, emit
    (doc_id, n_shared_grams) — the doc ids a decontaminated training run
    would drop. Benchmark members themselves are excluded.

    Both inputs are (doc_id, text). Exact: candidate pairs come from an
    xxhash64 equi-join (longs, broadcast benchmark side) and are verified
    on the gram string before counting.
    """
    grams = shingles_col(n=n)  # distinct grams per doc
    bench_ids = F.broadcast(benchmark.select("doc_id"))
    bench_grams = F.broadcast(
        benchmark.select(F.explode(grams).alias("bgram"))
        .distinct()
        .select(F.xxhash64("bgram").alias("gh"), "bgram")
    )
    corpus_grams = spread(
        corpus.join(bench_ids, "doc_id", "left_anti")
    ).select("doc_id", F.explode(grams).alias("gram"))
    hits = (
        corpus_grams.withColumn("gh", F.xxhash64("gram"))
        .join(bench_grams, "gh")
        .filter(F.col("gram") == F.col("bgram"))
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shared_grams")
    )


def remove_boilerplate_lines(
    pages_text: DataFrame, min_docs: int = BOILER_MIN_DOCS
) -> DataFrame:
    """Cross-corpus duplicated-line stripping over (url, text): a line is
    boilerplate when it appears in >= ``min_docs`` distinct documents; the
    cleaned document keeps its surviving lines in original order.

    -> (url, n_lines, n_kept, clean_hash) with clean_hash = md5 of the
    newline-joined surviving lines (empty string when every line is
    boilerplate) — value-checkable without shipping the cleaned text.
    """
    lines = pages_text.select(
        "url", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    ).withColumn("lh", F.xxhash64("line"))
    freq = (
        lines.groupBy("lh")
        .agg(F.countDistinct("url").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("lh", F.lit(True).alias("boiler"))
    )
    tagged = lines.join(freq, "lh", "left")
    return (
        tagged.groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("boiler").isNull(), 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("boiler").isNull(),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .select(
            "url",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.md5(F.col("clean_text").cast("binary")).alias("clean_hash"),
        )
    )


def c4_filters(docs: DataFrame) -> DataFrame:
    """C4-style cleaning verdicts (Raffel et al. 2020, the heuristics
    behind the Colossal Clean Crawled Corpus) over line-structured
    (doc_id, text) documents -> one audit row per doc:

    * line rule — a line SURVIVES iff it ends in terminal punctuation
      (. ! ? or a closing quote), has >= 3 words, and does not mention
      javascript;
    * doc rules — the doc is dropped outright when it contains
      "lorem ipsum" or a curly brace (code), or keeps < 3 lines.

    Output: (doc_id, n_lines, n_kept, has_lorem, has_brace,
    n_sentences, keep). n_sentences counts terminal-punctuation runs in
    the SURVIVING lines — the C4 "at least 3 sentences" signal.

    All rules are array/regexp expressions fused into the scan (one
    projection, zero shuffles, zero Python) — at 100 TB this is a pure
    map stage like gopher_rules, and the two filter families compose.
    """
    kept = F.expr(
        r"""
        filter(split(text, '\n'),
               l -> l rlike '[.!?"]$'
                    AND size(split(trim(l), ' ')) >= 3
                    AND NOT lower(l) rlike 'javascript')
        """
    )
    lower = F.lower(F.col("text"))
    out = docs.select(
        "doc_id",
        F.size(F.split("text", "\n")).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        lower.contains("lorem ipsum").alias("has_lorem"),
        (lower.contains("{") | lower.contains("}")).alias("has_brace"),
        F.regexp_count(F.array_join(kept, "\n"), F.lit(r"[.!?]+"))
        .cast("long")
        .alias("n_sentences"),
    )
    return out.withColumn(
        "keep",
        (~F.col("has_lorem"))
        & (~F.col("has_brace"))
        & (F.col("n_kept") >= 3)
        & (F.col("n_sentences") >= 3),
    )

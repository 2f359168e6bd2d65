"""Corpus-frequent n-gram (boilerplate) audit: per-document ratio of
word shingles that recur across many documents.

CCNet-style curation removes paragraphs whose hash appears in many
documents of a shard (nav bars, cookie banners, license headers) before
any model-based filtering. The corpus here is single-line text, so the
recurring unit is the word ``n``-gram rather than the paragraph; the
pipeline shape is identical: build the document-frequency table of the
unit hashes, call every unit seen in >= ``min_docs`` distinct documents
boilerplate, and score each document by the fraction of its distinct
shingles that are boilerplate. Downstream, ``boiler_ratio`` joins the
quality gate's feature set (a doc that is mostly boilerplate is a
removal candidate even when its length/stopword stats look fine).

Scale shape (and why it scales to 100 TB):

* Same hash-before-exchange discipline as source_overlap (overlap.py)
  and the MinHash pipeline: shingles are ``array_distinct``-ed map-side
  and hashed to the shared 31-bit space BEFORE any exchange, so the
  document-frequency aggregate moves int64 hashes (column pruning drops
  even doc_id from that exchange), never n-gram strings. Hash
  collisions perturb both engines identically — the oracle replays the
  md5-word hash over the same per-document distinct-string rows — so
  the check stays an equality hash-match.
* ``n_shingles`` is computed MAP-SIDE (size of the array_distinct'ed
  shingle array): the per-document denominator costs zero exchanges.
* The boilerplate set is bounded by total_shingle_occurrences /
  min_docs — at 100 TB you raise ``min_docs`` with corpus size (DF
  thresholds are corpus-relative in production curation, e.g. "in
  > 0.01% of documents"), which keeps the flag table broadcastable.
  The flag is applied by a broadcast LEFT SEMI join, so the numerator
  aggregate only exchanges the boilerplate-bearing rows.
* Per-document output is total: documents too short to have any
  ``n``-gram are emitted with zero counts and a NULL ratio (0/0), not
  dropped — an audit row that silently vanishes reads as "clean".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysparkflow.functions.text import portable_hash32, shingles
from pysparkflow.llmops.overlap import _HASH_SPACE


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shingles, n_boiler, boiler_ratio) for EVERY input
    document: ``n_shingles`` distinct word-``n``-grams in the document,
    ``n_boiler`` of those whose corpus document frequency (documents
    containing the shingle) is >= ``min_docs``, and their ratio (NULL
    when the document has no shingle at all — total over sub-``n``-token
    docs).

    Frequency counting and flagging run over the 31-bit portable hashes
    of the shingles, the same space as source_overlap: an in-document
    collision double-counts one hash for DF purposes and a cross-
    document collision merges two shingles' DF — both ~|shingles|^2 /
    2^31 rare and replayed identically by the oracle, which hashes the
    same per-document distinct-string rows."""
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # per-doc distinct shingles, hashed map-side; no distinct() exchange
    # — array_distinct already dedups within the doc, and DF below is
    # defined over exactly these (doc, distinct-string) rows
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("sh"),
    ).select(
        "doc_id",
        F.pmod(portable_hash32("sh"), F.lit(_HASH_SPACE)).alias("shh"),
    )
    # document frequency per shingle hash (map-side partial counts; the
    # exchange carries only int64 hashes); >= min_docs survivors are the
    # boilerplate set — bounded by occurrences/min_docs, broadcast
    boiler = (
        sh.groupBy("shh")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= F.lit(min_docs))
        .select("shh")
    )
    # numerator: only boilerplate-bearing rows reach the per-doc agg
    n_boiler = (
        sh.join(F.broadcast(boiler), "shh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_boiler"))
    )
    # denominator map-side, then one narrow left join to attach the
    # numerator (docs with zero boilerplate — and shingleless docs —
    # coalesce to 0); ratio NULL on 0/0 like the oracle.
    # Plan note: Catalyst does not reuse subtrees, so the corpus is
    # scanned three times (base, DF pass, flag pass), each pruned to
    # (doc_id, text). The trade is deliberate — the alternative (derive
    # the denominator from the exploded rows) replaces a cheap pruned
    # scan with a corpus-sized per-doc aggregate exchange; if a 100 TB
    # deployment is scan-bound instead, persist `sh` across the two
    # consumers.
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.array_distinct(shingles(text_col, n))).alias("n_shingles"),
    )
    return base.join(n_boiler, "doc_id", "left").select(
        "doc_id",
        F.col("n_shingles").cast("long").alias("n_shingles"),
        F.coalesce(F.col("n_boiler"), F.lit(0)).alias("n_boiler"),
        F.round(
            F.try_divide(F.coalesce(F.col("n_boiler"), F.lit(0)), F.col("n_shingles")),
            6,
        ).alias("boiler_ratio"),
    )

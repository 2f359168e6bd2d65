"""TF-IDF salient-term extraction over the document corpus.

The classic corpus-analysis pass of a data pipeline: which terms
characterize each source/domain? Implemented entirely with built-in
DataFrame operators (explode → two aggregations → window top-k), so
every stage is whole-stage-codegen JVM work with map-side partial
aggregation:

- tokenize: ``explode(split(text))`` — fused into the scan;
- document frequency: ``groupBy(term).agg(count_distinct(doc))`` over
  the (term, doc) pairs — combiner-friendly, one shuffle keyed by term;
- term frequency per group: ``groupBy(group, term).count()`` — one
  shuffle keyed by (group, term);
- idf join: the per-term df table is vocabulary-sized (tiny next to the
  corpus) — broadcast, so the tf table never reshuffles;
- top-k: ``row_number`` window per group over the scored table, which is
  |groups|×|vocab| rows — orders of magnitude smaller than the corpus.

At 100 TB the only corpus-sized shuffles are the two keyed aggregations,
both with partial aggregation upstream; everything after operates on
vocabulary-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def source_salient_terms(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 3,
    round_to: int = 6,
) -> DataFrame:
    """Top-``top_k`` terms per ``group_col`` by tf·idf, where tf is the
    term's occurrence count within the group and idf is the document-level
    ``ln(N_docs / df)``. Deterministic tie-break: (score desc, term asc).

    Returns (group, term, tf, score, rank) with score rounded so the
    DuckDB oracle hash-matches float-for-float.
    """
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("did"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    n_docs = docs.select(F.count_distinct(F.col(id_col)).alias("n")).collect()[0]["n"]
    df_tbl = toks.groupBy("term").agg(F.count_distinct("did").alias("df"))
    tf_tbl = toks.groupBy("grp", "term").agg(F.count("*").alias("tf"))
    scored = tf_tbl.join(F.broadcast(df_tbl), "term").select(
        F.col("grp").alias(group_col),
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), round_to
        ).alias("score"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col("score").desc(), F.col("term").asc())
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(group_col, "term", "tf", "score", "rank")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 100,
    round_to: int = 6,
) -> DataFrame:
    """BM25 retrieval scores of every document against a fixed term set —
    the ranking pass of retrieval-based curation (select the corpus
    slice most relevant to a target domain). Okapi BM25 with the
    Lucene-style non-negative idf ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    and token-count length normalization.

    Plan shape (and why it scales): document length is the MAP-ONLY
    ``size(split(...))`` — token-count identical to counting exploded
    rows, with no explode and no exchange; the corpus stats (doc count +
    average length) are ONE fused map-side aggregation job; term
    frequency is aggregated AFTER filtering the token stream to the
    query terms, so that shuffle carries only matching tokens (a thin
    slice of the corpus); idf is a |query_terms|-row table — broadcast;
    the final per-doc sum groups the tf rows (≤ |matching docs| ×
    |query_terms|). No corpus-sized join and nothing quadratic.

    Returns (doc_id, score, rank) for the ``top_k`` docs, ties broken by
    doc id — deterministic, oracle-replayable.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col).alias("did"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    # dl == the exploded token count per doc: split(trim(text)) yields
    # >= 1 element whenever text is non-NULL (empty text -> ['']), and
    # NULL text -> size NULL == no toks rows at all. Cast long so the
    # downstream arithmetic is bit-identical to the old count(*) form.
    dl_expr = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    # one fused map-side job replaces the old docs.count() + a FULL
    # tokenize-and-aggregate collect (two eager corpus passes at build
    # time, guide §1.2); avg() skips NULL-text docs exactly like the
    # explode-based form did
    stats = docs.agg(
        F.count("*").alias("n"), F.avg(dl_expr).alias("a")
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["a"]
    if n_docs == 0 or avgdl is None:
        # empty corpus (or all-null text): avg() collects as None and
        # float(avgdl) would raise (ADVICE r7) — the well-defined answer
        # is an empty ranking with the contract schema
        empty = docs.limit(0).select(
            F.col(id_col).alias("doc_id"),
            F.lit(0.0).alias("score"),
            F.lit(0).alias("rank"),
        )
        return empty
    # map-only doc-length table: no explode, no groupBy exchange — the
    # old explode+combiner form shuffled a |docs|-row aggregate and
    # re-tokenized the whole corpus a second time inside the final plan
    doclen = docs.select(F.col(id_col).alias("did"), dl_expr.alias("dl"))
    qtoks = toks.where(F.col("term").isin(query_terms))
    df_tbl = qtoks.groupBy("term").agg(F.count_distinct("did").alias("df"))
    tf_tbl = qtoks.groupBy("did", "term").agg(F.count("*").alias("tf"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    per_term = (
        tf_tbl.join(F.broadcast(df_tbl), "term")
        .join(doclen, "did")
        .select(
            "did",
            (
                idf
                * (F.col("tf") * (F.lit(k1) + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
                )
            ).alias("s"),
        )
    )
    # orderBy().limit() compiles to TakeOrderedAndProject — per-partition
    # top-k then a driver merge — so no global-window single partition
    # ever sees the full scored table; the rank window then runs over
    # top_k rows only
    top = (
        per_term.groupBy("did")
        .agg(F.round(F.sum("s"), round_to).alias("score"))
        .select(F.col("did").alias("doc_id"), "score")
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(top_k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return top.withColumn("rank", F.row_number().over(w))

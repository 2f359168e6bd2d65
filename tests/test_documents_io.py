"""Raw-ingest readers: PERMISSIVE tolerance, corrupt quarantine, round-trip."""

from __future__ import annotations

import gzip

from pysparkflow.io.documents import (
    corrupt_count,
    read_documents_csv,
    read_documents_jsonl,
)


def test_jsonl_ingest_tolerates_malformed(spark, tmp_path):
    p = tmp_path / "docs.jsonl.gz"
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11}',
        "this is not json at all",
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1"}',  # n_chars omitted
        '{"doc_id": "NaNsense", "text": 3}',  # type mismatch
    ]
    with gzip.open(p, "wt") as f:
        f.write("\n".join(lines))

    audit = read_documents_jsonl(spark, str(p), drop_corrupt=False)
    assert corrupt_count(audit) == 2

    clean = read_documents_jsonl(spark, str(p))
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    assert rows[2].n_chars == 7  # derived from text when the dump omits it
    assert rows[1].n_chars == 11


def test_csv_ingest_roundtrip(spark, tmp_path):
    p = tmp_path / "docs.csv"
    # NB: the _corrupt column is schema-internal — a file carrying a
    # column by that name would mark every row malformed
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        '5,"a,quoted text",en,s0,13\n'
        "6,plain,de,s1,5\n"
    )
    got = {r.doc_id: r for r in read_documents_csv(spark, str(p)).collect()}
    assert set(got) == {5, 6}
    assert got[5].text == "a,quoted text"


def test_jsonl_schema_matches_testdata_contract(spark, tmp_path, sf_dir):
    """An ingested frame is column-compatible with the shipped documents
    table (same names/types the engine's operators assume)."""
    p = tmp_path / "one.jsonl"
    p.write_text('{"doc_id": 9, "text": "t", "lang": "en", "source": "s", "n_chars": 1}\n')
    ingested = read_documents_jsonl(spark, str(p))
    shipped = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ing = {f.name: f.dataType.typeName() for f in ingested.schema.fields}
    for f in shipped.schema.fields:
        assert ing.get(f.name) == f.dataType.typeName(), f.name

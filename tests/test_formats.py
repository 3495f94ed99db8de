"""JSONL/CSV ingest round-trips (EXT §2.1): schema-explicit reads,
corrupt-record auditing, quote handling for text with commas/newlines."""

from __future__ import annotations

from robin_sparkles_spark.sources import (
    corrupt_count,
    load_table,
    read_csv,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)


def _rows(df):
    return sorted(
        (r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in df.collect()
    )


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path)
    assert back.schema == docs.schema
    assert _rows(back) == _rows(docs)
    assert corrupt_count(spark, path) == 0


def test_jsonl_corrupt_lines_audited_not_fatal(spark, tmp_path):
    path = tmp_path / "mixed.jsonl"
    path.write_text(
        '{"doc_id": 1, "text": "ok doc", "lang": "en", "source": "s", "n_chars": 6}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "another", "lang": "de", "source": "s", "n_chars": 7}\n'
        '{"broken": \n'
    )
    good = read_jsonl(spark, str(path))
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert corrupt_count(spark, str(path)) == 2


def test_csv_roundtrip_with_quoting(spark, sf_dir, tmp_path):
    """Documents text includes commas/quotes; RFC-4180 quoting must
    round-trip them byte-identically."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_csv")
    write_csv(docs, path)
    back = read_csv(spark, path)
    assert back.schema == docs.schema
    assert _rows(back) == _rows(docs)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    """ORC round-trips the documents corpus byte-for-byte and its
    vectorized reader accepts pushed predicates like parquet (the
    point of supporting the second columnar lake format)."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path)
    back = read_orc(spark, path)
    assert back.schema == docs.schema
    assert _rows(back) == _rows(docs)
    plan = (
        back.where("doc_id < 10")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters", 1)[1]

"""JSONL ingestion: schema-explicit read, corrupt-line quarantine,
content-addressed ids."""

from __future__ import annotations

import gzip
import json

from options_data_pipeline_spark.sources.jsonl import (
    read_jsonl,
    split_corrupt,
    with_doc_id,
)

GOOD = [
    {"text": "hello world one", "lang": "en", "source": "web", "meta": {"u": "a"}},
    {"text": "hola mundo dos", "lang": "es", "source": "web", "meta": None},
    {"text": "third doc here", "lang": "en", "source": "books", "meta": {}},
]
BAD = ['{"text": "unterminated', "not json at all", '["array","not","object"]']


def _write(tmp_path, name, lines, compress=False):
    p = tmp_path / name
    data = "\n".join(lines) + "\n"
    if compress:
        p.write_bytes(gzip.compress(data.encode()))
    else:
        p.write_text(data)
    return str(p)


def test_read_split_and_quarantine(spark, tmp_path):
    lines = [json.dumps(GOOD[0]), BAD[0], json.dumps(GOOD[1]), BAD[1],
             json.dumps(GOOD[2])]
    path = _write(tmp_path, "docs.jsonl", lines)
    clean, quarantine = split_corrupt(read_jsonl(spark, path))
    got = {r.text: (r.lang, r.source) for r in clean.collect()}
    assert got == {
        "hello world one": ("en", "web"),
        "hola mundo dos": ("es", "web"),
        "third doc here": ("en", "books"),
    }
    raws = {r.raw_line for r in quarantine.collect()}
    assert raws == {BAD[0], BAD[1]}
    # the clean side must not carry the capture column
    assert "_corrupt_record" not in clean.columns


def test_read_gzip_shards(spark, tmp_path):
    _write(tmp_path, "part-0.jsonl.gz", [json.dumps(GOOD[0])], compress=True)
    _write(tmp_path, "part-1.jsonl.gz", [json.dumps(GOOD[1])], compress=True)
    clean, q = split_corrupt(read_jsonl(spark, str(tmp_path)))
    assert clean.count() == 2 and q.count() == 0


def test_repeated_reads_do_not_mutate_schema(spark, tmp_path):
    from options_data_pipeline_spark.sources.jsonl import DOCUMENT_SCHEMA

    path = _write(tmp_path, "docs.jsonl", [json.dumps(GOOD[0])])
    n_before = len(DOCUMENT_SCHEMA.fields)
    read_jsonl(spark, path)
    read_jsonl(spark, path)
    assert len(DOCUMENT_SCHEMA.fields) == n_before


def test_with_doc_id_stable_and_layout_independent(spark, tmp_path):
    path = _write(tmp_path, "docs.jsonl", [json.dumps(g) for g in GOOD])
    clean, _ = split_corrupt(read_jsonl(spark, path))
    a = {(r.text, r.doc_id) for r in with_doc_id(clean).collect()}
    # same content, different physical layout -> same ids
    b = {(r.text, r.doc_id) for r in with_doc_id(clean.repartition(8)).collect()}
    assert a == b
    assert len({d for _, d in a}) == 3  # distinct per distinct text
    assert all(d >= 0 for _, d in a)


def test_read_csv_with_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from options_data_pipeline_spark.sources.jsonl import read_csv

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    lines = [
        "doc_id,text,score",
        "1,hello,0.5",
        "2,world,not_a_number",  # malformed double -> quarantine
        "3,ok,1.25",
    ]
    p = tmp_path / "docs.csv"
    p.write_text("\n".join(lines) + "\n")
    clean, quarantine = split_corrupt(read_csv(spark, str(p), schema))
    got = {(r.doc_id, r.text, r.score) for r in clean.collect()}
    assert got == {(1, "hello", 0.5), (3, "ok", 1.25)}
    raws = {r.raw_line for r in quarantine.collect()}
    assert raws == {"2,world,not_a_number"}

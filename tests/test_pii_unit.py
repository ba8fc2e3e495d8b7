"""PII operator edge cases the planted-corpus oracle query can't probe
individually: per-kind counting, redaction order, boundary anchoring."""

from __future__ import annotations

from options_data_pipeline_spark.operators.pii import (
    detect_pii,
    flag_contamination,
    redact_pii,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_detect_counts_each_kind(spark):
    rows = {
        r.doc_id: r
        for r in detect_pii(
            _docs(
                spark,
                [
                    "mail a@b.co and c.d+e@f-g.org today",
                    "call 555-123-4567 or 555-987-6543",
                    "ssn 123-45-6789 once",
                    "host 10.0.0.1 and 192.168.12.255",
                    "clean text with no identifiers at all",
                ],
            )
        ).collect()
    }
    assert (rows[0].n_email, rows[0].n_pii) == (2, 2)
    assert (rows[1].n_phone, rows[1].n_ssn) == (2, 0)
    assert (rows[2].n_ssn, rows[2].n_phone) == (1, 0)
    assert (rows[3].n_ipv4, rows[3].n_pii) == (2, 2)
    assert rows[4].n_pii == 0


def test_word_boundaries_prevent_partial_matches(spark):
    rows = {
        r.doc_id: r
        for r in detect_pii(
            _docs(
                spark,
                [
                    "version 1.2.3.4.5 is not an ip by itself",  # 5 octets
                    "id 1234-567-8901 has a 4-digit prefix",
                ],
            )
        ).collect()
    }
    # 1.2.3.4.5: the \b-anchored pattern still finds a 4-octet prefix —
    # documented behavior (count>=1), the point is no crash/overlap split
    assert rows[0].n_ipv4 >= 1
    # 1234-567-8901: leading \b fails inside the digit run -> no phone
    assert rows[1].n_phone == 0


def test_redaction_order_and_tokens(spark):
    out = redact_pii(
        _docs(spark, ["write a@b.co or call 555-123-4567, ssn 321-54-9876, ip 10.0.0.1"])
    ).collect()[0]
    assert out.redacted_text == "write [EMAIL] or call [PHONE], ssn [SSN], ip [IP]"


def test_contamination_flag(spark):
    out = flag_contamination(
        _docs(spark, ["has the quick brown fox jumps over the lazy dog inside", "clean"]),
        ["the quick brown fox jumps over the lazy dog"],
    ).collect()
    assert [r.is_contaminated for r in sorted(out, key=lambda r: r.doc_id)] == [
        True,
        False,
    ]

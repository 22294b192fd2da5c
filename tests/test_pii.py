"""PII detection + redaction (functions/pii.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_data_pipeline_fyp_spark.functions.pii import (
    DEFAULT_EMAIL_TOKEN,
    DEFAULT_IP_TOKEN,
    has_pii,
    pii_counts,
    redact_pii,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    c = pii_counts("text")
    return {
        r["id"]: (r["n_emails"], r["n_ipv4"], r["red"], r["flag"])
        for r in df.select(
            "id",
            *[v.alias(k) for k, v in c.items()],
            redact_pii("text").alias("red"),
            has_pii("text").alias("flag"),
        ).collect()
    }


def test_pii_detect_and_redact_basics(spark):
    got = _run(
        spark,
        [
            (1, "mail john.doe+x@sub.example.co.uk now"),
            (2, "hosts 192.168.1.254 10.0.0.1 255.255.255.255"),
            (3, None),
            (4, "clean text, nothing to see"),
        ],
    )
    assert got[1] == (1, 0, f"mail {DEFAULT_EMAIL_TOKEN} now", True)
    assert got[2] == (
        0,
        3,
        f"hosts {DEFAULT_IP_TOKEN} {DEFAULT_IP_TOKEN} {DEFAULT_IP_TOKEN}",
        True,
    )
    # NULL text: counts 0, redaction stays NULL, gate False
    assert got[3] == (0, 0, None, False)
    assert got[4] == (0, 0, "clean text, nothing to see", False)


def test_pii_boundaries_and_negatives(spark):
    got = _run(
        spark,
        [
            (1, "out-of-range 999.999.999.999 and 256.1.1.1"),
            (2, "no tld almost@nodot and bare @ signs a@b"),
            (3, "version string 1.2.3.4.5 contains a quad prefix"),
            (4, "edge octets 0.0.0.0 and 25.254.1.0"),
        ],
    )
    assert got[1][:2] == (0, 0)
    # 256.1.1.1: the leading 256 never matches a full word-bounded
    # octet run from its start; \b(?:...) cannot begin mid-number
    assert got[2][:2] == (0, 0)
    # documented conservative behavior: the quad PREFIX of a longer
    # dotted run redacts (same trade FineWeb makes)
    assert got[3][1] == 1 and got[3][2].count(DEFAULT_IP_TOKEN) == 1
    assert got[4][:2] == (0, 2)


def test_pii_redaction_order_is_load_bearing(spark):
    """Email-first: a@1.2.3.4.com is ONE email token (IP-first would
    leave the a@<IP>.com composite leak); a BARE numeric domain is
    not a matchable email, so its quad redacts as an IP."""
    got = _run(
        spark,
        [
            (1, "write a@1.2.3.4.com soon"),
            (2, "bare user@1.2.3.4 domain"),
        ],
    )
    # counts are class-independent scans: the quad inside the email
    # domain COUNTS as an IPv4 hit even though redaction (email
    # first) collapses the whole address into one token
    assert got[1] == (1, 1, f"write {DEFAULT_EMAIL_TOKEN} soon", True)
    # NB n_ipv4 COUNTS the quad inside the email (counts are
    # class-independent scans; redaction is where ordering applies)
    assert got[2][2] == f"bare user@{DEFAULT_IP_TOKEN} domain"


def test_pii_custom_tokens_and_guard(spark):
    df = spark.createDataFrame([(1, "x a@b.co 1.2.3.4")], "id long, text string")
    out = df.select(
        redact_pii("text", email_token="[M]", ip_token="[A]").alias("r")
    ).first()["r"]
    assert out == "x [M] [A]"
    with pytest.raises(ValueError, match="group references"):
        redact_pii("text", email_token="$1")
    with pytest.raises(ValueError, match="group references"):
        redact_pii("text", ip_token="\\<IP>")

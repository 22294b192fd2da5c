"""PII detection + redaction for training corpora.

The standard anonymization stage of public pretraining pipelines
(FineWeb anonymizes emails and IP addresses before release; CCNet and
The Pile document the same classes) rendered as PURE CATALYST regex
column expressions — `regexp_extract_all` to count, chained
`regexp_replace` to redact — so the scan runs inside whole-stage
codegen at 100 TB scan speed with no UDFs.

Pattern discipline: every pattern stays inside the RE2 subset (no
backreferences, no lookaround) so the DuckDB oracles run the IDENTICAL
strings — the same cross-engine rule as the HTML/URL cleaners
(functions/text.py). Two classes are detected and redacted:

- EMAIL: `local@domain.tld` with the conservative RFC-ish character
  classes public pipelines use. False negatives (exotic quoted
  locals) are preferred over false positives at corpus scale.
- IPV4: dotted quad with per-octet range enforcement (25[0-5] |
  2[0-4]\\d | [01]?\\d\\d?), word-bounded so version strings like
  `1.2.3.4.5` don't half-match their prefix... they DO contain a
  valid quad prefix; the trailing `\\b` stops at the 4th octet, which
  is the documented behavior (a conservative over-redaction, same
  trade FineWeb makes).

Redaction replaces each match with a FIXED sentinel token (default
`<EMAIL>` / `<IP>`): fixed tokens keep redacted text deterministic
and hash-comparable across engines (randomized replacement would
break the oracle contract and, worse, deduplication — two copies of
a page with different fake emails would stop being exact dups).
Emails redact BEFORE IPs: an email whose domain CONTAINS a dotted
quad (`a@1.2.3.4.com` — alpha TLD, so the email pattern matches the
whole address) must collapse into ONE `<EMAIL>` token; IP-first would
leave `a@<IP>.com`, whose sentinel brackets then block the email
match — a composite leak. Ordering is load-bearing and pinned by
test. (A BARE numeric domain `user@1.2.3.4` is not a matchable email
— numeric TLD — so its quad redacts as an IP: `user@<IP>`, also
pinned.)

No reference analog (the reference is an earthquake ELT pipeline);
this is part of the beyond-reference training-data surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RE2-safe; identical strings run in the DuckDB oracles.
EMAIL_PATTERN = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_PATTERN = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\b"
)

DEFAULT_EMAIL_TOKEN = "<EMAIL>"
DEFAULT_IP_TOKEN = "<IP>"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-row PII match counts, one entry per detected class:
    {"n_emails", "n_ipv4"}. NULL text counts 0 of each (a row you
    cannot scan carries no detected PII — the engine-wide NULL
    convention; surface NULL text upstream if it must be audited)."""
    t = _c(text)
    # idx=0 (whole match) is EXPLICIT: Spark's regexp_extract_all
    # defaults idx to 1, which errors on group-free patterns and
    # would silently extract a single octet from the IPv4 pattern's
    # non-capturing groups if they were capturing
    return {
        "n_emails": F.size(
            F.regexp_extract_all(
                F.coalesce(t, F.lit("")), F.lit(EMAIL_PATTERN), F.lit(0)
            )
        ),
        "n_ipv4": F.size(
            F.regexp_extract_all(
                F.coalesce(t, F.lit("")), F.lit(IPV4_PATTERN), F.lit(0)
            )
        ),
    }


def has_pii(text: Column | str) -> Column:
    """True when any detected class matches — the gate form."""
    c = pii_counts(text)
    out = F.lit(False)
    for col in c.values():
        out = out | (col > 0)
    return out


def redact_pii(
    text: Column | str,
    email_token: str = DEFAULT_EMAIL_TOKEN,
    ip_token: str = DEFAULT_IP_TOKEN,
) -> Column:
    """Text with every detected email, then every detected IPv4,
    replaced by its fixed sentinel token. NULL text stays NULL
    (redaction never invents content). Order is load-bearing — see
    the module docstring (`a@1.2.3.4.com` is ONE email token).

    Tokens must not contain `$` or `\\`: Java's regexp_replace treats
    them as group references in the REPLACEMENT string while RE2
    does not — a silent cross-engine divergence, rejected eagerly."""
    for tok in (email_token, ip_token):
        if "$" in tok or "\\" in tok:
            raise ValueError(
                f"redact_pii: replacement token {tok!r} contains $ or "
                "\\ — Java regex replacement treats those as group "
                "references (cross-engine divergence). Use plain tokens."
            )
    t = _c(text)
    out = F.regexp_replace(t, EMAIL_PATTERN, email_token)
    out = F.regexp_replace(out, IPV4_PATTERN, ip_token)
    return out


# DuckDB mirrors of the same chains (identical pattern strings; DuckDB
# regexp_* is RE2, the subset the patterns are written in).
def pii_counts_sql(text_expr: str) -> dict[str, str]:
    e = EMAIL_PATTERN.replace("'", "''")
    i = IPV4_PATTERN.replace("'", "''")
    base = f"coalesce({text_expr}, '')"
    return {
        "n_emails": f"len(regexp_extract_all({base}, '{e}'))",
        "n_ipv4": f"len(regexp_extract_all({base}, '{i}'))",
    }


def redact_pii_sql(
    text_expr: str,
    email_token: str = DEFAULT_EMAIL_TOKEN,
    ip_token: str = DEFAULT_IP_TOKEN,
) -> str:
    e = EMAIL_PATTERN.replace("'", "''")
    i = IPV4_PATTERN.replace("'", "''")
    return (
        f"regexp_replace(regexp_replace({text_expr}, '{e}', "
        f"'{email_token}', 'g'), '{i}', '{ip_token}', 'g')"
    )

"""Web-corpus URL hygiene — pure column expressions.

Canonicalizing URLs is the first step of every web-crawl curation
pipeline (host-level stats, per-host caps, exact URL dedup all key on
the canonical form): lowercase scheme/host, strip `www.`, drop default
ports and fragments, remove tracking parameters (`utm_*`, click ids),
sort the surviving query params, and trim trailing slashes — so the
same resource always maps to the same string.

Everything here is a single-pass column expression (regexp extracts +
array lambdas): whole-stage-codegen JVM compute, zero shuffle, zero
Python — at 100 TB this canonicalization rides along with the scan.
The reference's scalar-transform family (stg_full_load.py
FilterTransform / place parsing in udf_transforms) is the shape this
extends to web data.

The regex grammar (scheme `://` authority path `?` query `#` fragment)
is RFC-3986's common subset, chosen so the SAME patterns run on Spark
(Java regex) and DuckDB (RE2) for oracle certification. Userinfo
(`user@host`) is not handled — crawl URLs carrying credentials are
dropped upstream by quality gates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# click-tracking params every major curation pipeline strips
TRACKING_KEYS = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref")
TRACKING_PREFIXES = ("utm_",)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url: Column | str) -> Column:
    return F.lower(F.regexp_extract(_c(url), _SCHEME_RE, 1))


def _authority(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), _AUTH_RE, 1)


def url_host(url: Column | str, strip_www: bool = True) -> Column:
    h = F.lower(F.regexp_extract(_authority(url), r"^([^:]*)", 1))
    return F.regexp_replace(h, r"^www\.", "") if strip_www else h


def url_port(url: Column | str) -> Column:
    """Explicit port as a string, '' if absent."""
    return F.regexp_extract(_authority(url), r":([0-9]+)$", 1)


def url_path(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), _PATH_RE, 1)


def url_query(url: Column | str) -> Column:
    return F.regexp_extract(_c(url), _QUERY_RE, 1)


def _is_tracking(param: Column) -> Column:
    key = F.split_part(param, F.lit("="), F.lit(1))
    cond = F.lit(False)
    for p in TRACKING_PREFIXES:
        cond = cond | key.startswith(p)
    return cond | key.isin(*TRACKING_KEYS)


def canonical_query(url: Column | str) -> Column:
    """Tracking params dropped, survivors sorted; '' when nothing left."""
    params = F.filter(
        F.split(url_query(url), "&"),
        lambda p: (p != "") & ~_is_tracking(p),
    )
    return F.array_join(F.array_sort(params), "&")


def canonicalize_url(url: Column | str) -> Column:
    """The canonical form: lowercase scheme+host, `www.` stripped,
    default port (http:80 / https:443) and fragment dropped, tracking
    params removed, remaining params sorted, trailing slashes trimmed
    ('/path/' == '/path', bare '/' == '')."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = url_port(url)
    path = F.regexp_replace(url_path(url), r"/+$", "")
    q = canonical_query(url)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)

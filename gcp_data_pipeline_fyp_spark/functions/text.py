"""Text-analysis column builders for training-data pipelines.

All pure Catalyst expressions (array lambdas, no Python UDFs) so they
run inside codegen at 100 TB scan speed: tokenization, shingling,
quality metrics, n-gram-profile language id, rolling-hash
fingerprinting, MinHash signatures, SimHash.

Cross-engine determinism: every hash is md5-hex based; MinHash minima
are taken over fixed-width lowercase hex strings, whose lexicographic
order equals numeric order — so a DuckDB oracle reproduces signatures
byte-for-byte (no xxhash/murmur, which other engines don't ship).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text: Column | str) -> Column:
    """Whitespace tokens of trimmed text."""
    return F.split(F.trim(_c(text)), r"\s+")


def _coalesce_toks(toks: Column) -> Column:
    """The engine's NULL convention for token arrays: NULL text hashes
    like an empty document (matches the SQL oracles' NULL propagation
    through generate_series/list_transform)."""
    return F.coalesce(toks, F.array().cast("array<string>"))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count: alpha runs + digit runs + lone symbols."""
    return F.regexp_count(_c(text), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def punct_count(text: Column | str) -> Column:
    return F.regexp_count(_c(text), F.lit(r"[^A-Za-z0-9\s]"))


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """How many tokens are in `words` (multiset count)."""
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


# tiny per-language stopword profiles (public-knowledge function words)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "en", "que", "los"],
    "fr": ["le", "la", "de", "et", "un", "les", "des"],
    "de": ["der", "die", "das", "und", "ein", "nicht", "ist"],
}


def lang_id(text: Column | str) -> Column:
    """Argmax of stopword-profile hits; ties break en > es > fr > de."""
    toks = tokens(text)
    h = {lang: stopword_hits(toks, words) for lang, words in LANG_PROFILES.items()}
    return (
        F.when(
            (h["en"] >= h["es"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["de"]), "en"
        )
        .when((h["es"] >= h["fr"]) & (h["es"] >= h["de"]), "es")
        .when(h["fr"] >= h["de"], "fr")
        .otherwise("de")
    )


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-gram shingle strings; empty array when fewer than n
    tokens. NULL token arrays (NULL text) shingle to [] — matching the
    SQL rendering where generate_series over a NULL bound is empty.

    PERFORMANCE CONTRACT: pass a MATERIALIZED token-array column (a
    projected `tokens(text)` — use `exploded_shingles` for the common
    frame shape), not an inline `tokens(text)` expression. The
    position lambda slices `toks` per position, and a lambda that
    references an inline expression re-evaluates it per call (no CSE
    across higher-order functions): inline tokenization makes this
    O(tokens^2) splits per doc — measured 4-5x slower at sf0.1."""
    toks = _coalesce_toks(toks)
    count = F.size(toks) - F.lit(n - 1)
    # NB Spark's sequence(1, 0) is DESCENDING [1, 0], not empty — a doc
    # shorter than the shingle width must short-circuit to [] explicitly
    positions = F.when(count < 1, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(1), count)
    )
    return F.array_distinct(
        F.transform(
            positions,
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def exploded_shingles(
    df: "DataFrame",
    keep_cols: "Sequence[Column | str]",
    text_col: Column | str,
    n: int = 3,
    out_col: str = "ngram",
) -> "DataFrame":
    """(keep_cols..., out_col) — one row per distinct n-gram shingle,
    with the token array projected through a named column FIRST so
    the shingle lambda slices a bound attribute instead of
    re-tokenizing per position (the measured O(tokens^2) trap
    documented on `shingles`). The shared frame-level shape every
    shingle consumer (decontamination, contamination reports,
    leakage audits) should go through."""
    keeps = [F.col(c) if isinstance(c, str) else c for c in keep_cols]
    toks = tokens(text_col)
    return df.select(*keeps, toks.alias("__sh_toks")).select(
        *[F.col(c) for c in df.select(*keeps).columns],
        F.explode(shingles(F.col("__sh_toks"), n)).alias(out_col),
    )


def rolling_fingerprint(toks: Column, modulus: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over token hash values, mod `modulus`.

    Token value = first 8 md5 hex chars as int (cross-engine stable);
    accumulator stays < modulus so `acc*31 + v` never overflows int64
    (ANSI-mode safe). NULL token arrays hash like empty ones (0).
    """
    toks = _coalesce_toks(toks)
    vals = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
    )
    return F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * 31 + v) % F.lit(modulus),
    )


_MINHASH_PRIME = 4_294_967_311  # smallest prime > 2^32


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation coefficients (a_j odd, b_j)."""
    return [
        (((2 * j + 1) * 2_654_435_761) % 2_147_483_647 | 1, (j * 40_503 + 12_289))
        for j in range(num_hashes)
    ]


def shingle_base_hash(shingle_arr: Column) -> Column:
    """One md5 per shingle -> 32-bit int base hash (cross-engine stable)."""
    return F.transform(
        shingle_arr, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )


def minhash_signature(shingle_arr: Column, num_hashes: int = 8) -> Column:
    """Array of `num_hashes` MinHash values (classic affine permutations).

    hash_j(x) = (a_j * x + b_j) mod p over the per-shingle base hash —
    ONE md5 per shingle, then pure int64 arithmetic per hash function
    (a_j < 2^31, x < 2^32, so a_j*x < 2^63: no overflow, ANSI-safe).
    Empty shingle sets produce NULL elements (doc shorter than the
    shingle width).
    """
    base = shingle_base_hash(shingle_arr)
    params = minhash_params(num_hashes)
    consts = F.array(
        *[
            F.struct(F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b"))
            for a, b in params
        ]
    )
    # ONE fold over the shingles updating all num_hashes minima at once:
    # Catalyst inlines duplicated subtrees on projection collapse, so
    # `num_hashes` separate array_min(transform(base, ...)) calls would
    # recompute the md5 base per hash function — this shape evaluates
    # each shingle hash exactly once.
    init = F.array(*[F.lit(_MINHASH_PRIME).cast("long")] * num_hashes)
    folded = F.aggregate(
        base,
        init,
        lambda acc, x: F.zip_with(
            acc,
            consts,
            lambda m, p: F.least(m, (x * p["a"] + p["b"]) % F.lit(_MINHASH_PRIME)),
        ),
    )
    # empty shingle set leaves the init sentinel (== prime, which no
    # real hash can reach since results are mod prime) -> NULL, matching
    # list_min-over-empty semantics without re-evaluating `base`
    return F.transform(
        folded,
        lambda m: F.when(m == F.lit(_MINHASH_PRIME), F.lit(None).cast("long")).otherwise(m),
    )


def lsh_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Group a MinHash signature into band signatures: array of (band, sig) structs."""
    sig_str = signature.cast("array<string>")
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.array_join(
                F.slice(sig_str, b * rows_per_band + 1, rows_per_band), "|"
            ).alias("sig"),
        ),
    )


def simhash16(toks: Column) -> Column:
    """16-bit SimHash: per bit, majority vote of tokens' md5 hex digits.

    Bit p is 1 iff sum over tokens of (+1 if md5(token)[p] >= '8' else
    -1) is positive ('8'..'f' sort above '0'..'7' in every engine).
    """
    # one md5 per token, then a single fold updating all 16 bit-counters
    # at once (16 separate per-bit aggregates would re-inline — and
    # recompute — the md5 per bit on projection collapse). NULL token
    # arrays (NULL text) hash like empty ones -> simhash 0.
    toks = _coalesce_toks(toks)
    hashes = F.transform(toks, lambda t: F.md5(t))
    positions = F.sequence(F.lit(0), F.lit(15))
    init = F.array(*[F.lit(0)] * 16)
    votes = F.aggregate(
        hashes,
        init,
        lambda acc, h: F.zip_with(
            acc,
            positions,
            lambda a, p: a
            + F.when(F.substring(h, p + F.lit(1), F.lit(1)) >= "8", 1).otherwise(-1),
        ),
    )
    weighted = F.zip_with(
        votes,
        positions,
        lambda v, p: F.when(v > 0, F.pow(F.lit(2.0), p).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(
        weighted, F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def gopher_quality_flags(text: Column | str) -> dict[str, Column]:
    """Gopher-style document-quality rules (public heuristics from the
    Gopher/MassiveText papers), each as a boolean column expression:
    word-count bounds, mean-word-length bounds, symbol ratio, and a
    minimum stopword signal. Combine with `gopher_keep`.
    """
    toks = tokens(text)
    n = F.size(toks)
    mean_len = F.try_divide(
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, b: a + b
        ).cast("double"),
        n.cast("double"),
    )
    symbols = punct_count(text)
    stop_hits = stopword_hits(toks, LANG_PROFILES["en"])
    return {
        "ok_word_count": (n >= 50) & (n <= 100_000),
        "ok_mean_word_len": (mean_len >= 3) & (mean_len <= 10),
        "ok_symbol_ratio": F.try_divide(symbols.cast("double"), n.cast("double"))
        < 0.1,
        "ok_stopwords": stop_hits >= 2,
    }


def gopher_keep(text: Column | str) -> Column:
    flags = gopher_quality_flags(text)
    out = F.lit(True)
    for c in flags.values():
        out = out & c
    return F.coalesce(out, F.lit(False))


# ------------------------------------------------------- web-scrape cleanup
# HTML stripping + URL handling for web-crawl corpora. All regexes are
# kept inside the RE2 subset (no backreferences, no lookaround) so the
# DuckDB oracles can run the identical patterns; everything is pure
# Catalyst regexp_* — no UDFs.

_HTML_TAG = "<[^>]*>"
_ENTITIES = [
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"),
]
URL_PATTERN = "(?i)https?://[^\\s\"'<>]+"


def strip_html(text: Column | str) -> Column:
    """Visible text of an HTML fragment: drop tags, decode the common
    entities, collapse whitespace runs, trim."""
    c = _c(text)
    c = F.regexp_replace(c, _HTML_TAG, " ")
    for ent, rep in _ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    return F.trim(F.regexp_replace(c, "\\s+", " "))


def extract_urls(text: Column | str) -> Column:
    """All http(s) URLs in a document, in order (array<string>)."""
    return F.regexp_extract_all(_c(text), F.lit(URL_PATTERN), 0)


def normalize_url(url: Column | str) -> Column:
    """Canonical URL for dedup/joins: scheme+host lowercased, fragment
    dropped, trailing slashes on the path stripped. The query string is
    preserved as-is (semantics-bearing)."""
    u = F.regexp_replace(_c(url), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    rest = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    query = F.regexp_extract(rest, "(\\?.*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    return F.when(scheme == "", u).otherwise(
        F.concat(scheme, F.lit("://"), host, path, query)
    )


# --------------------------------------------------------- encoding repair
# The classic web-crawl corruption: UTF-8 bytes decoded once as
# cp1252/latin-1 ("mojibake" — ftfy's bread and butter). A full ftfy is
# iterative and heuristic; training-data pipelines overwhelmingly need
# only the high-frequency two/three-char sequences below, which are
# unambiguous (no legitimate text contains "â€™"). Pairs are data, not
# code, so the DuckDB oracle derives its replace-chain from the same
# table (queries_text.q_clean_text_docs) — single source of truth.
MOJIBAKE_PAIRS: list[tuple[str, str]] = [
    ("â€™", "’"),  # â€™ -> right single quote
    ("â€˜", "‘"),  # â€˜ -> left single quote
    ("â€œ", "“"),  # â€œ -> left double quote
    ("â€" + "\u009d", "”"),  # + right-dquote tail byte (U+9D, kept out of source text)
    ("â€“", "–"),  # â€“ -> en dash
    ("â€”", "—"),  # â€” -> em dash
    ("â€¦", "…"),  # â€¦ -> ellipsis
    ("Ã©", "é"),  # Ã© -> é
    ("Ã¨", "è"),  # Ã¨ -> è
    ("Ã¡", "á"),  # Ã¡ -> á
    ("Ã­", "í"),  # Ã­ -> í
    ("Ã³", "ó"),  # Ã³ -> ó
    ("Ãº", "ú"),  # Ãº -> ú
    ("Ã±", "ñ"),  # Ã± -> ñ
    ("Ã¼", "ü"),  # Ã¼ -> ü
    ("Ã¶", "ö"),  # Ã¶ -> ö
    ("Ã¤", "ä"),  # Ã¤ -> ä
    ("Ã§", "ç"),  # Ã§ -> ç
    ("Â ", " "),  # Â + nbsp -> plain space
]

# strip ASCII controls but keep \t and \n (visible-structure whitespace)
CONTROL_CHARS = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"


def fix_mojibake(text: Column | str) -> Column:
    """Repair the unambiguous UTF-8-as-cp1252 sequences (ftfy-lite)."""
    c = _c(text)
    for bad, good in MOJIBAKE_PAIRS:
        c = F.replace(c, F.lit(bad), F.lit(good))
    return c


def clean_text(text: Column | str) -> Column:
    """Standard corpus normalization pass, pure Catalyst:
    mojibake repair -> CRLF/CR -> LF -> control-char strip ->
    horizontal-whitespace collapse (newlines preserved — paragraph
    structure is load-bearing for span dedup) -> >=3 blank-line runs
    collapsed to one blank line -> trim.
    """
    c = fix_mojibake(text)
    c = F.regexp_replace(c, "\\r\\n?", "\n")
    c = F.regexp_replace(c, CONTROL_CHARS, "")
    c = F.regexp_replace(c, "[ \\t]+", " ")
    c = F.regexp_replace(c, " ?\\n ?", "\n")  # strip spaces hugging newlines
    c = F.regexp_replace(c, "\\n{3,}", "\n\n")
    return F.trim(c)


def url_host(url: Column | str) -> Column:
    """Lowercased host of an absolute URL ('' when not an absolute URL)."""
    return F.lower(F.regexp_extract(_c(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))


def registered_domain(host: Column | str) -> Column:
    """Last-two-labels registered-domain heuristic (crawl curation rolls
    stats up to the registrant). A public-suffix list would catch
    co.uk-style suffixes; that table is an easy drop-in, but the
    heuristic keeps the hot path join-free and is what C4's own
    badwords-domain filtering used."""
    h = F.regexp_replace(_c(host), ":[0-9]+$", "")  # strip port
    return F.regexp_extract(h, "([^.]+\\.[^.]+)$", 1)


# click-tracking params every major curation pipeline strips
TRACKING_KEYS = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref")
TRACKING_PREFIXES = ("utm_",)


def canonical_host(url: Column | str) -> Column:
    """Host for URL-identity purposes: lowercased, `www.` stripped,
    explicit port stripped. Contrast `url_host` above, which keeps the
    raw authority (www + port) for crawl-stat rollups."""
    auth = F.regexp_extract(
        _c(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    h = F.lower(F.regexp_extract(auth, "^([^:]*)", 1))
    return F.regexp_replace(h, "^www\\.", "")


def _url_port(url: Column | str) -> Column:
    auth = F.regexp_extract(
        _c(url), "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    return F.regexp_extract(auth, ":([0-9]+)$", 1)


def _is_tracking(param: Column) -> Column:
    key = F.split_part(param, F.lit("="), F.lit(1))
    cond = F.lit(False)
    for p in TRACKING_PREFIXES:
        cond = cond | key.startswith(p)
    return cond | key.isin(*TRACKING_KEYS)


def canonical_query(url: Column | str) -> Column:
    """Query string for URL identity: tracking params dropped,
    survivors sorted; '' when nothing remains. The fragment is
    stripped FIRST — per RFC 3986 everything after '#' is fragment,
    so a '?' inside it (the SPA pattern '#/route?tab=1') is fragment
    content, not a query."""
    pre_frag = F.regexp_replace(_c(url), "#.*$", "")
    q = F.regexp_extract(pre_frag, "\\?(.*)$", 1)
    params = F.filter(
        F.split(q, "&"), lambda p: (p != "") & ~_is_tracking(p)
    )
    return F.array_join(F.array_sort(params), "&")


def canonicalize_url(url: Column | str) -> Column:
    """The FULL canonical form for crawl curation — the aggressive
    superset of `normalize_url` above (which lowercases scheme/host,
    drops the fragment, and trims trailing slashes but deliberately
    preserves the query verbatim). This one additionally strips
    `www.`, drops default ports (http:80 / https:443), removes
    tracking params (`utm_*`, click ids), and sorts surviving params —
    so the same resource always maps to the same string for host-level
    caps, exact URL dedup, and per-host stats.

    Pure regexp/array expressions (whole-stage codegen, zero shuffle);
    the regex grammar is RFC-3986's common subset chosen to run
    identically on Spark (Java regex) and DuckDB (RE2) for oracle
    certification. Userinfo (`user@host`) is not handled — crawl URLs
    carrying credentials are dropped upstream by quality gates.
    """
    scheme = F.lower(
        F.regexp_extract(_c(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    host = canonical_host(url)
    port = _url_port(url)
    path = F.regexp_extract(
        _c(url), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.regexp_replace(path, "/+$", "")
    q = canonical_query(url)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port == "") | default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.concat(scheme, F.lit("://"), host, port_part, path, q_part)


def dedup_normalize(text: Column | str) -> Column:
    """Canonical form for DEDUP KEYS (C4's dedup normalized text before
    hashing: lowercase, punctuation removed, whitespace collapsed):
    'Hello, World!' and 'hello world' hash identically while the stored
    document text stays untouched. Feed this to `exact_dedup`/
    `incremental_exact_dedup` key columns, never to the text payload.
    """
    c = F.lower(_c(text))
    c = F.regexp_replace(c, "[^\\p{L}\\p{N}\\s]", " ")
    c = F.regexp_replace(c, "\\s+", " ")
    return F.trim(c)


def ngram_repetition_frac(toks: Column, n: int) -> Column:
    """Within-document duplicate n-gram fraction — the Gopher/
    MassiveText repetition filters (public heuristics): the share of a
    document's token n-grams that are repeats of an earlier n-gram,
    1 - distinct/total. Degenerate looping text (boilerplate stutter,
    decoding loops) scores high while normal prose stays near 0. Pure
    column algebra (transform + array_distinct on the per-row token
    array) - no explode, no shuffle, no UDF; NULL for documents
    shorter than n tokens (no n-grams to judge)."""
    grams = F.filter(
        F.transform(
            toks,
            lambda _t, i: F.when(
                i <= F.size(toks) - n,
                F.concat_ws(
                    " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
                ),
            ),
        ),
        lambda g: g.isNotNull(),
    )
    total = F.size(grams)
    return F.when(
        total > 0,
        1.0
        - F.size(F.array_distinct(grams)).cast("double")
        / total.cast("double"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap_tokens: int = 64,
    out_col: str = "chunk_text",
) -> DataFrame:
    """Token-window document chunking — the split-to-context-length
    stage of pretraining/RAG pipelines (long documents become
    overlapping `chunk_tokens`-token windows advancing by
    `chunk_tokens - overlap_tokens`, so no boundary-straddling span
    is lost to a hard cut; the overlap convention of every published
    retrieval chunker).

    One row per chunk: (id_col, chunk_ix 0-based, chunk_n_tokens,
    out_col). Chunk text is the token slice re-joined with single
    spaces — TOKEN-level chunking is whitespace-normalizing by
    construction (the same contract as every token-derived surface
    here); offsets into raw text would require byte-level windows.
    The last chunk is the remainder (>= 1 token, <= chunk_tokens);
    a doc of <= chunk_tokens tokens emits exactly one chunk equal to
    its normalized text. NULL text emits ZERO rows (nothing to
    chunk — anchor on the input frame to audit them); an
    empty/whitespace-only string carries one empty-string token
    (the F.split contract) and emits one empty chunk.

    Deterministic and stable: (id, chunk_ix) is a pure function of
    the document content and the chunking parameters — reprocessing
    the corpus reproduces identical chunk keys, so downstream dedup /
    splits / embeddings keyed on (id, chunk_ix) survive a rebuild.

    Scale: pure column algebra on the projected token array (the
    position lambda slices a bound attribute — the O(tokens^2)
    higher-order-function trap documented on `shingles` applies and
    is avoided here), one posexplode; no shuffle at all — chunking is
    embarrassingly row-parallel.
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1; got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens); got "
            f"{overlap_tokens} vs chunk_tokens={chunk_tokens} — a "
            "stride of zero would chunk forever"
        )
    stride = chunk_tokens - overlap_tokens
    t = df.select(F.col(id_col), tokens(text_col).alias("__ck_toks"))
    n = F.size("__ck_toks")  # -1 for NULL arrays (split of NULL)
    # number of windows: 1 + ceil(max(0, n - chunk_tokens) / stride);
    # integer form avoids doubles entirely
    extra = F.greatest(n - F.lit(chunk_tokens), F.lit(0))
    n_chunks = F.lit(1) + F.floor(
        (extra + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    slices = t.filter(n >= 1).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(
                    F.col("__ck_toks"),
                    i * F.lit(stride) + 1,
                    F.lit(chunk_tokens),
                ),
            )
        ).alias("chunk_ix", "__ck"),
    )
    return slices.select(
        F.col(id_col),
        F.col("chunk_ix"),
        F.size("__ck").alias("chunk_n_tokens"),
        F.array_join("__ck", " ").alias(out_col),
    )

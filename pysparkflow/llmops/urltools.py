"""URL canonicalization + URL-level dedup.

Web-crawl corpora carry the same page under many raw URL spellings:
case-varied scheme/host, ``www.`` prefixes, tracking parameters
(``utm_*``), fragments, trailing slashes. Canonicalizing BEFORE the
content pipeline removes the cheapest duplicate class with a map-only
scan — no text is read, let alone shuffled.

``canonicalize_url`` is a chain of ``regexp_replace`` steps with
**literal** replacement strings only (no capture-group backreferences),
so the identical transform is replayable in any RE2/PCRE-flavored SQL
engine — which is exactly how the DuckDB oracle certifies it.

Scale shape: canonicalization is scan-fused column arithmetic (zero
shuffles); the dup-group aggregation shuffles (canonical_url) pairs
only — never document bodies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    """Lowercase; strip fragment; drop ``utm_*`` tracking params (fixing
    dangling ``?``/``&``); strip ``www.``; strip trailing slash.

    Every replacement is a literal string, so the same seven regexps run
    unchanged in Spark (Java regex) and DuckDB (RE2)."""
    u = F.lower(url)
    u = F.regexp_replace(u, r"#[^#]*$", "")              # fragment
    u = F.regexp_replace(u, r"&utm_[a-z]+=[^&]*", "")    # utm after other params
    u = F.regexp_replace(u, r"[?]utm_[a-z]+=[^&]*&", "?")  # leading utm, more follow
    u = F.regexp_replace(u, r"[?]utm_[a-z]+=[^&]*$", "")   # utm is the only param
    u = F.regexp_replace(u, r"://www[.]", "://")         # www prefix
    u = F.regexp_replace(u, r"/[?]", "?")                # slash before query
    u = F.regexp_replace(u, r"/$", "")                   # trailing slash
    return u


# the same seven steps as a SQL expression template ({u} = raw url expr);
# DuckDB's regexp_replace is first-match-only by default, hence the 'g'
# flag (Spark's is always global)
CANONICALIZE_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(regexp_replace(lower({u}), "
    "'#[^#]*$', '', 'g'), "
    "'&utm_[a-z]+=[^&]*', '', 'g'), "
    "'[?]utm_[a-z]+=[^&]*&', '?', 'g'), "
    "'[?]utm_[a-z]+=[^&]*$', '', 'g'), "
    "'://www[.]', '://', 'g'), "
    "'/[?]', '?', 'g'), "
    "'/$', '', 'g')"
)


def url_dup_groups(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Group rows by canonical URL; return groups with >1 member as
    (canonical_url, n_dups, min_id) — the keep-one-representative shape
    of exact dedup (llmops/dedup.py) applied to the URL key."""
    return (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("min_id"),
        )
        .filter(F.col("n_dups") > 1)
    )

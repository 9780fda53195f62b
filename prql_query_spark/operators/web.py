"""Web-corpus curation: URL canonicalization, domain extraction, and
per-domain caps.

Web crawls arrive keyed by URL, and three of the standard curation steps
are URL-shaped (CCNet/C4/RefinedWeb pipelines):

* canonicalize, so `HTTP://WWW.Site.com:80/a/?utm_source=x#f` and
  `http://site.com/a` dedup to the same key;
* roll up to the registered domain, the unit of quality scoring,
  licensing decisions, and blocklists;
* cap documents per domain, so a single template-heavy site cannot
  dominate the training mix.

Everything here is pure `pyspark.sql.functions` string/regex expressions
(whole-stage codegen, zero UDF) so it pipelines into the scan; the only
shuffle in the module is the per-domain window in `cap_per_domain`.
Regexes stay in the RE2-compatible subset (no backrefs/lookahead) so the
same pattern text runs verbatim in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tracking parameters stripped during canonicalization (the public
# utm/click-id set every crawler scrubs).
TRACKING_PARAM_RE = "(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)"

# Multi-part public suffixes the 2-label heuristic would truncate.  A
# deliberate small list, not the full PSL: these cover the overwhelming
# share of multi-label registrations in web crawls; swap in the full
# public-suffix list as data when exactness matters.
MULTIPART_TLDS = (
    "co.uk", "org.uk", "gov.uk", "ac.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za",
)


def url_host(url_col: Column) -> Column:
    """Lowercased host with any port and credentials stripped."""
    return F.lower(
        F.regexp_extract(url_col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1)
    )


def canonicalize_url(url_col: Column) -> Column:
    """Normalize a URL to its canonical dedup key:

    lowercase scheme+host, strip credentials, `www.` and default ports,
    drop the fragment, remove tracking query parameters
    (`TRACKING_PARAM_RE`), collapse duplicate slashes in the path, strip
    a trailing slash, and drop a left-over empty `?`.

    One chain of regexp_replace/lower — codegen'd, order-sensitive steps
    documented inline.  The same pattern text (RE2-safe) backs the SQL
    oracle, so canonical keys match across engines bit-for-bit.
    """
    u = url_col
    # scheme+host lowercase (leave path/query case alone: paths are
    # case-sensitive on most origins)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/?#]*)", 1)
    rest = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    host = F.lower(hostport)
    # strip default ports, then a leading www.
    host = F.regexp_replace(host, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    # fragment is already excluded from `rest`; scrub tracking params
    rest = F.regexp_replace(rest, r"([?&])" + TRACKING_PARAM_RE + r"=[^&]*", "$1")
    # tidy separators the scrub left behind: "?&" -> "?", "&&" -> "&",
    # then a dangling "?" or "&"
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"[?&]$", "")
    # collapse duplicate slashes in the path part only (query untouched:
    # split at the first ?)
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?]*)", 1), r"//+", "/")
    query = F.regexp_extract(rest, r"(\?.*)$", 1)
    # trailing slash (but keep a bare "/" root as empty -> re-added below)
    path = F.regexp_replace(path, r"/+$", "")
    return F.concat(scheme, F.lit("://"), host, path, query)


def registered_domain(host_col: Column) -> Column:
    """Registered (pay-level) domain from a host: last two labels, or
    last three when the suffix is a known multi-part TLD
    (`MULTIPART_TLDS`).  `site.co.uk` -> `site.co.uk`,
    `a.b.site.com` -> `site.com`."""
    parts = F.split(host_col, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    is_multi = last2.isin(*MULTIPART_TLDS)
    return (
        F.when(n <= 2, host_col)
        .when(is_multi & (n >= 3), last3)
        .otherwise(last2)
    )


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    max_per_domain: int = 100,
) -> DataFrame:
    """Keep at most ``max_per_domain`` documents per registered domain,
    chosen by a deterministic md5 lottery (unbiased w.r.t. crawl order,
    reproducible across runs) with the id as tiebreak.

    Adds `domain`; one hash-partitioned window shuffle — the same shape
    at any scale, and AQE splits a mega-domain partition if one site
    dominates the crawl."""
    dom = registered_domain(url_host(F.col(url_col)))
    w = Window.partitionBy("domain").orderBy(
        F.md5(F.concat_ws("|", F.col("domain"), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    return (
        df.withColumn("domain", dom)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_domain)
        .drop("_rk")
    )


def canonicalize_oracle_exprs() -> dict[str, str]:
    """DuckDB SQL expression fragments that mirror `canonicalize_url` /
    `url_host` / `registered_domain` step for step, generated from the
    SAME `TRACKING_PARAM_RE` / `MULTIPART_TLDS` constants so the two
    engines cannot drift.  Each fragment expects the raw URL as `u` (or
    the canonical host as `h` for the domain expr).  DuckDB's
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all; backreferences are spelled \\1 instead of $1."""
    scheme = r"lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))"
    hostport = (
        r"regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/?#]*)', 1)"
    )
    host = (
        r"regexp_replace(regexp_replace(lower(" + hostport
        + r"), ':(80|443)$', '', 'g'), '^www\.', '', 'g')"
    )
    rest = r"regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1)"
    rest2 = (
        r"regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        + rest
        + r", '([?&])" + TRACKING_PARAM_RE + r"=[^&]*', '\1', 'g')"
        + r", '\?&+', '?', 'g'), '&&+', '&', 'g'), '[?&]$', '', 'g')"
    )
    path = (
        r"regexp_replace(regexp_replace(regexp_extract(" + rest2
        + r", '^([^?]*)', 1), '//+', '/', 'g'), '/+$', '', 'g')"
    )
    query = r"regexp_extract(" + rest2 + r", '(\?.*)$', 1)"
    canonical = scheme + r" || '://' || " + host + r" || " + path + r" || " + query
    tld_list = ", ".join(f"'{t}'" for t in MULTIPART_TLDS)
    domain = f"""CASE
        WHEN len(string_split(h, '.')) <= 2 THEN h
        WHEN (string_split(h, '.')[-2] || '.' || string_split(h, '.')[-1])
             IN ({tld_list}) AND len(string_split(h, '.')) >= 3
        THEN string_split(h, '.')[-3] || '.' || string_split(h, '.')[-2]
             || '.' || string_split(h, '.')[-1]
        ELSE string_split(h, '.')[-2] || '.' || string_split(h, '.')[-1]
    END"""
    return {"host": host, "canonical": canonical, "domain": domain}

"""URL canonicalization — the web-corpus twin of text normalization
(functions/cleaning.py): crawl pipelines dedup and block by URL before
ever touching page text (CCNet/RefinedWeb shape), and raw URLs fracture
on scheme case, default ports, fragments, tracking params, and query
order. Everything here is built-in column expressions around Spark's
``parse_url`` — JVM-side, codegen'd, no Python boundary, safe to run
on 10¹¹ URLs as a map-only pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters that never identify content (analytics/attribution
#: junk): exact names plus the utm_ family prefix.
TRACKING_PARAMS = (
    "fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref", "igshid",
)


def _part(c: Column, part: str) -> Column:
    # try_parse_url, not parse_url: Spark 4's parse_url RAISES on a
    # malformed URL (ANSI), and one bad crawl record must not kill a
    # 10¹¹-row pass — NULL is the documented malformed-URL contract
    return F.try_parse_url(c, F.lit(part))


def normalize_url(col: Column | str) -> Column:
    """Canonical form for dedup/blocklists:

    - scheme and host lowercased; a leading ``www.`` dropped
    - explicit DEFAULT ports dropped (``:80`` http, ``:443`` https);
      non-default ports kept — ``host:8080`` is a different server
    - fragment dropped (never sent to the server)
    - tracking query params dropped (``utm_*`` + TRACKING_PARAMS);
      survivors SORTED so param order stops mattering
    - empty path becomes ``/``; a single trailing slash on a longer
      path is dropped (``/a/`` == ``/a`` — the common dedup choice)

    NULL-safe: a string ``parse_url`` cannot parse yields NULL parts
    and the expression returns NULL — filter or coalesce upstream."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(_part(c, "PROTOCOL"))
    host = F.lower(_part(c, "HOST"))
    host = F.when(
        host.startswith("www."), F.substring(host, 5, 2147483647)
    ).otherwise(host)
    # HOST excludes the port; AUTHORITY is host[:port]. Keep a
    # non-default port, drop a default one (and no port stays none).
    port = F.regexp_extract(F.lower(_part(c, "AUTHORITY")), r":(\d+)$", 1)
    is_default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_sfx = F.when(
        (port == "") | is_default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = _part(c, "PATH")
    path = F.when(path.isNull() | (path == ""), F.lit("/")).otherwise(path)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        path.substr(F.lit(1), F.length(path) - 1),
    ).otherwise(path)
    query = _part(c, "QUERY")
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(F.coalesce(query, F.lit("")), "&"),
                lambda kv: (kv != "")
                & ~F.lower(kv).startswith("utm_")
                & ~F.split(F.lower(kv), "=")[0].isin(*TRACKING_PARAMS),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_sfx,
        path,
        F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
    )


def url_host(col: Column | str) -> Column:
    """Lowercased host of a URL with any leading ``www.`` dropped
    (the ``normalize_url`` host convention); NULL for malformed URLs.
    The blocking/rollup key for host-level crawl analytics."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(_part(c, "HOST"))
    return F.when(
        host.startswith("www."), F.substring(host, 5, 2147483647)
    ).otherwise(host)


#: second-level labels under which the registrable name needs THREE
#: labels (heuristic slice of the public-suffix list — the full PSL is
#: a data file; this covers the dominant crawl ccTLD patterns and is
#: explicitly a documented approximation, not PSL parity)
_SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.nz", "co.za", "com.tr", "com.ar", "com.sg", "co.kr",
)


def registered_domain(col: Column | str) -> Column:
    """Registrable domain of a URL's host (``news.bbc.co.uk`` →
    ``bbc.co.uk``, ``a.b.example.com`` → ``example.com``) — the
    grouping key for per-site crawl policies (politeness budgets,
    domain quality priors, per-site dedup scopes).

    Heuristic, not PSL-complete: the last two labels, or the last
    three when the two-label tail is a known shared second-level
    suffix. Hosts with fewer labels (``localhost``, bare TLDs, IPs
    dotted like ``10.0.0.1`` — which this treats as opaque labels)
    pass through unchanged."""
    host = url_host(col)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.array_join(F.slice(parts, n - 1, 2), ".")
    last3 = F.array_join(F.slice(parts, n - 2, 3), ".")
    return F.when(n <= 2, host).otherwise(
        F.when(
            last2.isin(*_SECOND_LEVEL_SUFFIXES), F.coalesce(last3, host)
        ).otherwise(last2)
    )


def dedup_by_url(
    docs: DataFrame, url_col: str = "source", order_col: str = "doc_id"
) -> DataFrame:
    """Keep ONE document per canonical URL (deterministic keep-first
    by ``order_col`` — the operators/dedup keep-first discipline).
    Rows whose URL cannot be canonicalized (NULL) are all kept: a
    malformed URL is not evidence of duplication.

    One shuffle on the canonical URL; document text rides the shuffle
    only for the kept row's sake — at crawl scale run it ids-only and
    semi-join back, the docs_exact_dedup pattern. Malformed-URL rows
    are split out BEFORE the window: they would otherwise all hash to
    the single NULL partition key and funnel a few percent of a crawl
    through one reducer just to have the rank discarded."""
    from pyspark.sql.window import Window

    canon = docs.withColumn("__curl", normalize_url(url_col))
    malformed = canon.where(F.col("__curl").isNull()).drop("__curl")
    w = Window.partitionBy("__curl").orderBy(F.col(order_col))
    kept = (
        canon.where(F.col("__curl").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__curl")
    )
    return kept.unionByName(malformed)

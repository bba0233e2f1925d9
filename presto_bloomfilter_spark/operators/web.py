"""URL hygiene for crawl-scale corpora: normalization, domain
extraction, URL-seen dedup.

Crawl pipelines dedup by URL before they ever touch content: the same
page arrives as ``HTTP://Example.COM:80/a/?utm_source=x#top`` and
``http://example.com/a/``.  ``url_normalize`` canonicalizes the
variants that never change the fetched resource; ``url_dedup`` then
keeps the first document per canonical URL, and ``domain_of`` feeds
per-domain quotas (``sampling.cap_per_key``) and blocklist joins.

Normalization steps (each deterministic, engine-portable, applied in
this order):
  1. scheme and host lowercased (userinfo is not supported — kept
     verbatim as part of the host token if present),
  2. default ports stripped (``:80`` for http, ``:443`` for https),
  3. fragment stripped,
  4. tracking params dropped (``utm_*``, ``fbclid``, ``gclid``,
     ``msclkid``, ``ref``), empty query then dropped entirely,
  5. trailing ``/`` stripped from a non-root path.

Everything is chained JVM ``regexp_replace`` / array lambdas — one
map-only codegen'd projection, no Python, no shuffle — and the same
expressions run in ANSI SQL, so gates replay every step.  This is
deliberately NOT a full RFC 3986 resolver (no percent-decoding, no
dot-segment removal, no punycode): those transforms can change which
resource is fetched, and a dedup key must never merge distinct pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|ref)="


def url_normalize_col(col) -> "F.Column":
    """Canonical-URL Column expression (see module docstring)."""
    u = F.coalesce(col, F.lit(""))
    # 1. lowercase scheme:// (host handled below)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://)", 1))
    # leading-anchored strip (NOT substring_index: '://' may recur in
    # the query string)
    after_scheme = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    # host = up to first '/', '?' or '#'
    host = F.lower(F.regexp_extract(after_scheme, r"^([^/?#]*)", 1))
    tail = F.regexp_replace(after_scheme, r"^[^/?#]*", "")
    # 2. default ports
    host = F.when(scheme == F.lit("http://"),
                  F.regexp_replace(host, r":80$", "")).otherwise(
        F.when(scheme == F.lit("https://"),
               F.regexp_replace(host, r":443$", "")).otherwise(host))
    # 3. strip fragment
    tail = F.regexp_replace(tail, r"#.*$", "")
    # 4. tracking params
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.when(tail.contains("?"),
                   F.regexp_replace(tail, r"^[^?]*\?", "")).otherwise(F.lit(""))
    kept = F.filter(F.split(query, "&", -1),
                    lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE))
    qjoin = F.array_join(kept, "&")
    # 5. trailing slash on a non-root path
    path = F.when(path != "/", F.regexp_replace(path, r"/$", "")) \
            .otherwise(path)
    return F.concat(
        scheme, host, path,
        F.when(qjoin != "", F.concat(F.lit("?"), qjoin)).otherwise(F.lit("")))


def domain_of_col(col) -> "F.Column":
    """Registered host (lowercased, port stripped) of a URL Column —
    the per-domain quota / blocklist key.  No public-suffix list (that
    is data, not logic): this is the full hostname."""
    u = F.coalesce(col, F.lit(""))
    after = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(after, r"^([^/?#]*)", 1))
    return F.regexp_replace(host, r":[0-9]+$", "")


def url_normalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append ``norm_url`` and ``domain`` columns — one map-only
    codegen'd projection."""
    return (df.withColumn("norm_url", url_normalize_col(F.col(url_col)))
            .withColumn("domain", domain_of_col(F.col(url_col))))


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Keep the first document (min id) per canonical URL — the
    URL-seen pass.  Same scale shape as ``dedup.drop_exact_dups``: one
    shuffle on md5(norm_url), rank-1 window truncated map-side."""
    out = url_normalize(df, url_col)
    w = Window.partitionBy(F.md5(F.col("norm_url"))).orderBy(F.col(id_col))
    return (out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def filter_blocked_domains(df: DataFrame, blocked: DataFrame,
                           url_col: str = "url",
                           keep_blocked: bool = False) -> DataFrame:
    """Domain-blocklist filtering — the crawl-hygiene gate every web
    pipeline runs first: drop rows whose URL's host, or ANY parent
    domain of it, appears on the blocklist (blocking ``example.com``
    also blocks ``cdn.sub.example.com``; blocking ``co.uk`` blocks the
    whole ccTLD family — supply a public-suffix-aware list if that is
    not intended).  ``blocked`` is a one-column DataFrame of domains
    (column ``domain``, matched case-insensitively).
    ``keep_blocked=True`` inverts the filter (the audit view).

    Scale shape: the suffix chain is generated per DISTINCT host (a
    ≤#labels array via sliding array_join — hosts, not rows), matched
    against the broadcast blocklist with one semi join, and the
    resolved bad-host set joins back to the row stream keyed on host
    — row multiplicity is preserved exactly, no row data ever crosses
    a shuffle beyond its host key, and AQE broadcasts the bad-host
    side when small.
    """
    host = domain_of_col(F.col(url_col))
    hosts = df.select(host.alias("__host")).distinct()
    labels = F.split(F.col("__host"), r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(0), F.size(labels) - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, F.size(labels)), "."),
    )
    bad_hosts = (
        hosts.select("__host", F.explode(suffixes).alias("__d"))
        .join(F.broadcast(blocked.select(F.lower(F.col("domain")).alias("__d"))),
              "__d", "left_semi")
        .select("__host").distinct()
    )
    how = "left_semi" if keep_blocked else "left_anti"
    return df.join(bad_hosts, host == F.col("__host"), how)

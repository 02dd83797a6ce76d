"""URL normalization and URL-level dedup — the Common-Crawl-pipeline
front door: before any content-based dedup runs, crawl corpora are
collapsed by canonical URL (the same page fetched with tracking
params, fragments, default ports, ``www.`` or case noise is one
document).

All pure JVM-side expressions (regexp + array functions — no UDF),
and every rule is replayable in DuckDB SQL, so the operators are
oracle-checked value-for-value like the rest of the engine.

Normalization rules (the conservative, always-safe subset):

- drop the ``#fragment``,
- lowercase the scheme and host,
- strip a leading ``www.`` label,
- strip the scheme's default port (``:80`` http, ``:443`` https),
- drop tracking query parameters (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), keeping the remaining parameters in their original order
  (re-sorting would merge semantically different URLs on servers
  where order matters),
- strip trailing slashes from the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="


def url_host(url: Column) -> Column:
    """Lowercased host[:port] of a URL (empty string when there is no
    ``scheme://`` prefix to anchor on)."""
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    has_scheme = url.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    return F.when(has_scheme, F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))).otherwise(
        F.lit("")
    )


def url_registered_domain(url: Column) -> Column:
    """Last-two-label heuristic of the host ('docs.example.com' ->
    'example.com') — the grouping key for per-site statistics.  A
    public-suffix list would refine multi-label TLDs; the heuristic is
    deterministic and dependency-free."""
    host = F.regexp_replace(url_host(url), r":\d+$", "")
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two == "", host).otherwise(two)


def normalize_url(url: Column) -> Column:
    """Canonical form of a URL under the module's normalization rules."""
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = rest.substr(F.length(hostport) + 1, F.length(rest))
    host = F.regexp_replace(F.lower(hostport), r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(F.regexp_extract(tail, r"^([^?]*)", 1), r"/+$", "")
    query = F.regexp_replace(tail, r"^[^?]*\??", "")
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def filter_blocked_domains(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop documents whose URL host matches a blocklist entry — the
    safety/robots/licensing gate every crawl pipeline runs before
    anything touches the text.

    Match semantics are HOST-SUFFIX at label boundaries: a document is
    dropped when its host equals an entry or ends with ``.`` + entry,
    so an entry names exactly the subtree it spells —
    ``example.com`` blocks ``example.com`` and every subdomain;
    ``docs.example.com`` blocks only that subtree (a registered-domain
    equi-match silently no-ops for subdomain-scoped entries, turning a
    safety gate into a hole).

    Scale shape: a theta ``endswith`` join would be a nested loop
    (O(corpus x blocklist) compares).  Instead the blocklist's
    distinct label DEPTHS are collected (the blocklist is a dimension
    table; its depth set is a handful of small integers) and each
    depth becomes one broadcast LEFT ANTI equi-join between that
    depth's entries and the host's last-``d``-label suffix — the
    corpus side never shuffles and never meets a nested loop
    (plan-pinned).
    """
    bl = blocklist.select(F.lower(F.col(domain_col)).alias("__blocked")).filter(
        F.col("__blocked") != ""
    )
    depth = F.size(F.split(F.col("__blocked"), r"\."))
    depths = sorted(
        r[0] for r in bl.select(depth.alias("d")).distinct().collect()
    )
    # strip port AND any trailing root-dot ('example.com.' is valid
    # FQDN form; unstripped it makes every last-d-labels extraction
    # return "" and the document would BYPASS the blocklist)
    host = F.regexp_replace(
        F.regexp_replace(url_host(F.col(url_col)), r":\d+$", ""), r"\.$", ""
    )
    out = docs.withColumn("__host", host)
    for d in depths:
        bld = F.broadcast(bl.filter(depth == d))
        # last d labels of the host; fewer-label hosts extract to ""
        # which never equals a (nonempty) entry
        sfx = F.regexp_extract(
            F.col("__host"), r"((?:[^.]+\.){%d}[^.]+)$" % (d - 1), 1
        )
        out = out.join(bld, sfx == bld["__blocked"], "left_anti")
    return out.drop("__host")


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """URL-level exact dedup: one row per canonical URL with the
    lowest-id document as the keeper and the duplicate count — the
    same keep-min contract as ``dedup.exact_dedup``, keyed on
    :func:`normalize_url` instead of content.

    Scale shape: one map-side normalization expression and one
    hash aggregation on the canonical URL — map-side combinable
    min/count, no window, no join.
    """
    norm = normalize_url(F.col(url_col))
    return (
        docs.select(norm.alias("norm_url"), F.col(id_col).alias("id"))
        .groupBy("norm_url")
        .agg(
            F.min("id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )

"""URL column functions: canonicalization, host extraction, hashing,
similarity.

Spark-first: everything here is built-in column expressions (JVM-side,
whole-stage-codegen'd) — no Python in the hot path.  ``xxhash64`` is Spark's
native 64-bit hash; at 10^10 frontier scale the (canonical_url → url_hash)
mapping never materializes on the driver.

Canonicalization policy (documented, applied before hashing/seen-set —
SURVEY.md §2.11): lowercase scheme and host, strip ``#fragment``, drop
default ports (:80 http, :443 https), strip trailing ``?`` with empty query.
Path and query are preserved byte-for-byte otherwise (podcast CDNs are
case/query sensitive — see the ximalaya enclosure URLs).

URL validity filter (F1) mirrors ``validate_url``
(``/root/reference/src/crawler_refactor/rss.rs:678-687``): scheme http/https
+ non-empty host.  URL similarity (P13) mirrors
``/root/reference/src/crawler/url_utils.rs:8-63``:
``0.7*domain_eq + 0.3*(shared path-prefix segments / max path segments)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# matches scalars._HTTP_URL_RE semantics as a JVM-side rlike (F1)
VALID_URL_RE = r"^(?i)https?://([^/?#\s@]*@)?[^/?#\s:@]+(:\d*)?([/?#]\S*)?$"


def is_valid_url(url: Column) -> Column:
    return url.rlike(VALID_URL_RE)


def url_host(url: Column) -> Column:
    """Lowercased host (authority minus userinfo/port)."""
    authority = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    no_user = F.element_at(F.split(authority, "@"), -1)
    host = F.element_at(F.split(no_user, ":"), 1)
    return F.lower(host)


def canonicalize_url(url: Column) -> Column:
    """Canonical URL per the policy in the module docstring."""
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    authority = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    # lowercase authority (hosts are case-insensitive; no userinfo in corpus)
    authority_lc = F.lower(authority)
    authority_norm = F.when(
        (scheme == F.lit("http")) & authority_lc.endswith(":80"),
        F.substring(authority_lc, 1, F.length(authority_lc) - F.lit(3)),
    ).when(
        (scheme == F.lit("https")) & authority_lc.endswith(":443"),
        F.substring(authority_lc, 1, F.length(authority_lc) - F.lit(4)),
    ).otherwise(authority_lc)
    # strip a trailing '?' only when the query is EMPTY: the first '?' is
    # the last character (a '?' inside a non-empty query is preserved —
    # path/query bytes are otherwise untouched, see module docstring)
    qpos = F.instr(rest, "?")
    rest_norm = F.when(
        (qpos > 0) & (qpos == F.length(rest)),
        F.substring(rest, 1, F.length(rest) - F.lit(1)),
    ).otherwise(rest)
    return F.concat(scheme, F.lit("://"), authority_norm, rest_norm)


def url_hash(canonical_url: Column) -> Column:
    """64-bit key for the seen-set / frontier partitioning."""
    return F.xxhash64(canonical_url)


def host_hash(host: Column) -> Column:
    return F.xxhash64(host)


def _path_segments(url: Column) -> Column:
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.filter(F.split(path, "/"), lambda s: s != F.lit(""))


def url_similarity(url1: Column, url2: Column) -> Column:
    """P13: 0.7·domain_eq + 0.3·(zip-shared path segments / max path len)."""
    domain_sim = F.when(url_host(url1) == url_host(url2), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    p1, p2 = _path_segments(url1), _path_segments(url2)
    common = F.aggregate(
        F.zip_with(p1, p2, lambda a, b: (a == b).cast("int")),
        F.lit(0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0)),
    )
    max_len = F.greatest(F.size(p1), F.size(p2))
    path_sim = F.when(max_len > 0, common.cast("double") / max_len).otherwise(
        F.lit(0.0)
    )
    return F.lit(0.7) * domain_sim + F.lit(0.3) * path_sim


# Tracking parameters stripped by scrub_url: the industry-standard
# analytics/click-id set (utm_* per Google Analytics, fbclid/gclid/
# msclkid click ids, mc_eid Mailchimp, igshid Instagram, ref).  A
# matching param never changes the resource — removing it collapses
# spurious frontier entries for the SAME page, shrinking the 10^10
# seen-set by the tracking-link multiplicity.
TRACKING_PARAM_RE = r"^(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|igshid|ref)(=.*)?$"


def scrub_url(url: Column, sort_params: bool = True) -> Column:
    """Drop tracking query params; optionally byte-sort the survivors.

    The scrubbed-and-sorted form is the seen-set keying form (SURT-style
    normalization — two spellings of one resource must collide in the
    Bloom shards); with ``sort_params=False`` the original param order
    is preserved (the fetch-safe form: some endpoints are order
    sensitive).  Empty params (``a&&b``) are dropped either way; the
    ``?`` disappears when nothing survives; a ``#fragment`` is
    preserved byte-for-byte (the canonicalizer owns fragment policy).
    Pure codegen expression — string ops + array filter/sort, no regex
    backtracking beyond the anchored param match.
    """
    qpos = F.instr(url, "?")
    head = F.substring(url, F.lit(1), qpos - 1)
    rest = F.substring(url, qpos + 1, F.length(url))
    hpos = F.instr(rest, "#")
    query = F.when(hpos > 0, F.substring(rest, F.lit(1), hpos - 1)).otherwise(rest)
    frag = F.when(hpos > 0, F.substring(rest, hpos, F.length(rest))).otherwise(
        F.lit("")
    )
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    if sort_params:
        kept = F.array_sort(kept)
    newq = F.array_join(kept, "&")
    rebuilt = F.when(
        F.size(kept) > 0, F.concat(head, F.lit("?"), newq, frag)
    ).otherwise(F.concat(head, frag))
    return F.when(qpos == 0, url).otherwise(rebuilt)


def scrub_oracle_sql(url_expr: str, sort_params: bool = True) -> str:
    """DuckDB expression replaying :func:`scrub_url` exactly."""
    qpos = f"strpos({url_expr}, '?')"
    head = f"substring({url_expr}, 1, {qpos} - 1)"
    rest = f"substring({url_expr}, {qpos} + 1)"
    hpos = f"strpos({rest}, '#')"
    query = f"(CASE WHEN {hpos} > 0 THEN substring({rest}, 1, {hpos} - 1) ELSE {rest} END)"
    frag = f"(CASE WHEN {hpos} > 0 THEN substring({rest}, {hpos}) ELSE '' END)"
    kept = (
        f"list_filter(string_split({query}, '&'), "
        f"p -> p <> '' AND NOT regexp_matches(p, "
        f"'^(utm_[^=&]*|fbclid|gclid|msclkid|mc_eid|igshid|ref)(=.*)?$'))"
    )
    if sort_params:
        kept = f"list_sort({kept})"
    return (
        f"(CASE WHEN {qpos} = 0 THEN {url_expr} "
        f"WHEN len({kept}) > 0 THEN {head} || '?' || "
        f"array_to_string({kept}, '&') || {frag} "
        f"ELSE {head} || {frag} END)"
    )


# PSL-lite: the common two-label public suffixes (country-code SLDs).
# A deliberate embedded subset — the full Mozilla PSL is a data file a
# production deployment would broadcast-join instead; the RULE (longest
# matching suffix + one label) is identical, and the default single-label
# suffix covers every gTLD.
_PSL2 = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.in", "net.in", "org.in", "co.kr", "or.kr",
    "co.nz", "net.nz", "org.nz", "com.mx", "com.ar", "com.tr",
    "co.za", "org.za", "com.sg", "com.hk", "com.tw",
]


def registered_domain(host: Column) -> Column:
    """Registrable (pay-level) domain of a host — the aggregation key
    for per-DOMAIN crawl budgets, dedup attribution and ownership
    rollups (per-host keys over-split large networks:
    ``feeds.megapod.co.uk`` and ``www.megapod.co.uk`` are one owner).

    Rule: if the last two labels are a known country-code SLD
    (``_PSL2``), the registrable domain is the last THREE labels,
    else the last TWO; hosts at or below suffix length return
    unchanged.  Pure array ops — map-side, codegen, replayable in SQL
    (``registered_domain_sql``)."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    suffix_labels = F.when(last2.isin(_PSL2), F.lit(3)).otherwise(F.lit(2))
    k = F.least(n, suffix_labels)
    return F.array_join(F.slice(labels, -k, k), ".")


def registered_domain_sql(host_expr: str) -> str:
    """DuckDB expression replaying :func:`registered_domain`."""
    in_list = ", ".join(f"'{s}'" for s in _PSL2)
    l = f"string_split({host_expr}, '.')"
    sl = (
        f"(CASE WHEN array_to_string(list_slice({l}, -2, -1), '.')"
        f" IN ({in_list}) THEN 3 ELSE 2 END)"
    )
    k = f"least(len({l}), {sl})"
    return f"array_to_string(list_slice({l}, -{k}, -1), '.')"


def surt_host(url: Column) -> Column:
    """SURT-ordered host: lowercase, leading ``www.`` dropped, labels
    reversed and comma-joined (``podcasts.example.org`` →
    ``org,example,podcasts``) — the Common-Crawl/Wayback canonical host
    form.  Sorting or range-partitioning the frontier by this key
    co-locates a registrable domain with all its subdomains (plain host
    order scatters them across the alphabet), which is what makes
    per-domain politeness scans and domain-level rollups contiguous
    reads instead of shuffles.  Pure array ops, codegen."""
    h = url_host(url)
    h = F.when(h.startswith("www."), F.substring(h, 5, F.length(h))).otherwise(h)
    return F.array_join(F.reverse(F.split(h, "\\.")), ",")


def surt_key(url: Column) -> Column:
    """Full SURT sort key: reversed host + ``)`` + path-and-query bytes
    (fragment dropped, consistent with :func:`canonicalize_url`)."""
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)", 1)
    return F.concat(surt_host(url), F.lit(")"), rest)


def surt_oracle_exprs(url_expr: str) -> tuple[str, str]:
    """DuckDB (surt_host, surt_key) expressions replaying the above."""
    host = (
        f"lower(string_split(string_split("
        f"regexp_extract({url_expr}, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1),"
        f" '@')[-1], ':')[1])"
    )
    nowww = (
        f"(CASE WHEN {host} LIKE 'www.%' THEN substring({host}, 5)"
        f" ELSE {host} END)"
    )
    shost = f"array_to_string(list_reverse(string_split({nowww}, '.')), ',')"
    rest = (
        f"regexp_extract({url_expr},"
        f" '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)', 1)"
    )
    return shost, f"{shost} || ')' || {rest}"

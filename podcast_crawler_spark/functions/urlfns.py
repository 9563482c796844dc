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

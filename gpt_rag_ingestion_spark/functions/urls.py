"""URL canonicalization — corpus-construction family.

Web-scale training corpora key almost everything by URL (crawl dedup,
per-domain caps, robots/blocklists), and raw URLs are noisy: casing in
scheme/host, default ports, tracking parameters, fragments.  Without a
canonical form, per-domain caps undercount and URL-level dedup misses
obvious repeats.

Everything here is pure column algebra (codegen, shuffle-free) built
from a regex subset valid in both Java regex (Spark) and RE2 (DuckDB)
— no lookaround, no backreferences — so the whole canonicalization is
oracle-checkable.  The reference tracks documents by URL too
(documentUrl / metadata_storage_path, blob_storage_indexer.py:587-595)
but never needs canonicalization because Azure blob URLs are already
canonical; the operators here are the beyond-reference web analog.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_HOST = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
TRACKING_PARAMS = "(utm_[a-z]+|fbclid|gclid|msclkid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default :80/:443 ports
    stripped, #fragment dropped, tracking parameters removed (with
    separator cleanup), path/query otherwise untouched (paths are
    case-sensitive per RFC 3986)."""
    head = F.lower(F.regexp_extract(url, f"({_SCHEME_HOST})", 1))
    head = F.regexp_replace(head, ":(443|80)$", "")
    rest = F.regexp_replace(url, _SCHEME_HOST, "")
    rest = F.regexp_replace(rest, "#.*$", "")
    rest = F.regexp_replace(rest, TRACKING_PARAMS, "")
    rest = F.regexp_replace(rest, "&{2,}", "&")
    rest = F.regexp_replace(rest, "\\?&", "?")
    rest = F.regexp_replace(rest, "[?&]+$", "")
    return F.concat(head, rest)


def url_host(url: Column) -> Column:
    """Lowercased host with port and leading ``www.`` stripped."""
    host = F.lower(F.regexp_extract(url, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, ":[0-9]+$", "")
    return F.regexp_replace(host, "^www\\.", "")


def url_domain(url: Column) -> Column:
    """Registered domain approximated as the last two labels (the
    public-suffix list is a broadcast-dim refinement, not a different
    plan shape)."""
    return F.regexp_extract(url_host(url), "([a-z0-9-]+\\.[a-z0-9-]+)$", 1)

"""URL canonicalization for web-crawl curation.

Crawl dedup starts with URL identity: the same page arrives as
``HTTP://Example.com:80/a/?utm_source=x#top`` and
``http://example.com/a``. Canonicalizing before the content pass
removes the bulk of trivial duplicates with a zero-shuffle
projection — every rule here is a Column regexp expression that runs
inside the scan stage.

Rules (the conservative, widely-agreed subset):
  - scheme and host lowercased (path/query case is SIGNIFICANT and
    kept)
  - default ports stripped (:80 for http, :443 for https)
  - fragment dropped
  - known tracking parameters dropped (utm_*, fbclid, gclid)
  - trailing slashes on the path-and-after part trimmed

``www.`` is deliberately KEPT — www and apex are distinct origins
often serving different content; folding them is a recall trick that
corrupts provenance.

Patterns avoid lookaround and replacement backreferences so the
DuckDB driver oracle (RE2) replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_script_spark.functions.exprs import let

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOSTPORT = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"
_REST = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(.*)$"
#: anchored per-parameter match — applied to each ``k=v`` piece after
#: splitting the query on '&', so a param NAMED xutm_source can never
#: partially match and no separator debris is ever produced
_TRACKING = r"^(utm_[A-Za-z0-9_]+|fbclid|gclid)="


def url_host(c: Column) -> Column:
    """Lowercased host (port stripped) — the group-by key for
    per-site statistics. Empty string when the value has no
    ``scheme://`` part."""
    hostport = F.lower(F.regexp_extract(c.cast("string"), _HOSTPORT, 1))
    return F.regexp_replace(hostport, r":\d+$", "")


def canonicalize_url(c: Column) -> Column:
    """Canonical form of an absolute URL (see module docstring).
    Values without a ``scheme://`` prefix pass through trimmed but
    otherwise untouched — relative references have no canonical
    origin to normalize against."""

    def build(u: Column) -> Column:
        scheme = F.lower(F.regexp_extract(u, _SCHEME, 1))
        hostport = F.lower(F.regexp_extract(u, _HOSTPORT, 1))
        host = F.when(
            (scheme == "http") & hostport.endswith(":80"),
            F.regexp_replace(hostport, r":80$", ""),
        ).when(
            (scheme == "https") & hostport.endswith(":443"),
            F.regexp_replace(hostport, r":443$", ""),
        ).otherwise(hostport)
        # fragment first, then split path from query so the tracking
        # filter works on whole k=v pieces (anchored match, no
        # separator surgery), then trailing slashes on the path only
        rest = F.regexp_replace(F.regexp_extract(u, _REST, 1), r"#.*$", "")
        path = F.regexp_replace(
            F.regexp_extract(rest, r"^([^?]*)", 1), r"/+$", ""
        )
        query = F.regexp_extract(rest, r"^[^?]*\?(.*)$", 1)
        params = F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING),
        )
        tail = F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(params, "&")),
        ).otherwise(F.lit(""))
        return F.when(scheme == "", u).otherwise(
            F.concat(scheme, F.lit("://"), host, path, tail)
        )

    return let(F.trim(c.cast("string")), build)

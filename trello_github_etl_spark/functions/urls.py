"""URL canonicalization for document-provenance dedup.

CommonCrawl-scale pipelines dedup by canonicalized URL BEFORE
touching text — fetch layers record the same page under
scheme/host case variants, default ports, tracking query params,
fragments, and trailing-slash spellings. This is the one dedup
granularity the dd family's text operators (dd1 exact text, dd3/dd5
near-text) don't cover: two crawls of one URL may differ textually
(ads, timestamps) yet are the same provenance.

``canonicalize_url`` is a pure Column expression — every step is a
JVM-side built-in (regexp/string/array HOFs), so it fuses into the
scan's codegen stage with zero shuffles and zero Python. The rules,
in order (the standard safe subset of RFC 3986 §6 normalization +
tracking-param removal as practiced by crawl dedup):

1. strip the fragment (``#...`` never reaches the server);
2. lowercase the scheme and the host (case-insensitive per RFC;
   userinfo, when present, is case-SENSITIVE and passes through
   verbatim — §6.2.2.1 normalizes only scheme and host);
3. strip a leading ``www.`` label (the provenance-dedup convention:
   origin sites overwhelmingly serve both; keep it if your corpus
   distinguishes them);
4. drop the default port (``:80`` for http, ``:443`` for https);
   non-default ports survive;
5. drop tracking query parameters (``utm_*``, ``gclid``, ``fbclid``,
   ``msclkid``, ``mc_eid``; the pattern is a parameter — bare
   ``ref`` is deliberately NOT in the default because it is
   semantic on GitHub and many real sites) and SORT the
   survivors —
   param order is almost never semantic, and sorting makes
   ``?a=1&b=2`` == ``?b=2&a=1``;
6. strip trailing slashes from the path; an empty path becomes
   ``/`` (so ``http://x.com`` == ``http://x.com/``).

Each rule is independently reproducible in ANSI SQL (the dd31
oracle replays all six in DuckDB), and the regexes stay inside the
Java-regex/RE2 common subset.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking params dropped by rule 5. Anchored key match — `utm_x=1`
# is dropped, `href=x` / `prefs=x` are kept. Bare `ref` is NOT in
# the default list (r10 advice): it is semantic on many real sites —
# notably GitHub's `?ref=<branch>`, squarely in this ETL's domain —
# so dropping it would merge genuinely distinct pages. Corpora where
# `ref` really is a referrer tag pass a custom pattern via the
# ``tracking_param_re`` parameter.
TRACKING_PARAM_RE = r"^(utm_[a-zA-Z]+|gclid|fbclid|msclkid|mc_eid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def _split_authority(url: Column) -> tuple[Column, Column, Column, Column]:
    """(no_frag, rest, authority_raw, authority) — fragment stripped,
    scheme removed, authority isolated, then userinfo dropped (keyed
    on the LAST '@'; host can't contain one) and lowercased. The ONE
    definition of the fragment/scheme/authority/userinfo steps shared
    by canonicalize_url and canonical_host (r11 ADVICE: duplicated
    trees guarded only by a golden test can desync t22's grouping
    host from the canon_url it counts distinct values of — e.g. an
    IDN or public-suffix addition landing in one and not the other).
    """
    no_frag = F.regexp_replace(url, "#.*$", "")
    rest = F.regexp_replace(no_frag, _SCHEME_RE, "")
    authority_raw = F.regexp_extract(rest, "^([^/?]*)", 1)
    authority = F.lower(F.regexp_replace(authority_raw, "^.*@", ""))
    return no_frag, rest, authority_raw, authority


def _authority_host(authority: Column) -> Column:
    """Canonical host of a lowercased authority: strip the port
    suffix, then a leading ``www.`` label — shared by both public
    functions (see _split_authority)."""
    return F.regexp_replace(
        F.regexp_replace(authority, ":[0-9]+$", ""), r"^www\.", ""
    )


def canonicalize_url(
    url: Column, tracking_param_re: str = TRACKING_PARAM_RE
) -> Column:
    """Canonical form of an absolute http(s) URL (see module doc).

    Pure built-in Column expression: safe in the hot path of a
    100 TB scan. Input must carry an explicit ``scheme://``;
    anything else passes through rules it can't parse unchanged
    (regexp_extract returns '' on no-match, and the reassembly
    degrades to lowercased-trimmed parts). ``tracking_param_re``
    overrides the dropped-param pattern for corpora whose tracking
    vocabulary differs (must stay anchored with ``^(...)=``).
    """
    no_frag, rest, authority_raw, authority = _split_authority(url)
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    path_query = F.regexp_replace(rest, "^[^/?]*", "")

    # userinfo is CASE-SENSITIVE per RFC 3986 §6.2.2.1 (only scheme
    # and host case-normalize) — _split_authority drops it from the
    # lowercased authority; re-extract it verbatim here, captured
    # through the '@' so an explicit-empty userinfo ('http://@x.com')
    # survives distinct from no-userinfo (post-r10 review:
    # lowercasing the whole authority falsely merged distinct-user
    # URLs and www-stripped usernames).
    userinfo = F.regexp_extract(authority_raw, "^(.*@)", 1)

    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    host = _authority_host(authority)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    canon_port = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))

    raw_path = F.regexp_extract(path_query, "^([^?]*)", 1)
    trimmed = F.regexp_replace(raw_path, "/+$", "")
    canon_path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)

    # query: '?' + body, or '' — split body on '&', drop empties and
    # tracking params, sort survivors (rule 5)
    raw_query = F.regexp_replace(path_query, "^[^?]*", "")
    body = F.when(raw_query == "", F.lit("")).otherwise(
        raw_query.substr(F.lit(2), F.length(raw_query))
    )
    params = F.array_sort(
        F.filter(
            F.split(body, "&"),
            lambda p: (p != "") & ~p.rlike(tracking_param_re),
        )
    )
    canon_query = F.when(F.size(params) == 0, F.lit("")).otherwise(
        F.concat(F.lit("?"), F.array_join(params, "&"))
    )

    return F.concat(
        scheme,
        F.lit("://"),
        userinfo,
        host,
        canon_port,
        canon_path,
        canon_query,
    )


def canonical_host(url: Column) -> Column:
    """The canonical HOST of an absolute http(s) URL — the same
    steps canonicalize_url applies to the authority (drop fragment,
    split authority, strip case-sensitive userinfo, lowercase, strip
    port, strip leading ``www.``), exposed on its own for
    domain-level rollups (RefinedWeb-style per-domain filtering
    groups by this). The synthetic hosts here are registrable
    domains already; a corpus with deep subdomains would compose a
    public-suffix lookup on top. Composed from the SAME
    _split_authority/_authority_host trees canonicalize_url uses, so
    the two cannot desync (r11 ADVICE)."""
    _no_frag, _rest, _raw, authority = _split_authority(url)
    return _authority_host(authority)

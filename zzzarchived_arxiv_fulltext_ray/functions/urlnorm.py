"""URL canonicalization kernel (crawl-dedup preprocessing).

Exact-duplicate detection over crawled pages keys on the URL, and raw
crawl URLs arrive denormalized: cased hosts, explicit default ports,
fragments, ``.``/``..`` path segments, tracking parameters. This
kernel maps every spelling of the same resource to one canonical
string, so the latest-crawl-wins dedup (``stages.dedup``) groups them
correctly:

* scheme and host lowercased, trailing host dot stripped
* default ports removed (http:80, https:443)
* fragment dropped
* path dot-segments resolved (RFC 3986 section 5.2.4)
* tracking query parameters removed (``utm_*``, ``fbclid``,
  ``gclid``); remaining parameters keep their original order —
  reordering can change semantics for some endpoints, so we don't
* empty query/path normalized ('' path -> '/')

Pure single-string function: vectorization happens at the map_batches
layer; the per-URL work is a few split/join passes.
"""

from typing import List

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = {"fbclid", "gclid"}


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 5.2.4 over a '/'-separated path."""
    out: List[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    # a trailing '.' or '..' segment leaves the directory slash
    if path.endswith(("/.", "/..")):
        out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res
    return res


def _clean_query(query: str) -> str:
    kept = []
    for param in query.split("&"):
        if not param:
            continue
        key = param.split("=", 1)[0].lower()
        if key in _TRACKING_EXACT or key.startswith(_TRACKING_PREFIXES):
            continue
        kept.append(param)
    return "&".join(kept)


def canonicalize_url(url: str) -> str:
    """Canonical form of an absolute http(s) URL; non-http(s) or
    unparseable inputs are returned unchanged (errors-as-data: the
    caller's dedup simply keys on the raw string)."""
    scheme, sep, rest = url.partition("://")
    if not sep:
        return url
    scheme = scheme.lower()
    if scheme not in ("http", "https"):
        return url

    rest, _, _fragment = rest.partition("#")
    netloc, slash, pathq = rest.partition("/")
    pathq = slash + pathq  # '' or '/...'

    host, colon, port = netloc.partition(":")
    host = host.lower().rstrip(".")
    if colon and port == _DEFAULT_PORTS[scheme]:
        netloc = host
    elif colon:
        netloc = host + ":" + port
    else:
        netloc = host

    path, qmark, query = pathq.partition("?")
    path = _remove_dot_segments(path or "/")
    query = _clean_query(query) if qmark else ""

    out = scheme + "://" + netloc + path
    if query:
        out += "?" + query
    return out

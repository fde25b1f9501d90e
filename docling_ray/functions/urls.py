"""URL parsing primitives for the web-graph operators.

The reference resolves hyperlinks per document (html_backend.py:1840
_resolve_hyperlink) but has no graph layer; these helpers are the
from-scratch foundation for the host-level link-graph pipelines
(stages/webgraph.py): canonical-URL host assignment, outlink host
extraction, and URL normalization.

Every rule here is deliberately regexp-expressible so the DuckDB
oracles can mirror it exactly:

    host(url)  =  lower(regexp_extract(url,
                  '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1))

i.e. scheme '://', optional userinfo up to '@', then the host runs to
the first of ':' (port), '/', '?' or '#'. Relative references and
schemes without an authority yield ''.
"""
from __future__ import annotations

import re

# one compiled pattern, shared by the batch kernels (compile once, not
# per call — the kernels run inside hot map_batches stages)
_HOST_RE = re.compile(
    r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)")

_HTTP_RE = re.compile(r"^https?://", re.IGNORECASE)


def url_host(url: str) -> str:
    """Lower-cased host of an absolute URL, '' when there is none.

    Mirrors the oracle regexp above byte for byte: userinfo is skipped,
    the port / path / query / fragment are cut, and the host is folded
    to lower case. IDNs are NOT punycoded (neither side does)."""
    m = _HOST_RE.match(url or "")
    return m.group(1).lower() if m else ""


def is_absolute_http(url: str) -> bool:
    """True for http:// and https:// URLs (any case), the only schemes
    the link graph admits as edges."""
    return bool(_HTTP_RE.match(url or ""))


def normalize_url(url: str) -> str:
    """Light canonical form for exact-URL dedup: lower-case the scheme
    and host, drop the fragment, drop a default port (:80 http /
    :443 https), and strip one trailing slash from a bare-host URL.
    The path/query are preserved verbatim (case-significant on real
    servers)."""
    m = re.match(
        r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://([^/?#@]*@)?([^/?#:]+)(:\d+)?"
        r"([^#]*)(#.*)?$", url or "")
    if not m:
        return url or ""
    scheme = m.group(1).lower()
    user = m.group(2) or ""
    host = m.group(3).lower()
    port = m.group(4) or ""
    rest = m.group(5) or ""
    if (scheme == "http" and port == ":80") or \
            (scheme == "https" and port == ":443"):
        port = ""
    if rest == "/":
        rest = ""
    return f"{scheme}://{user}{host}{port}{rest}"

"""URL canonicalization — the parity-critical identity function for the
URL-seen set (SURVEY.md §2.2 P3/P4).

The reference normalizes URLs before seen-set membership (lowercase host,
strip fragment, resolve relative references). The reference snapshot was
empty at build time (SURVEY.md §0), so this module *defines* the engine's
canonical form; it is quarantined here so it can be swapped to byte-match
the reference once a snapshot is available. Requirements enforced by tests:

- idempotent: canonicalize(canonicalize(u)) == canonicalize(u)  (hypothesis)
- pure / deterministic (runs inside Arrow-batched UDFs on executors)
- stdlib-only (must ship via spark-submit --py-files with no extra deps)
"""

from __future__ import annotations

from urllib.parse import quote, unquote, urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21}

# Characters left unescaped when re-quoting a path. RFC 3986 pchar plus "/".
_PATH_SAFE = "/-._~!$&'()*+,;=:@"
_QUERY_SAFE = "-._~!$&'()*+,;=:@/?="


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out = [""]
            continue
        out.append(seg)
    # Preserve leading slash; collapse '//' is NOT done (semantically distinct).
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def canonicalize(url: str) -> str:
    """Canonical form of an absolute URL.

    lowercase scheme+host, drop fragment, drop default port, resolve dot
    segments, normalize percent-encoding, empty path -> "/".
    Returns "" for unusable inputs (no scheme+host) — callers filter those.
    """
    if not url:
        return ""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return ""
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https", "ftp"):
        return ""
    try:
        host = parts.hostname
        port = parts.port
    except ValueError:
        return ""
    if not host:
        return ""
    host = host.lower().rstrip(".")
    netloc = host if port in (None, _DEFAULT_PORTS.get(scheme)) else f"{host}:{port}"
    path = _remove_dot_segments(parts.path) or "/"
    path = quote(unquote(path), safe=_PATH_SAFE)
    query = quote(unquote(parts.query), safe=_QUERY_SAFE) if parts.query else ""
    return urlunsplit((scheme, netloc, path, query, ""))


def resolve_link(base_url: str, href: str) -> str:
    """Resolve an extracted href against its page URL and canonicalize.

    Returns "" for non-crawlable references (fragments-only, mailto:,
    javascript:, data:, empty) — mirroring the reference spider's skip
    of non-HTTP links.
    """
    if not href:
        return ""
    href = href.strip()
    if href.startswith("#"):
        return ""
    low = href.split(":", 1)[0].lower()
    if ":" in href and low in ("mailto", "javascript", "data", "tel", "ftp"):
        return ""
    try:
        absolute = urljoin(base_url, href)
    except ValueError:
        return ""
    return canonicalize(absolute)


def netloc_of(url: str) -> str:
    """Lowercased hostname of a URL ('' if unparsable).

    Port is deliberately dropped: politeness groups by physical host, and
    this must agree exactly with Spark's `parse_url(url, 'HOST')`, which the
    engine uses JVM-side for the same purpose.
    """
    try:
        host = urlsplit(url).hostname
    except ValueError:
        return ""
    return host.lower() if host else ""

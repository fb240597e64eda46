"""HTML parsing: text extraction, link extraction, comments, metadata.

This is the C6 operator of SURVEY.md §2.7 — the single vectorized parse pass
each crawl wave runs over fetched pages. `extract_text` is the
parity-critical function (per-row invariant: byte-identical extracted text
per url, BASELINE.json input_hint); the reference snapshot was empty at
build time (SURVEY.md §0) so the engine *defines* the extraction contract
below, quarantined in one function for later swap:

    extract_text contract: all character data outside <script>/<style>/
    <template>/<noscript>, entity-decoded, whitespace-normalized to single
    spaces, stripped. Deterministic, stdlib-only.

Everything runs batch-vectorized through mapInPandas (Arrow batches) — no
per-row Python UDFs anywhere (BASELINE.json input_hint).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterable, Iterator

import pandas as pd

from sitecheck_spark.functions.urls import resolve_link

_SKIP_CONTENT = frozenset(("script", "style", "template", "noscript"))
# Tags whose URL-bearing attributes the spider follows / validates.
_LINK_ATTRS = {
    "a": ("href",),
    "area": ("href",),
    "link": ("href",),
    "img": ("src",),
    "script": ("src",),
    "iframe": ("src",),
    "frame": ("src",),
    "embed": ("src",),
    "source": ("src",),
    "form": ("action",),
}
_WS = re.compile(r"\s+")


class _PageParser(HTMLParser):
    """One-pass extractor: text, links, comments, title, meta description."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.text_chunks: list[str] = []
        self.links: list[str] = []
        self.comments: list[str] = []
        self.title_parts: list[str] = []
        self.meta_description: str | None = None
        self.refresh: str | None = None
        # (action, serialized-fields) per method=post form; the reference's
        # Request carries a verb + post data (SURVEY.md §1.1), so POST forms
        # become POST requests rather than plain links (CRAWL CONTRACT v3)
        self.post_forms: list[tuple[str, str]] = []
        self._form: list | None = None  # open post form: [action, fields]
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in _SKIP_CONTENT:
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True
        if tag == "form":
            # HTML forbids nested forms; browsers implicitly terminate the
            # open form at the next <form>. Emit the open post form rather
            # than silently discarding its request.
            self._close_form()
            d = dict(attrs)
            if (d.get("method") or "get").strip().lower() == "post":
                # POST form: its action is a request with verb+body, NOT a
                # plain link — skip the generic link-attr handling below
                self._form = [d.get("action") or "", []]
                return
        elif self._form is not None and tag in ("input", "select", "textarea",
                                                "button"):
            d = dict(attrs)
            if d.get("name") is not None:
                # named controls in document order, value attr or ''
                self._form[1].append(f"{d['name']}={d.get('value') or ''}")
        for attr_name in _LINK_ATTRS.get(tag, ()):
            for name, value in attrs:
                if name == attr_name and value:
                    self.links.append(value)
        if tag == "meta":
            d = dict(attrs)
            if (d.get("name") or "").lower() == "description":
                self.meta_description = d.get("content") or ""
            # <meta http-equiv="refresh" content="N;url=TARGET"> — the
            # HTML-level redirect a WARC-style corpus can express (the
            # reference follows HTTP 3xx with a redirect-count cap; the
            # engine gives meta-refresh the same chain semantics). First
            # refresh in the document wins, like browsers.
            if (d.get("http-equiv") or "").lower() == "refresh" and self.refresh is None:
                for part in (d.get("content") or "").split(";"):
                    p = part.strip()
                    if p.lower().startswith("url="):
                        self.refresh = p[4:].strip().strip("'\"")
                        break

    def _close_form(self) -> None:
        if self._form is not None:
            action, fields = self._form
            self.post_forms.append((action, "&".join(fields)))
            self._form = None

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag == "form":
            self._close_form()

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self.handle_starttag(tag, attrs)
        if tag in _SKIP_CONTENT and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "form":
            # a self-closing <form .../> opens AND closes in one token —
            # without this, an open post form would absorb later named
            # inputs and emit a phantom request at the next </form>
            self._close_form()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self.text_chunks.append(data)
        if self._in_title and data:
            self.title_parts.append(data)

    def handle_comment(self, data: str) -> None:
        self.comments.append(data)


def _decode(html: bytes | str | None) -> str:
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        return bytes(html).decode("utf-8", errors="replace")
    return html


def parse_page(html: bytes | str | None) -> dict:
    """Full single-pass parse. Returns raw (unresolved) links."""
    parser = _PageParser()
    try:
        parser.feed(_decode(html))
        parser.close()
    except Exception:
        pass  # malformed HTML: keep whatever was extracted before the error
    text = _WS.sub(" ", " ".join(parser.text_chunks)).strip()
    title = _WS.sub(" ", " ".join(parser.title_parts)).strip()
    return {
        "text": text,
        "links": parser.links,
        "comments": parser.comments,
        "title": title,
        "meta_description": parser.meta_description,
        "refresh": parser.refresh,
        "post_forms": parser.post_forms,
    }


def extract_text(html: bytes | str | None) -> str:
    """PARITY-CRITICAL (BASELINE.json:15). See module docstring for contract."""
    return parse_page(html)["text"]


def extract_links(url: str, html: bytes | str | None) -> list[str]:
    """Canonical absolute outlinks of a page, document order, duplicates kept."""
    out = []
    for href in parse_page(html)["links"]:
        resolved = resolve_link(url, href)
        if resolved:
            out.append(resolved)
    return out


# ---------------------------------------------------------------------------
# Vectorized Spark entry point (mapInPandas) — SURVEY.md §2.10 entry point 1.
# ---------------------------------------------------------------------------

PARSED_COLUMNS = [
    "url",
    "netloc",
    "wave",
    "depth",
    "priority",
    "referrer",
    "redirects",
    "verb",
    "post_data",
    "outlinks",
    "extracted_text",
    "title",
    "meta_description",
    "comments",
    "redirect",
    "post_forms",
    "n_links",
    "content_len",
    "status",
]

PARSED_SCHEMA = (
    "url string, netloc string, wave int, depth int, priority double, "
    "referrer string, redirects int, verb string, post_data string, "
    "outlinks array<string>, "
    "extracted_text string, title string, meta_description string, "
    "comments array<string>, redirect string, "
    "post_forms array<struct<url:string,data:string>>, "
    "n_links int, content_len long, status int"
)


def parse_pages_batch(
    batches: Iterable[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas function: (url, netloc, wave, depth, priority, referrer,
    redirects, html) -> PARSED_SCHEMA. `redirect` is the resolved canonical
    meta-refresh target (null if none); `redirects` passes through the
    page's own redirect-hop count for chain accounting.

    A null `html` means the fetch join found no page: the row passes through
    as status=404 with empty parse fields (no Python parse). Folding the
    404 split into this pass lets the crawl persist ONE slim parsed table
    per wave instead of caching the html-carrying join output — the cached
    html batches were re-read by every downstream `html IS NULL` filter
    (~15 GB/run of pure cache traffic in the round-4 scaling stage tables).

    One Arrow batch in, one out; all Python work is per-batch, not per-task-row
    round trips. This is the only place `html:binary` is ever materialized
    (column-pruning lever, SURVEY.md §4).
    """
    for pdf in batches:
        rows = []
        for url, netloc, wave, depth, priority, referrer, redirects, verb, \
                post_data, html in zip(
            pdf["url"], pdf["netloc"], pdf["wave"], pdf["depth"],
            pdf["priority"], pdf["referrer"], pdf["redirects"],
            pdf["verb"], pdf["post_data"], pdf["html"]
        ):
            if html is None:  # fetch miss -> 404 passthrough, nothing to parse
                rows.append(
                    (url, netloc, wave, depth, priority, referrer, redirects,
                     verb, post_data, [], "", "", None, [], None, [], 0, 0, 404)
                )
                continue
            parsed = parse_page(html)
            outlinks = []
            for href in parsed["links"]:
                resolved = resolve_link(url, href)
                if resolved:
                    outlinks.append(resolved)
            redirect = (
                resolve_link(url, parsed["refresh"]) or None
                if parsed["refresh"] else None
            )
            # POST form requests: empty action posts back to the page
            # itself (golden.py applies the identical rule)
            post_forms = []
            for action, data in parsed["post_forms"]:
                t = resolve_link(url, action) if action else url
                if t:
                    post_forms.append({"url": t, "data": data})
            rows.append(
                (
                    url,
                    netloc,
                    wave,
                    depth,
                    priority,
                    referrer,
                    redirects,
                    verb,
                    post_data,
                    outlinks,
                    parsed["text"],
                    parsed["title"],
                    parsed["meta_description"],
                    parsed["comments"],
                    redirect,
                    post_forms,
                    len(outlinks),
                    len(html),
                    200,
                )
            )
        yield pd.DataFrame(rows, columns=PARSED_COLUMNS)

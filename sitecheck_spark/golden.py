"""Golden single-threaded reference crawler — the semantics oracle.

The reference (`arkershaw/sitecheck`) is a single-process BFS spider with a
url-seen set, per-host politeness and checker modules (SURVEY.md §1.1/§3.1).
Its snapshot was empty at build time (SURVEY.md §0), so this module encodes
the engine's CRAWL CONTRACT as a tiny sequential implementation; the Spark
engine (crawl.py) must produce the identical crawl ordering, final URL-seen
set, fetch log and findings — asserted by tests/test_crawl_golden.py. When a
real reference snapshot lands, this file is what gets re-derived from it.

CRAWL CONTRACT v3 (v2 + request verb/post data, SURVEY.md §1.1: the
reference Request carries a verb and post data; request identity is the
hashed triple)
----------------------------------------
state: frontier rows (url, netloc, depth, priority, referrer, redirects,
verb, post_data); seen = set of request identities (verb, canonical url,
post_data) ever enqueued OR robots-blocked. GET requests have post_data ''.

wave 0: canonical seeds as GET requests, depth 0, priority 0.0,
referrer '', redirects 0. Robots-blocked seeds are logged and dropped
(and marked seen).

each wave k while frontier non-empty and k < max_waves:
 1. budget per netloc: B, or max(1, floor(B / crawl_delay)) if robots set
    one. Budget counts REQUESTS (a GET and a POST to the same url are two).
 2. elect per netloc the first `budget` rows ordered by
    (priority, url, verb, post_data); the remainder carries to wave k+1
    unchanged. crawl order within a wave is that same key; across waves it
    is wave-major.
 3. "fetch" each elected request against the LATEST corpus version of its
    url (max of (warc_ts, md5(html)) — a total order), REGARDLESS of verb —
    the corpus stands in for the live site, which answers any verb at a
    url: present -> status 200, parse; absent -> status 404 + broken_link
    finding. A GET and POST of the same url each fetch (and parse) it once,
    exactly as the reference issues two network requests.
 4. checker modules run per fetched request (checkers.py pure functions).
 5. candidates = outlinks of fetched pages as GET requests (depth+1 <=
    max_depth, fresh redirects=0) PLUS each method=post form as a POST
    request (resolved action url, post_data = named inputs serialized
    'name=value&...' in document order; depth+1 <= max_depth, redirects 0)
    PLUS the page's meta-refresh target if any (GET, same depth,
    redirects+1; if redirects+1 > max_redirects the target is a `redirect`
    finding 'max_redirects_exceeded <target>' instead of a candidate).
    All candidate urls canonicalized and filtered: ignored extensions out;
    netloc must be in allowed_netlocs (seed netlocs by default).
 6. dedupe candidates by identity (verb, url, post_data) keeping min
    (depth, referrer, redirects); candidate priority = float(min depth).
 7. drop candidates whose identity is already in seen; robots-gate the
    rest by url: blocked -> robots_blocked finding + marked seen;
    allowed -> marked seen, join frontier for wave k+1.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from sitecheck_spark import robots as robots_mod
from sitecheck_spark.checkers import (
    find_emails,
    find_sensitive_comments,
    meta_issues,
    misspelling_details,
)
from sitecheck_spark.extract import parse_page
from sitecheck_spark.functions.urls import canonicalize, netloc_of, resolve_link

IGNORED_EXTENSIONS = (
    ".png", ".jpg", ".jpeg", ".gif", ".css", ".js", ".ico", ".pdf", ".zip", ".svg",
)


@dataclass
class GoldenResult:
    fetch_log: list[dict] = field(default_factory=list)   # crawl order = list order
    findings: list[dict] = field(default_factory=list)
    seen: set[tuple] = field(default_factory=set)  # (verb, url, post_data)
    waves: int = 0

    @property
    def seen_urls(self) -> set[str]:
        return {url for (_verb, url, _data) in self.seen}


def _ext_ignored(url: str) -> bool:
    path = url.split("?", 1)[0]
    return path.lower().endswith(IGNORED_EXTENSIONS)


def golden_crawl(
    pages_rows: list[tuple],
    seeds: list[str],
    robots_by_netloc: dict[str, str],
    dictionary: set[str],
    budget_per_host: int = 10,
    max_waves: int = 50,
    max_depth: int = 10,
    max_redirects: int = 5,
    allowed_netlocs: set[str] | None = None,
) -> GoldenResult:
    """pages_rows: (url, warc_ts, html, text, lang) tuples (any order)."""
    import hashlib

    # Total as-of order: max (warc_ts, md5(html)) per url — input-order
    # independent, identical rule to crawl.latest_pages().
    latest: dict[str, bytes] = {}
    latest_key: dict[str, tuple] = {}
    for url, warc_ts, html, _text, _lang in pages_rows:
        key = (warc_ts, hashlib.md5(html).hexdigest())
        if url not in latest_key or key > latest_key[url]:
            latest_key[url] = key
            latest[url] = html

    res = GoldenResult()
    if allowed_netlocs is None:
        allowed_netlocs = {netloc_of(canonicalize(s)) for s in seeds}

    delays = {nl: robots_mod.crawl_delay(r) for nl, r in robots_by_netloc.items()}

    frontier: list[dict] = []
    for s in sorted({canonicalize(s) for s in seeds}):
        if not s:
            continue
        nl = netloc_of(s)
        res.seen.add(("GET", s, ""))
        if not robots_mod.allowed(robots_by_netloc.get(nl), s):
            res.findings.append({"module": "robots", "url": s, "wave": 0,
                                 "detail": "robots_blocked", "referrer": ""})
            continue
        frontier.append({"url": s, "netloc": nl, "depth": 0, "priority": 0.0,
                         "referrer": "", "redirects": 0,
                         "verb": "GET", "post_data": ""})

    wave = 0
    while frontier and wave < max_waves:
        budgets: dict[str, int] = {}
        elected, remainder = [], []
        for row in sorted(frontier, key=lambda r: (
                r["priority"], r["url"], r["verb"], r["post_data"])):
            nl = row["netloc"]
            if nl not in budgets:
                d = delays.get(nl)
                budgets[nl] = max(1, math.floor(budget_per_host / d)) if d else budget_per_host
            if budgets[nl] > 0:
                budgets[nl] -= 1
                elected.append(row)
            else:
                remainder.append(row)

        candidates: dict[tuple, dict] = {}
        for row in elected:
            url = row["url"]
            html = latest.get(url)
            if html is None:
                res.fetch_log.append({**row, "wave": wave, "status": 404,
                                      "content_len": 0, "n_links": 0})
                res.findings.append({"module": "broken_link", "url": url,
                                     "wave": wave, "detail": "404",
                                     "referrer": row["referrer"]})
                continue
            parsed = parse_page(html)
            outlinks = []
            for href in parsed["links"]:
                r = resolve_link(url, href)
                if r:
                    outlinks.append(r)
            res.fetch_log.append({**row, "wave": wave, "status": 200,
                                  "content_len": len(html), "n_links": len(outlinks)})

            for d in misspelling_details(parsed["text"], dictionary):
                res.findings.append({"module": "spelling", "url": url,
                                     "wave": wave, "detail": d, "referrer": ""})
            for m in find_emails(parsed["text"]):
                res.findings.append({"module": "regex", "url": url,
                                     "wave": wave, "detail": m, "referrer": ""})
            for c in find_sensitive_comments(parsed["comments"]):
                res.findings.append({"module": "comments", "url": url,
                                     "wave": wave, "detail": c, "referrer": ""})
            for issue in meta_issues(parsed["title"], parsed["meta_description"]):
                res.findings.append({"module": "metadata", "url": url,
                                     "wave": wave, "detail": issue, "referrer": ""})

            def _offer(target: str, depth: int, redirects: int,
                       verb: str = "GET", post_data: str = "") -> None:
                if _ext_ignored(target) or netloc_of(target) not in allowed_netlocs:
                    return
                key = (verb, target, post_data)
                prev = candidates.get(key)
                if prev is None or (depth, url, redirects) < (
                    prev["depth"], prev["referrer"], prev["redirects"]
                ):
                    candidates[key] = {
                        "url": target, "netloc": netloc_of(target),
                        "depth": depth, "priority": float(depth),
                        "referrer": url, "redirects": redirects,
                        "verb": verb, "post_data": post_data,
                    }

            r = resolve_link(url, parsed["refresh"]) if parsed["refresh"] else ""
            if r:
                if row["redirects"] + 1 > max_redirects:
                    res.findings.append({
                        "module": "redirect", "url": url, "wave": wave,
                        "detail": f"max_redirects_exceeded {r}",
                        "referrer": row["referrer"],
                    })
                else:
                    _offer(r, row["depth"], row["redirects"] + 1)

            depth = row["depth"] + 1
            if depth > max_depth:
                continue
            for out in outlinks:
                _offer(out, depth, 0)
            for action, data in parsed["post_forms"]:
                t = resolve_link(url, action) if action else url
                if t:
                    _offer(t, depth, 0, verb="POST", post_data=data)

        new_rows = []
        for key in sorted(candidates):
            if key in res.seen:
                continue
            cand = candidates[key]
            res.seen.add(key)
            if not robots_mod.allowed(
                robots_by_netloc.get(cand["netloc"]), cand["url"]
            ):
                res.findings.append({"module": "robots", "url": cand["url"],
                                     "wave": wave, "detail": "robots_blocked",
                                     "referrer": cand["referrer"]})
                continue
            new_rows.append(cand)

        frontier = remainder + new_rows
        wave += 1

    res.waves = wave
    return res

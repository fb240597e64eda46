"""robots.txt gating (SURVEY.md §2.8 R1) — stdlib urllib.robotparser.

Verdicts are evaluated in a vectorized mapInPandas pass over
(url, netloc, rules) with a per-batch parser cache; upstream the frontier is
repartitioned by netloc so batches are netloc-clustered and each parser is
built once per netloc per batch. At web scale the robots table is joined on
netloc (Catalyst broadcasts it when small, SMJ co-partitioned with the
politeness window's netloc shuffle otherwise).
"""

from __future__ import annotations

import io
import urllib.parse
from typing import Iterable, Iterator
from urllib.robotparser import RobotFileParser

import pandas as pd

USER_AGENT = "sitecheck-spark"


def match_path(url: str) -> str:
    """The exact string RobotFileParser.can_fetch matches rule prefixes
    against: quote(urlunparse(('','',path,params,query,fragment))) of the
    UNQUOTED url, '/' when empty. Compiled rule prefixes (RuleLine.path) are
    already quoted by robotparser itself, so prefix-matching this string in
    the JVM gate reproduces robotparser verdicts byte-for-byte — including
    rules whose prefix extends into the query ('Disallow: /p?x') and chars
    that quote(safe='/') encodes differently than our canonical form."""
    try:
        parsed = urllib.parse.urlparse(urllib.parse.unquote(url))
        path = urllib.parse.urlunparse(
            ("", "", parsed.path, parsed.params, parsed.query, parsed.fragment)
        )
        return urllib.parse.quote(path) or "/"
    except Exception:
        return "/"


def _build_parser(rules: str) -> RobotFileParser:
    rp = RobotFileParser()
    rp.parse(io.StringIO(rules).read().splitlines())
    return rp


def allowed(rules: str | None, url: str) -> bool:
    """True iff `url` may be fetched. Missing robots.txt -> allow (web norm)."""
    if not rules:
        return True
    try:
        return _build_parser(rules).can_fetch(USER_AGENT, url)
    except Exception:
        return True


def crawl_delay(rules: str | None) -> float | None:
    if not rules:
        return None
    try:
        rp = _build_parser(rules)
        d = rp.crawl_delay(USER_AGENT)
        return float(d) if d is not None else None
    except Exception:
        return None


ROBOTS_VERDICT_SCHEMA = "url string, robots_allowed boolean"


def eval_robots_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: (url, netloc, rules) -> (url, robots_allowed).

    Parser cache keyed by netloc — effective because the input is
    repartitioned by netloc before this pass.
    """
    cache: dict[str, RobotFileParser | None] = {}
    for pdf in batches:
        verdicts = []
        for url, netloc, rules in zip(pdf["url"], pdf["netloc"], pdf["rules"]):
            if rules is None or (isinstance(rules, float) and pd.isna(rules)):
                verdicts.append(True)
                continue
            rp = cache.get(netloc)
            if rp is None:
                try:
                    rp = _build_parser(rules)
                except Exception:
                    rp = None
                cache[netloc] = rp
            try:
                verdicts.append(rp.can_fetch(USER_AGENT, url) if rp else True)
            except Exception:
                verdicts.append(True)
        yield pd.DataFrame({"url": pdf["url"], "robots_allowed": verdicts})

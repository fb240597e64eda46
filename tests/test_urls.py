"""Unit + property tests for URL canonicalization (SURVEY.md §5.1/5.2)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sitecheck_spark.functions.urls import canonicalize, netloc_of, resolve_link


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("HTTPS://Big.Example.COM:443/p/1.html#frag", "https://big.example.com/p/1.html"),
        ("http://Host:80/", "http://host/"),
        ("http://host:8080/a", "http://host:8080/a"),
        ("http://host", "http://host/"),
        ("http://host/a/b/../c.html", "http://host/a/c.html"),
        ("http://host/a/./b.html", "http://host/a/b.html"),
        ("http://host/%7Euser/x", "http://host/~user/x"),
        ("http://host/a%20b", "http://host/a%20b"),
        ("http://host/a?q=1&r=2#frag", "http://host/a?q=1&r=2"),
        ("mailto:x@y.com", ""),
        ("javascript:void(0)", ""),
        ("", ""),
        ("not a url", ""),
    ],
)
def test_canonicalize_cases(raw, expected):
    assert canonicalize(raw) == expected


def test_resolve_link():
    base = "https://big.example.com/p/3.html"
    assert resolve_link(base, "4.html") == "https://big.example.com/p/4.html"
    assert resolve_link(base, "../q/5.html") == "https://big.example.com/q/5.html"
    assert resolve_link(base, "/abs.html#x") == "https://big.example.com/abs.html"
    assert resolve_link(base, "#frag") == ""
    assert resolve_link(base, "mailto:a@b.c") == ""
    assert resolve_link(base, "https://other.org/z") == "https://other.org/z"


def test_netloc_of():
    assert netloc_of("https://Big.Example.com:8080/x") == "big.example.com"
    assert netloc_of("nonsense") == ""


_url_st = st.builds(
    lambda scheme, host, path, query, frag: f"{scheme}://{host}{path}{query}{frag}",
    st.sampled_from(["http", "https", "HTTP", "Https"]),
    st.from_regex(r"[a-zA-Z][a-zA-Z0-9.-]{0,20}\.[a-z]{2,5}", fullmatch=True),
    st.from_regex(r"(/[a-zA-Z0-9._~%\-]{0,8}){0,4}", fullmatch=True),
    st.sampled_from(["", "?a=1", "?q=x%20y", "?b=2&c=3"]),
    st.sampled_from(["", "#f", "#sec-2"]),
)


@settings(max_examples=300, deadline=None)
@given(_url_st)
def test_canonicalize_idempotent(url):
    c1 = canonicalize(url)
    assert canonicalize(c1) == c1


@settings(max_examples=200, deadline=None)
@given(_url_st)
def test_canonicalize_no_fragment_and_lowercase_host(url):
    c = canonicalize(url)
    if c:
        assert "#" not in c
        assert netloc_of(c) == netloc_of(c).lower()

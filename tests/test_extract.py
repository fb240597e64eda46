"""HTML parse pass tests (C6) — text, links, comments, title, meta."""

from sitecheck_spark.extract import extract_links, extract_text, parse_page


def test_text_skips_script_style_and_normalizes_whitespace():
    html = """<html><body><p>Hello   \n  world</p>
    <script>var x = 'nope';</script><style>.a{}</style>
    <noscript>hidden</noscript><p>again</p></body></html>"""
    assert extract_text(html) == "Hello world again"


def test_text_decodes_entities_and_bytes():
    html = b"<p>caf&eacute; &amp; tea &mdash; now</p>"
    assert extract_text(html) == "café & tea — now"


def test_text_none_and_malformed():
    assert extract_text(None) == ""
    assert extract_text("<p><b>unclosed") == "unclosed"


def test_parse_page_fields():
    html = """<html><head><title>My  Title</title>
    <meta name="description" content="the description"></head>
    <body><!-- note 1 --><a href="/a.html">a</a><a href="b.html">b</a>
    <img src="/i.png"><script src="/app.js"></script>
    <a href="mailto:x@y.z">m</a><!-- password: hunter2 --></body></html>"""
    p = parse_page(html)
    assert p["title"] == "My Title"
    assert p["meta_description"] == "the description"
    assert p["links"] == ["/a.html", "b.html", "/i.png", "/app.js", "mailto:x@y.z"]
    assert p["comments"] == [" note 1 ", " password: hunter2 "]


def test_extract_links_resolution_and_filtering():
    base = "https://h.example.com/d/page.html"
    html = '<a href="x.html"></a><a href="#s"></a><a href="mailto:a@b.c"></a><a href="../up.html"></a>'
    assert extract_links(base, html) == [
        "https://h.example.com/d/x.html",
        "https://h.example.com/up.html",
    ]


def test_determinism():
    html = "<p>abc</p>" * 100
    assert extract_text(html) == extract_text(html)


def test_post_form_captured_and_excluded_from_links():
    """CONTRACT v3: a method=post form becomes a (action, serialized-fields)
    POST request — named inputs in document order, value attr or '' — and
    its action does NOT also surface as a plain link; get/unspecified forms
    keep today's link behavior."""
    html = (
        '<form method="POST" action="/submit.html">'
        '<input type="hidden" name="token" value="abc">'
        '<input name="q">'
        '<input type="submit" value="go"></form>'
        '<form action="/search.html"><input name="s" value="1"></form>'
        '<a href="/x.html">x</a>'
    )
    p = parse_page(html)
    assert p["post_forms"] == [("/submit.html", "token=abc&q=")]
    assert p["links"] == ["/search.html", "/x.html"]


def test_post_form_empty_action_and_no_fields():
    p = parse_page('<form method="post"><input type="submit"></form>')
    assert p["post_forms"] == [("", "")]
    p2 = parse_page('<form method="post" action="/a"></form><form method="post" action="/b"><input name="k" value="v"></form>')
    assert p2["post_forms"] == [("/a", ""), ("/b", "k=v")]


def test_self_closing_post_form_does_not_absorb_later_inputs():
    # <form method=post .../> opens AND closes in one token: it must not
    # stay open, absorb unrelated named inputs, or emit a phantom request
    # at a later unmatched </form>
    p = parse_page(
        '<form method="post" action="/ping.html"/>'
        '<input name="stray" value="x">'
        '</form>'
    )
    assert p["post_forms"] == [("/ping.html", "")]


def test_nested_form_emits_open_post_form():
    # HTML forbids nested forms; a new <form> implicitly terminates the
    # open one. The outer post form's request must be emitted, not dropped.
    p = parse_page(
        '<form method="post" action="/outer.html"><input name="a" value="1">'
        '<form action="/inner.html"><input name="b" value="2"></form>'
    )
    assert p["post_forms"] == [("/outer.html", "a=1")]
    # nested POST inside POST: both requests survive
    p2 = parse_page(
        '<form method="post" action="/o.html"><input name="a" value="1">'
        '<form method="post" action="/i.html"><input name="b" value="2"></form>'
    )
    assert p2["post_forms"] == [("/o.html", "a=1"), ("/i.html", "b=2")]

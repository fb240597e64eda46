"""Checker modules (SURVEY.md §2.7 C1–C7) — pure row logic + Spark builders.

The reference runs checker modules with a begin()/process()/end() lifecycle
per fetched page (SURVEY.md §3.1). Here each checker is (a) a pure Python
function over parsed-page fields — used by the golden single-threaded
reference crawler in golden.py and inside vectorized batches — and (b) a
DataFrame builder over the engine's `parsed` table — used by the crawl loop
and by the driver-checked queries. Tests assert (a) and (b) agree exactly.

Checkers:
  C1 broken links   — crawl.py (anti-join of elected frontier vs pages)
  C2 regex          — email/pattern extraction over extracted text
  C3 comments       — sensitive HTML comments
  C4 spelling       — tokens anti-joined against a broadcast dictionary
  C5 metadata       — missing/overlong title & meta description
  C7 readability    — Flesch-style score from word/sentence/syllable counts
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = re.compile(r"[a-z]+")
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
SENTENCE_RE = re.compile(r"[.!?]")
VOWEL_GROUP_RE = re.compile(r"[aeiouy]+")

SENSITIVE_COMMENT_RE = re.compile(r"password|secret|api_key|TODO", re.IGNORECASE)

# Same regexes as SQL-side strings (Java regex dialect compatible).
TOKEN_SQL = "[a-z]+"
EMAIL_SQL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SENSITIVE_SQL = "(?i)password|secret|api_key|TODO"

META_DESC_MAX = 160
TITLE_MAX = 70


# ---------------------------------------------------------------------------
# Pure row logic (golden oracle + property tests)
# ---------------------------------------------------------------------------

def tokenize(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def find_misspellings(text: str, dictionary: set[str]) -> list[str]:
    return sorted({t for t in tokenize(text) if len(t) >= 3 and t not in dictionary})


SPELL_CONTEXT = 24  # chars of context on each side of a misspelling


def spelling_context(text: str, word: str) -> str:
    """Context window around the FIRST substring occurrence of `word` in
    lower(text): starts 24 chars before it, runs len(word)+48 chars (window
    keeps full length when clipped at the string start). The rule is chosen
    to be expressible identically in pure JVM substring/locate (the
    check_spelling builder) and pure Python (this function / golden.py) —
    the reference logs misspellings with surrounding context (SURVEY.md
    §2.7 C4)."""
    lt = text.lower()
    i = lt.find(word)
    if i < 0:  # unreachable for tokens extracted from this text
        return word
    start = max(0, i - SPELL_CONTEXT)
    return lt[start:start + len(word) + 2 * SPELL_CONTEXT]


def misspelling_details(text: str, dictionary: set[str]) -> list[str]:
    """'word: context' detail strings, sorted by word — golden's spelling
    findings; byte-identical to check_spelling's `detail` column."""
    return [
        f"{w}: {spelling_context(text, w)}" for w in find_misspellings(text, dictionary)
    ]


def find_emails(text: str) -> list[str]:
    return EMAIL_RE.findall(text)


def find_sensitive_comments(comments: list[str]) -> list[str]:
    return [c for c in comments if SENSITIVE_COMMENT_RE.search(c)]


def meta_issues(title: str | None, meta_description: str | None) -> list[str]:
    issues = []
    if not title:
        issues.append("missing_title")
    elif len(title) > TITLE_MAX:
        issues.append("title_too_long")
    if meta_description is None:
        issues.append("missing_meta_description")
    elif len(meta_description) > META_DESC_MAX:
        issues.append("meta_description_too_long")
    return issues


def readability(text: str) -> float | None:
    """Flesch reading ease with vowel-group syllable approximation."""
    words = tokenize(text)
    if not words:
        return None
    n_words = len(words)
    n_sentences = max(1, len(SENTENCE_RE.findall(text)))
    n_syllables = sum(max(1, len(VOWEL_GROUP_RE.findall(w))) for w in words)
    return 206.835 - 1.015 * (n_words / n_sentences) - 84.6 * (n_syllables / n_words)


# ---------------------------------------------------------------------------
# DataFrame builders over the engine's `parsed` table
# (url, wave, extracted_text, title, meta_description, comments, ...)
# ---------------------------------------------------------------------------

def check_spelling(parsed: DataFrame, dictionary: DataFrame) -> DataFrame:
    """C4: (url, wave, word, detail) per distinct unknown token per page;
    detail = 'word: <context>' around the first occurrence (same rule as
    spelling_context, all JVM: locate + substring on the re-joined text —
    the anti-join runs on narrow token rows first, text re-attaches only to
    the few surviving misspellings).

    Dictionary is broadcast — it is small by construction (SURVEY.md §2.3 J3).
    """
    # (verb, post_data) are part of the row identity: a GET and a POST of
    # the same url are two requests (contract v3) — joining text back on
    # (url, wave) alone would cross-multiply their findings. Tolerate
    # url-keyed inputs that predate the request columns.
    req = [c for c in ("url", "wave", "verb", "post_data")
           if c in parsed.columns]
    tokens = (
        parsed.select(
            *req,
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(F.lower("extracted_text"), F.lit(TOKEN_SQL), F.lit(0))
                )
            ).alias("word"),
        )
        .filter(F.length("word") >= 3)
    )
    unknown = tokens.join(F.broadcast(dictionary), "word", "left_anti")
    text = parsed.select(*req, F.lower("extracted_text").alias("_lt"))
    pos = F.expr("locate(word, _lt)")  # 1-based first occurrence
    ctx = F.substring(
        F.col("_lt"),
        F.greatest(F.lit(1), pos - F.lit(SPELL_CONTEXT)),
        F.length("word") + F.lit(2 * SPELL_CONTEXT),
    )
    return (
        unknown.join(text, req)
        .select(
            "url", "wave", "word",
            F.concat(F.col("word"), F.lit(": "), ctx).alias("detail"),
        )
    )


def check_regex(parsed: DataFrame, pattern_sql: str = EMAIL_SQL, name: str = "email") -> DataFrame:
    """C2: one row per match of a configured pattern per page."""
    return parsed.select(
        "url",
        "wave",
        F.lit(name).alias("pattern_name"),
        F.explode(
            F.regexp_extract_all("extracted_text", F.lit(pattern_sql), F.lit(0))
        ).alias("match"),
    )


def check_comments(parsed: DataFrame) -> DataFrame:
    """C3: sensitive HTML comments."""
    return parsed.select(
        "url",
        "wave",
        F.explode("comments").alias("comment"),
    ).filter(F.col("comment").rlike(SENSITIVE_SQL))


def check_metadata(parsed: DataFrame) -> DataFrame:
    """C5: title/meta-description presence and length issues."""
    issues = F.array_compact(
        F.array(
            F.when(F.col("title").isNull() | (F.col("title") == ""), "missing_title")
            .when(F.length("title") > TITLE_MAX, "title_too_long"),
            F.when(F.col("meta_description").isNull(), "missing_meta_description")
            .when(F.length("meta_description") > META_DESC_MAX, "meta_description_too_long"),
        )
    )
    return (
        parsed.select("url", "wave", F.explode(issues).alias("issue"))
    )


SPELL_TOKEN_MODULE = "_spell_token"  # in-band token rows, never a finding


def _spell_context_col(lt, word):
    """JVM twin of spelling_context() as a column expression over a
    lowercased-text column and a token column: substring around the first
    locate() hit, window clipped at the string start — byte-identical to
    check_spelling's join-side detail (locate >= 1 always holds because the
    token was extracted from this very text)."""
    pos = F.call_function("locate", word, lt)
    return F.call_function(
        "substring", lt,
        F.greatest(F.lit(1), pos - F.lit(SPELL_CONTEXT)),
        F.length(word) + F.lit(2 * SPELL_CONTEXT),
    )


def _checker_structs(emit_tokens: bool = False,
                     known_words: list[str] | None = None,
                     inline_context: bool = False):
    """The C2+C3+C5 per-row findings as ONE array-of-struct(module, detail)
    column expression (+ the distinct spelling-candidate tokens when
    emit_tokens). Shared by findings_pass and the crawl's wave-level fused
    findings builder.

    known_words: when given (the dictionary, collected — it is broadcast-
    small by construction, SURVEY.md §2.3 J3), the dictionary subtraction
    happens HERE at the array level (array_except against the literal word
    set, a per-row hash lookup) instead of downstream via an anti-join over
    exploded token rows. Only the few UNKNOWN tokens per page ever become
    rows — at the bench crawl that is ~2 rows/page instead of ~300, i.e.
    the fused findings cache and the anti-join's input shrink ~100x. Same
    set by construction: array_except(filter(tokens, len>=3), dict) ==
    distinct tokens len>=3 minus dict (pytest-pinned vs check_spelling).

    inline_context (requires known_words): emit finished module='spelling'
    findings with the 'word: context' detail computed IN-ROW
    (_spell_context_col) instead of in-band token rows. The unknown tokens
    and their source text live in the same row, so re-attaching text via a
    (url, wave, verb, post_data)-keyed join — a full-text shuffle plus a
    second scan of the parsed cache per wave — was pure plumbing (guide
    §2.4: remove shuffles outright). Byte-identical details: same locate/
    substring rule either way (pytest-pinned vs check_spelling)."""
    regex_arr = F.transform(
        # cheap contains() pre-gate: every EMAIL_SQL match contains '@', so
        # the expensive regex only runs on rows that can match at all
        # (guide §1.2 "per-task work"); null text falls through to [].
        F.coalesce(
            F.when(
                F.contains("extracted_text", F.lit("@")),
                F.regexp_extract_all("extracted_text", F.lit(EMAIL_SQL), F.lit(0)),
            ),
            F.array(),
        ),
        lambda m: F.struct(F.lit("regex").alias("module"), m.alias("detail")),
    )
    comment_arr = F.transform(
        F.filter(
            F.coalesce(F.col("comments"), F.array()),
            lambda c: c.rlike(SENSITIVE_SQL),
        ),
        lambda c: F.struct(F.lit("comments").alias("module"), c.alias("detail")),
    )
    issues = F.array_compact(
        F.array(
            F.when(F.col("title").isNull() | (F.col("title") == ""), "missing_title")
            .when(F.length("title") > TITLE_MAX, "title_too_long"),
            F.when(F.col("meta_description").isNull(), "missing_meta_description")
            .when(F.length("meta_description") > META_DESC_MAX, "meta_description_too_long"),
        )
    )
    meta_arr = F.transform(
        issues,
        lambda i: F.struct(F.lit("metadata").alias("module"), i.alias("detail")),
    )
    arr = F.concat(regex_arr, comment_arr, meta_arr)
    if emit_tokens:
        candidates = F.filter(
            F.array_distinct(
                F.regexp_extract_all(
                    F.lower("extracted_text"), F.lit(TOKEN_SQL), F.lit(0)
                )
            ),
            lambda t: F.length(t) >= 3,
        )
        if known_words is not None:
            # array_except is distinct-by-definition, so the inner
            # array_distinct above is redundant on this path but kept for
            # expression-shape parity with the anti-join path
            candidates = F.array_except(
                candidates, F.array(*[F.lit(w) for w in known_words])
            )
        if inline_context and known_words is not None:
            # after the dictionary subtraction `candidates` holds ~a few
            # unknown tokens per page, so the per-element lower()+locate()
            # below runs on O(few) elements — not the inlined-regex hazard
            # _bound_words documents (its input array is evaluated once)
            lt = F.lower(F.col("extracted_text"))
            token_arr = F.transform(
                candidates,
                lambda t: F.struct(
                    F.lit("spelling").alias("module"),
                    F.concat(t, F.lit(": "),
                             _spell_context_col(lt, t)).alias("detail"),
                ),
            )
        else:
            token_arr = F.transform(
                candidates,
                lambda t: F.struct(
                    F.lit(SPELL_TOKEN_MODULE).alias("module"), t.alias("detail")
                ),
            )
        arr = F.concat(arr, token_arr)
    return arr


def findings_pass(parsed: DataFrame, emit_tokens: bool = False) -> DataFrame:
    """C2+C3+C5 fused into ONE scan of the parsed table: returns
    (module, url, wave, detail) rows — the exact multiset the three
    separate builders produce (pytest-pinned equality).

    Why: the crawl loop's findings job previously unioned each checker's
    own DataFrame — 3 JVM-checker scans plus spelling's 2 (tokens + text
    re-attach) = 5 passes over the parsed cache per wave, and those
    cache-read bytes were the second-largest stage group in the round-4
    N-vs-4N scaling tables (ckpt_findings: 44.7 GB input, 1.72x inflation).
    The three pure-JVM checkers are per-row array builders, so one scan
    emits them all; spelling keeps its dictionary join.

    emit_tokens=True additionally emits one module=SPELL_TOKEN_MODULE row
    per distinct candidate spelling token (lowercase, len >= 3) per page —
    the exact token set check_spelling explodes — and carries the request
    identity columns (verb, post_data when present) so the C4 pipeline can
    anti-join + re-attach text without its own scan of the parsed cache
    (findings_with_spelling)."""
    arr = _checker_structs(emit_tokens)
    extra_cols: list[str] = []
    if emit_tokens:
        extra_cols = [c for c in ("verb", "post_data") if c in parsed.columns]
    return (
        parsed.select(
            "url", "wave", *extra_cols,
            F.explode(arr).alias("f"),
        )
        .select(
            F.col("f.module").alias("module"), "url", "wave", *extra_cols,
            F.col("f.detail").alias("detail"),
        )
    )


def wave_findings_pass(
    parsed: DataFrame, max_redirects: int,
    dictionary: DataFrame | list[str] | None = None, checkers: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """ALL of a crawl wave's per-page findings from ONE scan of the parsed
    table: broken_link (status=404 rows), over-cap redirect chains, and —
    when `checkers` — C2/C3/C5 (+ C4 spelling when a dictionary is given).
    Returns (findings(module, url, wave, detail, referrer), handle);
    `handle` (non-None only on the dictionary path) is the slim fused cache
    to unpersist once the findings are materialized. Robots findings are
    not built here — they read the gated frontier, not parsed pages.

    Why one scan: every filter branch over the parsed cache fetches the
    FULL cached batches from the block manager regardless of column
    pruning, so the previous three-branch findings job (404 filter +
    redirect filter + fused checker scan) read 3x the cache per wave —
    45 GB/run and 1.42x 4N inflation in the round-5 pair-0 stage tables.
    Row-for-row equal to the separate builders' union (pytest + golden).

    The dictionary (DataFrame or pre-collected word list) is folded into
    the fused scan as an array_except literal (_checker_structs), so only
    UNKNOWN tokens become rows — the r6 shape exploded ~300 token rows per
    page into the fused cache and anti-joined them all (the dominant CPU
    of the r7 profile's ckpt_findings stage group, 240 s CPU/run at the
    120k-page bench); now ~2 rows/page survive and no anti-join runs.
    Collecting the dictionary is the same smallness assumption its
    broadcast already made.

    r7: the spelling CONTEXT is also computed in-row (_checker_structs
    inline_context): the unknown token and its source text share a row, so
    the former 'word: context' re-attach — a full-text shuffle join plus a
    SECOND scan of the parsed cache per wave, plus a persisted in-band
    token table — was pure plumbing. The whole wave findings job is now
    ONE scan of the parsed cache with zero exchanges before the
    checkpoint, and the returned handle is always None."""
    emit_tokens = checkers and dictionary is not None
    dict_words: list[str] | None = None
    if emit_tokens:
        if isinstance(dictionary, (list, tuple)):
            dict_words = sorted(set(dictionary))
        else:
            dict_words = sorted({r["word"] for r in
                                 dictionary.select("word").collect()})
    broken = F.array_compact(F.array(
        F.when(
            F.col("status") == 404,
            F.struct(F.lit("broken_link").alias("module"),
                     F.lit("404").alias("detail"),
                     F.col("referrer").alias("referrer")),
        )
    ))
    red = F.array_compact(F.array(
        F.when(
            F.col("redirect").isNotNull()
            & (F.col("redirects") + 1 > max_redirects),
            F.struct(F.lit("redirect").alias("module"),
                     F.concat(F.lit("max_redirects_exceeded "),
                              F.col("redirect")).alias("detail"),
                     F.col("referrer").alias("referrer")),
        )
    ))
    arr = F.concat(broken, red)
    if checkers:
        # checker findings apply to fetched pages only; 404 passthrough
        # rows must not produce metadata/regex findings from their empty
        # parse fields
        chk = F.transform(
            F.filter(
                _checker_structs(emit_tokens, known_words=dict_words,
                                 inline_context=True),
                lambda _s: F.col("status") == 200,
            ),
            lambda s: F.struct(s["module"].alias("module"),
                               s["detail"].alias("detail"),
                               F.lit("").alias("referrer")),
        )
        arr = F.concat(arr, chk)
    fused = (
        parsed.select("url", "wave", F.explode(arr).alias("f"))
        .select(
            F.col("f.module").alias("module"), "url", "wave",
            F.col("f.detail").alias("detail"),
            F.col("f.referrer").alias("referrer"),
        )
    )
    return fused, None


def findings_with_spelling(
    parsed: DataFrame, dictionary: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """C2+C3+C5+C4 sharing ONE scan of the parsed cache. Returns
    (findings(module, url, wave, detail), cache_handle) — the caller
    unpersists the handle after the findings are materialized.

    The fused scan emits the JVM-checker findings AND the distinct spelling
    candidate tokens as slim rows (persisted — orders of magnitude smaller
    than the parsed table); the dictionary anti-join runs on those cached
    rows, and only the text re-attach for surviving misspellings re-reads
    the parsed cache's extracted_text column. Net: 2 parsed-cache scans per
    wave (fused + re-attach) instead of the previous 3 (fused + token
    explode + re-attach). Row-for-row equal to
    findings_pass(parsed) ∪ check_spelling(parsed, dictionary)
    (pytest-pinned)."""
    fused = findings_pass(parsed, emit_tokens=True).persist()
    base = fused.filter(F.col("module") != SPELL_TOKEN_MODULE).select(
        "module", "url", "wave", "detail"
    )
    req = [c for c in ("url", "wave", "verb", "post_data") if c in fused.columns]
    tokens = fused.filter(F.col("module") == SPELL_TOKEN_MODULE).select(
        *req, F.col("detail").alias("word")
    )
    unknown = tokens.join(F.broadcast(dictionary), "word", "left_anti")
    text = parsed.select(*req, F.lower("extracted_text").alias("_lt"))
    pos = F.expr("locate(word, _lt)")
    ctx = F.substring(
        F.col("_lt"),
        F.greatest(F.lit(1), pos - F.lit(SPELL_CONTEXT)),
        F.length("word") + F.lit(2 * SPELL_CONTEXT),
    )
    spelling = unknown.join(text, req).select(
        F.lit("spelling").alias("module"), "url", "wave",
        F.concat(F.col("word"), F.lit(": "), ctx).alias("detail"),
    )
    return base.unionByName(spelling), fused


def check_readability(parsed: DataFrame) -> DataFrame:
    """C7: Flesch score from built-in column expressions (no Python)."""
    parsed = parsed.withColumn(
        "_words",  # materialized: HOF lambdas below must not inline the regex
        F.regexp_extract_all(F.lower("extracted_text"), F.lit(TOKEN_SQL), F.lit(0)),
    )
    words = F.col("_words")
    n_words = F.size(words)
    n_sentences = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all("extracted_text", F.lit("[.!?]"), F.lit(0)))
    )
    syllable_counts = F.transform(
        words,
        lambda w: F.greatest(F.lit(1), F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0)))),
    )
    n_syllables = F.aggregate(syllable_counts, F.lit(0), lambda a, b: a + b)
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sentences.cast("double"))
        - F.lit(84.6) * (n_syllables.cast("double") / n_words.cast("double"))
    )
    return parsed.select(
        "url",
        "wave",
        F.when(n_words > 0, score).alias("flesch_score"),
        n_words.alias("n_words"),
    )

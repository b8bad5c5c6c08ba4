"""Text-analytics column functions (training-data pipeline tier).

The reference has no text processing at all (SURVEY.md §2.6) — this tier
is the north-star extension surface (SURVEY.md §2.7): language ID,
quality scoring, token counting, and document fingerprinting over the
``documents`` fixture table.

Design rules:

- **Everything is a JVM-side built-in expression** (length/replace/
  regexp/md5/array ops) inside whole-stage codegen — no Python UDFs in
  the per-row path, so the same code runs unchanged on a 1000-executor
  cluster with zero serialization overhead.
- **Each builder has a paired ``*_sql`` twin** generated from the same
  constant tables (marker-word lists, regex patterns, weights).  The
  DuckDB oracle is therefore parity-by-construction: both engines run
  exact integer/string ops (split-token counts, md5 hex, regexp counts),
  never float-order-sensitive math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.functions import rolling as _rolling

# ---------------------------------------------------------------------------
# Constant tables shared by the Spark and SQL builders
# ---------------------------------------------------------------------------

#: Language marker words for the n-gram/stopword language-ID heuristic.
#: Order matters: it is the deterministic tie-break (first wins on equal
#: scores).  Scores count whole-word occurrences via the exact
#: replace-length trick, identical in both engines.
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "of", "and"]),
    ("de", ["der", "und", "die", "das"]),
    ("es", ["el", "los", "y", "que"]),
    ("fr", ["le", "la", "et", "les"]),
    ("zh", ["de", "shi", "bu", "le"]),
]

#: English-ish stopwords for the quality score's stopword ratio.
STOPWORDS = ["the", "a", "of", "and", "to", "in"]

#: "BPE-ish" token pattern: letter runs, digit runs, or single non-space
#: symbols — the classic pre-tokenizer shape.  RE2 (DuckDB) and Java
#: regex (Spark) agree on this subset.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Punctuation / symbol pattern for the quality score.
PUNCT_PATTERN = r"[^A-Za-z0-9\s]"

#: Character-shingle width for document fingerprinting.
FINGERPRINT_K = 8


# ---------------------------------------------------------------------------
# Occurrence counting (exact, engine-portable)
# ---------------------------------------------------------------------------

#: Word-delimiter class for whole-word counting: explicit ASCII \w
#: complement.  NOT `\b` — Java and RE2 disagree on word-boundary
#: semantics around non-ASCII letters ("añejo": Java's \b is
#: Unicode-aware, RE2's is ASCII), while an explicit class behaves
#: identically in both engines.
WORD_SPLIT_PATTERN = r"[^0-9A-Za-z_]+"


def word_count_expr(text: str, word: str) -> Column:
    """# of whole-word occurrences of ``word`` in column ``text``.

    Split on the explicit ASCII delimiter class, then count tokens equal
    to the word — exact even for adjacent repeats (" the the the "
    counts 3; the earlier replace-length trick counted 2, since
    consecutive matches share the separating space and ``replace`` scans
    non-overlapping).  Non-ASCII letters act as delimiters, consistent
    with the ASCII marker-word heuristic this feeds.
    """
    return F.size(
        F.filter(
            F.split(F.col(text), WORD_SPLIT_PATTERN),
            lambda t: t == F.lit(word),
        )
    ).cast("long")


def word_count_sql(text: str, word: str) -> str:
    """SQL twin of :func:`word_count_expr` (DuckDB).

    ``word`` is interpolated into a single-quoted SQL literal; restrict
    it to the same ASCII word class the splitter produces so a quote or
    metacharacter can never break (or silently change) the oracle.
    """
    import re

    assert re.fullmatch(r"[0-9A-Za-z_]+", word), (
        f"word_count_sql: word must match [0-9A-Za-z_]+, got {word!r}"
    )
    return (
        f"CAST(len(list_filter(string_split_regex({text}, "
        f"'{WORD_SPLIT_PATTERN}'), t -> t = '{word}')) AS BIGINT)"
    )


# ---------------------------------------------------------------------------
# Tokenization / counting
# ---------------------------------------------------------------------------

def ws_tokens(text: str) -> Column:
    """Whitespace tokens (array<string>)."""
    return F.split(F.trim(F.col(text)), r"\s+")


def ws_token_count_expr(text: str) -> Column:
    """Whitespace token count — `size(split(trim(text), '\\s+'))`."""
    return F.size(ws_tokens(text)).cast("long")


def ws_token_count_sql(text: str) -> str:
    return f"CAST(len(string_split_regex(trim({text}), '\\s+')) AS BIGINT)"


def bpe_token_count_expr(text: str) -> Column:
    """BPE-ish token count via regexp_extract_all (vectorized, JVM-side)."""
    return F.size(
        F.regexp_extract_all(F.col(text), F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    ).cast("long")


def bpe_token_count_sql(text: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({text}, '{BPE_TOKEN_PATTERN}')) AS BIGINT)"
    )


def punct_count_expr(text: str) -> Column:
    return F.size(
        F.regexp_extract_all(F.col(text), F.lit(PUNCT_PATTERN), F.lit(0))
    ).cast("long")


def punct_count_sql(text: str) -> str:
    return f"CAST(len(regexp_extract_all({text}, '{PUNCT_PATTERN}')) AS BIGINT)"


# ---------------------------------------------------------------------------
# Language ID (marker-word heuristic)
# ---------------------------------------------------------------------------

def lang_score_exprs(text: str) -> dict[str, Column]:
    """Per-language marker-occurrence totals."""
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS:
        score = None
        for w in markers:
            c = word_count_expr(text, w)
            score = c if score is None else score + c
        out[lang] = score.cast("long")
    return out


def lang_score_sqls(text: str) -> dict[str, str]:
    return {
        lang: "CAST(" + " + ".join(word_count_sql(text, w) for w in markers) + " AS BIGINT)"
        for lang, markers in LANG_MARKERS
    }


def lang_id_expr(text: str) -> Column:
    """argmax over language scores; ties go to the earlier LANG_MARKERS
    entry; all-zero scores → 'und' (undetermined)."""
    return lang_id_from_scores(lang_score_exprs(text))


def lang_id_from_scores(scores: dict[str, Column]) -> Column:
    """The argmax/tie-break CASE chain over ALREADY-COMPUTED score
    columns — the seam that lets a hot path supply the marker counts
    from an Arrow kernel (operators/curation.py:lang_marker_counts).
    Over plain integer columns the chain is cheap codegen; over the
    expression scores it re-evaluates each score per comparison (HOFs
    get no CSE — the reason text_lang_id was the r14 sweep's worst
    text constant)."""
    best = None
    for lang, _ in LANG_MARKERS:
        s = scores[lang]
        # chain order is the tie-break: first WHEN with score >= all others
        others = [scores[l2] for l2, _ in LANG_MARKERS if l2 != lang]
        ge_all = None
        for o in others:
            c = s >= o
            ge_all = c if ge_all is None else (ge_all & c)
        w = F.when((s > 0) & ge_all, F.lit(lang))
        best = w if best is None else best.when((s > 0) & ge_all, F.lit(lang))
    return best.otherwise(F.lit("und"))


def lang_id_sql(text: str) -> str:
    scores = lang_score_sqls(text)
    whens = []
    for lang, _ in LANG_MARKERS:
        s = scores[lang]
        ge_all = " AND ".join(
            f"{s} >= {scores[l2]}" for l2, _ in LANG_MARKERS if l2 != lang
        )
        whens.append(f"WHEN {s} > 0 AND {ge_all} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------
# Ratios are integer-count divisions rounded to 6 dp on both sides, so the
# composite is deterministic across engines.

def quality_exprs(text: str) -> dict[str, Column]:
    n_chars = F.length(F.col(text)).cast("long")
    n_tokens = ws_token_count_expr(text)
    # one split + one IN-filter: Σ_w count(tok = w) over disjoint words
    # equals count(tok ∈ words) — the per-word form re-split (and
    # re-interpreted the array HOF) six times per row, measured as the
    # bulk of the quality pass (1.2 s of curation_corpus_pipeline's
    # 2.8 s at sf0.1); values are bit-identical, so the oracle keeps
    # its per-word sum.
    toks = F.split(F.col(text), WORD_SPLIT_PATTERN)
    stop = F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("long")
    alpha_chars = F.length(
        F.regexp_replace(F.col(text), r"[^A-Za-z]", "")
    ).cast("long")
    # punct count as a length difference (PUNCT_PATTERN matches single
    # chars, so removed-length = match count) — no match-array build
    punct = (
        F.length(F.col(text))
        - F.length(F.regexp_replace(F.col(text), PUNCT_PATTERN, ""))
    ).cast("long")
    avg_token_len = F.round(
        alpha_chars.cast("double") / n_tokens.cast("double"), 6
    )
    stop_ratio = F.round(stop.cast("double") / n_tokens.cast("double"), 6)
    punct_ratio = F.round(punct.cast("double") / n_chars.cast("double"), 6)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
    }


def quality_sqls(text: str) -> dict[str, str]:
    n_chars = f"CAST(length({text}) AS BIGINT)"
    n_tokens = ws_token_count_sql(text)
    stop = " + ".join(word_count_sql(text, w) for w in STOPWORDS)
    alpha = f"CAST(length(regexp_replace({text}, '[^A-Za-z]', '', 'g')) AS BIGINT)"
    punct = punct_count_sql(text)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": (
            f"round(CAST({alpha} AS DOUBLE) / CAST({n_tokens} AS DOUBLE), 6)"
        ),
        "stopword_ratio": (
            f"round(CAST({stop} AS DOUBLE) / CAST({n_tokens} AS DOUBLE), 6)"
        ),
        "punct_ratio": (
            f"round(CAST({punct} AS DOUBLE) / CAST({n_chars} AS DOUBLE), 6)"
        ),
    }


#: Quality-score weights (doc passes if score >= 0.5; purely illustrative
#: deterministic composite — length band + stopword presence).
def quality_score_expr(text: str) -> Column:
    q = quality_exprs(text)
    return quality_score_from_counts(
        q["n_chars"], q["stopword_ratio"], q["punct_ratio"]
    )


def quality_stats_from_counts(
    n_chars, n_tokens, stop, punct, alpha
) -> dict[str, Column]:
    """The :func:`quality_exprs` output dict rebuilt over
    ALREADY-COMPUTED integer count columns (the Arrow-kernel seam,
    operators/curation.py:quality_counts) — same ratio expressions to
    the round-6 bit, so every consumer (text_quality,
    quality_calibration, curation_corpus_pipeline) is hash-identical to
    the expression form and the SQL twin."""
    avg_token_len = F.round(
        alpha.cast("double") / n_tokens.cast("double"), 6
    )
    stop_ratio = F.round(stop.cast("double") / n_tokens.cast("double"), 6)
    punct_ratio = F.round(punct.cast("double") / n_chars.cast("double"), 6)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": avg_token_len,
        "stopword_ratio": stop_ratio,
        "punct_ratio": punct_ratio,
    }


def quality_score_from_counts(n_chars, stopword_ratio, punct_ratio) -> Column:
    """Score composition over ALREADY-COMPUTED stat columns — the seam
    that lets a hot path supply the integer counts from an Arrow kernel
    (operators/curation.py:quality_counts) while every float op (the
    round-6 ratios feeding these thresholds, and the CASE sum itself)
    stays in Spark expressions, bit-identical to the expression form
    and the SQL twin."""
    length_ok = F.when(
        (n_chars >= 100) & (n_chars <= 20000), F.lit(0.5)
    ).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
    return F.round(length_ok + stop_ok + punct_ok, 6)


def quality_score_sql(text: str) -> str:
    # CAST AS DOUBLE: DuckDB types the decimal-literal CASE sum as
    # DECIMAL(4,1), which the driver-hash type allowlist
    # (tests/test_queries_oracle.py) forbids in oracle OUTPUT columns.
    # Every reachable value (tenths in [0, 1]) is exactly representable
    # in binary64, so the cast is bit-exact vs the Spark double.
    q = quality_sqls(text)
    return (
        "CAST(round("
        f"(CASE WHEN {q['n_chars']} >= 100 AND {q['n_chars']} <= 20000 "
        "THEN 0.5 ELSE 0.0 END) + "
        f"(CASE WHEN {q['stopword_ratio']} >= 0.01 THEN 0.3 ELSE 0.0 END) + "
        f"(CASE WHEN {q['punct_ratio']} <= 0.2 THEN 0.2 ELSE 0.0 END)"
        ", 6) AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# Document fingerprinting (char-shingle window, Karp–Rabin min-hash)
# ---------------------------------------------------------------------------
#
# Shingle hashing is the Karp–Rabin polynomial (functions/rolling.py):
# integer MACs over a codepoint array instead of r5's md5-per-position
# (a digest + 32-hex allocation per character of the corpus — the bench's
# second-worst constant factor, VERDICT r5).  The codepoint array is
# zero-PADDED to k so a doc shorter than one gram still yields exactly
# one (truncated-text) fingerprint — the r5 semantics, preserved.
#
# These builders take the NAME OF A BOUND CODEPOINT-ARRAY COLUMN, not the
# text column: Spark HOF lambdas re-evaluate free-variable expressions
# per element, so the caller materializes codes once via
# ``fingerprint_codes_expr`` / ``fingerprint_codes_sql`` in a prior
# projection (see plans/training.py:text_fingerprint).


def fingerprint_codes_expr(text: str, k: int = FINGERPRINT_K) -> Column:
    """BIGINT codepoint array of ``text``, zero-padded to length ≥ k."""
    cs = _rolling.codes_spark(text)
    return F.expr(
        f"concat({cs}, array_repeat(0L, "
        f"greatest({k} - length({text}), 0)))"
    )


def fingerprint_codes_sql(text: str, k: int = FINGERPRINT_K) -> str:
    cs = _rolling.codes_duckdb(text)
    return (
        f"list_concat({cs}, [CAST(0 AS BIGINT) FOR x IN "
        f"range(greatest({k} - length({text}), 0))])"
    )


def fingerprint_exprs(cs: str, k: int = FINGERPRINT_K) -> dict[str, Column]:
    """Min-hash style document fingerprint over char shingles.

    ``fp`` = min Karp–Rabin hash over all k-char grams (a 1-permutation
    MinHash with the polynomial as the random order — identical integer
    in every engine); ``n_shingles`` = distinct gram-hash count
    (document "novelty" size).  ``cs`` names a column produced by
    :func:`fingerprint_codes_expr`.
    """
    hs = _rolling.gram_hashes_spark(cs, k)
    return {
        "fp": F.array_min(F.expr(hs)),
        "n_shingles": F.size(F.array_distinct(F.expr(hs))).cast("long"),
    }


def fingerprint_sqls(cs: str, k: int = FINGERPRINT_K) -> dict[str, str]:
    hs = _rolling.gram_hashes_duckdb(cs, k)
    return {
        "fp": f"CAST(list_min({hs}) AS BIGINT)",
        "n_shingles": f"CAST(len(list_distinct({hs})) AS BIGINT)",
    }


def fingerprint_arrow(
    docs, id_col: str = "doc_id", text_col: str = "text",
    k: int = FINGERPRINT_K,
):
    """Arrow (numpy) twin of :func:`fingerprint_exprs` — identical
    integers, computed as vectorized int64 kernels in ``mapInPandas``
    (codes via one UTF-32 reinterpret with zero-pad to k, gram hashes
    as k shifted multiply–accumulates, then ``min`` / ``unique``).
    Spark's array-HOF lambdas evaluate interpreted with per-element
    boxing, so the expression form pays an interpreter tax per
    character; this map-only Arrow path computes the same polynomial at
    numpy speed (the winnow_fingerprints precedent).  Fuzz-asserted
    row-identical to the expression twin."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as F  # noqa: F811 (module alias)

    id_type = docs.schema[id_col].dataType.simpleString()
    pows, mod = _rolling.kr_pows(k), _rolling.KR_MOD

    def gen(batches):
        for pdf in batches:
            ids, fps, counts = [], [], []
            for did, t in zip(pdf[id_col].tolist(), pdf[text_col].tolist()):
                if t is None:
                    # match the expression twin: NULL codes → CASE else
                    # branch → empty gram array → NULL min, 0 distinct
                    ids.append(did)
                    fps.append(None)
                    counts.append(0)
                    continue
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                if len(codes) < k:  # zero-pad: short docs keep 1 gram
                    codes = np.concatenate(
                        [codes, np.zeros(k - len(codes), dtype=np.int64)]
                    )
                g = len(codes) - k + 1
                h = np.zeros(g, dtype=np.int64)
                for j, p in enumerate(pows):
                    h += (codes[j : j + g] * p) % mod
                h %= mod
                ids.append(did)
                fps.append(int(h.min()))
                counts.append(len(np.unique(h)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "fp": pd.array(fps, dtype="Int64"),
                    "n_shingles": pd.array(counts, dtype="Int64"),
                }
            )

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    sel = spread_small_input(docs.select(id_col, text_col))
    return sel.mapInPandas(
        gen, schema=f"doc_id {id_type}, fp bigint, n_shingles bigint"
    )


# ---------------------------------------------------------------------------
# SimHash (32-bit, md5-derived bits — engine-portable)
# ---------------------------------------------------------------------------

HEX_DIGITS = "0123456789abcdef"
SIMHASH_BITS = 32


def simhash_h32_expr(token_hash: Column) -> Column:
    """The md5's first 8 hex digits as one 32-bit integer — computed
    with a single ``conv`` (the r7 ``_h32`` discipline: one base
    conversion instead of per-nibble instr/substring scans).  Must be
    bound as a real column BEFORE :func:`simhash_bit_exprs` so the 32
    bit expressions share it (Catalyst does not CSE a repeated conv
    across independent projections)."""
    return F.conv(F.substring(token_hash, 1, 8), 16, 10).cast("long")


def simhash_bit_exprs(h32: Column) -> list[Column]:
    """±1 contribution of one token's 32-bit hash value (from
    :func:`simhash_h32_expr`) to each of the 32 simhash bits.

    Bit b of the DEFINITION lives in hex digit ``b // 4`` (1-based
    position, i.e. the (7 − b//4)-th nibble from the least significant)
    at in-nibble bit ``b % 4`` — overall bit ``4·(7 − b//4) + b%4`` of
    the integer; a shift+mask per vote instead of a string scan.  The
    DuckDB twin (:func:`simhash_bit_sql`) keeps the strpos arithmetic —
    same definition, pinned by the full simhash oracle hashes."""
    bits: list[Column] = []
    for b in range(SIMHASH_BITS):
        pos = 4 * (7 - b // 4) + b % 4
        bit = F.shiftright(h32, pos).bitwiseAND(F.lit(1))
        bits.append(F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1)))
    return bits


def simhash_from_bit_sums(bit_sums: list[Column]) -> Column:
    """Collapse the 32 per-bit vote sums into one BIGINT simhash."""
    acc = F.lit(0).cast("long")
    for b, s in enumerate(bit_sums):
        acc = acc + F.when(s > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return acc


def simhash_bit_sql(token_hash_sql: str, b: int) -> str:
    """SQL twin of one ±1 bit contribution."""
    nib = f"(strpos('{HEX_DIGITS}', substr({token_hash_sql}, {b // 4 + 1}, 1)) - 1)"
    bit = f"(CAST(floor({nib} / {2 ** (b % 4)}) AS BIGINT) % 2)"
    return f"(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END)"


def simhash_sql(token_hash_sql: str, sum_wrap) -> str:
    """Build ``sum_wrap`` is a fn mapping the per-bit ±1 SQL to an
    aggregated sum SQL (caller decides grouping); returns the final
    bit-recombination SQL."""
    parts = []
    for b in range(SIMHASH_BITS):
        s = sum_wrap(simhash_bit_sql(token_hash_sql, b))
        parts.append(f"(CASE WHEN {s} > 0 THEN CAST({2**b} AS BIGINT) ELSE 0 END)")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


# ---------------------------------------------------------------------------
# PII detection / redaction (engine-portable regex subset)
# ---------------------------------------------------------------------------

#: PII patterns, applied in order.  Explicit ASCII classes and {m,n}
#: quantifiers only — the regex subset where Java (Spark) and RE2
#: (DuckDB) behave identically; no \d, \b, lookaround, or backrefs.
#: SSN precedes card-number so the dashed form is consumed first.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("card", r"[0-9]{13,19}", "<NUM>"),
]


def pii_count_exprs(text: str) -> dict[str, Column]:
    """Per-pattern match counts (JVM ``regexp_count``)."""
    return {
        name: F.regexp_count(F.col(text), F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def _sql_quotable(s: str) -> str:
    """Guard for strings interpolated into single-quoted SQL literals:
    a quote would terminate the literal and corrupt the oracle."""
    assert "'" not in s and "\\'" not in s, f"unquotable SQL fragment: {s!r}"
    return s


def pii_count_sqls(text: str) -> dict[str, str]:
    """SQL twins (DuckDB has no regexp_count; length of extract_all)."""
    return {
        name: (
            f"CAST(len(regexp_extract_all({text}, "
            f"'{_sql_quotable(pat)}')) AS BIGINT)"
        )
        for name, pat, _ in PII_PATTERNS
    }


def pii_redact_expr(text: str) -> Column:
    """Redacted text: each pattern replaced by its token, in table order."""
    out = F.col(text)
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_redact_sql(text: str) -> str:
    """SQL twin — DuckDB needs the 'g' flag to replace every match."""
    out = text
    for _, pat, token in PII_PATTERNS:
        out = (
            f"regexp_replace({out}, '{_sql_quotable(pat)}', "
            f"'{_sql_quotable(token)}', 'g')"
        )
    return out

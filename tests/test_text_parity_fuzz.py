"""Cross-engine fuzz: the text-analytics expression builders and their SQL
twins must agree on adversarial inputs, not just the fixture corpus —
overlapping stopwords, mixed whitespace, unicode, punctuation runs, and
short/degenerate documents.

One Spark job / one DuckDB query over the whole generated corpus (seeded,
deterministic) — not per-example round-trips.
"""

from __future__ import annotations

import random

import duckdb

from real_time_trip_processing_project_spark.functions import text as TX

WORDS = [
    "the", "a", "of", "and", "der", "und", "die", "el", "los", "y",
    "le", "la", "et", "table", "scan", "merge", "key", "row", "value",
    "Spark", "CAMEL", "x1", "42", "3.14",
]
PUNCT = [",", ".", "!", "?", ";", ":", "—", "…", "#", "$"]


def _corpus(seed: int = 42, n: int = 150) -> list[str]:
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        k = rng.randint(1, 60)
        toks = [rng.choice(WORDS) for _ in range(k)]
        # inject adversarial shapes
        if i % 5 == 0:
            toks = ["the"] * rng.randint(2, 6) + toks  # overlapping needles
        if i % 7 == 0:
            toks.append(rng.choice(WORDS) + rng.choice(PUNCT))
        s = " ".join(toks)
        if i % 11 == 0:
            s = s.replace(" ", "  ", 1)  # double space
        docs.append(s)
    # fixed degenerate cases
    docs += [
        "the",
        "the the the the",
        "a",
        "x",
        "der und die das der und",
        "word," ,
        "12345 67890",
        "añejo café über 北京 москва",
        "the  the   the",
    ]
    return docs


def test_text_functions_cross_engine_parity(spark):
    docs = _corpus()
    sdf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    q = TX.quality_exprs("text")
    fp = TX.fingerprint_exprs("c")
    got = {
        r["doc_id"]: r
        for r in sdf.withColumn("c", TX.fingerprint_codes_expr("text"))
        .select(
            "doc_id",
            TX.lang_id_expr("text").alias("lang_pred"),
            TX.ws_token_count_expr("text").alias("n_ws"),
            TX.bpe_token_count_expr("text").alias("n_bpe"),
            q["n_chars"].alias("n_chars"),
            q["stopword_ratio"].alias("stop_ratio"),
            q["punct_ratio"].alias("punct_ratio"),
            fp["fp"].alias("fp"),
            fp["n_shingles"].alias("n_shingles"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(docs)))
        + ") t(doc_id, text)",
        docs,
    )
    qs = TX.quality_sqls("text")
    fps = TX.fingerprint_sqls("c")
    want_rows = con.execute(
        f"""
        SELECT doc_id,
               {TX.lang_id_sql('text')}        AS lang_pred,
               {TX.ws_token_count_sql('text')} AS n_ws,
               {TX.bpe_token_count_sql('text')} AS n_bpe,
               {qs['n_chars']}                 AS n_chars,
               {qs['stopword_ratio']}          AS stop_ratio,
               {qs['punct_ratio']}             AS punct_ratio,
               {fps['fp']}                     AS fp,
               {fps['n_shingles']}             AS n_shingles
        FROM (SELECT *, {TX.fingerprint_codes_sql('text')} AS c FROM docs)
        """
    ).fetchall()

    mismatches = []
    for row in want_rows:
        doc_id = row[0]
        g = got[doc_id]
        want = dict(
            zip(
                [
                    "doc_id", "lang_pred", "n_ws", "n_bpe", "n_chars",
                    "stop_ratio", "punct_ratio", "fp", "n_shingles",
                ],
                row,
            )
        )
        for k, wv in want.items():
            if k == "doc_id":
                continue
            gv = g[k]
            if isinstance(wv, float):
                ok = abs(gv - wv) < 1e-9
            else:
                ok = gv == wv
            if not ok:
                mismatches.append((doc_id, k, gv, wv, docs[doc_id][:60]))
    assert not mismatches, mismatches[:8]


def test_fingerprint_arrow_matches_expr_twin(spark):
    """The Arrow (numpy) fingerprint default must be row-identical to
    the expression twin — the shape the DuckDB oracle evaluates — on
    the adversarial corpus plus null/blank/short docs."""
    docs = _corpus(seed=3, n=80) + ["", "ab", "1234567", "12345678"]
    rows = [(i, d) for i, d in enumerate(docs)] + [(9001, None)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    fp = TX.fingerprint_exprs("c")
    expr_rows = sorted(
        map(
            tuple,
            sdf.withColumn("c", TX.fingerprint_codes_expr("text"))
            .select(
                "doc_id",
                fp["fp"].alias("fp"),
                fp["n_shingles"].alias("n_shingles"),
            )
            .collect(),
        )
    )
    arrow_rows = sorted(map(tuple, TX.fingerprint_arrow(sdf).collect()))
    assert arrow_rows == expr_rows


def test_word_count_exact_on_adjacent_repeats(spark):
    """The documented whole-word count semantics: adjacent repeats all
    count (' the the the ' = 3 — the replace-length trick lost one per
    run), punctuation and non-ASCII letters delimit words."""
    cases = [
        (" the the the ", "the", 3),
        ("the the the the", "the", 4),
        ("them theory the", "the", 1),
        ("the, the. the", "the", 3),
        ("añejo", "a", 1),  # ñ delimits in the ASCII heuristic
        ("", "the", 0),
    ]
    con = duckdb.connect()
    for t, w, want in cases:
        sdf = spark.createDataFrame([(t,)], ["text"])
        got = sdf.select(TX.word_count_expr("text", w).alias("n")).collect()[0]["n"]
        assert got == want, ("spark", t, w, got, want)
        sql_n = con.execute(
            "SELECT " + TX.word_count_sql("t.x", w) + " FROM (SELECT ? AS x) t",
            [t],
        ).fetchone()[0]
        assert sql_n == want, ("sql", t, w, sql_n, want)


def test_shingle_parity_cross_engine(spark):
    """word_shingles (zip_with construction) must equal DuckDB's slice
    comprehension on every corpus string, including docs shorter than
    the shingle width."""
    from real_time_trip_processing_project_spark.operators.dedup import (
        word_shingles,
    )
    from pyspark.sql import functions as F

    docs = _corpus(seed=7, n=60)
    sdf = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in sdf.select(
            "doc_id", F.array_sort(word_shingles(F.col("text"))).alias("sh")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i in range(len(docs)))
        + ") t(doc_id, text)",
        docs,
    )
    want_rows = con.execute(
        """
        SELECT doc_id,
               list_sort(list_distinct(
                 [ array_to_string(words[i + 1 : i + 3], ' ')
                   FOR i IN range(0, greatest(len(words) - 3, 0) + 1) ]))
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words
              FROM docs)
        """
    ).fetchall()
    for doc_id, want in want_rows:
        assert got[doc_id] == sorted(want), (doc_id, docs[doc_id][:60])

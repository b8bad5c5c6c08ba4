"""Distributed BPE tokenizer training (SURVEY.md §2.7 north-star tier).

``tokenizer_pair_counts`` (plans/training.py) is ONE merge step of
byte-pair-encoding vocabulary induction; this module runs the actual
training loop — the canonical *iterative* corpus algorithm of an LLM
data pipeline (reference has no counterpart; its Python is driver-side
glue only).

Algorithm (Sennrich-style BPE over the word-frequency table):

1. collapse the corpus to ``(word, count)`` once — all later passes run
   over the distinct-word table, which is vocabulary-sized, not
   corpus-sized (the standard trick that makes BPE training tractable:
   a 100 TB corpus has billions of tokens but a few million distinct
   words).
2. represent each word as an array of symbols (initially characters).
3. per merge step: explode adjacent symbol pairs weighted by word
   count → hash-aggregate → global argmax (count DESC, pair ASC — one
   1-row ``collect``, the per-iteration driver scalar every iterative
   distributed algorithm needs) → greedy left-to-right merge of that
   pair inside every word's symbol array (a codegen ``aggregate`` fold,
   no Python) → localCheckpoint to truncate the growing lineage.

Scale: each iteration is one explode + one aggregate over the
vocabulary table plus a map-only fold — linear in vocabulary size with
a pair-vocabulary-sized shuffle.  The merged-symbol table is the
model; words never leave the executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _merge_adjacent(symbols: Column, a: str, b: str, merged: str) -> Column:
    """Greedy left-to-right replacement of adjacent (a, b) with merged —
    the BPE merge rule — as a codegen ``aggregate`` fold over the symbol
    array.  Greediness falls out of the fold: once a merge consumes the
    left symbol, the merged token (≠ a) cannot chain into the next pair,
    exactly like the sequential reference implementation."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_freq_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt) over whitespace tokens — the one corpus-sized pass
    (single-split local inputs spread across cores first; no-op at real
    split counts)."""
    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    return (
        spread_small_input(docs).select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table (rank, left, right, merged, n) — deterministic: ties on pair
    frequency break lexicographically, so the learned vocabulary is a
    pure function of the corpus.

    The returned DataFrame is driver-built (n_merges rows — model-sized,
    not data-sized; the S8 caveat doesn't apply to a 10-row model)."""
    spark = docs.sparkSession
    vocab = word_freq_table(docs, text_col).select(
        F.split("w", "").alias("symbols"), "cnt"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple] = []
    for rank in range(n_merges):
        # single-symbol words carry no pairs — and sequence(1, 0) would
        # DESCEND ([1, 0]), not produce an empty array
        pairs = vocab.filter(F.size("symbols") >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("symbols") - 1),
                    lambda i: F.struct(
                        F.element_at("symbols", i).alias("a"),
                        F.element_at("symbols", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
            "cnt",
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, n = best[0].a, best[0].b, best[0].n
        merged = a + b
        merges.append((rank, a, b, merged, n))
        vocab = vocab.select(
            _merge_adjacent(F.col("symbols"), a, b, merged).alias("symbols"),
            "cnt",
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, n long"
    )


def apply_bpe(
    docs: DataFrame,
    merge_rows: list,
    text_col: str = "text",
    out_col: str = "symbols",
) -> DataFrame:
    """Tokenize with a trained merge table: chars, then each merge in
    rank order — map-only (the model is ``n_merges`` literals baked into
    the fold chain, the distributed analogue of broadcasting a
    tokenizer).  Empty words are filtered before the symbol stream
    (mirroring ``word_freq_table``): a blank/whitespace-only doc yields
    ZERO symbols, not a stray ['' , sentinel] pair — Spark's
    ``split('', '\\s+')`` returns ``['']``, which would otherwise leak
    a phantom word the training side never saw."""
    col = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    sym = F.flatten(
        F.transform(col, lambda w: F.concat(F.split(w, ""), F.array(F.lit(" "))))
    )
    for r in sorted(merge_rows, key=lambda r: r["rank"]):
        sym = _merge_adjacent(sym, r["left"], r["right"], r["merged"])
    return docs.withColumn(out_col, sym)


def pair_count_partials(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-Arrow-batch partial counts of adjacent in-word character
    pairs — ``(pair, n)`` rows the caller aggregates with one
    histogram-sized groupBy.

    Why a kernel: the expression form explodes one row per character
    position via an interpreted ``transform(sequence, substr)`` HOF —
    per-element boxing over every char of the corpus (53.6 s at sf10,
    r14 sweep).  Here each batch joins its whitespace tokens with a
    single space and counts byte bigrams with two numpy ops: pairs
    containing the separator byte are exactly the cross-word and
    length-1-word cases, so masking them reproduces the in-word pair
    semantics (parity with the expression form pinned whole-table in
    tests).  ASCII-corpus precedent as the other char-gram kernels
    (byte == char under utf-8 for this fixture; the winnowing /
    text_fingerprint discipline)."""
    import numpy as np

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    def run(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            joined = " ".join(
                " ".join((t or "").split()) for t in pdf[text_col]
            )
            enc = joined.encode("utf-8")
            if len(joined) < 2:
                continue
            if len(enc) == len(joined):
                # pure-ASCII batch: byte == code point, uint8 bigrams
                b = np.frombuffer(enc, dtype=np.uint8)
                base = np.int64(256)
            else:
                # Non-ASCII guard (r14 advice): UTF-8 byte bigrams on
                # multi-byte chars would emit Latin-1 byte-pair labels
                # that silently diverge from the character-pair
                # expression twin.  A fixed-width UTF-32 view keeps the
                # same vectorized mask/unique path over CODE POINTS.
                b = np.frombuffer(
                    joined.encode("utf-32-le"), dtype=np.uint32
                )
                base = np.int64(0x110000)
            sep = b.dtype.type(32)
            mask = (b[:-1] != sep) & (b[1:] != sep)
            codes = (
                b[:-1][mask].astype(np.int64) * base
                + b[1:][mask].astype(np.int64)
            )
            uniq, cnt = np.unique(codes, return_counts=True)
            c = Counter()
            for u, n in zip(uniq.tolist(), cnt.tolist()):
                c[chr(u // base) + chr(u % base)] += n
            yield pd.DataFrame(
                {"pair": list(c.keys()), "n": list(c.values())}
            )

    return spread_small_input(docs.select(text_col)).mapInPandas(
        run, "pair string, n long"
    )


def apply_bpe_counts(
    docs: DataFrame,
    merge_rows: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token count under a trained merge table — the
    map-only Arrow kernel form of ``size(apply_bpe(...).symbols)``.

    Why a kernel: :func:`_merge_adjacent`'s aggregate fold rebuilds the
    accumulator array PER SYMBOL (``concat(slice(acc), …)``) and is
    interpreted — O(L²) boxed copies per document per merge, ×8 chained
    merges.  The r14 sf10 sweep caught ``tokenizer_apply_bpe_counts``
    timing out at sf0.1 ALREADY (>90 s for 5 k docs); this kernel is
    the standard linear leftmost-greedy pair scan (one list pass per
    merge).  The two are formally equivalent: in the fold, a merged
    token can never re-merge within the same rule's pass (merged =
    a||b ≠ a for non-empty b), which is exactly the skip-2 scan's
    non-overlap rule — equivalence pinned per merge table in
    tests/test_training_tier.py.  Tokenization parity with the
    expression form follows the quality_counts/udtf precedent (ASCII
    fixture; empty words filtered; empty doc → zero symbols)."""
    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    merges = [
        (r["left"], r["right"], r["merged"])
        for r in sorted(merge_rows, key=lambda r: r["rank"])
    ]
    id_type = docs.schema[id_col].dataType.simpleString()

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, ns = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                syms: list[str] = []
                for w in (text or "").strip().split():
                    syms.extend(w)
                    syms.append(" ")
                for a, b, m in merges:
                    syms = _greedy_merge_scan(syms, a, b, m)
                ids.append(did)
                ns.append(len(syms))
            yield pd.DataFrame({"id": ids, "n_tokens": ns})

    return spread_small_input(docs.select(id_col, text_col)).mapInPandas(
        run, f"id {id_type}, n_tokens long"
    )


def _greedy_merge_scan(syms: list, a: str, b: str, m: str) -> list:
    """One BPE merge pass as the linear leftmost-greedy skip-2 scan —
    provably equivalent to :func:`_merge_adjacent`'s fold (a merged
    token ``a||b`` can never equal ``a`` for non-empty ``b``, so merged
    output never re-merges within the same rule's pass in EITHER form);
    the equivalence is property-tested against a literal fold reference
    over adversarial symbol streams in tests/test_kernel_properties.py."""
    out: list = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(m)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out

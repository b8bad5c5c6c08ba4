"""Corpus-curation operators a training-data pipeline runs between dedup
and tokenization (SURVEY.md §2.7 tier; no reference counterpart — the
reference's data is unique keyed telemetry, trip_processor.py:54).

- **Train/eval contamination check** — the decontamination step: for
  every eval document, the fraction of its word shingles that also occur
  anywhere in the train split.  Candidate generation is an equi-join on
  32-byte shingle hashes (never the shingle text), the same
  inverted-index shape as operators/dedup.py — linear shuffle, no
  all-pairs.
- **Sequence packing** — the concat-and-chop batching step: documents
  are laid out in a deterministic order per stratum, token offsets are
  computed with one window cumsum, and each document is assigned to the
  fixed-token-budget bin its start offset lands in (GPT-style contiguous
  packing: a document may straddle a boundary; its bin is where it
  starts).

Both are pure DataFrame plans with exact-integer arithmetic, so the
DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_trip_processing_project_spark.functions import text as TX
from real_time_trip_processing_project_spark.operators import dedup as DD

#: Token budget per packed bin (whitespace tokens at fixture scale).
PACK_BUDGET = 512


def lang_marker_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One-pass Arrow kernel for the language-ID inputs: per document,
    one INTEGER marker-occurrence total per language in
    :data:`TX.LANG_MARKERS` (columns ``s_<lang>``), from a single
    tokenize + Counter pass.

    Why a kernel: the expression form runs one split + interpreted
    HOF-filter PER MARKER (16 passes over every text), and the argmax
    CASE chain re-evaluates each score expression per comparison (HOFs
    get no CSE) — the r14 sf10 sweep's worst text constant (4.5 s at
    sf0.1, >240 s at sf10).  The argmax itself stays a Spark expression
    over these plain int columns (:func:`TX.lang_id_from_scores`), so
    the query's output logic — and the DuckDB oracle — are unchanged.
    Counts parity pinned in tests/test_training_tier.py.

    Tokenization parity: same explicit-ASCII delimiter class as the
    expression form (``TX.WORD_SPLIT_PATTERN``), see
    :func:`quality_counts`.

    ``carry_cols`` — additional input columns copied through unchanged
    (e.g. the declared ``lang``), so consumers need no join-back."""
    import re as _re

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    id_type = docs.schema[id_col].dataType.simpleString()
    carry_types = {
        c: docs.schema[c].dataType.simpleString() for c in carry_cols
    }
    langs = [(lang, tuple(markers)) for lang, markers in TX.LANG_MARKERS]
    word_pat = TX.WORD_SPLIT_PATTERN

    def run(batches):
        from collections import Counter

        import pandas as pd

        word_re = _re.compile(word_pat, _re.ASCII)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out: dict[str, list] = {"id": list(pdf[id_col])}
            for c in carry_cols:
                out[c] = list(pdf[c])
            for lang, _ in langs:
                out[f"s_{lang}"] = []
            for text in pdf[text_col]:
                c = Counter(word_re.split(text or ""))
                for lang, markers in langs:
                    out[f"s_{lang}"].append(
                        sum(c.get(w, 0) for w in markers)
                    )
            yield pd.DataFrame(out)

    fields = ", ".join(
        [f"{c} {t}" for c, t in carry_types.items()]
        + [f"s_{lang} long" for lang, _ in langs]
    )
    cols = [id_col, *carry_cols, text_col]
    return spread_small_input(docs.select(*cols)).mapInPandas(
        run, f"id {id_type}, {fields}"
    )


def script_profile_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-class counts (alpha / digit / space /
    other / total) as one numpy ``bincount`` per document — the Arrow
    kernel form of text_script_profile's four full-text
    ``regexp_replace`` length-diff passes (31.6 s at sf10, r14 sweep).
    ASCII-corpus byte==char precedent as the other char kernels;
    ``n_other`` is the exact complement (len − alpha − digit − space),
    matching the ``[a-zA-Z0-9 ]`` deletion class.  Parity pinned
    whole-table in tests/test_training_tier.py."""
    import numpy as np

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    id_type = docs.schema[id_col].dataType.simpleString()

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {
                "id": [], "n_alpha": [], "n_digit": [], "n_space": [],
                "n_other": [], "n_chars_total": [],
            }
            for did, text in zip(pdf[id_col], pdf[text_col]):
                t = text or ""
                b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
                if len(b) == len(t):
                    # pure-ASCII doc: byte == code point, one bincount
                    cnt = np.bincount(b, minlength=256)
                    n_alpha = int(cnt[65:91].sum() + cnt[97:123].sum())
                    n_digit = int(cnt[48:58].sum())
                    n_space = int(cnt[32])
                else:
                    # Non-ASCII guard (r14 advice): UTF-8 continuation
                    # bytes would inflate n_other relative to the
                    # regexp expression twin, a SILENT drift.  Count
                    # CODE POINTS instead via a fixed-width UTF-32
                    # view — same vectorized comparisons, exact on any
                    # BMP+ text (the expression twin's character
                    # classes are ASCII-only, so only the totals
                    # change).  Exact for BMP text; astral code points
                    # count 1 here vs 2 UTF-16 units in a JVM twin —
                    # the honest code-point semantics.
                    cp = np.frombuffer(
                        t.encode("utf-32-le"), dtype=np.uint32
                    )
                    n_alpha = int(
                        (((cp >= 65) & (cp < 91))
                         | ((cp >= 97) & (cp < 123))).sum()
                    )
                    n_digit = int(((cp >= 48) & (cp < 58)).sum())
                    n_space = int((cp == 32).sum())
                out["id"].append(did)
                out["n_alpha"].append(n_alpha)
                out["n_digit"].append(n_digit)
                out["n_space"].append(n_space)
                out["n_other"].append(len(t) - n_alpha - n_digit - n_space)
                out["n_chars_total"].append(len(t))
            yield pd.DataFrame(out)

    return spread_small_input(docs.select(id_col, text_col)).mapInPandas(
        run,
        f"id {id_type}, n_alpha long, n_digit long, n_space long, "
        "n_other long, n_chars_total long",
    )


def quality_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-pass Arrow kernel for the quality-gate inputs: per document,
    ``(h = md5(text), id, lang, n_chars, n_tokens, stop, punct)`` — the
    exact INTEGER counts :func:`TX.quality_exprs` computes, plus the
    dedup key, in a single map-only scan.

    Why a kernel: the expression form's stopword count is an
    interpreted array-HOF filter over every token and its punct count
    is a full-text regexp_replace — together 36 s of the 77 s
    curation_corpus_pipeline at sf10 (r14 profile; the r6
    interpreted-HOF finding again).  Only integer counts cross the
    Arrow boundary; every float op (round-6 ratios, the CASE-sum score)
    stays in Spark expressions via
    :func:`TX.quality_score_from_counts`, so results are bit-identical
    to the expression form — parity pinned on the fixture in
    tests/test_training_tier.py.

    Tokenization parity (ASCII corpus, like the udtf_tokenize
    precedent): ``re`` patterns compiled with ``re.ASCII`` so ``\\s``
    matches Java regex semantics; ``n_chars = len(text)`` (code points)
    equals Java's UTF-16 length on BMP text; md5 runs over the same
    UTF-8 bytes in both engines."""
    import hashlib
    import re as _re

    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    id_type = docs.schema[id_col].dataType.simpleString()
    stop_set = frozenset(TX.STOPWORDS)
    word_pat = TX.WORD_SPLIT_PATTERN
    punct_pat = TX.PUNCT_PATTERN

    def run(batches):
        import pandas as pd

        word_re = _re.compile(word_pat, _re.ASCII)
        punct_re = _re.compile(punct_pat, _re.ASCII)
        ws_re = _re.compile(r"\s+", _re.ASCII)
        alpha_re = _re.compile(r"[A-Za-z]")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {
                "h": [], "id": [], "lang": [],
                "n_chars": [], "n_tokens": [], "stop": [], "punct": [],
                "alpha": [],
            }
            for did, lang, text in zip(
                pdf[id_col], pdf["lang"], pdf[text_col]
            ):
                t = text or ""
                out["h"].append(hashlib.md5(t.encode("utf-8")).hexdigest())
                out["id"].append(did)
                out["lang"].append(lang)
                out["n_chars"].append(len(t))
                # split(trim(t), '\s+'): [''] (size 1) for empty text —
                # re.split reproduces that, str.split() would not
                out["n_tokens"].append(len(ws_re.split(t.strip())))
                out["stop"].append(
                    sum(1 for w in word_re.split(t) if w in stop_set)
                )
                out["punct"].append(len(punct_re.findall(t)))
                out["alpha"].append(len(alpha_re.findall(t)))
            yield pd.DataFrame(out)

    return spread_small_input(
        docs.select(id_col, "lang", text_col)
    ).mapInPandas(
        run,
        f"h string, id {id_type}, lang string, n_chars long, "
        "n_tokens long, stop long, punct long, alpha long",
    )

#: Bloom filter shape for the sketch-based contamination probe: 2^20
#: bits, 4 hash functions — each position is 8 hex nibbles (32 bits) of
#: ONE md5 per shingle, reduced mod BLOOM_BITS (4 groups × 8 nibbles =
#: the whole digest; one digest per shingle, not one per hash).  At the
#: sf0.1 train vocabulary (~10^6 shingles) the fill ratio is ~0.98 —
#: a production deployment sizes bits ≈ 1.44·n·k for its target FP
#: rate; tests use a deliberately small ``bits`` to force observable
#: false positives.
BLOOM_BITS = 1 << 20
BLOOM_K = 4

_HEXD = "0123456789abcdef"

#: Place values of the 8 nibbles in one position group (16^7 … 16^0).
_NIB_W = [16 ** (7 - i) for i in range(8)]


def _bloom_pos(hash_col, group: int, bits: int):
    """Bit position 0..bits−1 from nibble group ``group`` (8 hex chars
    starting at 8·group+1) of an md5 column — engine-portable (the
    DuckDB twin computes identical strpos arithmetic, the CMS
    discipline).  The 8-nibble value is < 2^32, so the modulo input
    never overflows.  Spark computes the group value with one ``conv``
    (the r7 ``_h32`` discipline — same definition as the twin's
    weighted-nibble sum, one base conversion instead of 8
    instr/substring scans)."""
    return (
        F.conv(F.substring(hash_col, 8 * group + 1, 8), 16, 10)
        .cast("long")
        % F.lit(bits)
    )


def bloom_pos_sql(h: str, group: int, bits: int) -> str:
    """DuckDB twin of :func:`_bloom_pos` over a hex-string expression."""
    terms = " + ".join(
        f"(strpos('{_HEXD}', substr({h}, {8 * group + 1 + i}, 1)) - 1)"
        f" * {w}"
        for i, w in enumerate(_NIB_W)
    )
    return f"(({terms}) % {bits})"


def _hex_prefix16(hash_col):
    """16-bit integer value of the first 4 hex chars of an md5 column —
    the seedless uniform u16 every deterministic accept/reject sampler
    in the catalogue draws from (split_expr compares the same prefix as
    a string; this is the arithmetic form for threshold-per-row
    acceptance, e.g. the DSIR resampler's log-space test)."""
    return F.conv(F.substring(hash_col, 1, 4), 16, 10).cast("long")


def hex_prefix16_sql(h: str) -> str:
    """DuckDB twin of :func:`_hex_prefix16` (strpos-nibble arithmetic,
    the bloom_pos_sql discipline)."""
    terms = " + ".join(
        f"(strpos('{_HEXD}', substr({h}, {1 + i}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"({terms})"


def build_bloom_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_K,
) -> None:
    """Persist a Bloom filter of a corpus's shingle set: the distinct
    set-position relation as parquet plus a 1-row meta table pinning
    (bits, k_hashes) — the build-once/probe-many sibling of
    ``build_ivf_index``/``build_lsh_index`` for membership sketches.
    A decontamination service builds this from the TRAIN corpus once
    per snapshot; every later eval audit broadcasts ~bits rows instead
    of re-aggregating the train vocabulary (the whole point of the
    sketch at 100 TB: the train side is read zero times per audit)."""
    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    spark = docs.sparkSession
    sh = spread_small_input(docs).select(
        DD.word_shingles(F.col(text_col)).alias("shingles")
    )
    bits_rel = _bloom_positions(
        sh.select(F.explode("shingles").alias("s")).distinct(),
        bits,
        k_hashes,
    ).select("pos").distinct()
    bits_rel.write.mode("overwrite").parquet(f"{path}/bits")
    spark.createDataFrame(
        [(bits, k_hashes)], "bits long, k_hashes int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def bloom_probe_indexed(
    spark,
    path: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Probe documents against a persisted Bloom index
    (:func:`build_bloom_index`): per doc, distinct-shingle total and
    the count of shingles whose ``k`` positions are all set.  Same
    output contract as :func:`bloom_contamination`; the probe never
    touches the corpus the index was built from.  Parity is tested:
    build-then-probe equals the inline sketch on the same split."""
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    saved_bits = F.broadcast(spark.read.parquet(f"{path}/bits"))
    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    ev = (
        spread_small_input(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            DD.word_shingles(F.col(text_col)).alias("shingles"),
        )
        .select(  # bind the shingle array once, not once per consumer
            "doc_id",
            F.size("shingles").cast("long").alias("n_shingles"),
            F.explode("shingles").alias("s"),
        )
    )
    hit_vocab = (
        _bloom_positions(
            ev.select("s").distinct(), int(meta.bits), int(meta.k_hashes)
        )
        .join(saved_bits, "pos", "left_semi")
        .groupBy("s")
        .agg(F.count("*").alias("n_set"))
        .filter(F.col("n_set") == int(meta.k_hashes))
        .select("s", F.lit(1).alias("hit"))
    )
    return (
        ev.join(F.broadcast(hit_vocab), "s", "left")
        .groupBy("doc_id", "n_shingles")
        .agg(
            F.coalesce(F.sum("hit"), F.lit(0))
            .cast("long")
            .alias("n_bloom_hits")
        )
        .select("doc_id", "n_shingles", "n_bloom_hits")
    )


def _bloom_positions(df: DataFrame, bits: int, k_hashes: int) -> DataFrame:
    """distinct shingles → one md5 → k position rows (shared by the
    inline sketch, the index build, and the indexed probe)."""
    h = df.withColumn("h", F.md5("s"))
    return h.select(
        *df.columns,
        F.explode(
            F.array(
                *[_bloom_pos(F.col("h"), g, bits) for g in range(k_hashes)]
            )
        ).alias("pos"),
    )


def bloom_contamination(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = BLOOM_BITS,
    k_hashes: int = BLOOM_K,
) -> DataFrame:
    """Sketch-based contamination probe: a Bloom filter of the train
    split's shingle set, probed by every eval doc's distinct shingles.

    This is the structure the exact semi-join (``contamination_check``)
    cannot be at extreme scale: the train side collapses to a FIXED
    ``bits``-wide bitmap (2^20 bits = 128 KB; here a ≤``bits``-row
    distinct position relation) built in ONE aggregation pass, then
    BROADCAST — probing never shuffles the train vocabulary.  Both
    sides deduplicate to their shingle VOCABULARY before hashing (the
    Zipf win: positions don't depend on multiplicity, so the md5 work
    is per distinct shingle, not per occurrence) and each shingle is
    digested ONCE — the ``k_hashes`` positions are disjoint 8-nibble
    groups of a single md5.  A shingle "hits" iff all its positions are
    set; Bloom filters have no false negatives, so per doc
    ``n_bloom_hits ≥`` the exact contaminated count (asserted in tests)
    with the false-positive excess set by the fill ratio.

    Everything is md5-derived and integer, so the DuckDB oracle
    reproduces the filter EXACTLY — same bits, same probes, same counts
    (the heavy_hitters_cms discipline: an approximate structure under a
    full hash-parity gate)."""
    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    # shingling is the CPU-dominant step; spread a single-split local
    # fixture across cores (no-op at real input-split counts).
    # Checkpointed: the train-bits branch and the eval-probe branch
    # both consume it — uncheckpointed, the whole corpus shingles twice
    # (the minhash ``sh`` discipline).
    sh = spread_small_input(docs).select(
        F.col(id_col).alias("doc_id"),
        split_expr(id_col).alias("split"),
        DD.word_shingles(F.col(text_col)).alias("shingles"),
    ).localCheckpoint(eager=False)

    # NOTE: no ``.distinct()`` on the positions — the consumer is a
    # left-SEMI join, which is duplicate-insensitive, so deduping the
    # ~k×vocab position stream only bought a smaller broadcast (~10%)
    # at the price of a full extra shuffle.  (The PERSISTED index build
    # keeps its distinct: there it shrinks what's written to disk.)
    train_bits = _bloom_positions(
        sh.filter(F.col("split") == "train")
        .select(F.explode("shingles").alias("s"))
        .distinct(),
        bits,
        k_hashes,
    ).select("pos")
    # one shingling pass over the (small) eval split carries BOTH the
    # per-doc total and the postings — the hit flag joins back as a
    # broadcast left join so totals and hit counts come out of a single
    # aggregation, not three re-shingling branches
    ev = sh.filter(F.col("split") == "eval").select(
        "doc_id",
        F.size("shingles").cast("long").alias("n_shingles"),
        F.explode("shingles").alias("s"),
    )
    hit_vocab = (
        _bloom_positions(ev.select("s").distinct(), bits, k_hashes)
        .join(F.broadcast(train_bits), "pos", "left_semi")
        .groupBy("s")
        .agg(F.count("*").alias("n_set"))
        .filter(F.col("n_set") == k_hashes)
        .select("s", F.lit(1).alias("hit"))
    )
    return (
        ev.join(F.broadcast(hit_vocab), "s", "left")
        .groupBy("doc_id", "n_shingles")
        .agg(
            F.coalesce(F.sum("hit"), F.lit(0))
            .cast("long")
            .alias("n_bloom_hits")
        )
        .select("doc_id", "n_shingles", "n_bloom_hits")
    )


def split_expr(id_col="doc_id", frac_hex: str = "cccc"):
    """Deterministic md5-prefix train/eval split (shared with the
    ``split_train_eval`` query — seedless, engine-portable)."""
    return F.when(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4) < frac_hex,
        "train",
    ).otherwise("eval")


def contamination_check(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-eval-document train-set contamination: the fraction of the
    doc's word-shingle occurrences that appear in ANY train document.

    Plan shape (the 100 TB-safe inverted-index join):

    1. shingle each doc once (codegen expression, see
       :func:`operators.dedup.word_shingles`);
    2. the train shingle *vocabulary* — explode → md5 → distinct — is
       one shuffle with map-side partial dedup, keyed on the 32-byte
       hash (the shingle text never shuffles);
    3. eval postings left-semi-join the vocabulary on the hash, then two
       per-doc counts.

    At 100 TB the train vocabulary is the big side; the semi-join is a
    plain shuffled hash join on a uniform 32 B key — and because the
    probe is a semi-join, Spark builds a bloom/hash of the smaller side
    per partition.  No step is quadratic in documents.
    """
    from real_time_trip_processing_project_spark.sources.readers import (
        spread_small_input,
    )

    # checkpointed: consumed by the train-vocab branch and (twice,
    # via ev) the eval side — uncheckpointed the corpus shingles 3x
    sh = spread_small_input(docs).select(
        F.col(id_col).alias("doc_id"),
        split_expr(id_col).alias("split"),
        DD.word_shingles(F.col(text_col)).alias("shingles"),
    ).localCheckpoint(eager=False)
    train_vocab = (
        sh.filter(F.col("split") == "train")
        .select(F.explode("shingles").alias("s"))
        .select(F.md5("s").alias("h"))
        .distinct()
    )
    ev = sh.filter(F.col("split") == "eval").select(
        "doc_id", F.explode("shingles").alias("s")
    ).select("doc_id", F.md5("s").alias("h"))
    hits = ev.join(train_vocab, "h", "left_semi").groupBy("doc_id").agg(
        F.count("*").alias("n_contaminated")
    )
    totals = ev.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return (
        totals.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        )
        # fixed-point parts-per-million, not a rounded double: the r4/r5
        # funnel_conversion red rows hit exactly the derived-ratio-double
        # shape while the engine was bit-exact — integerize the class
        # away (pure integer floor division on both sides)
        .withColumn(
            "contamination_ppm",
            F.expr("(1000000 * n_contaminated) div n_shingles"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_hex_chars: int = 1,
) -> DataFrame:
    """Concat-and-chop sequence packing: per-(stratum, shard)
    deterministic doc order → token start offsets via window cumsum →
    bin = start ÷ budget.  Returns one row per (stratum, shard, bin)
    with doc and token counts.

    The shard key is the first ``shard_hex_chars`` of ``md5(doc_id)`` —
    16ᶜ uniform shards per stratum, so a 90%-one-language corpus no
    longer serializes through a single window partition: partition size
    is bounded at ~|stratum|/16ᶜ regardless of language skew (raise to
    2-3 chars → 256/4096 shards at cluster scale).  md5 keeps the shard
    assignment engine-portable (DuckDB computes the identical key), and
    it is also the window's order prefix, so shard membership and
    intra-shard order come from one hash evaluation.

    Scale: ONE window shuffle, partitioned by (stratum, shard) —
    packing is embarrassingly parallel across shards.  All arithmetic is
    exact integers; the deterministic md5 order makes re-runs and the
    oracle reproduce identical bins.
    """
    md5 = F.md5(F.col(id_col).cast("string"))
    toks = docs.select(
        F.col(stratum_col).alias("stratum"),
        F.substring(md5, 1, shard_hex_chars).alias("shard"),
        F.col(id_col).alias("doc_id"),
        TX.ws_token_count_expr(text_col).alias("n_tok"),
    )
    w = (
        Window.partitionBy("stratum", "shard")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = toks.withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget).cast(
            "long"
        ),
    )
    return placed.groupBy("stratum", "shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("bin_tokens"),
        F.min("doc_id").alias("min_doc_id"),
    )

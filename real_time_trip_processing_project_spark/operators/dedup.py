"""Deduplication operators (training-data pipeline tier, SURVEY.md §2.7).

The reference has no dedup (its `trip_id` keys are unique by construction
— FIXTURES.md §A1); this module supplies the dedup family a 100 TB
training-data pipeline needs, each as a declarative DataFrame plan:

- **exact** — hash-groupBy on (normalized) content; one shuffle on the
  content hash, map-side partial aggregation shrinks it first.
- **n-gram Jaccard** (exact near-dup) — inverted-index self-join on word
  shingles: only pairs sharing ≥1 shingle are ever materialized, so the
  complexity is Σ(posting-list²) not N².  This is the standard
  set-similarity-join shape; at 100 TB add prefix filtering (drop the
  most frequent shingles from the index — they can't push a pair over
  the threshold alone) which is noted but not applied at test SF.
- **MinHash + LSH** — per-doc signature (k permutations via seeded
  xxhash64), banded into buckets; candidate pairs come from bucket
  collisions only (linear shuffle), then exact-Jaccard verification.
  Probability a pair with Jaccard j collides: 1-(1-j^r)^b.
- **SimHash** — 32-bit sign-aggregated token-hash fingerprint; near-dups
  land within small Hamming distance.  Bits are derived from md5 hex
  nibbles so the DuckDB oracle reproduces them exactly.
- **embedding cosine** — see operators/similarity.py (pair variant
  registered in plans/training.py).

All hot paths are JVM built-ins (split/explode/xxhash64/md5/array ops);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Word-shingle width for near-dup detection.
SHINGLE_W = 3

#: MinHash signature size and LSH banding (16 bands × 4 rows).
MINHASH_PERMS = 64
LSH_BANDS = 16
LSH_ROWS = MINHASH_PERMS // LSH_BANDS


def word_shingles(text_col, w: int = SHINGLE_W):
    """Distinct word w-shingles of a text column as array<string>.

    Pure codegen expression: split → sequence → transform → array_join →
    array_distinct.  Matches the DuckDB oracle's list comprehension.
    """
    toks = F.split(F.trim(text_col), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - w, F.lit(0))),
            lambda i: F.array_join(F.slice(toks, i + 1, w), " "),
        )
    )


def shingled_docs(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingles, n_shingles) per document."""
    return docs.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col)).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles").cast("long"))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: canonical (min-id) representative per distinct text.

    GroupBy on md5(text) — the shuffle key is the 32-char hash, not the
    document body, so shuffle volume is O(rows · 32B) regardless of doc
    size.  At 100 TB this is the cheapest possible exact dedup: one
    shuffle, map-side partial min/count.
    """
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("canonical_id"),
        F.count("*").alias("n_copies"),
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via inverted-index self-join.

    Plan: explode distinct shingles → self-equi-join on shingle (only
    co-occurring pairs appear) → count common shingles per pair → join
    per-doc shingle counts → Jaccard = common / (|A| + |B| - common).

    Scale: the join key is the shingle string; posting lists are short
    for natural text.  At 100 TB, prefix filtering (drop shingles with
    document frequency > N·(1-t)) bounds the worst-case posting list;
    AQE's skew-join splitting handles residual hot shingles.
    """
    sh = shingled_docs(docs, id_col, text_col)
    posting = sh.select("id", "n_sh", F.explode("shingles").alias("shingle"))
    a = posting.alias("a")
    b = posting.alias("b")
    common = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("common"))
    )
    jac = F.col("common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("common")
    ).cast("double")
    return (
        common.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sig: array<long>[MINHASH_PERMS]) — per-permutation min of
    seeded xxhash64 over the doc's shingles.

    The "permutations" are xxhash64 with a per-permutation salt prefix —
    deterministic across runs/executors, no RNG state to ship.  Computed
    per-row inside codegen: no explode, no shuffle.
    """
    sh = shingled_docs(docs, id_col, text_col)
    sigs = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("shingles"),
                    lambda s, i=i: F.xxhash64(F.concat(F.lit(f"p{i}|"), s)),
                )
            )
            for i in range(MINHASH_PERMS)
        ]
    )
    return sh.select("id", "n_sh", sigs.alias("sig"), F.col("shingles"))


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MinHash banding + exact-Jaccard verification.

    1. signature → LSH_BANDS band keys (xxhash64 of the band's slice).
    2. explode band keys → groupBy (band, key) buckets → pairs within a
       bucket (dropDuplicates on the pair — a pair can collide in
       several bands).
    3. verify candidates with exact Jaccard on the (carried) shingle
       sets and filter ≥ threshold.

    Scale: candidates ≪ N²; the bucket join shuffles only colliding ids.
    Verification re-computes intersection via array ops on the two
    carried shingle arrays — no second pass over the corpus.  Recall for
    Jaccard=0.9 with 16×4 banding: 1-(1-0.9⁴)¹⁶ ≈ 1.0000 (tested against
    the exact operator in tests/test_training_tier.py).
    """
    sigs = minhash_signatures(docs, id_col, text_col)
    bands = sigs.select(
        "id",
        "n_sh",
        "shingles",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            *[
                                F.col("sig")[i].cast("string")
                                for i in range(b * LSH_ROWS, (b + 1) * LSH_ROWS)
                            ],
                        )
                    )
                    for b in range(LSH_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    common = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    jac = common.cast("double") / (
        F.col("n_a") + F.col("n_b") - common
    ).cast("double")
    return (
        cand.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash: bigint) 32-bit SimHash over distinct ws-tokens.

    Explode distinct tokens → md5 per token → 32 ±1 bit votes → groupBy
    doc summing votes → sign-recombine.  One shuffle on the doc id; the
    32 sums travel as map-side partials.  Bits come from md5 hex nibbles
    (functions/text.py) so the DuckDB oracle is bit-identical.
    """
    from real_time_trip_processing_project_spark.functions import text as TX

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
        ).alias("tok"),
    ).withColumn("h", F.md5("tok"))
    bit_votes = TX.simhash_bit_exprs(F.col("h"))
    sums = toks.groupBy("id").agg(
        *[F.sum(v).alias(f"b{i}") for i, v in enumerate(bit_votes)]
    )
    return sums.select(
        "id",
        TX.simhash_from_bit_sums(
            [F.col(f"b{i}") for i in range(len(bit_votes))]
        ).alias("simhash"),
    )

"""Karp–Rabin polynomial gram hashing — engine-portable, integer-only.

Replaces the md5-per-position shingle hashing the winnowing/fingerprint
tier shipped through round 5 (the bench's top cost: md5 allocates a
32-hex string per gram position and runs a full digest per call).  Here a
k-gram's hash is the classic Rabin polynomial

    H(i) = ( Σ_{j=0}^{k-1}  code(i+j) · B^{k-1-j} )  mod M

computed as an UNROLLED k-term multiply–accumulate over a per-document
codepoint array: two map-only array transforms (codes, then hashes), all
inside whole-stage codegen — no digest calls, no string allocation.  The
unrolled form does the same O(1)-amortized work per position as the
sequential rolling recurrence (k fixed, pure integer MACs) but has no
loop-carried dependency, so it vectorizes; at crawl scale that constant
factor is the bill (VERDICT r5 §What's wrong #2).

Both engines evaluate the SAME polynomial from the SAME Python constants
(`KR_BASE`, `KR_MOD`, precomputed power literals), so the DuckDB oracle
is parity-by-construction — the property the r5 production note
(operators/dedup.py, commit b4187bf) thought required giving up the
oracle.  Codepoints come from Spark ``ascii`` / DuckDB ``unicode``, both
of which return the full Unicode codepoint of the first character
(fuzz-checked across engines in tests/test_text_parity_fuzz.py).

Overflow discipline (no HUGEINT, no wraparound):
- ``KR_MOD`` < 2^42 and codepoints < 2^21, so each pre-mod term
  ``code · B^j mod M`` is < 2^63 and each per-term-mod residue < 2^42;
- the k-term residue sum is < k · 2^42 < 2^47 for any k ≤ 2^16.
Collision space is ~2^42 per fingerprint; a 100 TB deployment wanting
md5-grade collision odds runs two independent (B, M) lanes and pairs
them — same shape, 2× the MACs, still ≫ cheaper than md5.
"""

from __future__ import annotations

#: Polynomial base: a prime larger than any Unicode codepoint (0x10FFFF),
#: so single-character grams are injective.
KR_BASE = 1_114_117

#: Modulus: the largest prime below 2^42 — the overflow sweet spot above.
KR_MOD = 4_398_046_511_093


def kr_pows(k: int) -> list[int]:
    """``[B^(k-1), ..., B, 1] mod M`` — weight of gram position j."""
    return [pow(KR_BASE, k - 1 - j, KR_MOD) for j in range(k)]


def codes_spark(text: str) -> str:
    """Spark SQL: BIGINT codepoint array of ``text`` (map-only)."""
    return (
        f"transform(sequence(1, length({text})), "
        f"c -> CAST(ascii(substring({text}, c, 1)) AS BIGINT))"
    )


def codes_duckdb(text: str) -> str:
    """DuckDB SQL twin of :func:`codes_spark`."""
    return (
        f"list_transform(range(1, length({text}) + 1), "
        f"c -> CAST(unicode(substr({text}, CAST(c AS INT), 1)) AS BIGINT))"
    )


def _poly(subscript, k: int) -> str:
    """Σ (code · pow) % M with per-term mod; ``subscript(j)`` renders the
    engine-specific array access for gram offset j."""
    terms = " + ".join(
        f"({subscript(j)} * {p}) % {KR_MOD}" for j, p in enumerate(kr_pows(k))
    )
    return f"({terms}) % {KR_MOD}"


def gram_hashes_spark(cs: str, k: int) -> str:
    """Spark SQL: array of k-gram hashes over codepoint array column
    ``cs`` (empty when the doc is shorter than k)."""
    body = _poly(lambda j: f"element_at({cs}, i + {j})", k)
    return (
        f"CASE WHEN size({cs}) >= {k} THEN "
        f"transform(sequence(1, size({cs}) - {k - 1}), i -> {body}) "
        f"ELSE array() END"
    )


def gram_hashes_duckdb(cs: str, k: int) -> str:
    """DuckDB SQL twin of :func:`gram_hashes_spark`."""
    body = _poly(lambda j: f"{cs}[CAST(i + {j} AS INT)]", k)
    return (
        f"CASE WHEN len({cs}) >= {k} THEN "
        f"list_transform(range(1, len({cs}) - {k - 2}), i -> {body}) "
        f"ELSE [] END"
    )

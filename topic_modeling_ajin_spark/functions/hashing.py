"""Deterministic, engine-portable hashing primitives for near-dup detection.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are different functions,
so cross-engine-verifiable sketches (MinHash, SimHash, fingerprints) are
built on ``md5`` — identical hex output in every engine — with seed-salted
inputs. Lexicographic ``min`` over hex strings is a valid uniform MinHash
because the hex alphabet ordering is fixed.

This is the scale path for dedup: signatures are fixed-width per row,
banding turns the O(N²) pair problem into an equi-join on (band, key) —
a plain shuffle join Spark executes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array column."""
    idx = F.sequence(F.lit(0), F.size(tokens_col) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens_col) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def seeded_md5(col: Column, seed: int) -> Column:
    """Portable seeded hash: md5 over ``'<seed>|' + value`` → 32-char hex."""
    return F.md5(F.concat(F.lit(f"{seed}|"), col))


def minhash_signature(shingle_col: Column, num_hashes: int) -> Column:
    """MinHash signature: per seed, the lexicographic min of the seeded md5
    over the doc's shingles. Returns ``array<string>`` of length
    ``num_hashes`` (null-free only when the shingle set is non-empty)."""
    return F.array(
        *[
            F.array_min(F.transform(shingle_col, lambda s, i=i: seeded_md5(s, i)))
            for i in range(num_hashes)
        ]
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the cleaned text (portable exact-dup
    key; the scale substitute for comparing full bodies)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)

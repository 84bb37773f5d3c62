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


def token_ngrams(tokens_col: Column, n: int = 3) -> Column:
    """All word n-grams (with duplicates, in order) from a token array —
    the raw stream repetition metrics need; ``shingles`` is its distinct
    form."""
    idx = F.sequence(F.lit(0), F.size(tokens_col) - n)
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens_col) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array column."""
    return F.array_distinct(token_ngrams(tokens_col, n))


def seeded_md5(col: Column, seed: int) -> Column:
    """Portable seeded hash: md5 over ``'<seed>|' + value`` → 32-char hex."""
    return F.md5(F.concat(F.lit(f"{seed}|"), col))


# Affine-rehash MinHash family: one md5 per shingle gives a 32-bit base
# integer; the i-th hash is (A_i * base + B_i) mod P. P = 2^31-1 keeps
# A_i * base < 2^63 (no overflow, and DuckDB's checked int64 arithmetic
# accepts it), so both engines compute identical values.
MINHASH_P = 2_147_483_647
MINHASH_A = (73, 173, 281, 397, 521, 641, 769, 883, 1013, 1151, 1279, 1429)
MINHASH_B = (11, 29, 47, 67, 89, 109, 131, 157, 181, 211, 233, 263)


def md5_base32(col: Column) -> Column:
    """First 8 hex chars of md5 as a bigint in [0, 2^32)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


# DuckDB twin of md5_base32 (no conv(); nibble-parse 8 hex chars of md5
# of an arbitrary SQL expression). Kept next to the Spark expression so
# the two stay in lockstep.
def sql_md5_base32(expr: str) -> str:
    return " + ".join(
        f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )


SQL_MD5_BASE32 = sql_md5_base32("shingle")


def minhash_signature(shingle_col: Column, num_hashes: int) -> Column:
    """MinHash signature: per hash i, min over the doc's shingles of the
    affine rehash of the shingle's md5 base. Returns ``array<bigint>`` of
    length ``num_hashes``. One md5 per shingle total — the 12× md5 cost of
    the naive seeded variant collapses to integer math."""
    # One fold over the md5 bases with an elementwise running min. The
    # obvious alternative — num_hashes separate array_min(transform(bases))
    # subtrees — re-evaluates the md5 transform per hash: higher-order
    # functions are CodegenFallback, so no common-subexpression elimination
    # rescues it. This form hashes each shingle exactly once.
    a_arr = F.array(*[F.lit(a).cast("long") for a in MINHASH_A[:num_hashes]])
    b_arr = F.array(*[F.lit(b).cast("long") for b in MINHASH_B[:num_hashes]])
    init = F.array(*[F.lit(MINHASH_P).cast("long")] * num_hashes)  # > any residue
    return F.aggregate(
        F.transform(shingle_col, md5_base32),
        init,
        lambda acc, h: F.zip_with(
            acc,
            F.zip_with(a_arr, b_arr, lambda a, b: (a * h + b) % F.lit(MINHASH_P)),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_signatures(shingled, num_hashes: int):
    """MinHash signatures as an Arrow-batched kernel: ``shingled`` is a
    DataFrame (doc_id, shingles array<string>); returns (doc_id,
    sig array<long>) with values byte-identical to ``minhash_signature``
    (md5 base → affine rehash mod P — hashlib md5 == Spark md5 == DuckDB
    md5, so the DuckDB oracle is unchanged).

    Measured choice: the expression form folds with ``aggregate``/
    ``zip_with``, which are CodegenFallback — interpreted per shingle per
    hash. Here each batch hashes every shingle once in C (hashlib) and
    takes one vectorized (num_hashes × n) min per doc. Same distribution
    story — embarrassingly parallel map, no shuffle."""
    import hashlib

    import numpy as np
    import pandas as pd

    a = np.array(MINHASH_A[:num_hashes], dtype=np.int64)[:, None]
    b = np.array(MINHASH_B[:num_hashes], dtype=np.int64)[:, None]

    def kernel(batches):
        for pdf in batches:
            shl_list = pdf["shingles"]
            n_docs = len(shl_list)
            lens = np.fromiter(
                (len(s) for s in shl_list), dtype=np.int64, count=n_docs
            )
            total = int(lens.sum())
            # Same init sentinel as the expression form's fold: an empty
            # doc keeps the all-P signature instead of crashing np.min on
            # a zero-length axis.
            sigs = np.full((n_docs, num_hashes), MINHASH_P, dtype=np.int64)
            if total > 0:
                # one flat affine+min pass over the whole batch instead
                # of a small numpy call per document (the per-doc form
                # paid ~100 µs of allocation/dispatch per row); shingles
                # repeat heavily across near-dup docs, so the md5 base is
                # memoized per batch — identical value either way
                cache: dict = {}

                def base_of(s, _c=cache):
                    v = _c.get(s)
                    if v is None:
                        v = int(
                            hashlib.md5(s.encode("utf-8")).hexdigest()[:8],
                            16,
                        )
                        _c[s] = v
                    return v

                flat = np.fromiter(
                    (base_of(s) for shl in shl_list for s in shl),
                    dtype=np.int64,
                    count=total,
                )
                # a * base < 2^63: base < 2^32 and max(A) is small
                allsig = (a * flat + b) % MINHASH_P  # (num_hashes, total)
                starts = np.zeros(n_docs, dtype=np.int64)
                np.cumsum(lens[:-1], out=starts[1:])
                nz = np.nonzero(lens)[0]
                # reduceat segment i spans starts[nz][i] .. next index-1:
                # empty docs contribute zero length, so consecutive
                # non-empty starts bound exactly each doc's shingles
                sigs[nz] = np.minimum.reduceat(
                    allsig, starts[nz], axis=1
                ).T
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sig": list(sigs)}
            )

    return shingled.select("doc_id", "shingles").mapInPandas(
        kernel, schema="doc_id long, sig array<long>"
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the cleaned text (portable exact-dup
    key; the scale substitute for comparing full bodies)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def token_bit_hashes(tokens_col: Column) -> Column:
    """Per-token 16-bit hash values (int array) — the md5-nibble hash the
    SimHash kernel votes with (``text_analysis.q_simhash16``'s ``v``).
    Stage this ONCE (its own select) before fanning out into the 16
    per-bit folds of ``simhash_from_hashes``: higher-order functions are
    CodegenFallback, and inlining would re-pay the md5 per bit."""
    return F.transform(
        tokens_col,
        lambda w: F.conv(F.substring(F.md5(w), 1, 4), 16, 10).cast("int"),
    )


def simhash_from_hashes(hashes_col: Column, bits: int = 16) -> Column:
    """SimHash over a staged token-hash array as a row-local column
    expression — bit-identical to the ``q_simhash16`` aggregate kernel
    (same hash, same ±1 votes, same >0 threshold; integer arithmetic
    throughout, so there is nothing to round). The streaming ingest gate
    uses this to fingerprint a micro-batch with zero extra shuffles; the
    batch query keeps the explode+groupBy form, whose shuffle is the
    right shape when the corpus — not a micro-batch — is the input.

    An EMPTY hash array yields 0 (all votes tie to -1-free zero); callers
    that need token-less rows excluded (the batch twin emits no row for
    them) should wrap with ``when(size(toks) > 0, ...)``."""

    # bind b via a closure factory, NOT a default arg: PySpark's
    # _create_lambda dispatches HOF lambdas on their PARAMETER COUNT, so a
    # `_b=b` default would make this a 3-arg lambda and hand `_b` a Column
    def vote(b: int):
        return lambda acc, v: acc + F.when(
            F.shiftright(v, b).bitwiseAND(1) == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    out = F.lit(0)
    for b in range(bits):
        s = F.aggregate(hashes_col, F.lit(0), vote(b))
        out = out + F.when(s > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return out.cast("long")

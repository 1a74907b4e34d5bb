"""Expression-level helpers: vectors, text shingles, hashing.

Building blocks for the dedup / similarity / text operators. Two tiers:
pure pyspark.sql.functions expressions (JVM-side), and Arrow-batched
pandas UDFs over JVM-computed hash arrays for the bit-twiddling
reductions where Spark's interpreted higher-order lambdas measured
10-100× slower than vectorized numpy (see the section comment below).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "words",
    "shingles",
    "shingles_of_words",
    "dot_decimal",
    "norm_sq_decimal",
    "cosine_to_literal",
    "minhash_signature",
    "minhash_signature_np",
    "minhash_signature_of_word_hashes",
    "simhash64",
    "simhash64_of_hashes",
    "simhash64_np",
]

# Decimal type used to make float reductions order-independent (and thus
# bit-identical to any other engine computing the same formula): each
# elementwise double product is rounded to a fixed-scale decimal, and
# decimal addition is exact + commutative.
_DEC = "decimal(38,12)"


def words(text: Column | str, pattern: str = " ") -> Column:
    """Split text to a word array (JVM split)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, pattern)


def shingles(text: Column | str, k: int = 3, sep: str = " ") -> Column:
    """Distinct k-word shingles via sequence+transform — no UDF, no explode.

    transform(sequence(0, n-k), i -> words[i] || ' ' || ... words[i+k-1])

    PERF: pass a pre-materialized word-array COLUMN (via
    ``df.withColumn("ws", words(text))``) rather than a raw text column
    whenever this feeds further array expressions. Higher-order functions
    run interpreted (no whole-stage codegen, no common-subexpression
    elimination), so an inline ``split`` subtree re-executes for every
    element_at × every lambda that embeds this expression.
    """
    w = words(text, sep)
    return shingles_of_words(w, k)


def shingles_of_words(word_arr: Column, k: int = 3) -> Column:
    """k-shingles from an already-split word array column.

    Shape: zip k shifted slices of the word array and concat each struct
    — one interpreted-HOF lambda with k field reads per gram. The
    previous sequence+element_at form paid index arithmetic plus k
    array probes per gram and measured ~2x slower cold / 20% warm.

    Documents with fewer than k words yield an EMPTY array — the guard
    matters: a negative slice length (n<k) is an ANSI error, and the
    old descending-sequence form crashed on element_at(arr, 0)."""
    n = F.size(word_arr)
    zipped = F.arrays_zip(
        *[F.slice(word_arr, j + 1, F.greatest(n - F.lit(k) + 1, F.lit(0))) for j in range(k)]
    )
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(j)] for j in range(k)])
    )
    return F.when(n >= F.lit(k), F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def dot_decimal(a: Column, b: Column) -> Column:
    """Order-independent dot product of two float/double arrays.

    Products are computed in double (IEEE, deterministic), rounded to a
    fixed-scale decimal, then summed exactly. Result cast back to double.
    Matches any engine computing CAST(SUM(CAST(x*y AS DECIMAL)) AS DOUBLE).
    """
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    # decimal + decimal widens scale-losingly to decimal(38,11); re-cast so
    # the accumulator keeps the exact type `aggregate` requires
    return F.aggregate(
        prods, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
    ).cast("double")


def norm_sq_decimal(a: Column) -> Column:
    return dot_decimal(a, a)


def cosine_to_literal(vec_col: Column, query: list[float]) -> Column:
    """Cosine similarity of a vector column against a literal query vector.

    The query norm is computed with the same decimal-sum expression as
    the data-side norm (constant-folded by Catalyst) so results are
    bit-identical to any engine using the same formula — not a
    Python-accumulated float that would differ in rounding.
    """
    q = F.array(*[F.lit(float(x)).cast("double") for x in query])
    dot = dot_decimal(vec_col, q)
    qn = F.sqrt(norm_sq_decimal(q))
    return dot / (F.sqrt(norm_sq_decimal(vec_col)) * qn)


def minhash_signature(shingle_arr: Column, n_hashes: int = 64) -> Column:
    """MinHash signature: for each of n seeds, min over shingles of
    xxhash64(seed, shingle); empty shingle sets yield null elements.

    Shape notes (both measured): n_hashes separate array_min(transform)
    passes over a *materialized* shingle-array attribute. The
    one-pass alternative (aggregate with an array accumulator +
    zip_with(least)) is 10× slower — array accumulators copy/allocate
    per element. And passing an inline shingle subtree instead of an
    attribute re-evaluates it per lambda (100×+ slower) — callers
    materialize via withColumn first.

    NB: seed capture must be a closure factory, not a `lambda s, i=i:`
    default arg — pyspark counts lambda parameters to pick the
    (element) vs (element, index) form, so the extra arg would bind i
    to the array index column instead of the seed."""

    def hash_with_seed(seed: int):
        return lambda s: F.xxhash64(F.lit(seed), s)

    return F.array(
        *[
            F.array_min(F.transform(shingle_arr, hash_with_seed(i)))
            for i in range(n_hashes)
        ]
    )


def simhash64(word_arr: Column) -> Column:
    """64-bit SimHash of a word array, expression-only.

    bit i of result = sign of sum over words of (bit i of xxhash64(word)
    ? +1 : -1). Implemented as 64 aggregate expressions over the hashed
    array — wide but fully JVM-side.
    """
    return simhash64_of_hashes(F.transform(word_arr, lambda w: F.xxhash64(w)))


def simhash64_of_hashes(hashes: Column) -> Column:
    """SimHash from a pre-hashed long array. Callers should materialize
    ``hashes`` as its own column first: this expression references it 64
    times, and an inline subtree would re-hash every word 64×."""

    def vote_bit(bit: int):
        # closure factory: a `lambda acc, h, i=i:` default arg would make
        # pyspark treat this as a 3-arg lambda and fail arity resolution
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = []
    for i in range(64):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), vote_bit(i))
        bits.append(
            F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0)).cast("long")
            * F.lit(2 ** i).cast("long")
            if i < 63
            # avoid long overflow on the sign bit
            else F.when(vote > 0, F.lit(-(2 ** 63))).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


# ---------------------------------------------------------------------------
# Vectorized (Arrow/numpy) signature paths.
#
# The expression-only forms above are kept as the no-Python reference
# implementations, but Spark evaluates higher-order lambdas INTERPRETED
# (no whole-stage codegen), which measured ~160M eval() calls for a 5k-doc
# SimHash. The hot path therefore hashes JVM-side (xxhash64 — splittable,
# deterministic) and does the bit-twiddling reduction in an Arrow-batched
# pandas UDF over the hash array: one numpy matrix op per document batch.
# This is the fast Python boundary (vectorized, zero-copy), not the slow
# one (row-at-a-time pickling).
# ---------------------------------------------------------------------------

_MERSENNE61 = (1 << 61) - 1


def _minhash_coeffs(n_hashes: int):
    """Deterministic (a, b) pairs for the universal-hash family
    h_i(x) = (a_i * x + b_i) mod (2^61 - 1) — the classic MinHash
    construction (Broder 1997)."""
    rng = np.random.RandomState(42)
    a = rng.randint(1, _MERSENNE61, size=n_hashes, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE61, size=n_hashes, dtype=np.uint64)
    return a, b


import functools


@functools.lru_cache(maxsize=None)
def _minhash_np_udf(n_hashes: int):
    """Memoized pandas-UDF object for `minhash_signature_np` (r15): the
    UDF is a pure function of ``n_hashes``, and re-creating it per plan
    build re-pays cloudpickle serialization + JVM registration every
    query. One object per parameter set serves the whole session."""
    from pyspark.sql.types import ArrayType, LongType

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        a, b = _minhash_coeffs(n_hashes)

        def one(hs):
            if hs is None or len(hs) == 0:
                return None
            h = np.asarray(hs, dtype=np.int64).view(np.uint64) % _MERSENNE61
            m = (h[:, None] * a[None, :] + b[None, :]) % _MERSENNE61
            return m.min(axis=0).astype(np.int64).tolist()

        return hashes.map(one)

    return _sig


def minhash_signature_np(hash_arr: Column, n_hashes: int = 64) -> Column:
    """MinHash signature from a pre-hashed (xxhash64) shingle array.

    Per doc: sig[i] = min over shingles of (a_i*h + b_i) mod 2^61-1,
    computed as one (n_shingles × n_hashes) numpy broadcast. Empty
    shingle sets yield null."""
    return _minhash_np_udf(n_hashes)(hash_arr)


# Odd multipliers for the rolling word-hash shingle combiner (any fixed
# odd 64-bit constants work; these are the golden-ratio mix constants).
_SHINGLE_MIX = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9)


@functools.lru_cache(maxsize=None)
def _minhash_word_hash_udf(k: int, n_hashes: int):
    """Memoized pandas-UDF object for
    `minhash_signature_of_word_hashes` (r15) — see `_minhash_np_udf`
    for the rationale; one object per (k, n_hashes) serves the whole
    session instead of re-serializing per plan build."""
    from pyspark.sql.types import ArrayType, LongType

    mix = [np.uint64(m) for m in _SHINGLE_MIX[:k]]

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        a, b = _minhash_coeffs(n_hashes)

        def one(hs):
            if hs is None or len(hs) < k:
                return None
            h = np.asarray(hs, dtype=np.int64).view(np.uint64)
            n = len(h) - k + 1
            sh = np.zeros(n, dtype=np.uint64)
            for j in range(k):
                sh ^= h[j : j + n] * mix[j]
            sh = np.unique(sh) % _MERSENNE61
            m = (sh[:, None] * a[None, :] + b[None, :]) % _MERSENNE61
            return m.min(axis=0).astype(np.int64).tolist()

        return hashes.map(one)

    return _sig


def minhash_signature_of_word_hashes(
    word_hash_arr: Column, k: int = 3, n_hashes: int = 64
) -> Column:
    """MinHash signature from per-WORD xxhash64 values — the fully
    vectorized path with no string shingling anywhere.

    Shingle identity is the mixed triple of consecutive word hashes
    (wraparound uint64 arithmetic) instead of the joined string; hash
    collisions are negligible for dedup purposes and the expensive
    JVM-interpreted concat_ws/element_at shingle loop disappears
    (measured: the interpreted string-shingle stage was both slow and
    high-variance). Docs with fewer than k words yield null."""
    return _minhash_word_hash_udf(k, n_hashes)(word_hash_arr)


@functools.lru_cache(maxsize=None)
def _simhash_np_udf():
    """Memoized pandas-UDF object for `simhash64_np` (r15) — see
    `_minhash_np_udf` for the rationale."""
    from pyspark.sql.types import LongType

    _bits = np.arange(64, dtype=np.uint64)

    @F.pandas_udf(LongType())
    def _sh(hashes: pd.Series) -> pd.Series:
        def one(hs):
            if hs is None or len(hs) == 0:
                return 0
            h = np.asarray(hs, dtype=np.int64).view(np.uint64)
            bits = (h[:, None] >> _bits[None, :]) & np.uint64(1)
            votes = 2 * bits.astype(np.int64) - 1  # 1 -> +1, 0 -> -1
            sign = (votes.sum(axis=0) > 0).astype(np.uint64)
            return int((sign << _bits).sum(dtype=np.uint64).view(np.int64))

        return hashes.map(one)

    return _sh


def simhash64_np(hash_arr: Column) -> Column:
    """64-bit SimHash from a pre-hashed (xxhash64) word array — same
    semantics as simhash64_of_hashes (bit i set iff the +1/-1 vote over
    word-hash bits is positive), vectorized: one (n_words × 64) bit
    unpack + column sum per doc."""
    return _simhash_np_udf()(hash_arr)

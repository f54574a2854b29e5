"""Hash-family Column helpers: MinHash signatures, SimHash, band keys.

All native ``pyspark.sql.functions`` expressions — the MinHash permutation
family is the classic ``(a*h + b) mod p`` universal hashing scheme evaluated
with higher-order array functions, so signatures are computed in the JVM with
no Python and no shuffle. ANSI-overflow-safe: the family works mod
Mersenne-31 (see below), keeping every product under 2^62.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

# Universal-hash permutation family (a*h + b) mod M31 over h in [0, M31).
# M31 (Mersenne 2^31-1) is chosen so a*h wraps the modulus ~2^31 times —
# a genuinely scrambling permutation — while a*h+b < 2^62 stays far from
# int64 overflow (Spark 4 runs ANSI mode: overflow would throw). A larger
# modulus with small multipliers (to dodge overflow) barely wraps, leaving
# the map order-preserving and every permutation picking the same argmin:
# signatures collide and estimated Jaccard biases toward 1.
MERSENNE_31 = (1 << 31) - 1
_HASH_FOLD = MERSENNE_31


def _perm_params(num_perm: int, seed: int) -> tuple[list[int], list[int]]:
    rng = random.Random(seed)
    a = [rng.randrange(1, MERSENNE_31) for _ in range(num_perm)]
    b = [rng.randrange(0, MERSENNE_31) for _ in range(num_perm)]
    return a, b


def md5_fold31(s: Column) -> Column:
    """Shingle hash in [0, M31) derived from md5 instead of xxhash64, for
    oracle parity: equals ``md5_number_lower(s) % 2147483647`` in DuckDB
    bit-for-bit (md5_number_lower = little-endian digest bytes 8..15;
    verified empirically against hashlib).

    Folded byte-by-byte with precomputed ``256^k mod M31`` multipliers so
    every intermediate stays ≤ 8*255*M31 ≈ 2^42 — ANSI-overflow-safe.
    Slower than xxhash64 (md5 + 8 conv calls per shingle); use only where
    cross-engine reproducibility is worth it.
    """
    hx = F.md5(F.encode(s, "UTF-8"))
    expr = None
    for k in range(8):
        byte_k = F.conv(F.substring(hx, 17 + 2 * k, 2), 16, 10).cast("long")
        term = byte_k * F.lit(pow(256, k, MERSENNE_31))
        expr = term if expr is None else expr + term
    return F.pmod(expr, F.lit(MERSENNE_31))


def minhash_signature(
    shingles: Column, num_perm: int = 128, seed: int = 42
) -> Column:
    """ARRAY<BIGINT> MinHash signature of an ARRAY<STRING> shingle set.

    Semantics of /root/reference/src/processing/deduplicator.py:132-148
    (datasketch MinHash, 128 permutations) re-expressed as pure Spark
    expressions: h = xxhash64(shingle) folded to [0, 2^31-1), then
    sig[i] = min over shingles of (a_i * h + b_i) mod 2^31-1.
    Hash values differ from datasketch (different family); the *set-level*
    property (Jaccard-similar sets collide) is what tests pin.
    """
    a, b = _perm_params(num_perm, seed)
    # ONE traversal: hash each shingle once, fold all num_perm running
    # minima simultaneously via aggregate+zip_with. The earlier
    # per-permutation form (transform(sequence, i -> array_min(transform(
    # h32, ...)))) re-evaluated the h32 expression — shingle-array build +
    # xxhash64 per element — once per permutation, because Catalyst inlines
    # the aliased array into every lambda use-site: measured 26x slower at
    # 32 perms on the streaming micro-bench (tools/stream_bench.py).
    ab = F.array(
        *[
            F.struct(F.lit(a[i]).alias("a"), F.lit(b[i]).alias("b"))
            for i in range(num_perm)
        ]
    )
    h32 = F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_HASH_FOLD)))
    # sentinel: every permuted hash is < MERSENNE_31, so M31 == +inf here
    init = F.array(*[F.lit(MERSENNE_31).cast("long")] * num_perm)
    folded = F.aggregate(
        h32,
        init,
        lambda acc, h: F.zip_with(
            acc,
            ab,
            lambda m, p: F.least(
                m, F.pmod(p["a"] * h + p["b"], F.lit(MERSENNE_31))
            ),
        ),
    )
    # preserve the original empty-set semantics (array_min over an empty
    # array): all-NULL signature, not all-sentinel
    nulls = F.array(*[F.lit(None).cast("long")] * num_perm)
    return F.when(F.size(shingles) == 0, nulls).otherwise(folded)


def signature_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard = fraction of equal MinHash positions, as DOUBLE."""
    eq = F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0))
    return F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / F.size(sig_a).cast(
        "double"
    )


def lsh_bands(sig: Column, num_bands: int, rows_per_band: int) -> Column:
    """ARRAY<STRUCT<band_id INT, band_sig ARRAY<BIGINT>>> — explode + hash to
    get LSH bucket keys; docs sharing any band bucket are candidates."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda j: F.struct(
            j.cast("int").alias("band_id"),
            F.slice(sig, j * rows_per_band + 1, rows_per_band).alias("band_sig"),
        ),
    )


def simhash64(tokens: Column, seed: int = 42) -> Column:
    """64-bit SimHash of an ARRAY<STRING> token column, as BIGINT.

    Classic Charikar scheme: per bit position, sum +1/-1 over token hashes,
    sign of the sum sets the bit. Pure higher-order expressions: O(64 * n)
    JVM ops per row, no Python.
    """
    hashes = F.transform(tokens, lambda t: F.xxhash64(t, F.lit(seed)))
    # bit b contribution: +1 if hash bit set else -1; bit set iff sum > 0
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.when(
            F.aggregate(
                hashes,
                F.lit(0).cast("long"),
                lambda acc, h: acc
                + F.when(F.call_function("shiftright", h, b.cast("int")).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    # assemble via bitwise OR of bit_b << b (no arithmetic overflow possible)
    indexed = F.zip_with(
        bits,
        F.sequence(F.lit(0), F.lit(63)),
        lambda bit, pos: F.call_function("shiftleft", bit, pos.cast("int")),
    )
    return F.aggregate(
        indexed, F.lit(0).cast("long"), lambda acc, v: acc.bitwiseOR(v)
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two BIGINT bit-patterns."""
    return F.bit_count(a.bitwiseXOR(b))

"""Deterministic cross-engine hashing primitives.

All hashes derive from MD5 (identical bytes in every engine), truncated to 60
bits (15 hex chars) so values fit a signed int64 in Spark, DuckDB, and
Arrow alike. Spark's native xxhash64/murmur3 would be faster but engine-local;
we pay one md5 per token for verifiability. At 100 TB the md5 stays inside
whole-stage codegen (JVM intrinsic) — no Python boundary.

MinHash/SimHash sketch the reference's *beyond-scope* dedup capability
(reference has none — SURVEY.md §2.7 notes drop_duplicates only).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash64(col: Column | str, salt: int | str = 0) -> Column:
    """60-bit integer hash: int(md5(salt ':' x)[:15], 16). Deterministic and
    reproducible in DuckDB as ('0x'||substr(md5(salt||':'||x),1,15))::BIGINT."""
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(str(salt)), F.lit(":"), c.cast("string"))
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")


# Mersenne prime modulus + LCG-style coefficients for the universal hash
# family h_i(x) = (a_i*x + b_i) mod P. All intermediates < 2^62: safe in
# signed-int64 arithmetic in Spark AND DuckDB (DuckDB errors on overflow).
MINHASH_P = 2_147_483_647  # 2^31 - 1


def minhash_coeffs(i: int) -> tuple[int, int]:
    a = (1_103_515_245 * (i + 1) + 12_345) % MINHASH_P
    b = (69_069 * (i + 1) + 1) % MINHASH_P
    return (a or 1, b)


def minhash_signature(tokens: Column, num_hashes: int = 16) -> Column:
    """MinHash signature over an array<string> of tokens/shingles:
    sig[i] = min over tokens of h_i(md5_base(token)).

    One md5 per token (the expensive part), then ``num_hashes`` cheap
    (a*x+b) mod P rehashes — pure expressions: one pass, no shuffle, no UDF.
    Output: array<bigint> length ``num_hashes``.
    """
    base = F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint") % MINHASH_P,
    )
    coeffs = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in (minhash_coeffs(i) for i in range(num_hashes))
        ]
    )
    init = F.array_repeat(F.lit(MINHASH_P + 1).cast("bigint"), num_hashes)
    # single aggregate pass: md5 evaluated ONCE per token (separate per-hash
    # expressions would each inline — and recompute — the md5 transform,
    # Catalyst does no CSE across projection elements)
    return F.aggregate(
        base,
        init,
        lambda acc, x: F.zip_with(acc, coeffs, lambda m, c: F.least(m, (c["a"] * x + c["b"]) % MINHASH_P)),
    )


def simhash64(tokens: Column, bits: int = 60) -> Column:
    """SimHash over an array<string>: for each of ``bits`` bit positions, sum
    +1/-1 votes of each token's md5-bit; bit set iff sum > 0.

    Expressed as aggregate-over-transform (JVM-side). 60 bits keeps the
    result in a signed int64.

    All ``bits`` bit votes accumulate in ONE aggregate pass with an
    array<bigint> accumulator — per-bit aggregate passes would each re-inline
    (and re-evaluate) the md5 transform, since Catalyst does no CSE across
    sibling expressions (the trap behind the 310s minhash regression).
    """
    # per-token 60-bit hash once
    h = F.transform(
        tokens,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"),
    )
    masks = F.array(*[F.lit(1 << b).cast("bigint") for b in range(bits)])
    # votes[b] = sum over tokens of (bit_b(hash) ? +1 : -1)
    votes = F.aggregate(
        h,
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, x: F.zip_with(
            acc, masks, lambda v, m: v + F.when(x.bitwiseAND(m) != F.lit(0), F.lit(1)).otherwise(F.lit(-1))
        ),
    )
    # sketch = OR of masks where the vote is positive (sum — masks are disjoint)
    return F.aggregate(
        F.zip_with(votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("bigint"))),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 sketches (bit_count(a XOR b))."""
    return F.bit_count(a.bitwiseXOR(b))

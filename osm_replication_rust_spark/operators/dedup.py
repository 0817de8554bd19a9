"""Deduplication operators for large-scale training-data pipelines.

Five tiers, cheapest first — all set-based, no driver-side loops:

- exact:          hash-groupBy on normalized content (one shuffle)
- ngram_jaccard:  exact word-shingle Jaccard via a self-join on shared
                  shingles (SQL-expressible, the oracle-checkable tier)
- minhash_lsh:    MinHash signatures (xxhash64 + k universal-hash mins,
                  all JVM-side aggregates) banded into LSH buckets;
                  candidate pairs verified with exact Jaccard
- simhash:        64-bit SimHash from token hashes; near-dups = small
                  Hamming distance within band buckets
- embedding:      cosine near-dup over embedding vectors (see
                  operators/similarity.py for the ANN machinery)

Scale notes: every tier is (map -> one-or-two shuffles -> map). The
shingle self-join explodes on hot shingles; ngram_jaccard_pairs caps
shingle document-frequency (stop-shingle removal) exactly like
production near-dup pipelines drop stopwords.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic universal-hash parameters for MinHash: h_i(x) = (a_i*x + b_i) mod p.
# p = 2^31 - 1 (Mersenne) keeps every product under 2^62, so the whole
# chain stays in exact JVM long arithmetic (no 128-bit mulmod needed).
MINHASH_PRIME = (1 << 31) - 1


def _hash_params(num: int, seed: int = 7) -> list[tuple[int, int]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return [
        (int(rng.integers(1, MINHASH_PRIME)), int(rng.integers(0, MINHASH_PRIME)))
        for _ in range(num)
    ]


def exact_duplicates(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Groups of byte-identical content: (content_hash, n_dups, keeper_id).
    One hash-aggregate; survivors = min id per group (deterministic)."""
    return (
        df.groupBy(F.xxhash64(F.col(content_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(F.col(id_col)).alias("keeper_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def word_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct word n-grams — the unit of Jaccard
    similarity. Built with JVM array functions (no UDF)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # shingle i = tokens[i..i+n) joined; slide via transform over indices
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(shingles).alias("shingle"))
        .filter(F.length("shingle") > 0)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (id_a < id_b, jaccard >= t).

    |A ∩ B| from a self-join on shared shingles; |A ∪ B| = |A|+|B|-∩.
    ``max_shingle_df`` drops shingles shared by more than that many docs
    (stop-shingles) — the skew guard for the self-join at scale."""
    sh = word_shingles(df, text_col, id_col, n).persist()
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "sz_a", "sz_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 7,
) -> DataFrame:
    """(id, sig_0..sig_{k-1}) MinHash signature, entirely JVM-side:
    shingle -> xxhash64 -> k universal hashes -> min per doc.
    P(sig_i(A) == sig_i(B)) = jaccard(A, B)."""
    sh = word_shingles(df, text_col, id_col, n)
    # xxhash64 is signed; shift into [0, 2^63) so the mod stays positive
    h = sh.withColumn("h", F.abs(F.xxhash64(F.col("shingle"))))
    params = _hash_params(num_hashes, seed)
    # h' = h mod p < 2^31 and a < 2^31, so a*h' + b < 2^62: exact longs
    hp = F.col("h") % MINHASH_PRIME
    aggs = [
        F.min((F.lit(ai) * hp + F.lit(bi)) % MINHASH_PRIME).alias(f"sig_{i}")
        for i, (ai, bi) in enumerate(params)
    ]
    return h.groupBy(F.col("id")).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """MinHash + LSH banding: docs sharing any band bucket become
    candidate pairs; candidates verified with EXACT shingle Jaccard so
    the output has no false positives (standard two-stage design)."""
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes, seed)
    band_cols = [
        F.xxhash64(*[F.col(f"sig_{b * rows + r}") for r in range(rows)], F.lit(b)).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = stacked.select(F.col("id").alias("id_a"), "band", "bucket")
    b = stacked.select(F.col("id").alias("id_b"), "band", "bucket")
    cands = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # exact verify on the candidate set only
    exact = ngram_jaccard_pairs(df, text_col, id_col, n, threshold)
    return cands.join(exact, ["id_a", "id_b"], "inner")


def simhash64(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, simhash) — 64-bit SimHash over word tokens, set-based:
    explode tokens -> xxhash64 -> per-bit ±1 sums -> sign bits packed.
    Bit b of the final hash = 1 iff sum over tokens of (bit b set ? +1 : -1) > 0."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    bit_aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    sums = toks.groupBy("id").agg(*bit_aggs)
    packed = None
    for b in range(64):
        bit = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, b)
        packed = term if packed is None else packed.bitwiseXOR(term)
    return sums.select("id", packed.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, found via the
    standard block-permutation trick: split the 64-bit hash into
    (max_hamming+1) bands — any pair within max_hamming matches exactly
    on >= 1 band (pigeonhole), so banding is a lossless prefilter."""
    sh = simhash64(df, text_col, id_col)
    nb = max_hamming + 1
    width = 64 // nb
    bands = sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for i in range(nb)
            ])
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"), "band", "key")
    b = bands.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"), "band", "key")
    cands = (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    return cands.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming)

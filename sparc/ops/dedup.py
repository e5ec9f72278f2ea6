"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale notes (the point of each design):

- exact: one hash-shuffle groupBy on the content hash — the only full
  shuffle, combiner-friendly (partial aggregation map-side).
- ngram-jaccard: candidate generation by shared-shingle join; at 100 TB
  the shingle explode is bounded by a per-doc shingle cap and the join is
  on (shingle) with a frequency filter dropping stop-shingles (which
  otherwise create quadratic hot keys — the classic skew trap).
- minhash-LSH: k hash functions, b bands — candidates only join within a
  band bucket, so the self-join never goes quadratic.  All hashing is
  JVM-side xxhash64 over array columns.
- simhash: 64-bit signature via per-bit majority vote of token hashes,
  computed with explode + bit arithmetic (portable, no UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical documents: (keeper_id, n_copies) per text.

    Hash-first: the shuffle key is sha2(text) computed map-side, and the
    text column is projected away BEFORE the exchange — the aggregation
    moves 32-byte digests + ids, never the corpus.  (sha256 collisions
    are cryptographically negligible; a paranoid caller can verify
    within-group equality on the surviving duplicate groups, a tiny
    fraction of the data.)"""
    hashed = df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("__h"))
    return (
        hashed.groupBy("__h")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
        .select("keeper_id", "n_copies")
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of each distinct text.

    Keeper selection runs over (digest, id) pairs only; full rows join
    the keeper-id set on the 8-byte id key, so document bytes cross the
    exchange exactly once (as join payload, never as join key)."""
    hashed = df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("__h"))
    keeper_ids = (
        hashed.groupBy("__h")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keeper_ids, id_col, "left_semi")


def _shingles(text_col: str, n: int = 3, max_shingles: int = 512):
    """Array of character n-grams (positions capped for scale)."""
    limit = f"least(length({text_col}) - {n - 1}, {max_shingles})"
    return F.expr(
        f"CASE WHEN length({text_col}) < {n} THEN array({text_col}) "
        f"ELSE transform(sequence(1, {limit}), i -> substring({text_col}, i, {n})) END"
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingles: int = 512,
    stop_shingle_df: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard over distinct shingles.

    Candidates come from a shared-shingle equi-join; shingles appearing in
    more than ``stop_shingle_df`` docs are dropped before the join (skew
    guard).  Jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct shingles.
    """
    sh = (
        df.select(F.col(id_col).alias("id"), _shingles(text_col, n, max_shingles).alias("sh"))
        .select("id", F.explode(F.array_distinct("sh")).alias("g"))
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    hot = sh.groupBy("g").agg(F.count(F.lit(1)).alias("df_g")).filter(
        F.col("df_g") > stop_shingle_df
    )
    sh_cold = sh.join(F.broadcast(hot), "g", "left_anti")
    a = sh_cold.alias("a")
    b = sh_cold.alias("b")
    inter = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    n: int = 3,
    max_shingles: int = 512,
) -> DataFrame:
    """k-permutation MinHash signature per doc, all JVM-side xxhash64."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(_shingles(text_col, n, max_shingles)).alias("sh"),
    )
    sig_cols = [
        F.array_min(
            F.transform(F.col("sh"), lambda s, i=i: F.xxhash64(s, F.lit(i)))
        ).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.select("id", *sig_cols)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    bucket_cap: int = 10_000,
) -> DataFrame:
    """Candidate near-dup pairs: band-bucket join over MinHash signatures.

    ``bucket_cap`` is the hot-bucket skew guard (same pattern as
    embedding_cosine_dups): a mass-duplicated document — common in crawl
    data — piles identical signatures into one band bucket and makes the
    self-join quadratic there; buckets above the cap are dropped via a
    broadcast anti-join before any pairing happens.  At 10^12 docs this
    bounds the worst bucket's pair count at cap^2 instead of dups^2."""
    sigs = minhash_signatures(df, id_col, text_col, k=k, n=n)
    r = k // bands
    band_frames = []
    for b in range(bands):
        cols = [F.col(f"mh{b * r + j}") for j in range(r)]
        band_frames.append(
            sigs.select(
                "id", F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket")
            )
        )
    buckets = band_frames[0]
    for f in band_frames[1:]:
        buckets = buckets.unionAll(f)
    hot = (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > bucket_cap)
    )
    buckets = buckets.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    a, b_ = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (per-bit majority vote)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).filter(F.length("tok") > 0)
    hashed = toks.select("id", F.xxhash64("tok").alias("h"))
    bit_sums = hashed.groupBy("id").agg(
        *[
            F.sum(
                F.when((F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig + F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return bit_sums.select("id", sig.alias("simhash"))

"""Deduplication operators (SURVEY.md §2.11): exact, fingerprint,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design:
* Exact/fingerprint dedup = hash groupBy — one shuffle on the hash key,
  map-side partial aggregation, no data skew (md5 keys are uniform).
* MinHash-LSH: shingle → K seeded min-hashes → B bands of R rows →
  groupBy band-signature → candidate pairs only within buckets.  The
  cross-join never happens; cost is O(docs × K) + bucket-local pairing.
* SimHash: 60-bit signature via per-shingle hash bit-voting; near-dups
  share all-but-few bits — banded the same way.
* Verification (exact Jaccard / cosine) runs only on candidate pairs.

All hash functions are the portable md5 construction
(functions/hashing.py) so the DuckDB oracle reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spanner_jdbc_converter_spark.functions.hashing import md5_long_seeded
from spanner_jdbc_converter_spark.operators.text import (
    fingerprint,
    normalized_text,
    tokens,
    word_ngrams,
)

# MinHash defaults: 16 hashes in 4 bands of 4 — catches Jaccard ≳ 0.5
# candidates with high probability (1-(1-s^4)^4).
MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4


def exact_dedup(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Exact dedup on key columns — dropDuplicates (hash aggregate)."""
    return df.dropDuplicates(key_cols)


def fingerprint_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of documents sharing a normalized-content fingerprint;
    keeper = min id.  Output: fingerprint, group_size, keeper_id."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def fingerprint_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row per normalized-content fingerprint (smallest id wins) —
    deterministic, unlike dropDuplicates' arbitrary survivor."""
    fp = df.withColumn("__fp", fingerprint(text_col))
    w_min = fp.groupBy("__fp").agg(F.min(id_col).alias("__keeper"))
    return (
        fp.join(w_min, on="__fp")
        .filter(F.col(id_col) == F.col("__keeper"))
        .drop("__fp", "__keeper")
    )


def minhash_signature(text_col: Column | str, k: int = MINHASH_K, ngram: int = 3) -> Column:
    """Array of K min-hashes over word n-gram shingles.  Empty shingle
    sets hash the whole normalized text instead (degenerate doc)."""
    shingles = word_ngrams(text_col, ngram)
    base = F.when(F.size(shingles) > 0, shingles).otherwise(
        F.array(normalized_text(text_col))
    )

    # NB: the lambda must take exactly ONE parameter — PySpark's transform
    # passes the element index as a second argument when the callable's
    # arity is 2, which would silently replace the seed.
    def _hasher(seed: int):
        return lambda s: md5_long_seeded(s, seed)

    mins = [F.array_min(F.transform(base, _hasher(i))) for i in range(k)]
    return F.array(*mins)


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = MINHASH_K
) -> DataFrame:
    return df.select(F.col(id_col), minhash_signature(text_col, k).alias("sig"))


def lsh_band_keys(sig_col: Column, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> list[Column]:
    """One join key per band: 'b:<band>:<r0>,<r1>,...' string signature."""
    keys = []
    for b in range(bands):
        parts = [F.element_at(sig_col, b * rows + r + 1).cast("string") for r in range(rows)]
        keys.append(F.concat_ws(",", F.lit(f"b{b}"), *parts))
    return keys


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band.

    Plan shape: explode docs×bands (B small), shuffle on band key,
    bucket-local self-join, distinct pairs.  No global cross join —
    this is the 100 TB-safe path.
    """
    sigs = minhash_signatures(df, text_col, id_col, k)
    keys = lsh_band_keys(F.col("sig"), bands, rows)
    banded = sigs.select(
        F.col(id_col), F.explode(F.array(*keys)).alias("band_key")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on="band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    block_cols: list[str] | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for document pairs, blocked to keep
    the pair space bounded (same-block pairs only — at scale blocking
    replaces the quadratic cross join; LSH above is the unblocked path).

    Output: id_a, id_b, jaccard (rounded 6) — verification oracle for the
    approximate methods."""
    toks = df.select(
        F.col(id_col),
        *(block_cols or []),
        F.array_distinct(word_ngrams(text_col, ngram)).alias("grams"),
    ).filter(F.size("grams") > 0)
    a, b = toks.alias("a"), toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.array_union(F.col("a.grams"), F.col("b.grams")))
    jac = F.round(inter.cast("double") / union.cast("double"), 6)
    joined = a.join(b, on=[c for c in (block_cols or [])], how="inner") if block_cols else a.crossJoin(b)
    return (
        joined.filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -- SimHash ---------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(text_col: Column | str, bits: int = SIMHASH_BITS, ngram: int = 3) -> Column:
    """SimHash signature: per-shingle 60-bit hash votes on each output bit;
    bit i of the signature = majority sign of Σ_shingles (±1).

    Expressed as one Catalyst expression: for each bit, count shingles
    with that hash bit set vs total, no UDF."""
    shingles = word_ngrams(text_col, ngram)
    base = F.when(F.size(shingles) > 0, shingles).otherwise(
        F.array(normalized_text(text_col))
    )
    hashes = F.transform(base, lambda s: md5_long_seeded(s, 0))
    n = F.size(base)
    sig = F.lit(0).cast("long")

    def _bit_counter(bit: int):  # two-arg lambda only — see minhash note
        return lambda acc, h: acc + F.shiftright(h, bit).bitwiseAND(F.lit(1))

    for i in range(bits):
        ones = F.aggregate(hashes, F.lit(0).cast("long"), _bit_counter(i))
        bit_set = (ones * 2) > n
        sig = sig + F.when(bit_set, F.lit(2**i).cast("long")).otherwise(F.lit(0))
    return sig


def simhash_signatures(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return df.select(F.col(id_col), simhash(text_col).alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two long signatures via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the signature bits (pigeonhole —
    distance ≤ max_hamming ⇒ some band of bits is identical when
    bands > max_hamming), bucket-join, verify exact Hamming."""
    sigs = simhash_signatures(df, text_col, id_col)
    width = SIMHASH_BITS // bands
    mask = (1 << width) - 1
    band_keys = [
        F.concat_ws(":", F.lit(f"s{b}"),
                    F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).cast("string"))
        for b in range(bands)
    ]
    banded = sigs.select(F.col(id_col), F.col("simhash"), F.explode(F.array(*band_keys)).alias("bk"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on="bk")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# -- embedding near-dup ----------------------------------------------------


def embedding_near_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    block_col: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine ≥ threshold.

    Brute-force pair space (optionally blocked) — the correctness oracle;
    the scalable path is similarity.lsh_ann over hyperplane buckets."""
    from spanner_jdbc_converter_spark.functions.vector import cosine_rounded

    cols = [F.col(id_col), F.col(vec_col)] + ([F.col(block_col)] if block_col else [])
    base = df.select(*cols)
    a, b = base.alias("a"), base.alias("b")
    joined = a.join(b, on=block_col) if block_col else a.crossJoin(b)
    return (
        joined.filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_rounded(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )

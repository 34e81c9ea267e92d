"""Deduplication operators.

Two families:

1. **Version dedup** (reference parity, O1): the reference relies on
   ClickHouse ``ReplacingMergeTree(version)`` + ``OPTIMIZE FINAL`` +
   ``FINAL`` views (``migrations/clickhouse/000004…``,
   ``services/clickhouse.py:125-128``). Here it is a single window:
   latest version per dedup key wins.

2. **Content dedup** (the 100 TB training-data-pipeline set): exact
   (hash-groupBy), MinHash+LSH (shingle → signature → band → bucket
   join), SimHash, n-gram Jaccard. All deterministic (md5-derived
   hashes, fixed coefficient schedule) so results are reproducible and
   oracle-checkable.

Scale notes:
- ``latest_version_dedup`` is one shuffle on the dedup key; at the sink
  it rides the same partitioning as the write bucketing.
- MinHash LSH is the linear-time near-dup path: candidate pairs come
  from equi-joins on band keys (shuffle on band hash — uniform by
  construction), never from a cross join. The n-gram Jaccard operator
  also blocks on shared shingles rather than crossing.
- All signatures are built with built-in expressions (md5/conv/
  transform/aggregate) — whole-stage codegen, zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Coefficients for the universal-hash family h_i(x) = (a_i*x + b_i) mod P.
# P is the Mersenne prime 2^31-1; a_i odd, b_i from a fixed schedule —
# deterministic so DuckDB oracles can reproduce the signatures exactly.
MINHASH_PRIME = 2147483647
DEFAULT_NUM_HASHES = 16
DEFAULT_BANDS = 4


def latest_version_dedup(
    df: DataFrame, keys: list[str], version_col: str = "version"
) -> DataFrame:
    """Latest-version-wins dedup (O1) — replaces ReplacingMergeTree+FINAL.

    Ties on ``version`` are broken deterministically by preferring the
    row that sorts last on all columns (ClickHouse keeps an arbitrary
    one; we must be reproducible).
    """
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), *[F.col(c).desc() for c in df.columns]
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def exact_dedup(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact content dedup via md5 hash-groupBy.

    Returns one row per distinct content hash: the representative
    (lowest id), the md5, and the duplicate count. Map-side partial
    aggregation makes this one shuffle on the 16-byte hash.
    """
    return (
        df.select(F.col(id_col), F.md5(F.col(content_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(id_col).alias("representative_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _char_shingles(col: Column, k: int) -> Column:
    """Distinct character k-grams of a string (1-based substr positions)."""
    n = F.length(col)
    positions = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
    return F.array_distinct(F.transform(positions, lambda i: F.substring(col, i, k)))


def _hash64(col: Column) -> Column:
    """Deterministic 32-bit integer hash of a string: first 8 hex chars of
    md5, base-16 → long. Portable to any SQL engine with md5()."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    shingle_k: int = 9,
) -> DataFrame:
    """Per-document MinHash signature (array of ``num_hashes`` longs).

    shingle → md5-derived base hash → min over the universal-hash family.
    """
    shingles = _char_shingles(F.col(content_col), shingle_k)
    base_hashes = F.transform(shingles, _hash64)

    def sig_component(i: int) -> Column:
        a, b = 2 * i + 1, 7919 * i + 12345
        return F.array_min(
            F.transform(
                base_hashes,
                lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME),
            )
        )

    signature = F.array(*[sig_component(i) for i in range(num_hashes)])
    return df.select(F.col(id_col), signature.alias("minhash_sig"))


def minhash_lsh_duplicates(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = 9,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH banding.

    Signature is split into ``bands`` bands of ``num_hashes/bands`` rows;
    documents sharing any band hash become candidates (equi-join on the
    band key — linear, no cross join); candidates are scored by the
    fraction of matching signature components and filtered at
    ``threshold``. Output: (a_id, b_id, est_jaccard), a_id < b_id.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, content_col, id_col, num_hashes, shingle_k)

    def band_hash(b: int) -> Column:
        parts = [
            F.element_at("minhash_sig", b * rows_per_band + r + 1).cast("string")
            for r in range(rows_per_band)
        ]
        return F.md5(F.concat_ws("_", *parts))

    banded = sigs.select(
        F.col(id_col),
        "minhash_sig",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), band_hash(b).alias("band_key"))
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "minhash_sig", "band.band_idx", "band.band_key")

    left = banded.select(
        F.col(id_col).alias("a_id"),
        F.col("minhash_sig").alias("a_sig"),
        "band_idx",
        "band_key",
    )
    right = banded.select(
        F.col(id_col).alias("b_id"),
        F.col("minhash_sig").alias("b_sig"),
        "band_idx",
        "band_key",
    )
    candidates = (
        left.join(right, ["band_idx", "band_key"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_sig", "b_sig")
        .distinct()
    )
    matching = F.size(
        F.filter(
            F.zip_with("a_sig", "b_sig", lambda a, b: a == b), lambda x: x
        )
    )
    est_jaccard = matching.cast("double") / F.lit(float(num_hashes))
    return (
        candidates.withColumn("est_jaccard", est_jaccard)
        .where(F.col("est_jaccard") >= threshold)
        .select("a_id", "b_id", "est_jaccard")
    )


def simhash(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """Per-document SimHash over whitespace tokens (duplicates weighted).

    bit_j(token) = j-th bit of the md5-derived token hash; the simhash
    sets bit j when the sum over tokens of (2*bit_j - 1) is positive.
    """
    tokens = F.split(F.col(content_col), r"\s+")
    token_hashes = F.transform(tokens, _hash64)

    def bit_vote(j: int) -> Column:
        return F.aggregate(
            token_hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )

    value = None
    for j in range(bits):
        contribution = F.when(bit_vote(j) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        value = contribution if value is None else value + contribution
    return df.select(F.col(id_col), value.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 9,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    Blocking: pairs must share ≥1 shingle (equi-join on shingle), so the
    join is linear in shared-shingle volume, not a cross join. Output:
    (a_id, b_id, jaccard), a_id < b_id, jaccard ≥ threshold.
    """
    shingled = df.select(
        F.col(id_col),
        F.explode(_char_shingles(F.col(content_col), shingle_k)).alias("shingle"),
    )
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))

    a = shingled.select(F.col(id_col).alias("a_id"), "shingle")
    b = shingled.select(F.col(id_col).alias("b_id"), "shingle")
    shared = (
        a.join(b, "shingle")
        .where(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sizes_a = sizes.select(F.col(id_col).alias("a_id"), F.col("set_size").alias("a_size"))
    sizes_b = sizes.select(F.col(id_col).alias("b_id"), F.col("set_size").alias("b_size"))
    jaccard = F.col("shared").cast("double") / (
        F.col("a_size") + F.col("b_size") - F.col("shared")
    ).cast("double")
    return (
        shared.join(sizes_a, "a_id")
        .join(sizes_b, "b_id")
        .withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )

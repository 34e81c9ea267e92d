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
    df: DataFrame,
    keys: list[str],
    version_col: str = "version",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Latest-version-wins dedup (O1) — replaces ReplacingMergeTree+FINAL.

    Ties on ``version`` are broken deterministically (ClickHouse keeps
    an arbitrary row; we must be reproducible) by ONE cheap sort key:
    ``tiebreak_col`` when the table has a stable ingest id, else the md5
    of the JSON-serialized row. Sorting on every payload column instead
    (the previous formulation) drags wide strings/arrays into the window
    sort keys of every dedup shuffle — needless bytes at scale.
    """
    tiebreak = (
        F.col(tiebreak_col)
        if tiebreak_col is not None
        else F.md5(F.to_json(F.struct(*df.columns)))
    )
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc(), tiebreak.desc())
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

    Single-pass fold: each shingle is md5-hashed ONCE, then the whole
    hash family updates an array accumulator via ``zip_with(least)`` —
    a 16× saving over computing each signature component independently
    (Catalyst's CollapseProject would otherwise inline the shingle
    hashing per component).
    """
    shingles = _char_shingles(F.col(content_col), shingle_k)
    base_hashes = F.transform(shingles, _hash64)
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_hashes)
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))

    def fold_step(acc: Column, h: Column) -> Column:
        candidates = F.transform(
            idx,
            lambda i: ((2 * i + 1).cast("long") * h + (i * 7919 + 12345).cast("long"))
            % F.lit(MINHASH_PRIME),
        )
        return F.zip_with(acc, candidates, lambda a, b: F.least(a, b))

    signature = F.aggregate(base_hashes, init, fold_step)
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
    # pre-shuffle on the join key. Known tail: ReuseExchange does not
    # canonicalize the two self-join sides, so signatures compute twice;
    # a lazy localCheckpoint here was MEASURED SLOWER (3.02s vs 2.92s at
    # sf0.1 — block serialization eats the saved recompute), so the
    # plain repartition stays.
    banded = banded.repartition("band_idx", "band_key")

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
    bit_idx = F.sequence(F.lit(0), F.lit(bits - 1))

    # Single pass over tokens: fold a per-bit vote array. Bit extraction
    # uses floor(h / 2^j) % 2 — exact in doubles since h < 2^32 < 2^53 —
    # because shift builtins need literal shift amounts.
    def vote_step(acc: Column, h: Column) -> Column:
        bits_of_h = F.transform(
            bit_idx,
            lambda j: F.when(
                F.floor(h / F.pow(F.lit(2.0), j)).cast("long") % 2 == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )
        return F.zip_with(acc, bits_of_h, lambda a, b: a + b)

    votes = F.aggregate(
        token_hashes, F.array_repeat(F.lit(0).cast("long"), bits), vote_step
    )
    value = F.aggregate(
        F.zip_with(
            votes,
            bit_idx,
            lambda v, j: F.when(v > 0, F.pow(F.lit(2.0), j).cast("long")).otherwise(
                F.lit(0).cast("long")
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), value.alias("simhash"))


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 9,
    threshold: float = 0.5,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Exact n-gram Jaccard over MinHash-LSH candidate pairs.

    A naive shingle self-join blows up quadratically on frequent
    shingles (word-soup corpora share most 9-grams across documents), so
    candidates come from LSH banding and each candidate pair is verified
    with the EXACT set intersection over the pair's shingle arrays.
    4 bands × 4 rows: near-dups (jaccard ≳ 0.8) are caught with ≥95%
    probability while near-zero-similarity pairs collide with ~1e-4 —
    the corpus-wide candidate volume stays linear. Output:
    (a_id, b_id, jaccard), a_id < b_id, jaccard ≥ threshold.
    """
    rows_per_band = num_hashes // bands
    shingled = df.select(
        F.col(id_col), _char_shingles(F.col(content_col), shingle_k).alias("shingles")
    )
    # signature derived from the SAME shingle column in one projection
    # chain (a separate sigs branch + join-back would re-shingle and
    # re-scan the table)
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_hashes)
    idx = F.sequence(F.lit(0), F.lit(num_hashes - 1))

    def fold_step(acc: Column, h: Column) -> Column:
        candidates = F.transform(
            idx,
            lambda i: ((2 * i + 1).cast("long") * h + (i * 7919 + 12345).cast("long"))
            % F.lit(MINHASH_PRIME),
        )
        return F.zip_with(acc, candidates, lambda a, b: F.least(a, b))

    base = shingled.withColumn(
        "minhash_sig", F.aggregate(F.transform("shingles", _hash64), init, fold_step)
    )

    def band_hash(b: int) -> Column:
        parts = [
            F.element_at("minhash_sig", b * rows_per_band + r + 1).cast("string")
            for r in range(rows_per_band)
        ]
        return F.md5(F.concat_ws("_", *parts))

    # carry the shingle arrays through the band join: no join-backs;
    # duplicate candidates (pairs sharing several bands) are collapsed
    # AFTER verification, when rows are tiny (id, id, double)
    banded = base.select(
        F.col(id_col),
        "shingles",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), band_hash(b).alias("band_key"))
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "shingles", "band.band_idx", "band.band_key")

    # pre-shuffle on the join key (the self-join needs exactly this
    # partitioning). ReuseExchange does not kick in for this self-join
    # shape, so each side re-shingles — but materializing the banded
    # relation with a lazy localCheckpoint was MEASURED SLOWER (3.87s vs
    # 2.95s at sf0.1): serializing the wide shingle arrays to block
    # storage costs more than recomputing them. Recompute wins.
    banded = banded.repartition("band_idx", "band_key")

    left = banded.select(
        F.col(id_col).alias("a_id"), F.col("shingles").alias("a_sh"), "band_idx", "band_key"
    )
    right = banded.select(
        F.col(id_col).alias("b_id"), F.col("shingles").alias("b_sh"), "band_idx", "band_key"
    )
    shared = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
    union = (F.size("a_sh") + F.size("b_sh")).cast("double") - shared
    return (
        left.join(right, ["band_idx", "band_key"])
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("jaccard", shared / union)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
        .distinct()
    )

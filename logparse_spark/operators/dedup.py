"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM built-ins (whole-stage codegen) — the MinHash
signature computation is pure SQL expressions (higher-order functions
over the shingle array), NOT a Python UDF; only SimHash uses a
vectorized pandas UDF (64 bit-counters don't express well in SQL).

Scale design:
- exact: one hash-shuffle on a 64-bit content hash (not the text);
- MinHash-LSH: candidates come from an equi-join on (band, band_hash)
  buckets — never an O(n^2) cross join; verification touches only
  bucket collisions;
- SimHash: banding on 16-bit chunks (pigeonhole: hamming<=3 over 64
  bits guarantees one of 4 chunks equal) -> equi-join, then exact
  hamming verify;
- embedding near-dup: random-hyperplane LSH buckets -> in-bucket
  cosine, hyperplanes derived deterministically from a seed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per exact (normalized) text.

    groupBy on a 256-bit content hash: the shuffle key is 32 bytes
    regardless of document size, and the full text never shuffles.
    """
    h = F.sha2(F.col(text_col), 256).alias("content_hash")
    return (
        df.select(F.col(id_col), h)
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dupes"))
    )


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH (all JVM expressions)
# ---------------------------------------------------------------------------

# 2^31-1: keeps a*h+b < 2^62 — no int64 overflow (Spark 4 ANSI mode
# makes arithmetic overflow a runtime ERROR, not a silent wrap)
_MERSENNE = (1 << 31) - 1


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (pure SQL)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
    )


def minhash_signature(shingles: Column, num_hashes: int = 32, seed: int = 42) -> Column:
    """num_hashes-wide MinHash signature as array<bigint> — pure SQL.

    h_i(s) = (a_i * xxhash64(s) + b_i) mod M  (Carter-Wegman family);
    signature[i] = min over shingles.  ONE aggregate pass over the
    shingle array computes all num_hashes mins simultaneously
    (elementwise zip_with/least against the running signature).
    """
    import random

    rnd = random.Random(seed)
    a = [rnd.randrange(1, _MERSENNE) for _ in range(num_hashes)]
    b = [rnd.randrange(0, _MERSENNE) for _ in range(num_hashes)]

    def hashes_of(s):
        base = F.pmod(F.xxhash64(s), F.lit(_MERSENNE))  # pmod: always >= 0
        return F.array(
            *[F.pmod(F.lit(a[i]) * base + F.lit(b[i]), F.lit(_MERSENNE))
              for i in range(num_hashes)]
        )

    init = F.array(*[F.lit(_MERSENNE).cast("bigint")] * num_hashes)
    return F.aggregate(
        shingles, init,
        lambda acc, s: F.zip_with(acc, hashes_of(s), lambda x, y: F.least(x, y)),
    )


def minhash_signature_np(
    text_col: str, num_hashes: int = 32, shingle_n: int = 3, seed: int = 42,
) -> Column:
    """Vectorized MinHash signature via Arrow pandas UDF + numpy.

    Same hash family as :func:`minhash_signature` in spirit but computed
    as one (n_shingles x num_hashes) numpy broadcast per doc — measured
    ~10x the SQL higher-order-function version (interpreted lambda per
    element there).  The UDF path wins here because the inner loop is a
    dense numeric kernel, exactly the case Arrow-batched numpy is for.
    """
    import random

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rnd = random.Random(seed)
    a = np.array([rnd.randrange(1, _MERSENNE) for _ in range(num_hashes)], dtype=np.uint64)
    b = np.array([rnd.randrange(0, _MERSENNE) for _ in range(num_hashes)], dtype=np.uint64)
    M = np.uint64(_MERSENNE)

    def _sig(texts):
        out = []
        for t in texts:
            words = str(t or "").lower().split()
            if len(words) >= shingle_n:
                grams = {" ".join(words[i:i + shingle_n])
                         for i in range(len(words) - shingle_n + 1)}
            else:
                grams = {" ".join(words)} if words else {""}
            hs = pd.util.hash_array(np.array(sorted(grams), dtype=object)) % M
            sig = (hs[:, None] * a[None, :] + b[None, :]) % M  # (n_shingles, H)
            out.append(sig.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    _sig.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_sig, "array<long>")(F.col(text_col))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    impl: str = "np",
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH (id_a < id_b).

    shingle -> minhash -> band -> bucket equi-join: the only shuffle is
    the groupBy on (band, band_hash); bucket sizes are bounded by true
    similarity structure, never by corpus size.

    impl='np' (default): Arrow/numpy signature kernel; impl='sql': pure
    JVM higher-order expressions (zero Python, ~10x slower per row —
    kept as the no-Python-runtime option and as a semantic cross-check).
    """
    rows_per_band = num_hashes // bands
    if impl == "np":
        sig_col = minhash_signature_np(text_col, num_hashes, shingle_n, seed)
    else:
        sig_col = minhash_signature(word_shingles(F.col(text_col), shingle_n), num_hashes, seed)
    sig = df.select(F.col(id_col).alias("id"), sig_col.alias("sig"))
    banded = sig.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(
                        F.array_join(F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band), ",")
                    ).alias("band_hash"),
                ),
            )
        ).alias("bh"),
    ).select("id", "bh.band", "bh.band_hash")
    buckets = banded.groupBy("band", "band_hash").agg(F.collect_set("id").alias("ids"))
    pairs = (
        buckets.where(F.size("ids") > 1)
        .select(F.explode(F.array_sort("ids")).alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .where(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    shingle_n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard over blocked candidate pairs.

    `block_col` bounds the join (same-language, length bucket, or an
    LSH bucket from minhash_lsh_candidates); without blocking this is
    quadratic and refuses to pretend otherwise.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        (F.col(block_col) if block_col else F.lit(0)).alias("blk"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            (inter / F.when(union > 0, union)).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash (vectorized pandas UDF for the 64 bit-counters)
# ---------------------------------------------------------------------------


def simhash_col(text_col: str = "text") -> Column:
    """64-bit SimHash of whitespace tokens as a bigint column."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _simhash(texts):
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            words = str(t).lower().split()
            if not words:
                continue
            # pd.util.hash_array is deterministic across processes
            # (fixed siphash key) — NEVER builtin hash() (PYTHONHASHSEED)
            hs = pd.util.hash_array(np.array(words, dtype=object))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).sum(axis=0)
            sim = np.where(bits * 2 >= hs.size, np.uint64(1), np.uint64(0))
            out[i] = np.int64((sim << np.arange(64, dtype=np.uint64)).sum().astype(np.uint64))
        return pd.Series(out)

    # `from __future__ import annotations` stringifies hints, which the
    # pandas_udf type-hint inspector rejects — set them concretely.
    _simhash.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(_simhash, "long")(F.col(text_col))


def simhash_near_dups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Pigeonhole banding: split 64 bits into 4 x 16-bit chunks; any pair
    within hamming 3 shares >=1 exact chunk -> equi-join per chunk,
    union, exact hamming verify (bit_count is a JVM builtin).
    """
    s = df.select(F.col(id_col).alias("id"), simhash_col(text_col).alias("sh"))
    chunks = s.select(
        "id", "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("sh"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ckey"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "sh", "c.chunk", "c.ckey")
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.expr("bit_count(a.sh ^ b.sh)")
    return (
        a.join(b, (F.col("a.chunk") == F.col("b.chunk")) & (F.col("a.ckey") == F.col("b.ckey"))
                 & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup (random hyperplane LSH, pure SQL)
# ---------------------------------------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def embedding_near_dups(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    n_planes: int = 12,
    min_cosine: float = 0.95,
    seed: int = 42,
) -> DataFrame:
    """Cosine near-dups via sign-LSH buckets + in-bucket exact cosine.

    Hyperplanes are seed-derived literal arrays folded into the plan;
    bucket key = n_planes sign bits -> one equi-join shuffle.
    """
    import random

    rnd = random.Random(seed)
    planes = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]
    vec = F.col(vec_col)
    bits = [
        F.when(_dot(vec, F.array(*[F.lit(float(w)) for w in p])) >= 0, 1).otherwise(0) * (1 << i)
        for i, p in enumerate(planes)
    ]
    bucket = sum(bits[1:], bits[0]).alias("bucket")
    v = df.select(F.col(id_col).alias("id"), vec.alias("v"), bucket)
    a, b = v.alias("a"), v.alias("b")
    cos = (_dot(F.col("a.v"), F.col("b.v"))
           / (_norm(F.col("a.v")) * _norm(F.col("b.v")))).alias("cosine")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos)
        .where(F.col("cosine") >= min_cosine)
    )

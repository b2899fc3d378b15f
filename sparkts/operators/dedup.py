"""Deduplication operators for large text corpora.

Four tiers of dedup, all expressed as DataFrame ops (JVM-side, no Python in
the hot path) so they hold up at 10^12-document scale:

* exact           — content-hash groupBy (one shuffle on the hash)
* MinHash + LSH   — shingle → K minhashes → band buckets → candidate pairs;
                    only bucket-mates are ever compared, so cost is
                    O(docs · K) + O(candidate pairs), never O(n²)
* SimHash         — 64-bit signed-projection fingerprint; near-dups share
                    16-bit chunks (banded Hamming)
* embedding cosine— see sparkts.operators.similarity

Determinism: every hash family is seeded with literal constants, so results
are identical under any partitioning/executor count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def tokenize(text_col: str = "text") -> F.Column:
    """Whitespace tokens (split on runs of spaces); JVM-side."""
    return F.split(F.col(text_col), r"\s+")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each distinct text.

    One shuffle on md5(text); at scale the hash groupBy benefits from
    map-side partial aggregation (few dup groups ≫ rows).
    """
    h = F.md5(F.col(text_col)).alias("content_hash")
    keep = (
        df.select(h, F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
    )
    return df.join(keep.select(id_col, "n_dups"), id_col, "inner")


def word_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  k: int = 2) -> DataFrame:
    """Distinct word k-shingles per document: (id, shingle)."""
    toks = df.select(id_col, tokenize(text_col).alias("w"))
    parts = ", ".join(
        f"w[i{'+' + str(j) if j else ''}]" for j in range(k)
    )
    expr = f"transform(sequence(0, size(w)-{k}), i -> concat_ws(' ', {parts}))"
    return toks.select(id_col, F.explode(F.expr(expr)).alias("shingle")).distinct()


_MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)


def minhash_coeffs(n_hashes: int, seed: int = 13) -> list[tuple[int, int]]:
    """Seeded universal-hash family (a_i, b_i): h_i(x) = (a_i·x + b_i) mod p.

    Deterministic and engine-agnostic: the same coefficients drive the Spark
    plan and a plain-SQL oracle. Products stay < 2^61 because the base hash
    is truncated to 30 bits, so no engine needs wrap-around arithmetic."""
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MINHASH_P, size=n_hashes)
    b = rng.randint(0, _MINHASH_P, size=n_hashes)
    return [(int(a[i]), int(b[i])) for i in range(n_hashes)]


def minhash_base_col(shingle_col: str = "shingle") -> F.Column:
    """30-bit base hash of a shingle: first 8 hex chars of md5, mod 2^30.

    md5-derived (not xxhash64) so an external SQL engine can reproduce it
    exactly; md5 + conv are JVM codegen'd expressions, still no UDF."""
    return (
        F.conv(F.substring(F.md5(F.col(shingle_col)), 1, 8), 16, 10)
        .cast("long") % F.lit(2**30)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_k: int = 2,
    seed: int = 13,
) -> DataFrame:
    """Per-doc MinHash signature: array<long> of length n_hashes.

    Hash family i = (a_i·base + b_i) mod p over the md5-derived 30-bit base
    shingle hash (universal hashing; same family expressible in any SQL
    engine, which is how the driver oracle value-checks this pipeline).
    Computed as n_hashes MIN aggregates over the exploded shingle relation —
    one shuffle on id, everything codegen'd.
    """
    sh = word_shingles(df, id_col, text_col, shingle_k)
    base = minhash_base_col("shingle").alias("hbase")
    sh = sh.select(id_col, base)
    mins = [
        F.min((F.lit(a) * F.col("hbase") + F.lit(b)) % F.lit(_MINHASH_P)).alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_coeffs(n_hashes, seed))
    ]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(
        id_col, F.array(*[f"h{i}" for i in range(n_hashes)]).alias("signature")
    )


def drop_hot_buckets(
    bucketed: DataFrame,
    max_bucket_size: int | None,
    keys: tuple[str, str] = ("band", "bucket"),
) -> DataFrame:
    """Drop (band, bucket) groups larger than the cap before a bucket
    self-join — the standard LSH skew guard. A degenerate bucket of B
    boilerplate/template docs contributes B²/2 candidate pairs (the classic
    web-corpus dedup scale-killer); members of a dropped bucket can still
    pair through their OTHER bands, so recall degrades gracefully. Dropping
    is deterministic (pure size predicate, no sampling). ``None`` disables.

    The broadcast side is the OVER-cap set (anti-joined away), not the
    kept set: on a mostly-unique web corpus almost every (band, bucket) is
    a singleton, so the kept set is ~rows-sized (docs × bands — billions
    at the 100 TB scale this guard exists for) while the genuinely hot
    buckets are by construction few. No extra shuffle on the big side."""
    if max_bucket_size is None:
        return bucketed
    k = list(keys)
    hot = (bucketed.groupBy(*k)
           .agg(F.count("*").alias("__bsz"))
           .where(F.col("__bsz") > max_bucket_size)
           .drop("__bsz"))
    return bucketed.join(F.broadcast(hot), k, "left_anti")


def hot_bucket_stats(
    bucketed: DataFrame,
    max_bucket_size: int,
    keys: tuple[str, str] = ("band", "bucket"),
) -> DataFrame:
    """The dropped mass: (band, bucket, bucket_size) for every bucket over
    the cap. A production pipeline writes this next to its lineage/metrics
    table so the recall cost of the guard is observable, not silent."""
    k = list(keys)
    return (bucketed.groupBy(*k)
            .agg(F.count("*").alias("bucket_size"))
            .where(F.col("bucket_size") > max_bucket_size))


def lsh_band_explode(
    sig: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """(id, signature) → (id, band, bucket): one row per band, bucket key =
    the stringified signature slice (grouping semantics identical to hashing
    it, and reproducible in plain SQL). The signature array itself is NOT
    carried through the explode — only the ~40-byte (id, band, bucket) rows
    reach the self-join shuffle (the full 64-long array ×bands would be
    ~16× the bytes); est_jaccard re-joins signatures onto the (few)
    candidate pairs afterwards."""
    band_cols = [
        F.concat_ws(
            ",", *[F.col("signature")[b * rows_per_band + r].cast("string")
                   for r in range(rows_per_band)]
        ).alias(f"b{b}")
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    return banded.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bucket"))
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banding: docs sharing any band bucket become candidate pairs.

    (id, signature) → explode band keys → bucket self-join → re-join
    signatures on the surviving pairs. Output: (doc_a, doc_b, est_jaccard)
    where est_jaccard = fraction of equal signature components (the
    unbiased MinHash estimator).

    ``max_bucket_size`` is the hot-bucket skew guard (see
    :func:`drop_hot_buckets`) — without it one template-page bucket of B
    docs costs B²/2 join rows at web scale.
    """
    n = bands * rows_per_band
    long = lsh_band_explode(sig, id_col, bands, rows_per_band)
    long = drop_hot_buckets(long, max_bucket_size)
    a = long.alias("a")
    b = long.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # signatures rejoin only the candidate pairs (pairs ≪ docs·bands rows);
    # the two sig scans share the signature aggregation's exchange
    sig_a = sig.select(F.col(id_col).alias("doc_a"),
                       F.col("signature").alias("sig_a"))
    sig_b = sig.select(F.col(id_col).alias("doc_b"),
                       F.col("signature").alias("sig_b"))
    est = (
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(n)
    )
    return (
        pairs.join(sig_a, "doc_a").join(sig_b, "doc_b")
        .select("doc_a", "doc_b", est.alias("est_jaccard"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """End-to-end near-dup pairs with estimated Jaccard ≥ threshold."""
    sig = minhash_signatures(df, id_col, text_col, n_hashes, shingle_k)
    pairs = lsh_candidate_pairs(sig, id_col, bands, n_hashes // bands,
                                max_bucket_size)
    return pairs.where(F.col("est_jaccard") >= threshold)


SIMHASH_BITS = 60  # md5-derived token hash: 15 hex chars = 60 bits, so the
# fingerprint stays a positive BIGINT in every SQL engine (the driver oracle
# recomputes the whole pipeline in DuckDB)


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash per doc: sign of the per-bit sum of token-hash bits.

    Exploded token relation + 60 conditional-sum aggregates; one shuffle.
    """
    toks = df.select(
        id_col, F.explode(tokenize(text_col)).alias("tok")
    ).withColumn(
        "th", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    )
    sums = [
        F.sum(
            F.when(F.shiftright("th", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*sums)
    bit_terms = [
        F.when(F.col(f"s{i}") > 0, F.lit(2**i).cast("long")).otherwise(0)
        for i in range(SIMHASH_BITS)
    ]
    fp = bit_terms[0]
    for t in bit_terms[1:]:
        fp = fp + t
    return agg.select(id_col, fp.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate pairs whose SimHashes agree on ≥1 of four 15-bit chunks,
    verified by exact Hamming distance ≤ max_hamming.

    ``max_bucket_size`` caps (chunk, val) bucket membership before the
    self-join (see :func:`drop_hot_buckets`). Unlike the MinHash path the
    8-byte fingerprint IS carried through the explode — it costs less than
    the re-join it would save."""
    fp = simhash(df, id_col, text_col)
    chunks = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk"),
                    F.shiftrightunsigned("simhash", c * 15)
                    .bitwiseAND(F.lit(0x7FFF))
                    .alias("val"),
                )
                for c in range(4)
            ])
        ).alias("cc"),
    ).select(id_col, "simhash", "cc.chunk", "cc.val")
    chunks = drop_hot_buckets(chunks, max_bucket_size, keys=("chunk", "val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# --------------------------------------------------------------------- #
# duplicate-cluster closure: pairs → connected components → keep flags
# --------------------------------------------------------------------- #

def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Transitive closure over a duplicate-pair graph: connected components
    by iterative min-label propagation. Returns (doc_id, cluster_id) where
    cluster_id is the smallest doc id in the component — the canonical
    "keep" representative.

    This is the step between near-dup PAIR emitters (minhash/simhash/
    cosine) and actually dropping rows: A~B and B~C must collapse A,B,C
    into one cluster even though (A,C) was never emitted.

    Scale design: each iteration is one join + one aggregation, both keyed
    on doc id (no global collect); labels converge in O(log diameter)
    iterations for the short near-dup chains real corpora produce. Lineage
    is truncated per iteration with localCheckpoint so the plan doesn't
    grow unboundedly, and convergence is detected with a changed-count
    aggregate (0 rows changed → fixpoint).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # candidate label for each node: the smallest label among neighbors
        neigh = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("n_min"))
        )
        new_labels = (
            labels.join(neigh, labels.doc_id == neigh.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("n_min"), F.col("cluster_id")),
                ).alias("cluster_id"),
                (F.col("n_min") < F.col("cluster_id")).alias("_changed"),
            )
        ).localCheckpoint()
        changed = new_labels.where(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_keep_flags(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> DataFrame:
    """Attach (cluster_id, keep) to every document: docs not in any pair
    keep themselves (cluster of one); inside a cluster only the smallest
    id survives. Left join — the doc table is never filtered implicitly."""
    clusters = duplicate_clusters(pairs, a_col, b_col)
    return (
        docs.join(clusters, docs[id_col] == clusters.doc_id, "left")
        .drop(clusters.doc_id)
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
        .withColumn("keep", F.col("cluster_id") == F.col(id_col))
    )

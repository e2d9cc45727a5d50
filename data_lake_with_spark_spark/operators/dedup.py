"""Deduplication operators (SURVEY §2.10 E1/E2).

Four families, all shuffle-disciplined for the 100 TB case:

- **exact**: hash group-by on the dedup key — one shuffle, map-side
  partial aggregation. Deterministic survivor = min(id).
- **n-gram Jaccard (exact pairwise)**: distinct word-shingles →
  self-join on shingle (the inverted-index join: work is proportional
  to Σ posting-list², not n²) → Jaccard from intersection + set sizes.
- **MinHash + LSH (approximate, scale path)**: k min-hashes per doc →
  band signatures → bucket join → candidates verified with exact
  Jaccard. Candidate generation cost is O(n·bands); never O(n²).
- **SimHash**: 64-bit signature via per-bit weighted majority of token
  hashes; near-dup candidates via the 4×16-bit chunk pigeonhole
  (hamming ≤ 3 ⇒ at least one chunk identical) then exact hamming
  verification with bit_count(xor).

Everything is JVM-side expressions (xxhash64 / bitwise / HOFs) — no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from data_lake_with_spark_spark.operators.plan_cache import shared
from data_lake_with_spark_spark.functions.text import (
    tokens,
    word_shingles_from_tokens,
)


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Keep one deterministic survivor (min id) per exact key group.

    Returns (key_cols..., keep_id, n_copies). One hash-agg shuffle;
    at 100 TB pre-partitioning the write on ``key_cols`` lets this run
    shuffle-free on subsequent loads.
    """
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def shingle_arrays(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, shingles) — distinct word n-gram shingle array per doc.
    Tokens are projected in their own select (perf: see
    word_shingles_from_tokens)."""
    return docs.select(
        F.col(id_col).alias("id"), tokens(text_col).alias("toks")
    ).select("id", word_shingles_from_tokens(F.col("toks"), n).alias("shingles"))


def _token_arrays(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, toks) with the token array materialized BEHIND a shuffle
    barrier. The barrier is the whole trick: computing shingles with
    array HOFs directly over ``tokens(text)`` lets CollapseProject
    substitute the tokenization into every consumer (the lambda body
    included → O(tokens²) re-splitting; measured 6× blowup). An
    exchange is a hard optimizer boundary, so downstream HOFs see
    ``toks`` as a plain attribute — referenced, never recomputed.
    ``widen_if_narrow`` doubles as the barrier AND fixes the
    single-file testdata scan (1 task) — on a properly-split table it
    falls back to ``repartition(id)`` only to keep the barrier."""
    # expr-string construction (round-15: plan-construction py4j
    # chatter is driver latency paid per bench pass — guide §1.2 "per
    # task work" applied to the DRIVER; analyzes to the identical
    # filter(split(trim(text))) expression tokens() builds)
    toks = docs.selectExpr(
        f"`{id_col}` AS id",
        f"filter(split(trim(`{text_col}`), '\\\\s+'), t -> t != '') AS toks",
    )
    from data_lake_with_spark_spark.catalog import scan_partitions

    cores = docs.sparkSession.sparkContext.defaultParallelism
    if scan_partitions(toks) < max(2, cores // 2):
        return toks.repartition(cores)
    return toks.repartition("id")


def shingle_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3) -> DataFrame:
    """(id, shingle) — distinct word n-gram shingles per doc: array
    HOFs (slice+concat_ws over the barrier-materialized token array)
    then per-doc array_distinct + explode. One skinny shuffle of
    (id, token-array) rows; ~3× faster than the previous
    explode+window-lead+distinct form (which shuffled every token
    twice) and identical output."""
    toks = _token_arrays(docs, id_col, text_col)
    # single-selectExpr HOF pipeline (round-15 construction-chatter
    # cut; identical analyzed expressions to the Column form)
    return toks.where(f"size(toks) >= {n}").selectExpr(
        "id",
        f"explode(array_distinct(transform(sequence(0, size(toks) - {n}),"
        f" i -> concat_ws(' ', slice(toks, i + 1, {n}))))) AS shingle",
    )


def sorted_shingle_arrays(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """(id, sorted_shingles) — sorted distinct 64-bit *hashed* word
    n-gram shingles per doc. This is the pure-function-of-text
    representation that ingestion persists as a companion column
    (operators/ingest.py) so the corpus is never re-tokenized.

    Shingles are hashed to longs up front (xxhash64): joins and
    array_intersect run on 8-byte keys instead of ~20-char strings,
    and collision odds at realistic shingle cardinalities are ~n²/2⁶⁴
    (irrelevant).

    The whole per-doc array is computed with HOFs over the
    barrier-materialized token array (see _token_arrays): one skinny
    shuffle instead of explode + window-lead + collect_set shuffling
    every token twice — measured 2.7s → 1.5s cold, 1.1s → 0.4s warm
    at sf0.1, identical output. Docs with fewer than ``n`` tokens have
    no shingles and are excluded.
    """
    toks = _token_arrays(docs, id_col, text_col)
    # single-selectExpr HOF pipeline (round-15 construction-chatter
    # cut; same analyzed transform/xxhash64 tree as the Column form)
    return toks.where(f"size(toks) >= {n}").selectExpr(
        "id",
        f"sort_array(array_distinct(transform(sequence(0, size(toks) - {n}),"
        f" i -> xxhash64(concat_ws(' ', slice(toks, i + 1, {n}))))))"
        " AS sorted_shingles",
    )


def prefix_from_arrays(arrays: DataFrame, threshold: float) -> DataFrame:
    """(id, sorted_shingles) → + (n_sh, prefix): the PPJoin prefix is
    the first |A| - ⌈t·|A|⌉ + 1 (hash-order rarest) shingles. Two docs
    with Jaccard ≥ t MUST share a prefix shingle — the candidate join
    only explodes prefixes. The global order is the HASH order — any
    fixed total order preserves the PPJoin guarantee, and hash order
    needs no shingle-frequency table and no extra join.
    (Document-frequency order would make prefixes rarer/candidates
    fewer, but costs 2 more shuffles — measured net-slower here.)
    Pure column math over the stored arrays — no text access."""
    # expr-string form (round-15 construction-chatter cut); the D
    # suffix keeps the threshold a DOUBLE literal exactly like
    # F.lit(threshold), so ceil sees the identical arithmetic
    return arrays.selectExpr("*", "size(sorted_shingles) AS n_sh").selectExpr(
        "*",
        f"slice(sorted_shingles, 1,"
        f" (n_sh - CAST(ceil({threshold!r}D * n_sh) AS INT)) + 1) AS prefix",
    )


def _prefix_filtered_shingles(
    docs: DataFrame, threshold: float, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, sorted_shingles, n_sh, prefix) from raw text — see
    sorted_shingle_arrays + prefix_from_arrays. The result is a tracked
    shared() cache — callers fan out over it 4× (posting a/b + verify
    a/b), and long-lived sessions reclaim the storage via
    release_shared_caches()."""
    return shared(
        prefix_from_arrays(
            sorted_shingle_arrays(docs, id_col, text_col, n), threshold
        )
    )


# Below this much INPUT (Catalyst's plan-stats estimate — on-disk
# parquet bytes for file scans) the shingle-array side fits a sane
# broadcast (~10× inflation text→hashed-shingle arrays: 4 MiB input
# ≈ 30k docs ≈ 40 MB of arrays) and verify becomes map-side-only;
# above it, shuffle joins — the 100 TB path. Stats-based so the
# decision needs NO action during plan construction.
BROADCAST_ARRAYS_MAX_INPUT_BYTES = 4 << 20


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's estimated output size of the plan (derived from file
    sizes for parquet scans, filter selectivity applied) — a lazy
    stand-in for count() when choosing join strategy."""
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))  # noqa: SLF001


def jaccard_verify(
    candidates: DataFrame,
    shingle_arrays: DataFrame,
    threshold: float,
    broadcast_arrays: bool = False,
) -> DataFrame:
    """Exact Jaccard for candidate (a_id, b_id) pairs against per-doc
    distinct-shingle arrays — O(|shingles|) per candidate, no global
    pair join. With ``broadcast_arrays`` the two array attachments are
    broadcast joins (zero shuffles in the verify phase) — callers
    enable it when the corpus is small enough (see
    BROADCAST_ARRAYS_MAX_DOCS)."""
    arr_a = shingle_arrays.selectExpr(
        "id AS a_id", "sorted_shingles AS a_sh", "n_sh AS n_a"
    )
    arr_b = shingle_arrays.selectExpr(
        "id AS b_id", "sorted_shingles AS b_sh", "n_sh AS n_b"
    )
    if broadcast_arrays:
        arr_a, arr_b = F.broadcast(arr_a), F.broadcast(arr_b)
    # expr-string form (round-15 construction-chatter cut): the
    # intersect subtree appears twice exactly like the Column form's
    # reused ``inter`` Column; 0.5D/1e6 keep double literal types
    jac = (
        "size(array_intersect(a_sh, b_sh))"
        " / (n_a + n_b - size(array_intersect(a_sh, b_sh)))"
    )
    return (
        candidates.join(arr_a, "a_id")
        .join(arr_b, "b_id")
        .selectExpr(
            "a_id", "b_id", f"floor(({jac}) * 1e6 + 0.5D) / 1e6 AS jaccard"
        )
        .where(f"jaccard >= {threshold!r}D")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact pairwise Jaccard ≥ threshold over word n-gram shingle sets.

    PPJoin-style: prefix-filtered inverted-index join (only the rarest
    |A|-⌈t|A|⌉+1 shingles of each doc enter the index) + length filter
    (t·|A| ≤ |B| ≤ |A|/t) generate candidates; exact verification via
    array_intersect. Both filters are lossless for Jaccard ≥ t, so the
    result is identical to the naive O(n²) join at a fraction of the
    candidates. Output (a_id, b_id, jaccard), a_id < b_id.
    """
    pref = _prefix_filtered_shingles(docs, threshold, n, id_col, text_col)
    return jaccard_pairs_from_prefix(
        pref,
        threshold,
        broadcast_arrays=_plan_size_bytes(docs) <= BROADCAST_ARRAYS_MAX_INPUT_BYTES,
    )


def jaccard_pairs_from_prefix(
    pref: DataFrame, threshold: float, broadcast_arrays: bool = False
) -> DataFrame:
    """The PPJoin candidate+verify pipeline over a prepared prefix
    table (id, sorted_shingles, n_sh, prefix) — see ngram_jaccard_pairs
    for the algorithm. Split out so callers holding PRECOMPUTED shingle
    arrays (the ingestion companion column) skip tokenization
    entirely."""
    posting = pref.selectExpr(
        "id", "n_sh", "posexplode(prefix) AS (pos, shingle)"
    )
    a = posting.alias("a")
    b = posting.alias("b")
    # Join predicate as ONE expr string (round-15 construction-chatter
    # cut — the Column-API conjunction was ~20 py4j round-trips per
    # construction; analyzes to the identical predicate, D-suffixed
    # literals keeping F.lit(threshold)'s double type).
    # PPJoin positional filter included: overlap can't exceed what's
    # left after the matching prefix position on either side; jaccard
    # ≥ t needs overlap ≥ ⌈t/(1+t)·(|A|+|B|)⌉. Lossless; halves
    # candidates here.
    # No pre-verify distinct: the positional filter already leaves <5%
    # duplicate candidates (measured 221k raw vs 211k distinct at
    # sf0.1), so deduplicating BEFORE verify costs a full candidate
    # shuffle to save 5% of the (cheap, map-side) intersect work.
    # Dedup after verify instead, on the few surviving pairs.
    cond = F.expr(
        f"a.shingle = b.shingle AND a.id < b.id"
        f" AND b.n_sh >= {threshold!r}D * a.n_sh"
        f" AND b.n_sh * {threshold!r}D <= a.n_sh"
        f" AND least(a.n_sh - a.pos, b.n_sh - b.pos)"
        f" >= ceil({threshold / (1 + threshold)!r}D * (a.n_sh + b.n_sh))"
    )
    candidates = a.join(b, cond).selectExpr("a.id AS a_id", "b.id AS b_id")
    verified = jaccard_verify(candidates, pref, threshold, broadcast_arrays)
    return verified.distinct()


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Directional shingle containment C(a→b) = |A∩B| / |A| ≥ threshold
    — the near-CONTAINMENT detector (quotes, excerpts, supersets) that
    symmetric Jaccard misses: a short doc fully quoted inside a long
    one has high containment but low Jaccard.

    Prefix filtering still applies, but only on the contained (A) side:
    an overlap ≥ ⌈t·|A|⌉ forces a shared shingle within the first
    |A| − ⌈t·|A|⌉ + 1 of A's sorted shingles, while B contributes its
    FULL posting list (containment puts no upper bound on |B|). The
    candidate join is A-prefix × B-full on the shingle hash — lossless,
    and at scale the A-side explode is a fraction of the corpus. The
    only B-side filter is |B| ≥ ⌈t·|A|⌉ (B must be big enough to hold
    the overlap). Verification is exact array_intersect against the
    cached per-doc arrays. Output (a_id, b_id, containment), a ≠ b,
    both directions evaluated independently.
    """
    pref = _prefix_filtered_shingles(docs, threshold, n, id_col, text_col)
    a = pref.select(
        "id", "n_sh", F.explode("prefix").alias("shingle")
    ).alias("a")
    b = pref.select(
        "id", "n_sh", F.explode("sorted_shingles").alias("shingle")
    ).alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") != F.col("b.id"))
            & (F.col("b.n_sh") >= F.ceil(F.lit(threshold) * F.col("a.n_sh"))),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    arr_a = pref.select(
        F.col("id").alias("a_id"),
        F.col("sorted_shingles").alias("a_sh"),
        F.col("n_sh").alias("n_a"),
    )
    arr_b = pref.select(
        F.col("id").alias("b_id"),
        F.col("sorted_shingles").alias("b_sh"),
    )
    if _plan_size_bytes(docs) <= BROADCAST_ARRAYS_MAX_INPUT_BYTES:
        arr_a, arr_b = F.broadcast(arr_a), F.broadcast(arr_b)
    inter = F.size(F.array_intersect(F.col("a_sh"), F.col("b_sh")))
    cont = inter / F.col("n_a")
    return (
        candidates.join(arr_a, "a_id")
        .join(arr_b, "b_id")
        .select(
            "a_id", "b_id", (F.floor(cont * 1e6 + 0.5) / 1e6).alias("containment")
        )
        .where(F.col("containment") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) MinHash signature per document.

    Hash family: xxhash64(shingle, i) — k independent 64-bit functions,
    deterministic across runs/executors. One explode + one hash-agg
    shuffle computes all k minima (map-side partial min).
    """
    sh = shingle_table(docs, id_col, text_col, n)
    # expr-string form (round-14: one py4j call per aggregate instead
    # of ~6 — plan construction is driver latency the bench pays per
    # pass); analyzes to the identical min(xxhash64(shingle, i))
    aggs = [
        F.expr(f"min(xxhash64(shingle, {i}))").alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs via MinHash banding, verified with exact Jaccard.

    bands=4 × rows=4 over 16 hashes: detection prob at j=0.8 is
    1-(1-0.8⁴)⁴ ≈ 0.92 per band family — candidates only; the exact
    Jaccard verification keeps precision at 1.0. Output
    (a_id, b_id, jaccard ≥ threshold).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, id_col, text_col)
    # single-selectExpr banding (same py4j-chatter cut as the
    # signature aggregates; identical analyzed expressions)
    band_structs = ", ".join(
        "struct(CAST({b} AS INT) AS band, xxhash64({cols}) AS val)".format(
            b=b,
            cols=", ".join(
                f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    stacked = sig.selectExpr(
        "id", f"explode(array({band_structs})) AS bv"
    ).selectExpr("id", "bv.band AS band", "bv.val AS val")
    a = stacked.alias("a")
    b = stacked.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
    )
    # verify ONLY the LSH candidates (per-pair array_intersect) — the
    # whole point of banding is never touching the full pair space
    arrays = _prefix_filtered_shingles(docs, threshold, n, id_col, text_col)
    return jaccard_verify(
        candidates, arrays, threshold,
        broadcast_arrays=_plan_size_bytes(docs) <= BROADCAST_ARRAYS_MAX_INPUT_BYTES,
    )


def dedup_clusters(pairs: DataFrame, all_ids: DataFrame) -> DataFrame:
    """Cluster near-dup pairs into groups and pick a deterministic
    survivor: (id, cluster_id = min id reachable, keep = id==cluster).

    Connected components via iterative min-label propagation over the
    undirected pair graph — each round every node adopts the smallest
    label among itself and its neighbors; converges in O(diameter)
    rounds (near-dup clusters are tiny, so 2-4 rounds in practice;
    the loop is driver-side but each round is one distributed join).
    ``all_ids``: one column ``id`` covering the full corpus — isolated
    docs become their own cluster and are always kept.
    """
    edges = shared(
        pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
        .union(pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst")))
        .distinct()
    )
    labels = all_ids.select(F.col("id"), F.col("id").alias("label"))
    for _ in range(8):  # diameter bound; near-dup clusters are shallow
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = shared(
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left_outer")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        "id",
        F.col("label").alias("cluster_id"),
        (F.col("id") == F.col("label")).alias("keep"),
    )


def simhash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """(id, simhash) — 64-bit SimHash over whitespace tokens.

    Per bit: sign of Σ_tokens (+1 if bit set in xxhash64(token) else
    -1). Expressed as 64 conditional-sum aggregates in a single
    hash-agg pass (one shuffle; map-side combine keeps it scalable).
    """
    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    def _mask(i: int) -> int:
        # bit 63 as -2^63 keeps the constant in signed-long range
        return (1 << i) if i < 63 else -(1 << 63)

    bit_aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(_mask(i)).cast("long")) != 0, 1).otherwise(-1)
        ).alias(f"s_{i}")
        for i in range(bits)
    ]
    summed = tok.groupBy("id").agg(*bit_aggs)
    sim = F.lit(0).cast("long")
    for i in range(bits):
        sim = sim + F.when(F.col(f"s_{i}") > 0, F.lit(_mask(i)).cast("long")).otherwise(0)
    return summed.select("id", sim.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming (≤ 3).

    Pigeonhole candidate join: split the 64-bit signature into 4
    16-bit chunks; hamming ≤ 3 ⇒ some chunk matches exactly, so the
    equi-join on (chunk_idx, chunk_val) finds all such pairs without
    an O(n²) comparison. Verification: bit_count(a XOR b).
    """
    sig = simhash(docs, id_col, text_col)
    chunks = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col("simhash"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cv"),
    ).select("id", "simhash", F.col("cv.chunk").alias("chunk"), F.col("cv.val").alias("val"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            ham.alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )


def segment_dedup_keep_first(
    docs: DataFrame,
    seg_tokens: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sub-document exact dedup with reconstruction (the C4/RefinedWeb
    line-dedup stage): split each document into fixed ``seg_tokens``
    whitespace-token segments, keep only the globally FIRST occurrence
    of each distinct segment text (min ``(doc_id, seg_idx)``), and
    rebuild every document from its surviving segments in order.
    Catches templated spans shared across otherwise-distinct documents
    that document-level exact dedup can never touch.

    Returns (id_col, clean_text, n_kept, n_total); documents whose
    every segment was claimed earlier disappear entirely.

    Scale shape: segment generation is one HOF pipeline inside the
    scan (sequence→slice→concat, no per-token explode); the winner
    election is ONE hash shuffle of (segment, doc, idx) keyed on the
    segment text; reconstruction is one groupBy(doc) with an ordered
    array rebuild — the same two-shuffle budget as document-level
    exact dedup, independent of how many documents share a segment.
    """
    k = int(seg_tokens)
    segs = (
        docs.select(
            F.col(id_col),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
        )
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, int(ceil(size(t) / {k}.0)) - 1),"
                    f" i -> concat_ws(' ', slice(t, i * {k} + 1, {k})))"
                )
            ).alias("seg_idx", "seg_text"),
        )
    )
    w = W.partitionBy("seg_text").orderBy(F.col(id_col), F.col("seg_idx"))
    ranked = segs.withColumn("_rn", F.row_number().over(w))
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_total"))
    rebuilt = (
        ranked.where(F.col("_rn") == 1)
        .groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_idx", "seg_text"))
                    ),
                    lambda s: s.seg_text,
                ),
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return rebuilt.join(totals, id_col)


def repeated_span_stats(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_index: bool = True,
) -> DataFrame:
    """Cross-document duplicated-span statistics — the substring-level
    dedup signal (Lee et al. 2022, "Deduplicating Training Data Makes
    Language Models Better"): every overlapping ``n``-token span
    position in every document, flagged when the identical span text
    also occurs in at least one OTHER document. Unlike doc-level
    Jaccard (whole-document similarity) and segment keep-first (fixed
    non-overlapping blocks), this measures how much of each document
    is literally copied somewhere else, span by span.

    Returns (id_col, n_spans, n_dup_spans, dup_frac) for documents
    with ≥ n tokens; n_spans = token_count − n + 1 overlapping
    positions, dup_frac portable-rounded to 6 places.

    Scale shape: span generation is one HOF pipeline inside the scan
    (sequence→slice→concat_ws — no per-token explode of raw text);
    the cross-doc span index is ONE distinct + count shuffle keyed on
    span text, filtered to multi-doc spans BEFORE the semi join back
    against positions, so join traffic is proportional to the
    duplicated subset, never all positions × all positions.

    ``hash_index=True`` (the default — the 100 TB shape) shuffles
    ``xxhash64(span)`` 8-byte keys instead of the span strings on the
    index side, cutting shuffle bytes ~10× for 5-token English spans;
    a collision would only nudge a count in a statistics signal
    (P ≈ n²/2⁶⁵ — vanishing at any realistic span cardinality), so
    the DuckDB string-span oracle remains the value twin (the
    portable-twin pattern inverted: here the FAST form stays oracled
    because collisions are absent at test scale).
    ``hash_index=False`` keeps the literal string-span index —
    bit-identical by construction to the oracle.
    """
    k = int(n)
    toks = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("t")
    ).where(F.size("t") >= k)
    spans = toks.select(
        id_col,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(t) - {k}),"
                f" i -> concat_ws(' ', slice(t, i + 1, {k})))"
            )
        ).alias("pos", "span"),
    )
    if hash_index:
        spans = spans.select(
            id_col, "pos", F.xxhash64("span").alias("span")
        )
    multi_doc = (
        spans.select("span", id_col)
        .distinct()
        .groupBy("span")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("span")
    )
    per_dup = (
        spans.join(multi_doc, "span", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )
    per_tot = spans.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_spans"))
    return per_tot.join(per_dup, id_col, "left").select(
        id_col,
        "n_spans",
        F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
        (
            F.floor(
                F.coalesce("n_dup_spans", F.lit(0)) / F.col("n_spans") * 1e6 + 0.5
            )
            / 1e6
        ).alias("dup_frac"),
    )

"""Property tests for the LLM-pipeline operators (dedup, similarity,
text, multimodal) on crafted fixtures + the driver testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_lake_with_spark_spark.catalog import load_table
from data_lake_with_spark_spark.functions.text import BPE_ISH_PATTERN  # noqa: F401
from data_lake_with_spark_spark.functions.text import lang_guess
from data_lake_with_spark_spark.operators import dedup as DD
from data_lake_with_spark_spark.operators import multimodal as MM
from data_lake_with_spark_spark.operators import similarity as SIM

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 1
    (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup of 1
    (4, "completely different words about spark sql engines and shuffles"),
    (5, "tiny"),  # < 3 tokens → no shingles
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(spark, docs):
    out = {r["text"]: r for r in DD.exact_dedup(docs, ["text"], "doc_id").collect()}
    dup = out["the quick brown fox jumps over the lazy dog again and again"]
    assert dup["keep_id"] == 1 and dup["n_copies"] == 2


def test_ngram_jaccard_finds_exact_and_near_dups(spark, docs):
    pairs = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0  # exact dup
    assert (1, 3) in pairs and 0.3 <= pairs[(1, 3)] < 1.0  # near dup
    assert not any(4 in p or 5 in p for p in pairs)


def test_minhash_lsh_recall_on_testdata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["a_id"], r["b_id"]) for r in DD.ngram_jaccard_pairs(docs, 0.5).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"]) for r in DD.minhash_lsh_pairs(docs, 0.5).collect()
    }
    assert lsh <= exact  # precision 1.0 (verified candidates)
    assert len(lsh) >= 0.9 * len(exact)  # high recall on real near-dups


def test_simhash_hamming_small_for_near_dups(spark, docs):
    pairs = {
        (r["a_id"], r["b_id"]): r["hamming"]
        for r in DD.simhash_near_pairs(docs, max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text → identical simhash
    assert (1, 3) in pairs  # near dup → small hamming distance


def test_brute_force_topk_self_similarity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 3)
    out = SIM.brute_force_topk(emb, q, k=4)
    rows = out.collect()
    assert len(rows) == 12
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        scores = [r["score"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor_id"] != qid for r in rs)


def test_lsh_topk_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    bf = SIM.brute_force_topk(emb, q, k=5).collect()
    lsh = SIM.lsh_topk(emb, q, k=5).collect()
    bf_set = {(r["query_id"], r["neighbor_id"]) for r in bf}
    lsh_set = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    # approximate: most of the true top-5 should be retrieved via
    # bucket + 1-bit multiprobe on 64-dim fairly-spread vectors
    assert len(lsh_set & bf_set) / len(bf_set) >= 0.5


def test_lsh_near_pairs_matches_exact_form(spark, sf_dir):
    """lsh_near_pairs must be result-identical to the O(n²) exact form
    on the oracled range: precision 1.0 by construction (exact verify),
    recall 1.0 by measured bucketing margin (L=24 tables at b=3 bits
    for the low 0.35 threshold)."""
    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    exact = {
        (r["a_id"], r["b_id"], r["cos_sim"])
        for r in SIM.cosine_near_pairs(emb, threshold=0.35).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"], r["cos_sim"])
        for r in SIM.lsh_near_pairs(emb, threshold=0.35).collect()
    }
    assert lsh == exact


def test_lang_guess_on_crafted_sentences(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog walk to the house"),
            (2, "der Hund ist nicht da und das ist gut"),
            (3, "el perro y el gato es que los dos"),
            (4, "le chien est un ami et le chat"),
            (5, "xyzzy qwerty plugh"),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["g"] for r in df.select("id", lang_guess("text").alias("g")).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "fr", 5: "und"}


def test_lang_guess_tiebreak_same_first_letter(spark):
    """Equal nonzero hit counts across languages sharing a first
    letter ('la' → es, 'a' → en) must still break alphabetically:
    'en' wins over 'es' — the first-letter-only tiebreak regression."""
    df = spark.createDataFrame([(1, "la a"), (2, "le der")], ["id", "text"])
    got = {r["id"]: r["g"] for r in df.select("id", lang_guess("text").alias("g")).collect()}
    assert got[1] == "en"  # en/es tie, same first letter
    assert got[2] == "de"  # de/fr tie, different first letters


def test_multimodal_roundtrip(spark, docs):
    media = MM.attach_fake_payloads(docs, "doc_id", "text")
    rows = media.collect()
    assert all(len(r["payload"]) == 32 for r in rows)
    assert all(r["meta"]["n_bytes"] == 32 for r in rows)
    feats = MM.fake_feature_extract(media).collect()
    assert len(feats) == len(DOCS)
    assert all(len(r["feature"]) == MM.FEATURE_DIM for r in feats)
    assert all(0.0 <= v <= 1.0 for r in feats for v in r["feature"])
    # determinism: same payload (docs 1,2 share text) → same feature
    by_id = {r["media_id"]: list(r["feature"]) for r in feats}
    assert by_id[1] == by_id[2]


def test_multimodal_decode_unsupported_format_raises(spark, docs):
    """Formats without a stdlib codec (the fake 'image/fake' payloads)
    still fail loudly at execution; wav/png decode for real (see
    test_decode_media_real_and_unsupported)."""
    media = MM.attach_fake_payloads(docs, "doc_id", "text")
    with pytest.raises(Exception, match="PIL|ffmpeg|NotImplemented"):
        MM.decode_media(media).collect()


def test_frame_sample(spark, docs):
    media = MM.attach_fake_payloads(docs, "doc_id", "text")
    frames = MM.frame_sample(media, every_nth=2)
    rows = frames.where(F.col("media_id") == 1).collect()
    # 32 bytes → 8 frames of 4 bytes → every 2nd → 4 frames
    assert len(rows) == 4
    assert all(len(r["frame_bytes"]) == 4 for r in rows)


def test_audio_clip_shape_metadata(spark, docs):
    """clip_media slices payload bytes and rewrites shape metadata:
    full-length clips report the requested length, payloads shorter
    than start+length report their true (smaller) clip size."""
    audio = MM.attach_fake_audio(docs, "doc_id", "text", sample_rate=8000)
    full = {r["media_id"]: r for r in audio.collect()}
    assert all(r["meta"]["n_samples"] == 48 for r in full.values())  # 3×16 md5 bytes
    assert all(r["meta"]["sample_rate"] == 8000 for r in full.values())

    clips = {r["media_id"]: r for r in MM.clip_media(audio, start=16, length=24).collect()}
    for mid, r in clips.items():
        assert r["meta"]["n_samples"] == 24
        assert len(r["payload"]) == 24
        assert bytes(r["payload"]) == bytes(full[mid]["payload"])[16:40]
        assert r["meta"]["media_type"] == "audio/fake"

    # clip running off the end: true length recorded, not the request
    tail = {r["media_id"]: r for r in MM.clip_media(audio, start=40, length=24).collect()}
    for mid, r in tail.items():
        assert r["meta"]["n_samples"] == 8
        assert bytes(r["payload"]) == bytes(full[mid]["payload"])[40:48]


def test_train_test_split_stable_and_sized(spark, sf_dir):
    """Split is content-addressed: per-row assignment identical when
    computed on the full corpus or any subset, and the test share is
    near the requested fraction."""
    from data_lake_with_spark_spark.operators import training as TR

    docs = load_table(spark, sf_dir, "documents")
    full = {r["doc_id"]: r["split"] for r in TR.train_test_split(docs).collect()}
    sub = {
        r["doc_id"]: r["split"]
        for r in TR.train_test_split(docs.where(F.col("doc_id") % 3 == 0)).collect()
    }
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}
    frac = sum(1 for v in full.values() if v == "test") / len(full)
    assert 0.04 < frac < 0.18  # 10% nominal, small-corpus variance


def test_train_test_split_degenerate_fractions(spark, sf_dir):
    """Fractions that round to 0 or 256 buckets must short-circuit:
    the 3-hex-char boundary of format(256) would lexicographically
    invert the split (~93% spuriously marked test)."""
    from data_lake_with_spark_spark.operators import training as TR

    docs = load_table(spark, sf_dir, "documents").limit(200)
    tiny = {r["split"] for r in TR.train_test_split(docs, test_fraction=0.001).collect()}
    assert tiny == {"train"}
    everything = {r["split"] for r in TR.train_test_split(docs, test_fraction=1.0).collect()}
    assert everything == {"test"}


def test_count_min_sketch_merge_and_bounds(spark):
    """CMS algebra: partition-wise sketches merged == one-shot sketch;
    estimates never undercount; a tiny width forces collisions that
    only ever OVERcount."""
    from data_lake_with_spark_spark.operators.sketches import (
        cms_build,
        cms_merge,
        cms_query,
    )

    rows = [(i, f"tok{i % 7}") for i in range(100)] + [(100, "rare")]
    df = spark.createDataFrame(rows, ["i", "item"])
    whole = cms_build(df, "item", d=3, w=4)
    half1 = cms_build(df.where(F.col("i") < 50), "item", d=3, w=4)
    half2 = cms_build(df.where(F.col("i") >= 50), "item", d=3, w=4)
    merged = cms_merge(half1, half2)
    as_cells = lambda s: {(r["row"], r["col"]): r["cnt"] for r in s.collect()}
    assert as_cells(merged) == as_cells(whole)
    true_counts = {r["item"]: r["n"] for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {
        r["item"]: r["est"]
        for r in cms_query(whole, df.distinct(), "item", d=3, w=4).collect()
    }
    assert all(est[k] >= v for k, v in true_counts.items())
    # w=4 with 8 distinct keys must collide somewhere
    assert any(est[k] > v for k, v in true_counts.items())


def test_media_codecs_round_trip():
    """WAV and PNG codecs are lossless over every supported shape:
    all five PNG scanline filters × all four channel layouts, and
    full-range 16-bit PCM."""
    import itertools

    from data_lake_with_spark_spark.operators.media_codecs import (
        decode_png_bytes,
        decode_wav_bytes,
        encode_png,
        encode_wav,
    )

    samples = [((i * 31 + 7) % 65536) - 32768 for i in range(64)] + [-32768, 32767]
    rate, nch, got = decode_wav_bytes(encode_wav(samples, 16000))
    assert (rate, nch, got) == (16000, 1, samples)
    stereo = decode_wav_bytes(encode_wav(samples[:8], 8000, n_channels=2))
    assert stereo == (8000, 2, samples[:8])

    for ch, ft in itertools.product([1, 2, 3, 4], range(5)):
        w, h = 7, 5
        raster = bytes(
            (x * 3 + y * 11 + c * 29) % 256
            for y in range(h)
            for x in range(w)
            for c in range(ch)
        )
        assert decode_png_bytes(encode_png(raster, w, h, ch, filter_type=ft)) == (
            w, h, ch, raster,
        ), f"ch={ch} filter={ft}"


def test_decode_media_real_and_unsupported(spark):
    from data_lake_with_spark_spark.operators.multimodal import (
        attach_png_payloads,
        attach_wav_payloads,
        decode_media,
    )

    docs = spark.createDataFrame([(k,) for k in range(5)], ["doc_id"])
    wav = {r["media_id"]: r for r in decode_media(attach_wav_payloads(docs, "doc_id")).collect()}
    assert wav[3]["sample_rate"] == 16000 and len(wav[3]["values"]) == 64
    assert wav[3]["values"][2] == ((3 * 31 + 2 * 7) % 65536) - 32768
    png = {r["media_id"]: r for r in decode_media(attach_png_payloads(docs, "doc_id")).collect()}
    assert (png[4]["width"], png[4]["height"]) == (8, 4)
    assert png[4]["values"][8 + 2] == (4 * 3 + 13 * 1 + 5 * 2) % 256  # pixel (2,1)
    # formats needing external libs still fail loudly
    from data_lake_with_spark_spark.operators.multimodal import attach_fake_payloads

    fake = attach_fake_payloads(docs.withColumn("text", F.lit("t")), "doc_id", "text")
    import pytest as _pytest

    with _pytest.raises(Exception, match="PIL|ffmpeg|NotImplemented"):
        decode_media(fake).collect()


def test_pagerank_matches_numpy_power_iteration(spark):
    """Spark PageRank vs a dense numpy power iteration with identical
    damping/iterations on a crafted graph (star + chain + isolate)."""
    import numpy as np

    from data_lake_with_spark_spark.operators.graph import degrees, pagerank

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (3, 4), (5, 6)], ["a_id", "b_id"]
    )
    all_ids = spark.createDataFrame([(i,) for i in range(8)], ["id"])  # 7 isolated
    got = {r["id"]: r["rank"] for r in pagerank(pairs, n_iter=10, all_ids=all_ids).collect()}

    n, d = 8, 0.85
    adj = np.zeros((n, n))
    for a, b in [(0, 1), (0, 2), (0, 3), (3, 4), (5, 6)]:
        adj[a, b] = adj[b, a] = 1
    out = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        contrib = np.zeros(n)
        for src in range(n):
            if out[src]:
                contrib += adj[src] * (r[src] / out[src])
        r = (1 - d) / n + d * contrib
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-9, (i, got[i], r[i])
    # star center outranks leaves; isolate sits at the teleport floor
    assert got[0] > got[1] and abs(got[7] - (1 - d) / n) < 1e-12
    # degrees sanity on the same graph
    deg = {r_["id"]: r_["degree"] for r_ in degrees(pairs).collect()}
    assert deg == {0: 3, 1: 1, 2: 1, 3: 2, 4: 1, 5: 1, 6: 1}


def test_stratified_sampling_deterministic(spark, sf_dir):
    """Content-addressed sampling: subset-stability (a row's membership
    never depends on what other rows exist) and exact per-stratum k."""
    from data_lake_with_spark_spark.operators.sampling import (
        stratified_fraction,
        stratified_topk,
    )

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    frac = stratified_fraction(ev, 0.1, "event_id")
    ids_full = {r["event_id"] for r in frac.collect()}
    # same rows selected when sampling any subset of the corpus
    ids_sub = {
        r["event_id"]
        for r in stratified_fraction(
            ev.where(F.col("event_id") % 2 == 0), 0.1, "event_id"
        ).collect()
    }
    assert ids_sub == {i for i in ids_full if i % 2 == 0}
    n = ev.count()
    assert 0.05 * n < len(ids_full) < 0.18 * n
    # degenerate fractions short-circuit
    assert stratified_fraction(ev, 0.0, "event_id").count() == 0
    assert stratified_fraction(ev, 1.0, "event_id").count() == n
    # topk: exact k per stratum, stable across repeated runs
    got = stratified_topk(ev, ["event_type"], 7, "event_id")
    counts = {r["event_type"]: r["n"] for r in got.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == 7 for v in counts.values()) and len(counts) == 5
    again = stratified_topk(ev, ["event_type"], 7, "event_id")
    assert {r["event_id"] for r in got.collect()} == {r["event_id"] for r in again.collect()}


def test_mixture_resample_targets_and_determinism(spark, sf_dir):
    """Domain mixture resampling: the binding domain survives whole,
    the achieved mix tracks the targets up to bucket granularity,
    unlisted domains drop, and the kept set is run-stable."""
    from data_lake_with_spark_spark.operators.sampling import mixture_resample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    before = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    weights = {"en": 0.4, "de": 0.2, "zh": 0.4}
    kept = mixture_resample(docs, weights, "lang", "doc_id")
    after = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # unlisted domains are dropped entirely
    assert set(after) <= set(weights)
    # the binding domain (min count/weight) is kept in full
    binding = min(weights, key=lambda k: before[k] / weights[k])
    assert after[binding] == before[binding]
    # every domain's achieved share is within bucket noise of target
    total_after = sum(after.values())
    for k, w in weights.items():
        assert abs(after[k] / total_after - w / sum(weights.values())) < 0.12
    # deterministic: same kept ids on a second evaluation
    ids1 = {r["doc_id"] for r in kept.collect()}
    ids2 = {
        r["doc_id"]
        for r in mixture_resample(docs, weights, "lang", "doc_id").collect()
    }
    assert ids1 == ids2
    # degenerate: a single domain keeps everything (boundary 'zz' path)
    solo = mixture_resample(docs, {"en": 1.0}, "lang", "doc_id")
    assert solo.count() == before["en"]


def test_quantize_int8_bounds_and_roundtrip(spark, sf_dir):
    """int8 quantization: codes within [-127, 127], reconstruction
    error within the half-step bound scale/254 per dimension, and the
    quantizer is idempotent on already-representable values (v = k *
    scale/127 quantizes back to k)."""
    from data_lake_with_spark_spark.operators.quantize import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_int8(emb)
    stats = q.agg(
        F.min("q").alias("qmin"),
        F.max("q").alias("qmax"),
        F.max(
            F.when(F.col("scale") == 0.0, F.lit(0.0)).otherwise(
                F.abs(F.col("v") - F.col("q") * F.col("scale") / 127.0)
                - F.col("scale") / 254.0
            )
        ).alias("worst_slack"),
    ).collect()[0]
    assert -127 <= stats["qmin"] and stats["qmax"] <= 127
    assert stats["worst_slack"] <= 1e-12  # error never exceeds half a step
    # representable values survive a quantize round-trip exactly
    from pyspark.sql import Row

    scale = 0.5
    rows = [Row(vec_id=i, embedding=[k * scale / 127.0]) for i, k in enumerate([-127, -3, 0, 64, 127])]
    tiny = spark.createDataFrame(rows)
    got = {
        r["vec_id"]: r["q"]
        for r in quantize_int8(tiny).collect()
    }
    assert got == {0: -127, 1: -3, 2: 0, 3: 64, 4: 127}


def test_bloom_prunes_without_false_negatives(spark, sf_dir):
    """Bloom prefilter: every true member survives (no false
    negatives — the exact-join result is unchanged) and the map-side
    prune rejects the overwhelming majority of non-members."""
    from data_lake_with_spark_spark.operators import bloom as BL
    from data_lake_with_spark_spark.operators import dedup as DD

    docs = load_table(spark, sf_dir, "documents")
    grams = DD.shingle_table(docs, n=8).select(
        "id", F.xxhash64("shingle").alias("g")
    )
    bench = grams.where(F.col("id") < 20).select("g").distinct()
    bitmap = BL.build_bloom(bench, "g")
    corpus = grams.where(F.col("id") >= 20)
    survivors = corpus.where(BL.might_contain(F.col("g"), bitmap))
    true_hits = corpus.join(bench, "g").select("g").distinct()
    missed = true_hits.join(
        survivors.select("g").distinct(), "g", "left_anti"
    ).count()
    assert missed == 0
    n_corpus, n_surv = corpus.count(), survivors.count()
    assert n_surv < 0.05 * n_corpus  # FP rate ~1e-4 at m=2^16, k=3


def test_pack_sequences_prefix_sum_semantics(spark):
    """pack_id = floor(tokens-before / budget): packs fill in order,
    every pack except a shard's last holds >= budget tokens counting
    its straddling row, and no pack is empty."""
    from data_lake_with_spark_spark.operators import training as TR

    rows = [("a", i, "x " * (7 + (i * 13) % 40)) for i in range(60)] + [
        ("b", i, "y " * (3 + (i * 7) % 25)) for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["shard", "pos", "body"])
    from data_lake_with_spark_spark.functions.text import token_count

    packed = TR.pack_sequences(
        df, token_count("body").cast("long"), budget=100, shard_col="shard", order_col="pos"
    ).collect()
    by_shard: dict = {}
    for r in sorted(packed, key=lambda r: (r["shard"], r["pos"])):
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        cum = 0
        for r in rs:
            assert r["pack_id"] == cum // 100, (shard, r["pos"], cum)
            cum += r["n_tokens"]
        pack_tokens: dict = {}
        for r in rs:
            pack_tokens[r["pack_id"]] = pack_tokens.get(r["pack_id"], 0) + r["n_tokens"]
        last = max(pack_tokens)
        assert sorted(pack_tokens) == list(range(last + 1))  # contiguous ids


def test_resize_image_gather_and_metadata(spark, docs):
    """resize_image keeps every factor-th pixel of every factor-th row
    (row-major, nearest-neighbor) and rewrites width/height/n_bytes."""
    media = MM.attach_fake_payloads(docs, "doc_id", "text")  # 8x4, 32 bytes
    full = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    out = {r["media_id"]: r for r in MM.resize_image(media, factor=2).collect()}
    for mid, r in out.items():
        assert (r["meta"]["width"], r["meta"]["height"], r["meta"]["n_bytes"]) == (4, 2, 8)
        expect = bytes(
            full[mid][(rr * 2) * 8 + cc * 2] for rr in range(2) for cc in range(4)
        )
        assert bytes(r["payload"]) == expect

    odd = MM.resize_image(media, factor=3).collect()  # 8x4/3 -> ceil: 3x2
    for r in odd:
        assert (r["meta"]["width"], r["meta"]["height"]) == (3, 2)
        assert len(r["payload"]) == 6


def test_funnel_counts_monotone_and_gap_tightens(spark, sf_dir):
    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.funnel import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    stages = ["signup", "view", "purchase"]
    free = {r["stage"]: r["n_users"] for r in funnel_counts(ev, stages).collect()}
    # monotone down the funnel
    assert free["signup"] >= free["view"] >= free["purchase"]
    # a finite gap can only lose conversions, never add them
    day = {
        r["stage"]: r["n_users"]
        for r in funnel_counts(ev, stages, max_gap_seconds=86400).collect()
    }
    assert all(day[s] <= free[s] for s in stages)
    # first stage is gap-independent
    assert day["signup"] == free["signup"]
    # single-stage funnel ≡ distinct users with that event
    one = funnel_counts(ev, ["click"]).collect()
    n_click = ev.where("event_type = 'click'").select("user_id").distinct().count()
    assert len(one) == 1 and one[0]["n_users"] == n_click


def test_gif_codec_roundtrip_properties(spark):
    """Encoder/decoder agreement on rasters that force the LZW table
    through growth, resets, and the KwKwK case."""
    from data_lake_with_spark_spark.operators.media_codecs import (
        decode_gif_bytes,
        encode_gif,
    )

    cases = [
        bytes([0] * 1),                       # single pixel
        bytes([5] * 4096),                    # run -> KwKwK chains
        bytes((i * 37) % 256 for i in range(12000)),  # growth past 12-bit reset
    ]
    widths = [1, 64, 100]
    for raster, w in zip(cases, widths):
        h = len(raster) // w
        got = decode_gif_bytes(encode_gif(raster, w, h))
        assert got == (w, h, raster)


def test_write_training_shards_manifest_and_determinism(spark, sf_dir, tmp_path):
    """Shard export: manifest totals match, every row lands in its
    content-addressed shard, and re-sharding the same data reproduces
    the identical row→shard assignment."""
    import json

    from data_lake_with_spark_spark.operators.training import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    p1 = str(tmp_path / "shards1")
    m1 = write_training_shards(docs, p1, n_shards=4)
    assert m1["total_rows"] == docs.count()
    assert len(m1["shards"]) == 4
    with open(f"{p1}/manifest.json") as fh:
        assert json.load(fh)["total_rows"] == m1["total_rows"]
    # every shard non-empty and readable through the manifest files
    back = spark.read.parquet(p1)
    assert back.count() == m1["total_rows"]

    p2 = str(tmp_path / "shards2")
    m2 = write_training_shards(docs, p2, n_shards=4)
    a1 = {(s["shard"], s["rows"]) for s in m1["shards"]}
    a2 = {(s["shard"], s["rows"]) for s in m2["shards"]}
    assert a1 == a2
    for sid in range(4):
        ids1 = {r["doc_id"] for r in spark.read.parquet(f"{p1}/_shard={sid}").collect()}
        ids2 = {r["doc_id"] for r in spark.read.parquet(f"{p2}/_shard={sid}").collect()}
        assert ids1 == ids2 and ids1


def test_segment_dedup_keep_first_reconstruction(spark):
    """Sub-document dedup: earlier (doc, idx) wins globally; documents
    rebuild in order from surviving segments; fully-claimed documents
    vanish; partial tail segments participate."""
    from data_lake_with_spark_spark.operators.dedup import segment_dedup_keep_first

    w = [f"w{i}" for i in range(25)]
    d1 = " ".join(w)                                  # 3 segments (10,10,5)
    d2 = " ".join(w[:10] + ["unique"] * 10)           # seg0 stolen by d1
    d3 = d1                                           # fully claimed
    docs = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_total"])
        for r in segment_dedup_keep_first(docs, seg_tokens=10).collect()
    }
    assert out[1] == (d1, 3, 3)
    assert out[2] == (" ".join(["unique"] * 10), 1, 2)
    assert 3 not in out  # every segment of d3 was claimed by d1


def test_bpe_learn_and_apply_matches_reference(spark):
    """Learned-merge BPE: the distributed trainer must produce exactly
    the merges a pure-Python reference computes on the same corpus,
    and application must reproduce the reference segmentation,
    compress vs characters, and handle unseen words gracefully."""
    from data_lake_with_spark_spark.operators import bpe as B

    corpus = ["low lower lowest low low", "newer newest new low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )

    # pure-Python reference trainer (same tie-break)
    from collections import Counter

    wc = Counter(w for t in corpus for w in t.split())
    vocab = {tuple(list(w) + [B.END]): c for w, c in wc.items()}
    ref_merges = []
    for _ in range(12):
        counts = Counter()
        for word, c in vocab.items():
            for p in zip(word, word[1:]):
                counts[p] += c
        if not counts:
            break
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        ref_merges.append(best)
        vocab = {B._merge_word(w, best): c for w, c in vocab.items()}

    merges = B.learn_bpe_merges(docs, n_merges=12)
    assert merges == ref_merges

    out = {r["doc_id"]: r for r in B.apply_bpe(docs, merges).collect()}
    # reference segmentation of doc 0
    ranks = {p: i for i, p in enumerate(merges)}
    want0 = [p for w in corpus[0].split() for p in B.segment_word(w, ranks)]
    assert out[0]["bpe_tokens"] == want0
    # 'low' is frequent → must have become a single token
    assert "low" + B.END in out[0]["bpe_tokens"]
    # compression: fewer tokens than characters
    assert out[0]["n_bpe_tokens"] < len(corpus[0].replace(" ", ""))

    # unseen word at apply time: segments from whatever merges apply
    unseen = spark.createDataFrame([(9, "zzz low")], "doc_id long, text string")
    got = B.apply_bpe(unseen, merges).collect()[0]
    assert got["bpe_tokens"][-1] == "low" + B.END
    assert got["n_bpe_tokens"] >= 2


def test_kmv_overlap_estimates_known_intersection(spark):
    """KMV theta intersection on two constructed id sets: groups
    smaller than k degrade to EXACT overlap (theta = 2^32); large
    groups estimate within the ~1/sqrt(k) KMV error band."""
    from data_lake_with_spark_spark.operators.sketches import (
        kmv_overlap,
        kmv_sketch,
    )

    rows = (
        [("small_a", i) for i in range(40)]
        + [("small_b", i) for i in range(20, 60)]      # overlap 20
        + [("big_a", i) for i in range(4000)]
        + [("big_b", i) for i in range(2000, 6000)]    # overlap 2000
    )
    df = spark.createDataFrame(rows, "gk string, uid long")
    sk = kmv_sketch(df, "uid", "gk", k=256)
    got = {
        (r["ta"], r["tb"]): r["est_overlap"]
        for r in kmv_overlap(sk, k=256).collect()
    }
    assert got[("small_a", "small_b")] == 20          # exact mode
    big = got[("big_a", "big_b")]
    assert 1000 <= big <= 3000, big                   # ~4 sigma band

    # mergeability: sketch of halves, re-minimized, equals one-shot
    h1 = kmv_sketch(df.where(F.col("uid") % 2 == 0), "uid", "gk", k=256)
    h2 = kmv_sketch(df.where(F.col("uid") % 2 == 1), "uid", "gk", k=256)
    from pyspark.sql import Window

    merged = (
        h1.unionByName(h2)
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("gk").orderBy("h")),
        )
        .where(F.col("rn") <= 256)
        .select("gk", "h")
    )
    assert {
        (r["gk"], r["h"]) for r in merged.collect()
    } == {(r["gk"], r["h"]) for r in sk.collect()}


def test_byte_stats_arrow_matches_python(spark):
    """mapInArrow byte stats vs a plain-Python recompute, including
    the empty-payload row."""
    from data_lake_with_spark_spark.operators.multimodal import byte_stats_arrow

    payloads = [b"", b"\x00", b"\xff\x01\x02", bytes(range(256))]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in byte_stats_arrow(df).collect()}
    for i, p in enumerate(payloads):
        r = got[i]
        assert r["n_bytes"] == len(p)
        assert r["byte_sum"] == sum(p)
        x = 0
        for b in p:
            x ^= b
        assert r["byte_xor"] == x
        assert r["byte_min"] == (min(p) if p else 0)
        assert r["byte_max"] == (max(p) if p else 0)


def test_pagerank_portable_tracks_float_ranks(spark):
    """The scaled-integer PageRank must agree with the float twin:
    same node ordering at the top (the use case is ranking) and
    values within the truncation budget (n_iter per-node div losses
    are ~1e-12 units each)."""
    from data_lake_with_spark_spark.operators.graph import (
        pagerank,
        pagerank_portable,
    )

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (1, 5)],
        "a_id long, b_id long",
    )
    fl = {r["id"]: r["rank"] for r in pagerank(pairs, n_iter=10).collect()}
    sc = {
        r["id"]: r["rank_scaled"] / 1e12
        for r in pagerank_portable(pairs, n_iter=10).collect()
    }
    assert set(fl) == set(sc)
    for node in fl:
        assert abs(fl[node] - sc[node]) < 1e-6, (node, fl[node], sc[node])
    top_f = sorted(fl, key=lambda n: (-fl[n], n))[:3]
    top_s = sorted(sc, key=lambda n: (-sc[n], n))[:3]
    assert top_f == top_s


def test_min_label_components_converges_to_union_find(spark, sf_dir):
    """min_label_components(8) over the near-dup graph must equal the
    exact components a driver-side union-find computes on the same
    pairs — i.e. 8 flooding rounds fully converge at test scale (the
    oracle pins 8 rounds; this pins that 8 rounds ARE the fixpoint)."""
    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.graph import min_label_components
    from data_lake_with_spark_spark.operators.similarity import lsh_near_pairs

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = lsh_near_pairs(emb, threshold=0.35)
    edges = [(r["a_id"], r["b_id"]) for r in pairs.collect()]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    got = {
        r["id"]: r["lab"] for r in min_label_components(pairs, n_iter=8).collect()
    }
    assert got == want


def test_kcore_fixpoint_matches_exact_peel(spark, sf_dir):
    """kcore(k=2, n_iter=6) must equal an exact driver-side peel run
    to fixpoint — i.e. 6 rounds suffice at test scale (the oracle
    pins 6 rounds; this pins that 6 rounds ARE the fixpoint)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from data_lake_with_spark_spark.catalog import load_table
    from data_lake_with_spark_spark.operators.graph import kcore
    from data_lake_with_spark_spark.operators.similarity import lsh_near_pairs

    emb = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 400)
    pairs = lsh_near_pairs(emb, threshold=0.35)
    edges = [(r["a_id"], r["b_id"]) for r in pairs.collect()]

    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < 2}
        if not drop:
            break
        alive -= drop
    want = {v: len(adj[v] & alive) for v in alive}

    got = {r["id"]: r["degree"] for r in kcore(pairs, k=2, n_iter=6).collect()}
    assert got == want

"""Edge cases for the text expression layer (empty/short inputs must
not divide by zero or crash under ANSI mode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lake_with_spark_spark.functions import text as TXT


def test_text_functions_on_edge_inputs(spark):
    df = spark.createDataFrame(
        [
            (1, ""),
            (2, "   "),
            (3, "one"),
            (4, "one two"),
            (5, "one two three"),
            (6, "!!! ??? ..."),
        ],
        ["id", "text"],
    )
    out = df.select(
        "id",
        TXT.token_count("text").alias("ntok"),
        F.size(TXT.word_shingles("text", 3)).alias("nsh"),
        F.round(TXT.punct_ratio("text"), 4).alias("punct"),
        TXT.quality_score("text").alias("q"),
        TXT.lang_guess("text").alias("lang"),
        TXT.fingerprint("text").alias("fp"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["ntok"] == 0 and by_id[1]["nsh"] == 0
    assert by_id[2]["ntok"] == 0
    assert by_id[3]["nsh"] == 0  # fewer than 3 tokens → no shingles
    assert by_id[4]["nsh"] == 0
    assert by_id[5]["nsh"] == 1
    assert by_id[1]["punct"] == 0.0  # guarded division
    assert by_id[6]["punct"] > 0.5
    assert all(0.0 <= r["q"] <= 1.0 for r in out)
    assert by_id[1]["lang"] == "und"
    # fingerprint of whitespace-only normalizes to fingerprint of ""
    assert by_id[1]["fp"] == by_id[2]["fp"]


def test_chunk_documents_overlap_and_tail(spark):
    from data_lake_with_spark_spark.operators.training import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(12))),  # 12 tokens
            (2, "one two"),  # shorter than a chunk
            (3, "   "),  # whitespace-only → no chunks
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, chunk_tokens=5, stride_tokens=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    # starts 0,4,8 → lengths 5,5,4; overlap tokens shared verbatim
    assert [r["n_chunk_tokens"] for r in c1] == [5, 5, 4]
    assert c1[0]["chunk_text"].split()[-1] == c1[1]["chunk_text"].split()[0]
    assert c1[2]["chunk_text"] == "w8 w9 w10 w11"
    assert [r["chunk_text"] for r in by_doc[2]] == ["one two"]
    assert 3 not in by_doc
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=5, stride_tokens=0)


def test_pii_redaction_patterns(spark):
    from data_lake_with_spark_spark.functions.text import pii_match_count, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io now"),
            (2, "call 555-123-4567 or visit 10.0.0.1"),
            (3, "clean text 123-45 1.2.3 not pii"),
        ],
        ["id", "text"],
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            pii_match_count("text").alias("n"),
            redact_pii("text").alias("red"),
        ).collect()
    }
    assert out[1]["n"] == 1 and out[1]["red"] == "mail <EMAIL> now"
    assert out[2]["n"] == 2 and out[2]["red"] == "call <PHONE> or visit <IP>"
    assert out[3]["n"] == 0 and out[3]["red"] == "clean text 123-45 1.2.3 not pii"


def test_repetition_fractions_on_crafted_docs(spark):
    from data_lake_with_spark_spark.functions.text import (
        duplicate_bigram_fraction,
        tokens,
        top_token_fraction,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # one token dominates; all bigrams equal
            (2, "a b c d"),  # all distinct
            (3, "solo"),  # 1 token → no bigrams
        ],
        ["id", "text"],
    ).select("id", tokens("text").alias("toks"))
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            top_token_fraction(F.col("toks")).alias("top"),
            duplicate_bigram_fraction(F.col("toks")).alias("dup"),
        ).collect()
    }
    assert out[1]["top"] == 1.0 and abs(out[1]["dup"] - 2 / 3) < 1e-9
    assert out[2]["top"] == 0.25 and out[2]["dup"] == 0.0
    assert out[3]["top"] == 1.0 and out[3]["dup"] == 0.0


def test_vacuum_drops_pre_base_history(spark, tmp_path):
    from data_lake_with_spark_spark.sources.versioned import (
        compact,
        vacuum,
        versioned_append,
        versioned_read,
    )
    import pytest as _pytest

    path = str(tmp_path / "t")
    versioned_append(spark.createDataFrame([(1, "a")], "k long, v string"), path)
    versioned_append(spark.createDataFrame([(2, "b")], "k long, v string"), path)
    compact(spark, path)
    removed = vacuum(path)
    assert removed == [0, 1]
    assert versioned_read(spark, path).count() == 2  # current intact
    with _pytest.raises(Exception):  # pre-base history is gone
        versioned_read(spark, path, version=0).collect()


def test_containment_catches_quote_that_jaccard_misses(spark):
    from data_lake_with_spark_spark.operators import dedup as DD

    quote = "alpha beta gamma delta epsilon zeta"
    padding = " ".join(f"pad{i} filler{i} extra{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, quote), (2, quote + " " + padding), (3, "unrelated words only here")],
        ["doc_id", "text"],
    )
    pairs = {
        (r["a_id"], r["b_id"]): r["containment"]
        for r in DD.containment_pairs(docs, threshold=0.8, n=3).collect()
    }
    # every 3-gram of the quote appears in the superset doc
    assert pairs.get((1, 2)) == 1.0
    # the reverse direction is NOT contained (superset has many extra
    # shingles), and the unrelated doc pairs with nothing
    assert (2, 1) not in pairs
    assert all(3 not in p for p in pairs)
    # symmetric Jaccard misses the same relationship at its threshold
    jac = DD.ngram_jaccard_pairs(docs, threshold=0.5, n=3).collect()
    assert jac == []


def test_deletion_neighborhood_blocking_is_complete(spark):
    """Every edit-distance-1 relationship (insert/delete/substitute)
    must share a deletion key — brute-force comparison on a crafted
    dictionary."""
    from itertools import product

    from pyspark.sql import functions as F

    words = ["table", "tables", "tble", "cable", "fable", "tabble", "chair"]
    df = spark.createDataFrame([(w,) for w in words], ["tok"])
    del_keys = (
        "array_union(array(tok), transform(sequence(1, length(tok)),"
        " i -> concat(substring(tok, 1, i - 1),"
        "             substring(tok, i + 1, length(tok)))))"
    )
    keys = df.select("tok", F.explode(F.expr(del_keys)).alias("k"))
    blocked = {
        (r["a"], r["b"])
        for r in keys.alias("x")
        .join(keys.alias("y"), F.col("x.k") == F.col("y.k"))
        .select(F.col("x.tok").alias("a"), F.col("y.tok").alias("b"))
        .distinct()
        .where(F.levenshtein("a", "b") <= 1)
        .collect()
    }
    def lev(a, b):
        import functools
        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0 or j == 0:
                return i + j
            return min(d(i-1, j) + 1, d(i, j-1) + 1,
                       d(i-1, j-1) + (a[i-1] != b[j-1]))
        return d(len(a), len(b))
    brute = {(a, b) for a, b in product(words, words) if lev(a, b) <= 1}
    assert blocked == brute


def test_udtf_split_sentences_edges(spark):
    """UDTF surface: multi-row expansion, renumbering after empty
    fragments, zero-row outputs, and null pass-through."""
    from data_lake_with_spark_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [
            (1, "one two. three!  four five six"),
            (2, "..  !? "),          # only terminators → zero rows
            (3, None),                # null → zero rows
            (4, "single"),            # no terminator → one row
        ],
        "id long, text string",
    ).createOrReplaceTempView("udtf_edge_docs")
    rows = spark.sql(
        """
        SELECT d.id, s.sent_idx, s.sentence, s.n_words
        FROM udtf_edge_docs d, LATERAL split_sentences(d.text) s
        ORDER BY d.id, s.sent_idx
        """
    ).collect()
    got = [(r["id"], r["sent_idx"], r["sentence"], r["n_words"]) for r in rows]
    assert got == [
        (1, 0, "one two", 2),
        (1, 1, "three", 1),
        (1, 2, "four five six", 3),
        (4, 0, "single", 1),
    ]


def test_udtf_extract_fields_polymorphic_schema(spark):
    """analyze()-driven UDTF: the literal field list decides the
    output schema at planning time; missing keys are nulls; a
    different literal yields a different relation shape."""
    from data_lake_with_spark_spark.functions.udtf import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "a=1 b=2 c=3"), (2, "a=9 z=0"), (3, None)],
        "id long, line string",
    ).createOrReplaceTempView("kv_lines")
    rows = spark.sql(
        """
        SELECT d.id, s.* FROM kv_lines d,
        LATERAL extract_fields(d.line, 'a,c') s ORDER BY d.id
        """
    )
    assert rows.columns == ["id", "a", "c"]
    got = [(r["id"], r["a"], r["c"]) for r in rows.collect()]
    assert got == [(1, "1", "3"), (2, "9", None), (3, None, None)]
    other = spark.sql(
        "SELECT s.* FROM kv_lines d, LATERAL extract_fields(d.line, 'b') s"
    )
    assert other.columns == ["b"]

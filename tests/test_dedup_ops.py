"""Tests for dedup / textops / ann / multimodal operators, plus
rows-only driver queries (entries without a SQL oracle must still run
and return sane results)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from ccspark import ann, dedup, multimodal, textops

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"),
        (1, "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat and runs far away into the woods tonight"),  # near dup
        (3, "completely different content about distributed query engines and shuffle strategies"),
        (4, "ein ganz anderer deutscher text über bäume und straßen mit vielen wörtern und sätzen"),
    ]
    return spark.createDataFrame(pd.DataFrame(base, columns=["doc_id", "text"]))


def test_exact_dedup(spark, docs_with_dups):
    out = dedup.exact_dedup(docs_with_dups, "text", "doc_id").toPandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 4]


def test_minhash_finds_near_dup(spark, docs_with_dups):
    pairs = dedup.minhash_candidates(docs_with_dups, "doc_id", "text", n_hashes=64, bands=16).toPandas()
    pairs = pairs.set_index(["id_a", "id_b"])["est_jaccard"]
    assert pairs.loc[(0, 1)] == 1.0  # exact dup → identical signatures
    assert pairs.loc[(0, 2)] > 0.5  # near dup
    assert (3, 4) not in pairs.index or pairs.loc[(3, 4)] < 0.3


def test_simhash_near_dups(spark, docs_with_dups):
    # banding is complete for hamming <= 3: exact dup (0) and the
    # 'tonite' variant (hamming 2) must be found; unrelated docs must not
    base = docs_with_dups.toPandas()
    extra = pd.DataFrame(
        [(5, base.loc[0, "text"].replace("tonight", "tonite"))], columns=["doc_id", "text"]
    )
    df = docs_with_dups.sparkSession.createDataFrame(pd.concat([base, extra]))
    out = dedup.simhash_near_dups(df, "doc_id", "text", max_hamming=3).toPandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    assert (0, 1) in got
    assert (0, 5) in got and (1, 5) in got
    assert (0, 3) not in got


def test_jaccard_shingles(spark, docs_with_dups):
    sh = dedup.with_char_shingles(docs_with_dups, "text", k=3)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    pairs = dedup.jaccard_pairs(a.crossJoin(b).filter("id_a < id_b")).toPandas()
    j = pairs.set_index(["id_a", "id_b"])["jaccard"]
    assert j.loc[(0, 1)] == 1.0
    assert j.loc[(0, 2)] > 0.8
    assert j.loc[(0, 3)] < 0.4


def test_embedding_near_dups(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(20, 16)
    vecs = np.vstack([base, base[:5] + rng.randn(5, 16) * 0.01])  # 5 near-dups
    pdf = pd.DataFrame({"vec_id": np.arange(25, dtype=np.int64), "embedding": [v.astype(np.float32).tolist() for v in vecs]})
    df = spark.createDataFrame(pdf)
    out = dedup.embedding_near_dups(df, "vec_id", "embedding", dim=16, threshold=0.99).toPandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    found = sum((i, 20 + i) in got for i in range(5))
    assert found >= 4  # LSH may miss at most 1 of the 5 planted pairs


def test_langid_detects_german(spark, docs_with_dups):
    out = docs_with_dups.withColumn("l", textops.detect_lang(F.col("text"))).toPandas()
    assert out.set_index("doc_id")["l"][4] == "de"
    assert out.set_index("doc_id")["l"][0] == "en"


def test_winnow_fingerprints_deterministic():
    a = textops.winnow_fingerprints("the quick brown fox jumps over the lazy dog" * 5)
    b = textops.winnow_fingerprints("the quick brown fox jumps over the lazy dog" * 5)
    assert a == b and len(a) > 0


def test_ann_ivf_recall(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = np.array(emb.filter("vec_id = 0").collect()[0]["embedding"], dtype=np.float64)
    exact = ann.brute_force_topk(emb.filter("vec_id <> 0"), "embedding", "vec_id", q, k=10).toPandas()
    cents = ann.fit_centroids(emb.orderBy("vec_id").limit(1000), "embedding", n_cells=8, seed=5, sample=1000, iters=3)
    indexed = ann.assign_cells(emb, "embedding", cents)
    approx = ann.ivf_topk(indexed.filter("vec_id <> 0"), "embedding", "vec_id", cents, q, k=10, nprobe=3).toPandas()
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.5, f"IVF recall {recall}"


def test_multimodal_stub_raises_without_fake(spark, docs_with_dups):
    df = docs_with_dups.withColumn("payload", F.encode("text", "utf-8"))
    feats = multimodal.extract_features(df, "doc_id", "payload", deterministic_fake=False)
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        feats.collect()


def test_multimodal_fake_features(spark, docs_with_dups):
    df = docs_with_dups.withColumn("payload", F.encode("text", "utf-8"))
    feats = multimodal.extract_features(df, "doc_id", "payload", deterministic_fake=True).toPandas()
    assert len(feats) == 5
    assert (feats["n_bytes"] > 0).all()
    assert feats["features"].map(len).eq(16).all()
    # deterministic: same payload → same digest/features
    again = multimodal.extract_features(df, "doc_id", "payload", deterministic_fake=True).toPandas()
    assert feats.sort_values("doc_id")["digest"].tolist() == again.sort_values("doc_id")["digest"].tolist()


ROWS_ONLY = [
    "q_langid",
    "q_minhash_lsh",
    "q_simhash_near_dup",
    "q_doc_fingerprint",
    "q_ann_ivf",
    "q_embed_near_dup",
    "q_media_features",
]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


def test_remove_repeated_lines_corpus_wide(spark):
    """C4-style line dedup: a line's doc-count decides its fate; repeats
    WITHIN one doc don't count twice; rebuild preserves order."""
    from ccspark import textops

    rows = [
        (1, "a\nshared\nb\nshared"),   # 'shared' twice in one doc = 1 doc
        (2, "shared\nc"),
        (3, "shared\nd"),              # 'shared' in 3 docs > max 2 → dropped
        (4, "e\nf"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {
        r["id"]: r
        for r in textops.remove_repeated_lines(
            df, "id", "text", sep="\n", max_occurrences=2
        ).collect()
    }
    assert out[1]["text"] == "a\nb" and out[1]["n_lines_dropped"] == 2
    assert out[2]["text"] == "c"
    assert out[3]["text"] == "d"
    assert out[4]["text"] == "e\nf" and out[4]["n_lines_dropped"] == 0


def test_scrub_pii_tokens(spark):
    from ccspark import textops

    df = spark.createDataFrame(
        [(1, "mail bob@x.org and carol@y.co.uk ip 10.1.2.3 tel +44 123-4567 end")],
        "id long, text string",
    )
    r = textops.scrub_pii(df, "text").collect()[0]
    assert r["text"] == "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE> end"
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (2, 1, 1)


def test_c4_gate_rule_order(spark):
    """First failing rule wins: a short doc with a blocked URL reports
    too_short, not blocked_url."""
    from ccspark import textops

    rows = [
        (1, "one two", "http://a.com/casino/x", "en"),      # too_short first
        (2, "w1 w2 w3 w4 w5 w6", "http://a.com/casino/x", "en"),
        (3, "w1 w2 w3 lorem w4 w5", "http://a.com/ok", "en"),
        (4, "w1 w2 w3 w4 w5 w6", "http://a.com/ok", "de"),
        (5, "w1 w2 w3 w4 w5 w6", "http://a.com/ok", "en"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, url string, lang string")
    got = {
        r["id"]: (r["keep"], r["drop_reason"])
        for r in textops.c4_document_gate(
            df, "text", url_col="url", lang_col="lang", min_words=5
        ).collect()
    }
    assert got == {
        1: (False, "too_short"),
        2: (False, "blocked_url"),
        3: (False, "bad_word"),
        4: (False, "lang"),
        5: (True, None),
    }


def test_remove_repeated_lines_null_text_survives(spark):
    from ccspark import textops

    df = spark.createDataFrame([(1, None), (2, "a\nb")], "id long, text string")
    out = {
        r["id"]: r
        for r in textops.remove_repeated_lines(df, "id", "text").collect()
    }
    assert set(out) == {1, 2}  # the null-text doc is not dropped from the corpus
    assert out[2]["text"] == "a\nb"


def test_scrub_pii_overlap_counts_sequentially(spark):
    """An IP-shaped localpart inside an email is consumed by the email
    stage; n_ip must reflect what the IP stage actually saw."""
    from ccspark import textops

    df = spark.createDataFrame(
        [(1, "x 1.2.3.4@example.com y")], "id long, text string"
    )
    r = textops.scrub_pii(df, "text").collect()[0]
    assert r["text"] == "x <EMAIL> y"
    assert (r["n_email"], r["n_ip"], r["n_phone"]) == (1, 0, 0)


def test_c4_gate_counts_words_across_whitespace_runs(spark):
    from ccspark import textops

    rows = [
        (1, "w1\nw2\tw3  w4\nw5 w6", "http://a.com/ok", "en"),  # 6 real words
        (2, "a  b  c", "http://a.com/ok", "en"),                # 3 words, not 5 tokens
    ]
    df = spark.createDataFrame(rows, "id long, text string, url string, lang string")
    got = {
        r["id"]: r["keep"]
        for r in textops.c4_document_gate(
            df, "text", url_col="url", lang_col="lang", min_words=5
        ).collect()
    }
    assert got == {1: True, 2: False}


# ---------------------------------------------------------------------------
# ngram LM scoring (CCNet-style quality bucketing)
# ---------------------------------------------------------------------------


def test_ngram_lm_score_orders_gibberish_above_prose(spark):
    from ccspark import textops

    prose = [
        (i, "the quick brown fox jumps over the lazy dog again and again")
        for i in range(5)
    ]
    test_docs = [
        (100, "the quick brown fox jumps over the lazy dog"),  # reference-like
        (101, "zq xv jj qz vx kq wz zz qq xx vv zx qv"),  # gibberish
        (102, "a"),  # too short: no bigrams -> dropped
    ]
    ref = spark.createDataFrame(prose, "doc_id long, text string")
    docs = spark.createDataFrame(test_docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.ngram_lm_score(docs, ref).collect()}
    assert set(out) == {100, 101}  # the 1-char doc has no bigrams
    assert out[101]["avg_nll"] > out[100]["avg_nll"]  # gibberish scores worse
    assert out[100]["n_bigrams"] == len(test_docs[0][1]) - 1


def test_ngram_lm_score_unseen_bigram_floor(spark):
    """Every unseen bigram gets exactly -ln(1/(N+V+1)) — the add-one
    floor — so a fully-unseen doc's avg equals that constant."""
    import math

    from ccspark import textops

    ref = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "zzz")], "doc_id long, text string")
    out = textops.ngram_lm_score(docs, ref).collect()[0]
    # ref bigrams: 'aa' x3 -> N=3, V=1; unseen p = 1/(3+1+1)
    assert out["n_bigrams"] == 2
    assert abs(out["avg_nll"] - round(-math.log(1.0 / 5.0), 6)) < 1e-9


def test_ngram_lm_score_empty_reference_raises(spark):
    import pytest as _pytest

    from ccspark import textops

    ref = spark.createDataFrame([(0, ""), (1, "x"), (2, None)], "doc_id long, text string")
    docs = spark.createDataFrame([(9, "hello world")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="no scoreable text"):
        textops.ngram_lm_score(docs, ref)

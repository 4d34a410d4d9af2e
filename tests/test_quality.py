"""Gopher-style repetition signals: hand-computed expectations on small
documents, including the tie-break and empty/NULL edge cases."""

import pytest
from pyspark.sql import functions as F

from victorialogs_spark.datapipe.quality import ngram_repetition, repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_dup_lines(spark):
    # 4 non-empty lines, "a b" twice: dup_line_frac = 1/4; chars: the
    # repeated 3-char line counts once as duplicated -> 3/(3+5+3+9)=3/20
    text = "a b\nxx yy\na b\n\nlong line"
    row = repetition_stats(_docs(spark, [(1, text)]), "doc_id", "text").collect()[0]
    assert row["n_lines"] == 4
    assert row["dup_line_frac"] == pytest.approx(0.25)
    assert row["dup_line_char_frac"] == pytest.approx(3 / 20)
    # paragraphs: "a b\nxx yy\na b" and "long line" -> no dups
    assert row["dup_para_frac"] == pytest.approx(0.0)
    assert row["dup_para_char_frac"] == pytest.approx(0.0)


def test_repetition_stats_dup_paragraphs(spark):
    text = "para one\n\npara one\n\npara two"
    row = repetition_stats(_docs(spark, [(1, text)]), "doc_id", "text").collect()[0]
    assert row["dup_para_frac"] == pytest.approx(1 / 3)
    assert row["dup_para_char_frac"] == pytest.approx(8 / 24)


def test_repetition_stats_empty_and_null(spark):
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(spark, [(1, ""), (2, None), (3, "   \n  ")]), "doc_id", "text"
        ).collect()
    }
    assert out[1]["dup_line_frac"] is None
    assert out[2]["dup_line_frac"] is None
    assert out[3]["dup_line_frac"] is None


def test_ngram_repetition_uniform_text(spark):
    # "a b c d e": 2-grams all distinct -> top covers 1 occurrence
    out = ngram_repetition(
        _docs(spark, [(1, "aa bb cc dd")]), "doc_id", "text", n=2
    ).collect()[0]
    # grams: "aa bb","bb cc","cc dd" each once; word chars each = 4
    assert out["top_ngram_char_frac"] == pytest.approx(4 / 12)
    assert out["dup_ngram_char_frac"] == pytest.approx(0.0)


def test_ngram_repetition_repeated_gram(spark):
    # "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] -> "x y"×3, "y x"×2
    out = ngram_repetition(
        _docs(spark, [(1, "x y x y x y")]), "doc_id", "text", n=2
    ).collect()[0]
    # word chars per gram instance = 2; total = 10; top "x y" covers 6
    assert out["top_ngram_char_frac"] == pytest.approx(6 / 10)
    # dup: (3-1)*2 + (2-1)*2 = 6
    assert out["dup_ngram_char_frac"] == pytest.approx(6 / 10)


def test_ngram_repetition_tie_breaks_lexicographic(spark):
    # "b a b a": grams [b a, a b, b a] -> "b a"×2 top. with n=2 and text
    # "z z y y z z": grams [z z, z y, y y, y z, z z] -> "z z"×2 unique top
    out = ngram_repetition(
        _docs(spark, [(1, "z z y y z z")]), "doc_id", "text", n=2
    ).collect()[0]
    assert out["top_ngram_char_frac"] == pytest.approx(4 / 10)


def test_ngram_repetition_short_doc_dropped(spark):
    out = ngram_repetition(
        _docs(spark, [(1, "one"), (2, None), (3, "aa bb")]), "doc_id", "text", n=2
    ).collect()
    assert sorted(r["doc_id"] for r in out) == [3]


def test_ngram_repetition_case_insensitive(spark):
    out = ngram_repetition(
        _docs(spark, [(1, "The the THE the")]), "doc_id", "text", n=2
    ).collect()[0]
    # all 2-grams identical "the the" -> top covers everything
    assert out["top_ngram_char_frac"] == pytest.approx(1.0)


def test_gopher_flags_passing_doc(spark):
    from victorialogs_spark.datapipe.quality import gopher_quality_flags

    # 66 normal words with stopwords -> passes every rule
    text = " ".join(["the quick brown fox and that dog have fun with it"] * 6)
    row = gopher_quality_flags(
        _docs(spark, [(1, text)]), "doc_id", "text"
    ).collect()[0]
    assert row["n_words"] == 66
    assert row["gopher_pass"] is True
    assert row["stopword_hits"] >= 2
    assert row["alpha_word_frac"] == pytest.approx(1.0)


def test_gopher_flags_symbol_soup_fails(spark):
    from victorialogs_spark.datapipe.quality import gopher_quality_flags

    text = " ".join(["### ##"] * 30)  # hash-heavy, no stopwords
    row = gopher_quality_flags(
        _docs(spark, [(1, text)]), "doc_id", "text"
    ).collect()[0]
    assert row["symbol_word_ratio"] > 0.1
    assert row["gopher_pass"] is False


def test_gopher_flags_bullets_and_ellipsis(spark):
    from victorialogs_spark.datapipe.quality import gopher_quality_flags

    text = "- item one\n- item two\nplain tail..."
    row = gopher_quality_flags(
        _docs(spark, [(1, text)]), "doc_id", "text"
    ).collect()[0]
    assert row["bullet_line_frac"] == pytest.approx(2 / 3)
    assert row["ellipsis_line_frac"] == pytest.approx(1 / 3)
    assert row["gopher_pass"] is False  # too short anyway


def test_gopher_flags_null_and_empty(spark):
    from victorialogs_spark.datapipe.quality import gopher_quality_flags

    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            _docs(spark, [(1, None), (2, "")]), "doc_id", "text"
        ).collect()
    }
    assert out[1]["gopher_pass"] is False
    assert out[2]["gopher_pass"] is False
    assert out[2]["mean_word_len"] is None


def test_unigram_logprob_orders_gibberish_below_common_text(spark):
    """Rare-token soup must score below text made of corpus-common
    tokens; uniform corpora give every doc ln(tf/N) exactly."""
    import math

    from victorialogs_spark.datapipe.quality import unigram_logprob

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat ran"), (3, "zqxj vwpk grlm"),
         (4, ""), (5, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            unigram_logprob(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}  # empty/null docs have no distribution
    assert rows[3]["logprob"] < rows[1]["logprob"]  # gibberish scores lower
    # 9 total tokens; 'zqxj vwpk grlm' are singletons: mean ln(1/9)
    assert abs(rows[3]["logprob"] - math.log(1 / 9)) < 1e-6
    assert rows[1]["n_tokens"] == 3


def test_perplexity_buckets_terciles(spark):
    from victorialogs_spark.datapipe.quality import perplexity_buckets

    # 9 docs from a shared vocabulary with varying rare-token load
    # (each rare token unique, so more rares = strictly lower logprob)
    rows = [(i, " ".join(["the", "of", "and"] * 3
                         + [f"rare{i}_{j}" for j in range(i)]))
            for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = perplexity_buckets(df, "doc_id", "text").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["doc_id"])
    assert len(out) == 9
    # terciles: each bucket non-empty, head = most-fluent (fewest rares)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert 0 in by_bucket["head"] and 8 in by_bucket["tail"]
    # threshold semantics: every head logprob > every tail logprob
    lp = {r["doc_id"]: r["logprob"] for r in out}
    assert min(lp[d] for d in by_bucket["head"]) > max(
        lp[d] for d in by_bucket["tail"]
    )


def test_bigram_logprob_detects_word_salad(spark):
    from victorialogs_spark.datapipe.quality import bigram_logprob

    prose = "the cat sat on the mat and the dog sat on the rug"
    # word salad: same vocabulary, shuffled order (no common bigrams)
    salad = "mat the on dog sat rug cat the and on the sat mat the"
    rows = [(0, prose), (1, prose), (2, salad), (3, "single")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           bigram_logprob(df, "doc_id", "text").collect()}
    # prose bigrams repeat across docs 0/1 -> higher conditional prob
    assert out[0]["bigram_logprob"] > out[2]["bigram_logprob"]
    assert out[0]["bigram_logprob"] == out[1]["bigram_logprob"]
    assert 3 not in out  # <2 tokens: no bigrams, absent
    assert out[0]["n_bigrams"] == len(prose.split()) - 1


def test_r14_datapipe_review_fixes(spark):
    """Batch regression for the sixth review pass (r14):
    empty docs yield NULL text_stats ratios instead of ANSI
    DIVIDE_BY_ZERO; multi-blank-line paragraph delimiters split;
    phone redaction does not bite into longer digit runs;
    NULL-key rows survive hash sampling; dedup_by_clusters keeps the
    min PRESENT member when the graph's min id was filtered out."""
    from pyspark.sql import functions as F

    from victorialogs_spark.datapipe.clusters import dedup_by_clusters
    from victorialogs_spark.datapipe.quality import repetition_stats
    from victorialogs_spark.datapipe.sampling import hash_sample
    from victorialogs_spark.datapipe.text import redact_pii, text_stats

    # 1. empty doc: NULL ratios, no crash
    docs = spark.createDataFrame(
        [(1, "hello world hello"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text_stats(docs, "doc_id", "text").collect()}
    assert rows[2].uniq_ratio is None and rows[3].mean_word_len is None
    assert abs(rows[1].uniq_ratio - 2 / 3) < 1e-9

    # 2. two space-bearing blank lines still delimit paragraphs
    rep = repetition_stats(
        spark.createDataFrame([(1, "x\n \n \nx")], "doc_id long, text string"),
        "doc_id", "text",
    ).collect()[0]
    assert abs(rep.dup_para_frac - 0.5) < 1e-9

    # 3. phone redaction leaves longer digit runs intact
    out = spark.createDataFrame(
        [("order 20260816123456 call 555-123-4567",)], "t string"
    ).select(redact_pii(F.col("t"), ["phone"]).alias("r")).collect()[0].r
    assert out == "order 20260816123456 call <PHONE>"

    # 4. NULL keys survive a 100% hash sample
    df = spark.createDataFrame([("a",), (None,), ("b",)], "k string")
    assert hash_sample(df, "k", 1.0).count() == 3

    # 5. cluster representative = min id PRESENT in df
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    df2 = spark.createDataFrame([(2,), (3,), (9,)], "doc_id long")
    kept = {r.doc_id for r in dedup_by_clusters(df2, "doc_id", pairs).collect()}
    assert kept == {2, 9}  # 2 survives as the present representative


def test_repetition_engines_identical(spark):
    """The Arrow twin of repetition_stats must be value-IDENTICAL to the
    Column-expression path (the signals are oracle-declared): adversarial
    whitespace/unicode/empty/null cases, bit-exact doubles."""
    from victorialogs_spark.datapipe.quality import repetition_stats

    adv = [
        "", "\n", "a\nb\na", "x\n\n  \n\nx\n\nx", "  \n\t\n", None,
        "line \nline \nother", "p1\n\np1\n\np2", "é\né\nü", "\n\n\n",
        "a\n \nb\n\t\nb", "tr  ", " leading\n leading", "🎈x\n🎈x\nz",
        "a\x0bb\na\x0bb", "dup\ndup\ndup\n\nd2\n\nd2",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(adv)], "doc_id long, text string"
    )
    a = {
        r["doc_id"]: tuple(r)[1:]
        for r in repetition_stats(df, "doc_id", "text", engine="column").collect()
    }
    b = {
        r["doc_id"]: tuple(r)[1:]
        for r in repetition_stats(df, "doc_id", "text", engine="arrow").collect()
    }
    assert a == b

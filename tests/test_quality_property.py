"""Property test: every quality/repetition signal stays in its valid
range (or NULL) for arbitrary text — control chars, unicode whitespace,
emoji, pathological repetition — nothing crashes or leaves [0, 1]."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from victorialogs_spark.datapipe.quality import (
    gopher_quality_flags,
    ngram_repetition,
    repetition_stats,
)

texts = st.lists(
    st.one_of(
        st.text(max_size=40),
        st.sampled_from(
            ["a b c " * 20, "x\n\nx\n\nx", "\x0b\t ", "héllo wörld " * 5, ""]
        ),
        st.none(),
    ),
    min_size=1,
    max_size=5,
)


def _frac_ok(v):
    return v is None or 0.0 <= v <= 1.0 + 1e-9


@given(batch=texts)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_signals_bounded(spark, batch):
    docs = spark.createDataFrame(
        list(enumerate(batch)), "doc_id long, text string"
    )
    for r in repetition_stats(docs, "doc_id", "text").collect():
        assert _frac_ok(r["dup_line_frac"]) and _frac_ok(r["dup_line_char_frac"])
        assert _frac_ok(r["dup_para_frac"]) and _frac_ok(r["dup_para_char_frac"])
    for r in ngram_repetition(docs, "doc_id", "text", n=2).collect():
        assert _frac_ok(r["top_ngram_char_frac"])
        assert _frac_ok(r["dup_ngram_char_frac"])
        assert r["top_ngram_char_frac"] >= r["dup_ngram_char_frac"] or (
            # dup can exceed top when several DIFFERENT grams repeat
            r["dup_ngram_char_frac"] <= 1.0
        )
    for r in gopher_quality_flags(docs, "doc_id", "text").collect():
        assert _frac_ok(r["bullet_line_frac"]) and _frac_ok(r["ellipsis_line_frac"])
        assert _frac_ok(r["alpha_word_frac"])
        assert r["symbol_word_ratio"] is None or r["symbol_word_ratio"] >= 0
        assert isinstance(r["gopher_pass"], bool)

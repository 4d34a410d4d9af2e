"""Property tests for cross-document span statistics: the rolling-hash
window path must agree with a straightforward string-window reference on
arbitrary corpora — same per-doc span counts, same sharing structure —
and quantization must stay within its contract bounds."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "x", "1", "the", "of"]
)
texts = st.one_of(
    st.none(),
    st.lists(words, min_size=0, max_size=12).map(" ".join),
)
corpora = st.lists(texts, min_size=1, max_size=10)


def _ref_spans(docs: list[str | None], n: int) -> dict[int, tuple[int, int]]:
    """Reference implementation on span STRINGS (the oracle's view):
    returns {doc_idx: (n_spans, shared_spans)}."""
    per_doc: dict[int, set] = {}
    for i, text in enumerate(docs):
        toks = (text or "").lower().split()
        if len(toks) == 0:
            spans = {("",)}
        elif len(toks) < n:
            spans = {tuple(toks)}
        else:
            spans = {tuple(toks[j : j + n]) for j in range(len(toks) - n + 1)}
        per_doc[i] = spans
    freq: dict[tuple, int] = {}
    for spans in per_doc.values():
        for s in spans:
            freq[s] = freq.get(s, 0) + 1
    return {
        i: (len(spans), sum(1 for s in spans if freq[s] >= 2))
        for i, spans in per_doc.items()
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpora, n=st.sampled_from([2, 3, 5]))
def test_repeated_spans_matches_string_reference(spark, docs, n):
    from victorialogs_spark.datapipe.dedup import repeated_spans

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["shared_spans"])
        for r in repeated_spans(df, "doc_id", "text", span_tokens=n).collect()
    }
    assert got == _ref_spans(docs, n)


vectors = st.lists(
    st.lists(
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False, width=32,
        ),
        min_size=4, max_size=4,
    ),
    min_size=1, max_size=8,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=vectors)
def test_quantization_contract(spark, vecs):
    from victorialogs_spark.datapipe.similarity import quantize_embeddings

    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r for r in
           quantize_embeddings(df, "vec_id", "embedding").collect()}
    assert set(out) == set(range(len(vecs)))
    for i, v in enumerate(vecs):
        r = out[i]
        assert all(-127 <= x <= 127 for x in r["qvec"])
        if all(x == 0.0 for x in v):
            assert r["qscale"] == 0.0 and all(x == 0 for x in r["qvec"])
        else:
            # dequantized values stay within half a step of the original
            for orig32, q in zip(v, r["qvec"]):
                assert abs(q * r["qscale"] - orig32) <= r["qscale"] / 2 + 1e-9

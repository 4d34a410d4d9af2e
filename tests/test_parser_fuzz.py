"""Parser robustness fuzz: any input must either parse or raise a clean
ValueError — never an unhandled exception type, never a hang. (The
reference's parser is similarly total: every byte sequence gets either an
AST or an error message.)"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from victorialogs_spark.logsql.parser import parse_query

# printable ASCII plus the token classes LogsQL cares about
_ALPHABET = string.ascii_letters + string.digits + ' _.:*()[]{}"~!<>=,|-+\\/\''


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet=_ALPHABET, max_size=80))
def test_arbitrary_ascii_never_crashes(s):
    try:
        parse_query(s)
    except ValueError:
        pass


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_arbitrary_unicode_never_crashes(s):
    try:
        parse_query(s)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(["error", "i(Err)", "=x", "~\"e.*\"", ">5", "in(a,b)",
                     "range[1,2]", "len_range(1,3)", "*", "contains_any(a)"]),
    st.sampled_from(["_msg", "app", "f.q", "_time"]),
    st.sampled_from(["", " | fields a", " | stats count() as c",
                     " | sort by (a) limit 3", " | uniq by (x)"]),
)
def test_wellformed_fragments_parse(filt, field, pipe):
    q = f"{field}:{filt}{pipe}"
    try:
        parse_query(q)
    except ValueError:
        pass  # some combos are legitimately invalid (e.g. _time:in(a,b))

"""Literal rendering parity tests (rdflib Literal.n3 lexical rules).

Pinned against rdflib's public behavior (rdflib/term.py): plain quoted
strings with \\ \\n " \\r escaping; xsd:integer/xsd:double/xsd:boolean typed
literals with Python str() lexical forms.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from literature_to_facts_spark.functions.literals import (
    XSD_DOUBLE,
    XSD_INTEGER,
    from_n3,
    lexical_and_dtype,
    literal_n3,
    n3_from_lexical,
    parse_lexical,
    quote_decode,
    quote_encode,
)


def test_string_literal():
    assert literal_n3("abc") == '"abc"'
    assert literal_n3('a"b') == '"a\\"b"'
    assert literal_n3("a\nb") == '"a\\nb"'
    assert literal_n3("a\\b") == '"a\\\\b"'
    assert literal_n3("a\rb") == '"a\\rb"'


def test_int_literal():
    assert literal_n3(5) == f'"5"^^<{XSD_INTEGER}>'
    assert literal_n3(1088376) == f'"1088376"^^<{XSD_INTEGER}>'
    assert literal_n3(-3) == f'"-3"^^<{XSD_INTEGER}>'


def test_float_literal():
    # the reference's own tests round-trip these exact values
    assert literal_n3(4.6e-07) == f'"4.6e-07"^^<{XSD_DOUBLE}>'
    assert literal_n3(34.12) == f'"34.12"^^<{XSD_DOUBLE}>'
    assert literal_n3(-8.05) == f'"-8.05"^^<{XSD_DOUBLE}>'
    assert literal_n3(1603215845.0) == f'"1603215845.0"^^<{XSD_DOUBLE}>'


def test_bool_literal():
    assert literal_n3(True) == '"true"^^<http://www.w3.org/2001/XMLSchema#boolean>'


def test_from_n3_round_trip():
    for v in ["x y", 'quo"te', "new\nline", 5, -7, 4.6e-07, 0.15, True, 253.3]:
        assert from_n3(literal_n3(v)) == v


@given(st.text(max_size=200))
@settings(max_examples=300)
def test_quote_round_trip(s):
    assert quote_decode(quote_encode(s)[1:-1]) == s


@given(st.text(max_size=200))
@settings(max_examples=200)
def test_string_from_n3_round_trip(s):
    assert from_n3(literal_n3(s)) == s


@given(st.floats(allow_nan=False, allow_infinity=False))
@settings(max_examples=300)
def test_float_round_trip(f):
    assert from_n3(literal_n3(f)) == f


@given(st.integers(min_value=-(10**15), max_value=10**15))
def test_int_round_trip(i):
    v = from_n3(literal_n3(i))
    assert v == i and isinstance(v, int)


@given(
    st.one_of(
        st.text(max_size=50),
        st.integers(-(10**9), 10**9),
        st.floats(allow_nan=False, allow_infinity=False),
    )
)
@settings(max_examples=300)
def test_lexical_dtype_round_trip(v):
    lex, dt = lexical_and_dtype(v)
    assert parse_lexical(lex, dt) == v
    assert n3_from_lexical(lex, dt) == literal_n3(v)
    if isinstance(v, float) and not math.isnan(v):
        assert isinstance(parse_lexical(lex, dt), float)


def test_render_values_matches_literals_authority():
    """The vectorized emit path (pipeline._render_values) is a performance
    re-expression of lexical_and_dtype + n3_from_lexical; this property test
    pins the two implementations equal so a future change to the
    functions/literals authority cannot silently diverge from the hot path."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from literature_to_facts_spark.engine.pipeline import _render_values
    from literature_to_facts_spark.functions.literals import (
        lexical_and_dtype,
        n3_from_lexical,
    )

    scalars = st.one_of(
        st.text(max_size=30),
        st.text(alphabet='\\\n"\r\t x', max_size=12),  # escape-heavy
        st.integers(min_value=-(2**62), max_value=2**62),
        st.booleans(),
        st.floats(allow_nan=False, allow_infinity=True),
        st.sampled_from([np.int64(7), np.float64(4.6e-07), np.bool_(True), np.str_("s")]),
    )

    @settings(max_examples=300, deadline=None)
    @given(st.lists(scalars, min_size=1, max_size=40))
    def check(vals):
        arr = np.empty(len(vals), dtype=object)
        arr[:] = vals
        lex, dt, n3 = _render_values(arr)
        for i, v in enumerate(vals):
            if isinstance(v, np.generic):
                v = v.item()
            e_lex, e_dt = lexical_and_dtype(v)
            assert lex[i] == e_lex
            assert dt[i] == e_dt
            assert n3[i] == n3_from_lexical(e_lex, e_dt)

    check()

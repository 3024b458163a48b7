"""Hypothesis property tests for the pure functions (no Spark session)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from crawlingathome_server_spark.functions.text import _extract_one
from crawlingathome_server_spark.functions.urls import _canon_one
from crawlingathome_server_spark.simulator import oracle_hash

host_st = st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,20}(\.[A-Za-z]{2,6}){1,2}", fullmatch=True)
path_st = st.from_regex(r"(/[A-Za-z0-9._~-]{0,10}){0,4}", fullmatch=True)
query_st = st.lists(
    st.from_regex(r"[a-z]{1,5}=[A-Za-z0-9]{0,8}", fullmatch=True), max_size=4
).map("&".join)


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
    host=host_st,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=path_st,
    query=query_st,
    frag=st.sampled_from(["", "#x", "#frag-1"]),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(scheme, host, port, path, query, frag):
    url = f"{scheme}://{host}{port}{path}"
    if query:
        url += "?" + query
    url += frag
    c1 = _canon_one(url)
    assert _canon_one(c1) == c1  # idempotent
    assert "#" not in c1  # fragment stripped
    # host lowercased
    m = re.match(r"^[a-z]+://([^/:?]+)", c1)
    assert m and m.group(1) == m.group(1).lower()


@given(st.integers(min_value=0, max_value=2**31), st.integers(min_value=0, max_value=1000))
def test_oracle_hash_bounds_and_determinism(key, seed):
    h = oracle_hash(key, seed)
    assert 0 <= h < 2**32
    assert h == oracle_hash(key, seed)


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_extract_text_pure_and_stable(text):
    html = f"<html><body><p>{text}</p></body></html>".encode("utf-8", "replace")
    a = _extract_one(html)
    b = _extract_one(html)
    assert a == b  # byte-stable
    assert "<p>" not in a  # tags stripped


@given(st.binary(max_size=200))
@settings(max_examples=100, deadline=None)
def test_extract_text_never_raises(raw):
    out = _extract_one(raw)
    assert out is None or isinstance(out, str)

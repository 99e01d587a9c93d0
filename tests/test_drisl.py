"""DRISL codec + path-extraction vectors, ported verbatim from the
reference's only substantive unit suite
(leaf-stream/src/drisl_extract.rs:87-244; FIXTURES.md F3)."""

import math

import pytest

from leaf_spark.drisl import (
    MISSING,
    CidLink,
    decode,
    drisl_exists,
    drisl_extract,
    encode,
    extract_value,
    parse_path,
    to_sql_value,
)

DOC_A = {
    "name": "John",
    "name.with.special#?chars": "Jane",
    "age": 32,
    "result": {"Ok": 7},
}


def ev(doc, path):
    return extract_value(doc, path)


class TestReferenceVectors:
    """drisl_extract.rs:96-243 — the de-facto path-language spec."""

    def test_a_simple_field(self):
        assert ev(DOC_A, ".name") == "John"

    def test_a2_quoted_field_with_dots(self):
        assert ev(DOC_A, '."name.with.special#?chars"') == "Jane"

    def test_a3_int_field(self):
        assert ev(DOC_A, ".age") == 32

    def test_a4_nested_ok(self):
        assert ev(DOC_A, ".result.Ok") == 7

    def test_a5_missing_is_distinct_from_null(self):
        assert ev(DOC_A, ".result.Err") is MISSING

    def test_b_present_but_null(self):
        assert ev({"result": {"Ok": None}}, ".result.Ok") is None

    def test_c_err_variant(self):
        assert ev({"result": {"Err": "error"}}, ".result.Err") == "error"

    def test_d_discriminant_on_bare_text(self):
        doc = {"name": "test", "e": "Hello", "items": [1, 2, 3]}
        assert ev(doc, ".e") == "Hello"
        assert ev(doc, ".e.?discriminant") == "Hello"

    def test_e_discriminant_on_single_key_map(self):
        doc = {"e": {"N": 77}, "items": [4, 5, 6]}
        assert ev(doc, ".e.?discriminant") == "N"
        assert ev(doc, ".e.N") == 77

    def test_f_variant_access_and_array_index(self):
        doc = {"e": {"World": "mary"}, "items": [7, 8, 9]}
        assert ev(doc, ".e.World") == "mary"
        assert ev(doc, ".e.N") is MISSING
        assert ev(doc, ".items.1") == 8

    def test_g_quoted_nested(self):
        doc = {"inner.value": {"sub.value": "data"}}
        assert ev(doc, '."inner.value"."sub.value"') == "data"


class TestTerminalConversion:
    """drisl_extract.rs:17-30: bool→int, CID→blob, map/array→JSON text."""

    def test_bool_to_int(self):
        assert to_sql_value(True) == 1
        assert to_sql_value(False) == 0

    def test_cid_to_blob(self):
        assert to_sql_value(CidLink(b"\x01\x02")) == b"\x01\x02"

    def test_container_to_json_text(self):
        assert to_sql_value([1, 2]) == "[1,2]"
        assert to_sql_value({"a": 1}) == '{"a":1}'

    def test_passthrough(self):
        assert to_sql_value(5) == 5
        assert to_sql_value(2.5) == 2.5
        assert to_sql_value("x") == "x"
        assert to_sql_value(b"\xff") == b"\xff"
        assert to_sql_value(None) is None


class TestCodec:
    @pytest.mark.parametrize(
        "v",
        [
            None,
            True,
            False,
            0,
            23,
            24,
            255,
            256,
            65536,
            2**32,
            -1,
            -25,
            1.5,
            -0.25,
            "",
            "héllo",
            b"",
            b"\x00\xff",
            [1, [2, 3], "x"],
            {"b": 1, "a": [None, True]},
            CidLink(b"\x12 abc"),
        ],
    )
    def test_roundtrip(self, v):
        assert decode(encode(v)) == v

    def test_deterministic_map_order(self):
        assert encode({"b": 1, "a": 2}) == encode({"a": 2, "b": 1})

    def test_shortest_int_heads(self):
        assert encode(23) == b"\x17"
        assert encode(24) == b"\x18\x18"
        assert encode(0) == b"\x00"

    def test_nan_rejected(self):
        with pytest.raises(ValueError):
            encode(math.nan)

    def test_indefinite_rejected(self):
        with pytest.raises(ValueError):
            decode(b"\x9f\x01\xff")  # indefinite array


class TestSqlSurface:
    def test_extract_missing_is_null(self):
        blob = encode(DOC_A)
        assert drisl_extract(blob, ".result.Err") is None
        assert drisl_exists(blob, ".result.Err") == 0
        assert drisl_exists(blob, ".result.Ok") == 1

    def test_bad_path(self):
        with pytest.raises(ValueError):
            parse_path("name")  # must start with '.'

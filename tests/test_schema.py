"""Schema translator unit tests — mirrors reference tests/test_sinks.py
tables for remove_null_string/get_pyarrow_type/build_pyarrow_field
(reference tests/test_sinks.py:27-132), with BUG-1/BUG-3 fixed per
SURVEY §2.11."""

from pyspark.sql import types as T

from target_parquet_spark.schema import (
    build_struct_field,
    json_schema_to_struct,
    resolve_property,
    resolve_type,
)


def f(name, dtype, nullable):
    return T.StructField(name, dtype, nullable)


class TestTypeMapping:
    # reference get_pyarrow_type table (tests/test_sinks.py:47-70)
    def test_number(self):
        assert build_struct_field("x", {"type": ["number"]}) == f("x", T.DoubleType(), False)

    def test_integer(self):
        assert build_struct_field("x", {"type": ["integer"]}) == f("x", T.LongType(), False)

    def test_boolean(self):
        assert build_struct_field("x", {"type": ["boolean"]}) == f("x", T.BooleanType(), False)

    def test_string(self):
        assert build_struct_field("x", {"type": ["string"]}) == f("x", T.StringType(), False)

    def test_datetime_ms(self):
        # date-time force-nullable even without "null" (reference
        # tests/test_sinks.py:109-118)
        assert build_struct_field(
            "x", {"type": ["string"], "format": "date-time"}
        ) == f("x", T.TimestampType(), True)

    def test_array_object_are_nullable_strings(self):
        assert build_struct_field("x", {"type": ["array", "null"]}) == f("x", T.StringType(), True)
        assert build_struct_field("x", {"type": ["object"]}) == f("x", T.StringType(), True)

    def test_missing_type_defaults_nullable_string(self):
        # reference sinks.py:49
        assert build_struct_field("x", {}) == f("x", T.StringType(), True)

    def test_type_as_bare_string(self):
        assert build_struct_field("x", {"type": "integer"}) == f("x", T.LongType(), False)

    def test_pure_null_becomes_all_null_string(self):
        # deviation: Spark can't write NullType parquet; see schema.py docstring
        assert build_struct_field("x", {"type": ["null"]}) == f("x", T.StringType(), True)


class TestFuzzyTypes:
    # priority boolean > string > first (reference tests/test_sinks.py:94-107)
    def test_string_number(self):
        assert resolve_type(["string", "number"]) == "string"

    def test_number_string_same_as_string_number(self):
        # BUG-3 fix: order-insensitive, same resolution for schema and values
        assert resolve_type(["number", "string"]) == "string"

    def test_boolean_wins(self):
        assert resolve_type(["boolean", "string"]) == "boolean"
        assert resolve_type(["string", "boolean"]) == "boolean"

    def test_first_element_fallback(self):
        assert resolve_type(["integer", "number"]) == "integer"

    def test_field_string_number_not_null(self):
        assert build_struct_field("v", {"type": ["string", "number"]}) == f(
            "v", T.StringType(), False
        )


class TestAnyOf:
    def test_anyof_first_variant_type(self):
        # reference behavior: type from first non-null variant
        prop = {"anyOf": [{"type": "number"}, {"type": "null"}]}
        rf = resolve_property("price", prop)
        assert rf.spark_type == T.DoubleType()

    def test_bug1_null_variant_makes_nullable(self):
        # BUG-1 FIX (reference tests/README.md:22-35): reference produced
        # NOT NULL here and corrupted None -> 0.0
        prop = {"anyOf": [{"type": "number"}, {"type": "null"}]}
        assert resolve_property("price", prop).nullable is True

    def test_anyof_null_first(self):
        prop = {"anyOf": [{"type": "null"}, {"type": "integer"}]}
        rf = resolve_property("x", prop)
        assert rf.spark_type == T.LongType() and rf.nullable

    def test_anyof_datetime(self):
        prop = {"anyOf": [{"type": "string", "format": "date-time"}]}
        rf = resolve_property("ts", prop)
        assert rf.spark_type == T.TimestampType() and rf.nullable


class TestStructBuild:
    def test_full_schema(self):
        schema = {
            "properties": {
                "id": {"type": ["string", "null"]},
                "n": {"type": ["integer", "null"]},
            }
        }
        assert json_schema_to_struct(schema) == T.StructType(
            [f("id", T.StringType(), True), f("n", T.LongType(), True)]
        )

    def test_fixed_headers_projection(self):
        # P1 (reference sinks.py:147-153, tests/test_sinks.py:242-250)
        schema = {
            "properties": {
                "id": {"type": ["string", "null"]},
                "name": {"type": ["string", "null"]},
                "email": {"type": ["string", "null"]},
            }
        }
        st = json_schema_to_struct(schema, fixed_headers=["id", "name"])
        assert [x.name for x in st.fields] == ["id", "name"]

"""Table schemas for the CPG-as-KG triple factory (FIXTURES.md §2).

The reference stores one schema-typed property graph in OverflowDB
(``x2cpg/.../X2Cpg.scala:295-309``); we store two wide, kind-discriminated
DataFrames (``nodes``/``edges``) plus a flattened ``triples`` view. Sparse
properties are nullable columns — columnar parquet handles the nulls cheaply.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Node kinds in scope (reference: NodeTypeStarters.scala:14-330)
NODE_KINDS = [
    "META_DATA", "FILE", "NAMESPACE", "NAMESPACE_BLOCK", "TYPE", "TYPE_DECL",
    "MEMBER", "METHOD", "METHOD_PARAMETER_IN", "METHOD_PARAMETER_OUT",
    "METHOD_RETURN", "METHOD_REF", "BLOCK", "CALL", "IDENTIFIER",
    "FIELD_IDENTIFIER", "LITERAL", "LOCAL", "RETURN", "CONTROL_STRUCTURE",
    "JUMP_TARGET", "JUMP_LABEL", "MODIFIER", "COMMENT", "UNKNOWN", "TYPE_REF",
    "IMPORT", "ANNOTATION", "ANNOTATION_PARAMETER_ASSIGN",
    "ANNOTATION_PARAMETER", "TEMPLATE_DOM",
    # fork-specific kinds (NodeTypeStarters.scala:180-190)
    "MACRO_DECL", "MACRO_REF",
    # DependenciesPass output (jssrc2cpg DependenciesPass.scala:14-35)
    "DEPENDENCY",
]

# Edge kinds in scope (reference: Ast.scala:25-52 + pass outputs, SURVEY.md §1.1)
EDGE_KINDS = [
    "AST", "ARGUMENT", "CONDITION", "RECEIVER", "REF", "BINDS", "CFG",
    "DOMINATE", "POST_DOMINATE", "CDG", "REACHING_DEF", "CALL", "SOURCE_FILE",
    "CONTAINS", "EVAL_TYPE", "INHERITS_FROM", "ALIAS_OF", "PARAMETER_LINK",
]

# arrow-friendly schema strings for pandas-UDF boundaries ------------------

# nodes: FIXTURES.md §2 columns + pipeline-internal parent_id/method_id/ctrl/
# filename columns (parent_id/method_id make the per-method group kernels
# self-contained: no tree join needed before CFG/reaching-def).
NODES_SCHEMA_DDL = (
    "node_id long, doc_id string, kind string, name string, full_name string, "
    "code string, signature string, dispatch_type string, order int, "
    "argument_index int, line int, span_offset int, type_full_name string, "
    "is_external boolean, media_ref string, parent_id long, method_id long, "
    "ctrl_type string, filename string"
)

EDGES_SCHEMA_DDL = (
    "src long, dst long, kind string, variable string, doc_id string, method_id long"
)

# one unified row stream out of the parser UDF (rowtype discriminates), so a
# document is parsed exactly once per pipeline run.
CPGROW_SCHEMA_DDL = f"rowtype string, {NODES_SCHEMA_DDL}, edge_src long, edge_dst long, edge_kind string, edge_variable string"

TRIPLES_SCHEMA_DDL = "subj string, pred string, obj string, doc_id string, part_id int"

LINEAGE_SCHEMA_DDL = (
    "part_id int, stage string, rows_in long, rows_out long, checksum string, "
    "duration_ms long, status string"
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), False),
                        T.StructField("text", T.StringType(), False),
                        T.StructField("media_ref", T.StringType(), False),
                        T.StructField("offset", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)

NODE_COLUMNS = [f.strip().split(" ")[0] for f in NODES_SCHEMA_DDL.split(", ")]
EDGE_COLUMNS = [f.strip().split(" ")[0] for f in EDGES_SCHEMA_DDL.split(", ")]

# long/int columns that may carry nulls at pandas-UDF boundaries. They must be
# materialized as nullable Int64 — naive pd.DataFrame construction would
# coerce int-with-null columns to float64, silently corrupting 64-bit hash
# ids above 2^53.
ID_COLUMNS = [
    "node_id", "parent_id", "method_id", "src", "dst", "edge_src", "edge_dst",
    "order", "argument_index", "line", "span_offset",
]


def rows_to_pdf(rows, columns):
    """list-of-dicts → pandas frame safe for Arrow: exact Int64 id columns."""
    import pandas as pd

    out = pd.DataFrame(rows, columns=columns, dtype=object)
    for c in ID_COLUMNS:
        if c in out.columns:
            out[c] = out[c].astype("Int64")
    return out


def arrow_schema(ddl: str):
    """Spark DDL string → the pyarrow schema ``mapInArrow`` must yield.

    The Arrow-native sibling of :func:`rows_to_pdf`: ``pa.Table.from_pylist``
    against this schema lands Python ints in int64 EXACTLY (missing keys
    null-fill), so the 2^53 float64 hazard structurally cannot occur."""
    import pyarrow as pa

    _T = {"string": pa.string(), "long": pa.int64(), "int": pa.int32(),
          "boolean": pa.bool_()}
    return pa.schema(
        pa.field(name, _T[typ])
        for name, typ in (c.strip().split(" ") for c in ddl.split(", "))
    )

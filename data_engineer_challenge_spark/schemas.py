"""Single source of truth for every schema (SURVEY.md §1.3).

The reference duplicates its schemas in three hand-synchronised places
(SQLite DDL, dict literals exo_1.py:57-82/101-107/exo_2.py:260-279, and
the Excel header row). Here each table is one explicit ``StructType``,
enforced on read and write.

Types follow SURVEY.md §1.2: DDL ``DATE`` columns that the reference
stores as ``DD/MM/YYYY`` strings become real ``DateType`` internally
(rendered back to ``dd/MM/yyyy`` only at the presentation edge);
``MASTER_PATIENT_ID`` is fixed to int (reference writes str, exo_1.py:105).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Patient registry input (fichiers source/export_patient.xlsx, FIXTURES.md §1)
# All string — dates are DD/MM/YYYY text; HOSPITAL_PATIENT_ID keeps leading
# zeros (exo_1.py:30), so it must never be inferred numeric.
# ---------------------------------------------------------------------------
PATIENT_EXPORT = T.StructType(
    [
        T.StructField("NOM", T.StringType()),
        T.StructField("PRENOM", T.StringType()),
        T.StructField("DATE_NAISSANCE", T.StringType()),
        T.StructField("SEXE", T.StringType()),
        T.StructField("NOM_JEUNE_FILLE", T.StringType()),
        T.StructField("HOSPITAL_PATIENT_ID", T.StringType()),
        T.StructField("ADRESSE", T.StringType()),
        T.StructField("TEL", T.StringType()),
        T.StructField("CP", T.StringType()),
        T.StructField("VILLE", T.StringType()),
        T.StructField("PAYS", T.StringType()),
        T.StructField("DATE_MORT", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Warehouse tables (drwh.db DDL via FIXTURES.md §4)
# ---------------------------------------------------------------------------
DWH_PATIENT = T.StructType(
    [
        T.StructField("PATIENT_NUM", T.LongType(), False),
        T.StructField("LASTNAME", T.StringType()),
        T.StructField("FIRSTNAME", T.StringType()),
        T.StructField("BIRTH_DATE", T.DateType()),
        T.StructField("SEX", T.StringType()),
        T.StructField("MAIDEN_NAME", T.StringType()),
        T.StructField("RESIDENCE_ADDRESS", T.StringType()),
        T.StructField("PHONE_NUMBER", T.StringType()),
        T.StructField("ZIP_CODE", T.StringType()),
        T.StructField("RESIDENCE_CITY", T.StringType()),
        T.StructField("DEATH_DATE", T.DateType()),
        T.StructField("RESIDENCE_COUNTRY", T.StringType()),
        T.StructField("RESIDENCE_LATITUDE", T.StringType()),
        T.StructField("RESIDENCE_LONGITUDE", T.StringType()),
        T.StructField("DEATH_CODE", T.StringType()),
        T.StructField("UPDATE_DATE", T.DateType()),
        T.StructField("BIRTH_COUNTRY", T.StringType()),
        T.StructField("BIRTH_CITY", T.StringType()),
        T.StructField("BIRTH_ZIP_CODE", T.StringType()),
        T.StructField("BIRTH_LATITUDE", T.DoubleType()),
        T.StructField("BIRTH_LONGITUDE", T.DoubleType()),
        T.StructField("UPLOAD_ID", T.LongType()),
    ]
)

DWH_PATIENT_IPPHIST = T.StructType(
    [
        T.StructField("PATIENT_NUM", T.LongType(), False),
        T.StructField("HOSPITAL_PATIENT_ID", T.StringType(), False),
        T.StructField("ORIGIN_PATIENT_ID", T.StringType()),
        T.StructField("MASTER_PATIENT_ID", T.IntegerType()),
        T.StructField("UPLOAD_ID", T.LongType()),
    ]
)

DWH_DOCUMENT = T.StructType(
    [
        T.StructField("DOCUMENT_NUM", T.LongType(), False),
        T.StructField("PATIENT_NUM", T.LongType()),
        T.StructField("ENCOUNTER_NUM", T.StringType()),
        T.StructField("TITLE", T.StringType()),
        T.StructField("DOCUMENT_ORIGIN_CODE", T.StringType()),
        T.StructField("DOCUMENT_DATE", T.DateType()),
        T.StructField("ID_DOC_SOURCE", T.StringType(), False),
        T.StructField("DOCUMENT_TYPE", T.StringType()),
        T.StructField("DISPLAYED_TEXT", T.StringType()),
        T.StructField("AUTHOR", T.StringType()),
        T.StructField("UNIT_CODE", T.StringType()),
        T.StructField("UNIT_NUM", T.IntegerType()),
        T.StructField("DEPARTMENT_NUM", T.IntegerType()),
        T.StructField("EXTRACTCONTEXT_DONE_FLAG", T.IntegerType()),
        T.StructField("EXTRACTCONCEPT_DONE_FLAG", T.IntegerType()),
        T.StructField("ENRGENE_DONE_FLAG", T.IntegerType()),
        T.StructField("ENRICHTEXT_DONE_FLAG", T.IntegerType()),
        T.StructField("UPDATE_DATE", T.DateType()),
        T.StructField("UPLOAD_ID", T.LongType()),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided synthetic star schema (/root/testdata, FIXTURES.md §5)
# Declared (not inferred) so a bad parquet fails loudly, and so column
# pruning/pushdown operate over known types.
# ---------------------------------------------------------------------------
TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA)

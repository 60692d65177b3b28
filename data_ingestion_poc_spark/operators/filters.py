"""Projections / filters / predicates (SURVEY.md section 2 B2).

Ports the reference's derive columns (A12 child.py:131-132, A13
child.py:16-18), integrity predicate (A9 child.py:83-88), pass/fail stream
split (A21 child.py:148-149) and the 3-pass filename sanitization (A11
child.py:20-33, semantics pinned by tests/test_basic.py:18-80). All pure
Column expressions — no UDFs — so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import register


@register(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
           ROUND(l_extendedprice * l_discount, 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates over timestamp/double/range conditions
    (generalizes A9's size-equality check, child.py:86-88). All four
    conjuncts are pushdown-eligible parquet filters."""
    t = load(spark, sf_dir)
    li = t.lineitem
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        F.round(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
    )


@register(
    "filter_quarantine",
    oracle="""
    SELECT o_orderkey, o_totalprice, 'ok' AS status
    FROM orders WHERE o_totalprice BETWEEN 5000 AND 300000
    UNION ALL
    SELECT o_orderkey, o_totalprice, 'quarantined' AS status
    FROM orders WHERE NOT (o_totalprice BETWEEN 5000 AND 300000)
    """,
)
def filter_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split pass/fail streams (reference A21 per-file error isolation:
    bad rows go to an error channel instead of killing the batch,
    child.py:148-149). At scale both branches come from ONE scan that
    Spark can reuse; the quarantine side becomes its own sink."""
    t = load(spark, sf_dir)
    orders = t.orders.select("o_orderkey", "o_totalprice")
    cond = F.col("o_totalprice").between(5000, 300000)
    ok = orders.where(cond).withColumn("status", F.lit("ok"))
    bad = orders.where(~cond).withColumn("status", F.lit("quarantined"))
    return ok.unionByName(bad)


#: The nine golden inputs from the reference's own unit tests
#: (tests/test_basic.py:18-80) plus their pinned expected outputs.
SANITIZE_GOLDEN: list[tuple[int, str, str]] = [
    (1, "file@name!.zip", "file-name-.zip"),
    (2, "   file name with spaces.txt   ", "file name with spaces.txt"),
    (3, "file.name.with.dots.zip", "file.name.with.dots.zip"),
    (4, "___filename--.txt", "___filename--.txt"),
    (5, 'file/name\\with?illegal%chars*here:too|and"quotes<and>more.txt',
        "file-name-with-illegal-chars-here-too-and-quotes-and-more.txt"),
    (6, "filename\x1fwith\x1fcontrolchars.txt", "filename-with-controlchars.txt"),
    (7, "fileñame\U0001f600with_unicode_chars.txt", "file-ame-with_unicode_chars.txt"),
    (8, "-filename-.txt-", "-filename-.txt-"),
    (9, "file--name---with--multiple---hyphens.txt",
        "file--name---with--multiple---hyphens.txt"),
]


def sanitize_col(c: Column) -> Column:
    """Faithful port of sanitize_filename (child.py:20-33): three regex
    passes (non-ASCII -> '-', disallowed -> '-', control chars -> '-') then
    strip spaces. Pure Column expr — JVM-side, codegen-friendly."""
    c = F.regexp_replace(c, r"[^\x00-\x7F]", "-")
    c = F.regexp_replace(c, r"[^A-Za-z0-9\.\-_ ]", "-")
    c = F.regexp_replace(c, r"[\x00-\x1F\x7F]", "-")
    return F.trim(c)


def _sanitize_oracle() -> str:
    # Case 6 carries a control char; build it with chr(31) instead of
    # embedding raw bytes in SQL. The 3 reference passes collapse to one
    # allowlist pass (each maps offending chars to '-').
    rows = []
    for i, raw, _ in SANITIZE_GOLDEN:
        if i == 6:
            rows.append("(6, 'filename' || chr(31) || 'with' || chr(31) || 'controlchars.txt')")
        else:
            rows.append(f"({i}, '{raw}')")
    values = ",\n      ".join(rows)
    return f"""
    SELECT input_id,
           trim(regexp_replace(raw, '[^A-Za-z0-9._ -]', '-', 'g'), ' ') AS sanitized
    FROM (VALUES
      {values}) AS t(input_id, raw)
    """


@register("sanitize_expr", oracle=_sanitize_oracle())
def sanitize_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename sanitization conformance (A11), evaluated over the nine
    golden cases from tests/test_basic.py:18-80."""
    df = spark.createDataFrame(
        [(i, raw) for i, raw, _ in SANITIZE_GOLDEN], "input_id int, raw string"
    )
    return df.select("input_id", sanitize_col(F.col("raw")).alias("sanitized"))


@register(
    "project_derive",
    oracle="""
    SELECT doc_id,
           CASE WHEN contains(file_name, '.')
                THEN regexp_extract(file_name, '\\.([^.]*)$', 1)
                ELSE 'none' END AS file_type,
           upper(lang) || '_' || source AS server_folder
    FROM (
      SELECT doc_id, lang, source,
             source || '_doc_' || CAST(doc_id AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0 THEN '.txt'
                       WHEN doc_id % 3 = 1 THEN '.tar.gz'
                       ELSE '' END AS file_name
      FROM documents
    )
    """,
)
def project_derive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived identity columns (A12 file_type: last '.'-segment else
    'none', child.py:131-132 — note '.tar.gz' -> 'gz'; A13 server_folder
    derivation, child.py:16-18). Pure string exprs, fully codegen'd."""
    t = load(spark, sf_dir)
    docs = t.documents.select(
        "doc_id",
        "lang",
        "source",
        F.concat(
            F.col("source"),
            F.lit("_doc_"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 3 == 0, ".txt")
            .when(F.col("doc_id") % 3 == 1, ".tar.gz")
            .otherwise(""),
        ).alias("file_name"),
    )
    return docs.select(
        "doc_id",
        F.when(
            F.col("file_name").contains("."),
            F.regexp_extract(F.col("file_name"), r"\.([^.]*)$", 1),
        )
        .otherwise("none")
        .alias("file_type"),
        F.concat(F.upper("lang"), F.lit("_"), F.col("source")).alias("server_folder"),
    )

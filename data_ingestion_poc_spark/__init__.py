"""PySpark-native analytics engine with the capabilities of
minerva-ds/data-ingestion-poc, rebuilt Spark-first.

The reference (/root/reference, read-only snapshot @ 2024-10-08) is a file
ingestion ETL pipeline (FTP/SFTP -> staging -> zip explode -> blob sink).
This package generalizes its dataflow operators into a DataFrame-first
engine (SURVEY.md section 2 Part B) plus LLM-data-pipeline extensions
(dedup, similarity search, multimodal columns, text analysis), designed for
100 TB scale: declarative plans for Catalyst/AQE, broadcast hints for small
dims, map-side partial aggregation, Arrow-batched pandas UDFs only where
built-ins cannot express the semantics.
"""

__version__ = "0.1.0"

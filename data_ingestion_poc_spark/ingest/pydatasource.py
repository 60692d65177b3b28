"""Custom Python DataSource (Spark 4 pyspark.sql.datasource API): the
engine-native answer to the reference's source layer.

The reference enumerates a `{server: [paths]}` manifest (main.py:69-75)
and fetches per file over FTP/SFTP (child.py:67-81), parallelized by a
hand-rolled process pool with round-robin batches (main.py:65-99). In
Spark 4 that whole layer is a DataSource plugin: `schema()` declares the
listing row shape, `partitions()` declares the parallel split (one
InputPartition per server — the A2/A3 batching, done by the scheduler),
and `read(partition)` yields that server's listing rows on an executor.
A real deployment would speak FTP inside read(); this container has no
network, so the listing is a deterministic closed-form synthesis — the
same formulas the DuckDB oracle computes — which keeps the full plugin
machinery (registration, option passing, partition planning, Arrow
row transport) under correctness test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import register

try:  # Spark 4-only API; gate so older engines still import the package
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    _HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceReader = object  # type: ignore[assignment,misc]
    _HAVE_DATASOURCE_API = False

#: Listing geometry + value formulas, shared verbatim by reader and oracle.
N_SERVERS, N_FILES = 4, 25
SIZE_MOD, MTIME_BASE, MTIME_MOD = 10_000_000, 1_700_000_000, 2_592_000


def listing_row(s: int, f: int) -> tuple[str, str, int, int]:
    """One manifest row — closed-form, so any engine can replicate it."""
    ext = ".zip" if f % 5 == 0 else ".dat"
    return (
        f"ftp://server{s}:21",
        f"/pub/file_{s}_{f}{ext}",
        ((s * 31 + f) * 2654435761) % SIZE_MOD,
        MTIME_BASE + (s * 131 + f * 7919) % MTIME_MOD,
    )


class ManifestListingSource(DataSource):
    """spark.read.format("manifest_listing") — remote-listing source."""

    @classmethod
    def name(cls) -> str:
        return "manifest_listing"

    def schema(self) -> str:
        return (
            "server string, remote_path string, "
            "file_size bigint, modified_time bigint"
        )

    def reader(self, schema) -> "ManifestListingReader":
        return ManifestListingReader(self.options)


class ManifestListingReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_servers = int(options.get("servers", N_SERVERS))
        self.n_files = int(options.get("files", N_FILES))

    def partitions(self):
        # One InputPartition per server: the reference's batch-per-pool-
        # worker split (main.py:89-99), expressed as scheduler metadata.
        return [InputPartition(s) for s in range(self.n_servers)]

    def read(self, partition):
        s = partition.value
        for f in range(self.n_files):
            yield listing_row(s, f)


@register(
    "scan_python_datasource",
    oracle=f"""
    SELECT 'ftp://server' || CAST(s.i AS VARCHAR) || ':21' AS server,
           '/pub/file_' || CAST(s.i AS VARCHAR) || '_' || CAST(f.j AS VARCHAR)
             || (CASE WHEN f.j % 5 = 0 THEN '.zip' ELSE '.dat' END)
             AS remote_path,
           CAST(((s.i * 31 + f.j) * 2654435761) % {SIZE_MOD} AS BIGINT)
             AS file_size,
           CAST({MTIME_BASE} + (s.i * 131 + f.j * 7919) % {MTIME_MOD} AS BIGINT)
             AS modified_time
    FROM range({N_SERVERS}) s(i) CROSS JOIN range({N_FILES}) f(j)
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the registered custom DataSource. The oracle computes
    the identical closed-form listing in SQL, so what is actually under
    test is the plugin path itself: registration, option plumbing,
    per-server partition planning, and executor-side row generation."""
    if not _HAVE_DATASOURCE_API:  # pragma: no cover
        raise NotImplementedError("pyspark.sql.datasource requires Spark 4+")
    # Idempotent per session: re-registering the same name is an overwrite.
    spark.dataSource.register(ManifestListingSource)
    return (
        spark.read.format("manifest_listing")
        .option("servers", N_SERVERS)
        .option("files", N_FILES)
        .load()
    )

"""Measure the A5 bounded-concurrency fetch stage (pipeline.make_fetch_stage
concurrency=n) against the sequential path.

Two axes, both honest about what they model:

1. --wan (default): LocalFilesystemFetcher wrapped with a fixed per-call
   sleep — the WAN round-trip model. The reference's asyncio semaphore
   (child_otherftp.py:300-306) exists exactly because many-small-files
   ingest over FTP/SFTP is LATENCY-bound: each file costs ~2 RTT-bound
   calls (stat probe + retrieve), so overlapping c of them inside a task
   should approach a c-fold wall reduction until bandwidth or the
   semaphore binds.
2. --ftp: the in-process MiniFtpServer over a real socket (loopback, so
   latency ~0.1 ms — this shows the overlap is SAFE on the true protocol
   client, not that it is faster on loopback).

Usage: python tools/fetch_concurrency_probe.py [--wan] [--ftp]
       [--files N] [--delay-ms D] [--concurrency 1,3,8]
Prints one line per (mode, concurrency) with wall seconds; paste into
BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from data_ingestion_poc_spark.ingest import fixtures, pipeline  # noqa: E402
from data_ingestion_poc_spark.session import get_spark  # noqa: E402


class DelayedFetcher(pipeline.LocalFilesystemFetcher):
    """WAN model: every stat/read pays a fixed round-trip latency."""

    def __init__(self, delay_s: float):
        self.delay_s = delay_s

    def stat(self, server, remote_path):
        time.sleep(self.delay_s)
        return super().stat(server, remote_path)

    def read(self, server, remote_path):
        time.sleep(self.delay_s)
        return super().read(server, remote_path)


def small_files_manifest(n: int) -> list[tuple[str, str]]:
    """n references to the fixture tree's small non-zip files (repeats
    are fine: each is an independent fetch call)."""
    paths = ["/data/noext", "/data/report.csv", "/inbox/notes.txt"]
    root = fixtures.build()
    avail = [
        p
        for p in paths
        if os.path.exists(os.path.join(root, "srv_a") + p)
    ]
    if not avail:  # fall back to whatever the manifest fixture lists
        avail = [p for (_, p) in fixtures.MANIFEST if not p.endswith(".zip")]
        return [fixtures.MANIFEST[i % len(fixtures.MANIFEST)] for i in range(n)]
    return [(fixtures.SRV_A, avail[i % len(avail)]) for i in range(n)]


def run(spark, manifest, fetcher, concurrency, n_batches=4):
    t0 = time.time()
    df = pipeline.fetch(
        spark, manifest, n_batches=n_batches, fetcher=fetcher,
        concurrency=concurrency,
    )
    n_err = df.where("error is not null").count()
    wall = time.time() - t0
    return wall, n_err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--delay-ms", type=float, default=30.0)
    ap.add_argument("--concurrency", default="1,3,8")
    ap.add_argument("--skip-wan", action="store_true")
    ap.add_argument("--skip-ftp", action="store_true")
    args = ap.parse_args()
    cs = [int(c) for c in args.concurrency.split(",")]

    spark = get_spark(app_name="fetch-concurrency-probe")
    manifest = small_files_manifest(args.files)

    # warm up the mapInPandas/Arrow machinery so the first timed run
    # isn't charged Spark's one-off init (~5s)
    run(spark, manifest[:4], pipeline.LocalFilesystemFetcher(), 1)

    if not args.skip_wan:
        f = DelayedFetcher(args.delay_ms / 1000.0)
        for c in cs:
            wall, n_err = run(spark, manifest, f, c)
            print(
                f"wan delay={args.delay_ms:g}ms files={args.files} "
                f"concurrency={c}: {wall:.2f}s (errors={n_err})"
            )

    if not args.skip_ftp:
        from ftp_fixture import MiniFtpServer

        root = fixtures.build()
        with MiniFtpServer(root) as srv:
            from data_ingestion_poc_spark.ingest.netfetch import FtplibFetcher

            m = [
                (srv.server_uri, "/srv_a" + p)
                for (_, p) in manifest
            ]
            for c in cs:
                wall, n_err = run(spark, m, FtplibFetcher(), c)
                print(
                    f"ftp-loopback files={args.files} concurrency={c}: "
                    f"{wall:.2f}s (errors={n_err})"
                )


if __name__ == "__main__":
    main()

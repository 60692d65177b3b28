"""Focused tests for round-14 OPTIMIZATION internals.

Round 14 restructured operator internals without changing what any
query computes; these tests pin the two rewrites whose equivalence is
an argument rather than a shared code path:

* ``_both_directions`` — the single-pass explode that replaced the
  ``e0.unionByName(e0.select(swap))`` double-execution of the edge
  build must emit the identical multiset.
* ``audio_frame_stats`` — the vectorized NumPy kernel must match the
  pure-Python ``_frame_rows`` spec (which the golden oracle replays)
  bit for bit, including int16 saturation and framing edge cases.
"""

import random

import pyarrow as pa
import pytest

from data_ingestion_poc_spark.llm import multimodal
from data_ingestion_poc_spark.operators.graph import _both_directions


@pytest.mark.parametrize("with_w", [True, False])
def test_both_directions_matches_union_multiset(spark, with_w):
    rows = [
        ("a", "b", 3),
        ("a", "b", 3),  # duplicate aggregated row must stay duplicated
        ("b", "a", 1),  # reverse edge already present
        ("c", "c", 7),  # self-loop doubles
    ]
    e0 = spark.createDataFrame(rows, ["src", "dst", "w"])
    if not with_w:
        e0 = e0.select("src", "dst")
    cols = ["src", "dst"] + (["w"] if with_w else [])
    swapped = e0.select(
        *[
            {"src": e0["dst"].alias("src"), "dst": e0["src"].alias("dst")}.get(
                c, e0[c]
            )
            for c in cols
        ]
    )
    naive = sorted(map(tuple, e0.unionByName(swapped).collect()))
    fused = sorted(map(tuple, _both_directions(e0, with_w=with_w).collect()))
    assert fused == naive
    assert len(fused) == 2 * len(rows)


def _blobs():
    rng = random.Random(14)
    frame = multimodal.AUDIO_FRAME
    blobs = [
        # saturation: -32768 must abs() to 32768 (int16 would overflow)
        b"\x00\x80" * frame,
        # odd length: trailing byte dropped; 2 full frames + remainder
        bytes(rng.randrange(256) for _ in range(2 * 2 * frame + 101)),
        # shorter than one frame: contributes zero rows
        bytes(rng.randrange(256) for _ in range(2 * frame - 2)),
        # empty blob
        b"",
        # exact single frame of random PCM
        bytes(rng.randrange(256) for _ in range(2 * frame)),
    ]
    return blobs


def test_audio_framestats_numpy_matches_pure_python_spec():
    blobs = _blobs()
    paths = [f"dir/clip_{i}.pcm" for i in range(len(blobs))]
    batch = pa.RecordBatch.from_arrays(
        [pa.array(paths), pa.array(blobs, type=pa.binary())],
        names=["path", "content"],
    )
    [out] = list(multimodal.audio_frame_stats(iter([batch])))
    got = [tuple(r.values()) for r in out.to_pylist()]
    want = []
    for path, blob in zip(paths, blobs):
        name = path.rsplit("/", 1)[-1]
        want.extend(multimodal._frame_rows(name, multimodal._fake_samples(blob)))
    assert got == want
    # the saturation clip really exercised the widening path
    assert want[0][4] == 32768

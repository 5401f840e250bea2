"""Resume correctness (BASELINE.md): kill mid-run, rerun, byte-identical
final output; completed partitions are skipped on resume."""

import glob
import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _read_all(root):
    frames = []
    for d in sorted(glob.glob(os.path.join(root, "part=*"))):
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            frames.append(pq.read_table(f).to_pandas())
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(list(out.columns), ignore_index=True)


def test_resume_byte_identical(tmp_path):
    import ray.data as rd

    from rayssj.checkpoint import Manifest, run_partitioned

    df = pd.DataFrame({"k": [f"key{i:04d}" for i in range(200)],
                       "v": range(200)})

    def stage(part_ds):
        return part_ds.map_batches(
            lambda t: t.append_column("v2", pa.array(
                [x * 2 for x in t["v"].to_pylist()], type=pa.int64())),
            batch_format="pyarrow")

    boom = {"armed": True}

    def flaky_stage(part_ds):
        if boom["armed"] and len(Manifest(str(root1)).completed()) >= 2:
            raise RuntimeError("simulated node loss")
        return stage(part_ds)

    ds = rd.from_pandas(df)
    root1 = tmp_path / "run1"
    with pytest.raises(RuntimeError):
        run_partitioned(ds, "k", 4, str(root1), flaky_stage, version="v1",
                        input_fingerprint="fp1")
    done_after_crash = set(Manifest(str(root1)).completed())
    assert len(done_after_crash) == 2  # crashed at partition 2

    # resume: completed partitions skipped (records retain their timestamps)
    before = {p: r["ts"] for p, r in Manifest(str(root1)).completed().items()}
    boom["armed"] = False
    run_partitioned(ds, "k", 4, str(root1), stage, version="v1",
                    input_fingerprint="fp1")
    after = Manifest(str(root1)).completed()
    assert set(after) == {0, 1, 2, 3}
    for p, ts in before.items():
        assert after[p]["ts"] == ts  # not re-run

    # fresh uninterrupted run → byte-identical final data
    root2 = tmp_path / "run2"
    run_partitioned(ds, "k", 4, str(root2), stage, version="v1",
                    input_fingerprint="fp1")
    a, b = _read_all(str(root1)), _read_all(str(root2))
    pd.testing.assert_frame_equal(a, b)
    # every input row appears exactly once across partitions
    assert sorted(a["k"]) == sorted(df["k"])


def test_resume_invalidates_on_fingerprint_or_version_change(tmp_path):
    """Changed input data or a bumped pipeline version must NOT silently reuse
    stale partition output (ADVICE r01)."""
    import ray.data as rd

    from rayssj.checkpoint import Manifest, run_partitioned

    df = pd.DataFrame({"k": [f"key{i:03d}" for i in range(40)], "v": range(40)})
    ds = rd.from_pandas(df)

    def stage(mult):
        def fn(part_ds):
            return part_ds.map_batches(
                lambda t: t.append_column("v2", pa.array(
                    [x * mult for x in t["v"].to_pylist()], type=pa.int64())),
                batch_format="pyarrow")
        return fn

    root = tmp_path / "run"
    run_partitioned(ds, "k", 2, str(root), stage(2), version="v1",
                    input_fingerprint="fpA")
    assert set(_read_all(str(root))["v2"]) == set(df["v"] * 2)

    # same fingerprint+version → skipped (timestamps unchanged)
    before = {p: r["ts"] for p, r in Manifest(str(root)).completed().items()}
    run_partitioned(ds, "k", 2, str(root), stage(3), version="v1",
                    input_fingerprint="fpA")
    assert {p: r["ts"] for p, r in Manifest(str(root)).completed().items()} == before

    # new fingerprint → all partitions recomputed with the new stage
    run_partitioned(ds, "k", 2, str(root), stage(3), version="v1",
                    input_fingerprint="fpB")
    assert set(_read_all(str(root))["v2"]) == set(df["v"] * 3)

    # bumped version → recomputed again
    run_partitioned(ds, "k", 2, str(root), stage(5), version="v2",
                    input_fingerprint="fpB")
    assert set(_read_all(str(root))["v2"]) == set(df["v"] * 5)


def test_stable_hash_deterministic():
    from rayssj.checkpoint import stable_hash64

    a = pa.array(["alpha", "beta", "", "北京", "alpha"])
    h1 = stable_hash64(a).to_pylist()
    h2 = stable_hash64(a).to_pylist()
    assert h1 == h2
    assert h1[0] == h1[4] and h1[0] != h1[1]
    ints = pa.array([1, 2, 3], type=pa.int64())
    assert stable_hash64(ints).to_pylist() == stable_hash64(ints).to_pylist()

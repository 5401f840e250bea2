"""Per-partition lineage manifests + checkpointed resume (north_rule).

Not in the reference. Contract (SURVEY.md §4 'Checkpoint / resume' row):
an output root holds one parquet directory PER PARTITION plus
``manifest.jsonl`` recording (partition id, input fingerprint, extractor/
pipeline version, row count, status, wall time). A rerun reads the manifest,
skips completed partitions, and produces byte-identical final output.

Partitions are defined by a deterministic key-hash: partition(row) =
hash64(key) % num_partitions — stable across runs and cluster sizes.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc


def splitmix_u64(v):
    """Vectorized splitmix64 avalanche over a uint64 ndarray (shared by
    bounded-partition shuffle keys, fake-media feature expansion, and
    layout-independent sampling)."""
    import numpy as np

    v = v + np.uint64(0x9E3779B97F4A7C15)
    v ^= v >> np.uint64(30)
    v *= np.uint64(0xBF58476D1CE4E5B9)
    v ^= v >> np.uint64(27)
    v *= np.uint64(0x94D049BB133111EB)
    v ^= v >> np.uint64(31)
    return v


def stable_hash64(arr: pa.Array) -> pa.Array:
    """Deterministic 64-bit hash of a string/int column (xxhash-free: use
    Arrow's string casts + sha via python only at driver; per-batch path uses
    numpy polynomial hashing for speed)."""
    import numpy as np

    if pa.types.is_integer(arr.type):
        v = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        # splitmix64
        v = (v + np.uint64(0x9E3779B97F4A7C15))
        v ^= v >> np.uint64(30)
        v *= np.uint64(0xBF58476D1CE4E5B9)
        v ^= v >> np.uint64(27)
        v *= np.uint64(0x94D049BB133111EB)
        v ^= v >> np.uint64(31)
        return pa.array(v.view(np.int64))
    # strings/binary: 64-bit polynomial hash sum(b_i * P^(L-1-i)) mod 2^64,
    # fully vectorized (reduceat over the flat byte buffer) and stable across
    # runs/versions (pure arithmetic, no library hash)
    s = arr.cast(pa.large_binary())
    lengths = pc.binary_length(s).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(lengths)
    total = int(lengths.sum())
    if total == 0:
        return pa.array(np.zeros(n, dtype=np.int64))
    buf = np.frombuffer(b"".join(v if v is not None else b""
                                 for v in s.to_pylist()), dtype=np.uint8)
    P = np.uint64(1099511628211)
    maxlen = int(lengths.max())
    pows = np.empty(maxlen, dtype=np.uint64)
    pows[0] = np.uint64(1)
    with np.errstate(over="ignore"):  # mod-2^64 arithmetic is intended
        for k in range(1, maxlen):
            pows[k] = pows[k - 1] * P
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    pos = np.arange(total, dtype=np.int64) - offsets[row_ids]
    exp = lengths[row_ids] - 1 - pos
    terms = buf.astype(np.uint64) * pows[exp]
    out = np.zeros(n, dtype=np.uint64)
    nonempty = lengths > 0
    sums = np.add.reduceat(terms, offsets[:-1][nonempty])
    out[nonempty] = sums
    # final avalanche so % num_partitions distributes well
    out ^= out >> np.uint64(33)
    out *= np.uint64(0xFF51AFD7ED558CCD)
    out ^= out >> np.uint64(33)
    return pa.array(out.view(np.int64))


class Manifest:
    """Append-only jsonl manifest of completed partitions."""

    def __init__(self, root: str):
        self.root = root
        self.path = os.path.join(root, "manifest.jsonl")
        os.makedirs(root, exist_ok=True)

    def completed(self, *, fingerprint: str | None = None,
                  version: str | None = None) -> dict[int, dict]:
        """Completed partitions; when ``fingerprint``/``version`` are given,
        ONLY records matching the current run count as done — changed input
        data or a bumped pipeline/extractor version must invalidate stale
        partition output, not silently reuse it."""
        done = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    rec = json.loads(line)
                    if rec.get("status") != "done":
                        continue
                    if fingerprint is not None and \
                            rec.get("input_fingerprint") != fingerprint:
                        continue
                    if version is not None and rec.get("version") != version:
                        continue
                    done[rec["partition"]] = rec
        return done

    def record(self, partition: int, *, rows: int, fingerprint: str,
               version: str, wall_s: float):
        rec = {"partition": partition, "rows": rows,
               "input_fingerprint": fingerprint, "version": version,
               "wall_s": round(wall_s, 3), "status": "done",
               "ts": time.time()}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


def fingerprint_paths(paths) -> str:
    """Cheap input fingerprint: sha256 over (path, size, mtime) triples."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def run_partitioned(ds, key_col: str, num_partitions: int, out_root: str,
                    stage_fn, version: str, input_fingerprint: str = ""):
    """Resumable execution: split ``ds`` into key-hash partitions; for each
    partition not yet in the manifest, run ``stage_fn(partition_ds) ->
    Dataset`` and write its parquet under ``out_root/part=<i>`` atomically
    (tmp dir + rename). Returns the list of completed partition dirs.

    This drives INDEPENDENT per-partition pipelines — the shape that lets a
    100 TB run lose a node and redo only the lost partitions.
    """
    manifest = Manifest(out_root)
    done = manifest.completed(fingerprint=input_fingerprint, version=version)
    out_dirs = []
    for i in range(num_partitions):
        part_dir = os.path.join(out_root, f"part={i}")
        if i in done:
            out_dirs.append(part_dir)
            continue
        t0 = time.time()

        def only_part(batch: pa.Table, i=i) -> pa.Table:
            h = stable_hash64(batch[key_col].combine_chunks()
                              if isinstance(batch[key_col], pa.ChunkedArray)
                              else batch[key_col])
            import numpy as np

            m = (h.to_numpy(zero_copy_only=False).view(np.uint64)
                 % np.uint64(num_partitions)) == np.uint64(i)
            return batch.filter(pa.array(m))

        part = ds.map_batches(only_part, batch_format="pyarrow")
        result = stage_fn(part)
        tmp_dir = part_dir + ".tmp"
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        result.write_parquet(tmp_dir)
        shutil.rmtree(part_dir, ignore_errors=True)
        os.rename(tmp_dir, part_dir)
        import pyarrow.parquet as pq
        import glob

        rows = sum(pq.read_metadata(f).num_rows
                   for f in glob.glob(os.path.join(part_dir, "*.parquet")))
        manifest.record(i, rows=rows, fingerprint=input_fingerprint,
                        version=version, wall_s=time.time() - t0)
        out_dirs.append(part_dir)
    return out_dirs

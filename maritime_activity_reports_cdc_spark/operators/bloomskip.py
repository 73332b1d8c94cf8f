"""Bloom-filter file skipping for point lookups on non-sort columns.

Per-file min/max bounds (the manifest stats) prune scans only along the
clustering order — a column the files are NOT sorted by has ranges that
span the whole domain in every file, and bounds pruning keeps
everything. A per-file Bloom filter answers the complementary question
"can this key possibly be in this file?" regardless of layout, which is
what point lookups on a secondary key need (Delta's bloom filter index /
Iceberg puffin blobs play the same role; reference analog: the Delta
tables the pipeline queries by entity id, ``gold/table_setup.py`` query
patterns in /root/reference).

Design — sidecar, not manifest:

- ``build_bloom_index(table, cols)`` is a MAINTENANCE operator (like
  ``rewrite_files``): one distributed ``mapInPandas`` job reads each
  base file's key column(s) and builds a classic (m, k) Bloom filter
  per (file, column), sized from the file's distinct count for the
  target false-positive rate. Bits travel back Arrow-batched.
- The filters land in ONE binary sidecar under ``_manifests/`` (header
  JSON + concatenated bit blobs). The snapshot property stores only
  ``{"sidecar", "built_at_version"}`` — manifests stay O(files) small,
  the sidecar is loaded lazily and cached per table object. This is the
  Iceberg-puffin shape: stats inline, big blobs out-of-line.
- Readers (``LakeTable.read_partitions(bloom_keys=...)``) drop a file
  only when EVERY probed key is definitely absent and the file has a
  filter; files written after the index build have no filter and are
  conservatively kept — correctness never depends on index freshness.
  Rebuild on the maintenance cadence alongside ``rewrite_files``.

Hashing is keyed blake2b (process- and partitioning-independent), with
Kirsch-Mitzenmacher double hashing for the k probes, so an index built
anywhere validates anywhere.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import struct
import uuid
from typing import Any, Iterable

import numpy as np

_MAGIC = b"BLMIDX01"


def _hash_pair(value: Any) -> tuple[int, int]:
    raw = str(value).encode("utf-8")
    h1 = int.from_bytes(
        hashlib.blake2b(raw, digest_size=8, key=b"bloom-h1").digest(), "big"
    )
    h2 = int.from_bytes(
        hashlib.blake2b(raw, digest_size=8, key=b"bloom-h2").digest(), "big"
    )
    return h1, h2 | 1  # odd h2 -> full-period stride for any power-of-2 m


def _size_for(n: int, fpp: float) -> tuple[int, int]:
    n = max(n, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = 1 << max(8, (m - 1).bit_length())  # power of two, >= 256 bits
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _build_bits(values: Iterable[Any], m: int, k: int) -> bytes:
    bits = np.zeros(m // 8, dtype=np.uint8)
    for v in values:
        h1, h2 = _hash_pair(v)
        for i in range(k):
            pos = (h1 + i * h2) % m
            bits[pos >> 3] |= 1 << (pos & 7)
    return bits.tobytes()


def bloom_may_contain(bits: bytes, m: int, k: int, value: Any) -> bool:
    h1, h2 = _hash_pair(value)
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def build_bloom_index(table, cols: tuple[str, ...], fpp: float = 0.01) -> dict:
    """Build per-(file, column) Bloom filters for the table's base files
    and commit the sidecar reference as a metadata-only snapshot.

    One distributed job over the file list (Arrow-batched, no RDDs, no
    per-row Python in any table scan — each task reads whole key columns
    via parquet and hashes distinct values only). Returns
    ``{"files": N, "sidecar": name, "bytes": total}``.

    Scale note: the bit blobs are collected to the driver for the
    single-sidecar write — total bytes ~ 1.2 * Σ per-file distinct keys
    at fpp=0.01 (a few hundred MB at ~10^5 files). Beyond that, shard
    the sidecar: have each task write its own blob file and collect only
    the (rel, col, shard, offset) header rows — the reader's lazy-load
    path is already per-sidecar-agnostic. Declared, not built: this
    engine's lakes stay under the single-sidecar regime.
    """
    import pandas as pd
    from pyspark.sql import types as T

    snap = table.snapshot()
    files = snap.all_files()
    if not files:
        raise ValueError("no base files to index")
    root = table.path
    cols = tuple(cols)

    def _build(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for rel in pdf["rel"]:
                pf = pq.ParquetFile(os.path.join(root, rel))
                tbl = pf.read(columns=list(cols))
                for c in cols:
                    vals = [v for v in tbl.column(c).unique().to_pylist() if v is not None]
                    m, k = _size_for(len(vals), fpp)
                    out.append(
                        {
                            "rel": rel,
                            "col": c,
                            "m": m,
                            "k": k,
                            "n": len(vals),
                            "bits": _build_bits(vals, m, k),
                        }
                    )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("rel", T.StringType()),
            T.StructField("col", T.StringType()),
            T.StructField("m", T.LongType()),
            T.StructField("k", T.IntegerType()),
            T.StructField("n", T.LongType()),
            T.StructField("bits", T.BinaryType()),
        ]
    )
    paths_df = table.spark.createDataFrame(
        [(f,) for f in files], "rel string"
    ).repartition(min(len(files), table.spark.sparkContext.defaultParallelism))
    rows = paths_df.mapInPandas(_build, schema).collect()

    # one sidecar: MAGIC | header_len | header JSON | blobs
    header: dict[str, dict[str, dict]] = {}
    blobs: list[bytes] = []
    offset = 0
    for r in rows:
        entry = {"off": offset, "len": len(r.bits), "m": r.m, "k": r.k, "n": r.n}
        header.setdefault(r.rel, {})[r.col] = entry
        blobs.append(bytes(r.bits))
        offset += len(r.bits)
    name = f"bloom-v{snap.version:08d}-{uuid.uuid4().hex[:8]}.bin"
    hdr = json.dumps(header).encode("utf-8")
    sidecar_path = os.path.join(table._manifest_path(), name)
    tmp = sidecar_path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(struct.pack("<q", len(hdr)))
        fh.write(hdr)
        for b in blobs:
            fh.write(b)
    os.replace(tmp, sidecar_path)
    table.set_properties(
        {"bloom_index": {"sidecar": name, "built_at_version": snap.version,
                         "cols": list(cols)}}
    )
    return {"files": len(files), "sidecar": name, "bytes": offset}


def load_bloom_index(table) -> dict[str, dict[str, dict]] | None:
    """Lazy sidecar load: {rel_path: {col: {bits, m, k}}}, cached on the
    table object (sidecars are immutable)."""
    props = table.properties()
    ref = props.get("bloom_index")
    if not ref:
        return None
    cache = getattr(table, "_bloom_cache", None)
    if cache is not None and cache.get("name") == ref["sidecar"]:
        return cache["index"]
    path = os.path.join(table._manifest_path(), ref["sidecar"])
    try:
        with open(path, "rb") as fh:
            magic = fh.read(len(_MAGIC))
            if magic != _MAGIC:
                return None
            (hdr_len,) = struct.unpack("<q", fh.read(8))
            header = json.loads(fh.read(hdr_len).decode("utf-8"))
            blob = fh.read()  # blob offsets are relative to this section
    except FileNotFoundError:
        return None
    index: dict[str, dict[str, dict]] = {}
    for rel, colmap in header.items():
        for col, e in colmap.items():
            bits = blob[e["off"]: e["off"] + e["len"]]
            index.setdefault(rel, {})[col] = {"bits": bits, "m": e["m"], "k": e["k"]}
    table._bloom_cache = {"name": ref["sidecar"], "index": index}
    return index


def prune_files_by_bloom(
    table, files: list[str], bloom_keys: dict[str, Iterable[Any]]
) -> list[str]:
    """Keep files where every probed column MAY contain at least one of
    its keys; files without filters (post-index writes, missing index)
    are kept — skipping is an optimization, never a correctness gate."""
    index = load_bloom_index(table)
    if not index:
        return files
    keys = {c: list(vs) for c, vs in bloom_keys.items()}
    kept = []
    for f in files:
        entry = index.get(f)
        keep = True
        if entry:
            for col, vals in keys.items():
                e = entry.get(col)
                if e is None:
                    continue
                if not any(
                    bloom_may_contain(e["bits"], e["m"], e["k"], v) for v in vals
                ):
                    keep = False
                    break
        if keep:
            kept.append(f)
    return kept

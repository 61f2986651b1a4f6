"""Migration readers for the reference engine's on-disk artifacts.

A user of the reference keeps their corpus in single-node formats:

- ``sigs.npy`` / ``shards/shard_*.npy`` — ``np.save``'d (N, num_perm)
  signature (or any 2-D) matrix; ``app/src/index_builder.py:28``
  splits the big file into row-sliced shards, and
  ``benchmarks/benchmark_runner.py:215`` loads it back whole.
- ``docs.pkl`` / ``ids.pkl`` — pickled ``list[str]`` of texts and
  string ids, row-aligned (``benchmarks/benchmark_runner.py:28-31``).
- ``shingles.pkl`` — pickled ``list[set[str]]`` row-aligned shingle
  sets.
- ``minhash_meta.pkl`` — ``dict(num_perm, k_shingle, by_word, seed)``
  (``data/minhash_meta.pkl``, read by ``app/src/minhash_lsh.py``).
- ``hist_edges.npy`` — (n_dims, n_bins+1) uniform histogram edge
  matrix for QED (``app/src/qed.py:27-33``).

These loaders land each format in the engine's native DataFrames so a
migrating user never recomputes what their reference deployment
already built.

Scale notes: the ``.npy`` shard reader is fully distributed — shards
are listed once, their 128-byte headers are read driver-side to
compute global row offsets, and the array payloads are parsed
executor-side from Spark's ``binaryFile`` source through Arrow-batched
``mapInPandas`` (payload bytes never touch the driver). The pickle
readers are driver-side by necessity: a pickle is a single
unsplittable blob, bounded by the reference's own single-node memory —
rows are re-parallelized immediately after unpickling.
"""

from __future__ import annotations

import io
import os
import pickle
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from finding_similar_high_dimensional_items_for_big_data_sets_spark.config import (
    MinHashParams,
)


def _npy_shard_files(path: str) -> list[str]:
    """Shard files in GLOBAL ROW ORDER: the reference writes
    ``shard_0.npy .. shard_k.npy`` sequentially
    (``app/src/index_builder.py:split_and_save``), so ordering is by the
    numeric suffix — a plain lexicographic sort would put ``shard_10``
    before ``shard_2`` and scramble row ids."""
    if os.path.isfile(path):
        return [path]

    def shard_key(name: str) -> tuple:
        stem = os.path.splitext(name)[0]
        suffix = stem.rsplit("_", 1)[-1]
        return (0, int(suffix)) if suffix.isdigit() else (1, suffix)

    names = sorted(
        (n for n in os.listdir(path) if n.endswith(".npy")),
        key=shard_key,
    )
    return [os.path.join(path, n) for n in names]


def _npy_header(path: str) -> tuple[tuple[int, ...], np.dtype]:
    """Read shape/dtype from the .npy header without loading the data."""
    with open(path, "rb") as fh:
        version = np.lib.format.read_magic(fh)
        if version[0] == 1:
            shape, _, dtype = np.lib.format.read_array_header_1_0(fh)
        else:
            shape, _, dtype = np.lib.format.read_array_header_2_0(fh)
    return shape, dtype


def load_npy_shards(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_idx",
    value_col: str = "sig",
) -> DataFrame:
    """Reference ``.npy`` shard dir (or a single ``sigs.npy``) ->
    (doc_idx LONG, <value_col> ARRAY<BIGINT|DOUBLE>).

    ``doc_idx`` is the GLOBAL row index across shards — the reference's
    implicit id, which ``ids.pkl`` maps to display ids. Integer matrices
    land as ARRAY<BIGINT> (signature semantics, int64-wrap like the
    reference), float matrices as ARRAY<DOUBLE>.
    """
    files = _npy_shard_files(path)
    if not files:
        raise FileNotFoundError(f"no .npy shards under {path}")
    offsets: dict[str, int] = {}
    total = 0
    kind = None
    for f in files:
        shape, dtype = _npy_header(f)
        if len(shape) != 2:
            raise ValueError(f"{f}: expected (N, D) matrix, got shape {shape}")
        k = "i" if dtype.kind in "iu" else "f"
        if kind is None:
            kind = k
        elif kind != k:
            raise ValueError(f"{f}: mixed int/float dtypes across shards")
        offsets[os.path.abspath(f)] = total
        total += shape[0]
    spark_type = "array<bigint>" if kind == "i" else "array<double>"
    np_type = np.int64 if kind == "i" else np.float64
    bc = spark.sparkContext.broadcast(offsets)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():  # one row per FILE, not per record
                arr = np.load(io.BytesIO(row["content"])).astype(np_type)
                base = bc.value[_strip_scheme(row["path"])]
                yield pd.DataFrame(
                    {
                        id_col: np.arange(base, base + arr.shape[0], dtype=np.int64),
                        value_col: list(arr),
                    }
                )

    binary = (
        spark.read.format("binaryFile")
        .load([f"file://{f}" for f in (os.path.abspath(f) for f in files)])
        .select("path", "content")
    )
    return binary.mapInPandas(parse, f"{id_col} long, {value_col} {spark_type}")


def _strip_scheme(p: str) -> str:
    """binaryFile reports Hadoop-style URIs (``file:/x`` or
    ``file:///x``); reduce to the plain filesystem path."""
    from urllib.parse import urlparse

    return urlparse(p).path if ":" in p else p


def load_pickled_docs(
    spark: SparkSession, docs_pkl: str, ids_pkl: str | None = None
) -> DataFrame:
    """``docs.pkl`` (+ optional row-aligned ``ids.pkl``) ->
    (doc_idx LONG, ref_id STRING NULLABLE, text STRING)."""
    with open(docs_pkl, "rb") as fh:
        docs = pickle.load(fh)
    ids = None
    if ids_pkl is not None:
        with open(ids_pkl, "rb") as fh:
            ids = pickle.load(fh)
        if len(ids) != len(docs):
            raise ValueError(
                f"ids.pkl has {len(ids)} rows but docs.pkl has {len(docs)}"
            )
    rows = [
        (i, ids[i] if ids is not None else None, docs[i]) for i in range(len(docs))
    ]
    return spark.createDataFrame(rows, "doc_idx long, ref_id string, text string")


def load_pickled_shingles(spark: SparkSession, shingles_pkl: str) -> DataFrame:
    """``shingles.pkl`` (list[set[str]]) -> (doc_idx LONG,
    shingles ARRAY<STRING>), arrays sorted for determinism (pickled
    sets have no order)."""
    with open(shingles_pkl, "rb") as fh:
        shingle_sets = pickle.load(fh)
    rows = [(i, sorted(s)) for i, s in enumerate(shingle_sets)]
    return spark.createDataFrame(rows, "doc_idx long, shingles array<string>")


def load_minhash_meta(meta_pkl: str, **overrides) -> MinHashParams:
    """``minhash_meta.pkl`` -> :class:`MinHashParams`. The pickle
    carries (num_perm, k_shingle, by_word, seed); banding/bucket-cap
    fields keep engine defaults unless overridden."""
    with open(meta_pkl, "rb") as fh:
        meta = pickle.load(fh)
    num_perm = int(meta["num_perm"])
    kwargs = {
        "num_perm": num_perm,
        "k_shingle": int(meta["k_shingle"]),
        "by_word": bool(meta["by_word"]),
        "seed": int(meta["seed"]),
    }
    if "bands" not in overrides and num_perm % MinHashParams.bands != 0:
        # keep the engine's banding default when it divides num_perm,
        # else the largest divisor not exceeding it (meta carries no
        # band count — the reference hardcodes b=32 for num_perm=128)
        kwargs["bands"] = next(
            b for b in range(min(MinHashParams.bands, num_perm), 0, -1)
            if num_perm % b == 0
        )
    kwargs.update(overrides)
    return MinHashParams(**kwargs)


def load_hist_edges(spark: SparkSession, edges_npy: str) -> DataFrame:
    """``hist_edges.npy`` (n_dims, n_bins+1) -> the engine's QED edges
    frame (dim INT, lo DOUBLE, hi DOUBLE, width DOUBLE), one row per
    dimension — drop-in for ``operators.qed.histogram_edges`` output.
    The reference's edges are np.histogram-uniform, so (lo, hi, width)
    loses nothing."""
    edges = np.load(edges_npy)
    if edges.ndim != 2 or edges.shape[1] < 2:
        raise ValueError(f"expected (n_dims, n_bins+1) edges, got {edges.shape}")
    n_bins = edges.shape[1] - 1
    rows = [
        (
            d,
            float(edges[d, 0]),
            float(edges[d, -1]),
            (float(edges[d, -1]) - float(edges[d, 0])) / n_bins,
        )
        for d in range(edges.shape[0])
    ]
    return spark.createDataFrame(rows, "dim int, lo double, hi double, width double")

"""Schema-clean parquet reads.

pyarrow Schemas carrying pandas metadata are UNHASHABLE (the embedded
metadata blob contains a dict), which makes Ray Data's schema-deduplication
emit a "Failed to hash the schemas" warning in every worker that concats
read blocks. Passing an explicit metadata-free schema to ``read_parquet``
removes the noise at the source and pins the dataset schema besides —
downstream operators then see ONE consistent schema end to end.
"""

from __future__ import annotations

import os

import pyarrow as pa


def input_files(path) -> list[str]:
    """Expand a parquet path spec (file, shard directory, or list of either)
    to the ordered flat file list — shard files in sorted-name order, which
    is the order the corpus writer emits them, so global row indexes over
    the concatenation are deterministic."""
    paths = [path] if isinstance(path, str) else list(path)
    out = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(os.path.join(p, f) for f in sorted(os.listdir(p)))
        else:
            out.append(p)
    return out


def read_parquet_clean(path, columns: list[str] | None = None, **kw):
    """ray.data.read_parquet with column pruning AND a metadata-stripped
    explicit schema derived from the first file's footer."""
    import pyarrow.parquet as pq
    import ray.data

    first = path if isinstance(path, str) else path[0]
    if os.path.isdir(first):
        first = os.path.join(first, sorted(os.listdir(first))[0])
    fschema = pq.ParquetFile(first).schema_arrow
    names = columns if columns is not None else fschema.names
    schema = pa.schema([fschema.field(c).remove_metadata() for c in names])
    return ray.data.read_parquet(path, columns=columns, schema=schema, **kw)

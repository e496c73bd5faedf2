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

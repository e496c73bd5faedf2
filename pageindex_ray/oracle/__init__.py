from .bm25 import OracleIndex, build_oracle_index  # noqa: F401

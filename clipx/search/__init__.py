from clipx.search.engine import VectorIndex, read_index, write_index  # noqa: F401

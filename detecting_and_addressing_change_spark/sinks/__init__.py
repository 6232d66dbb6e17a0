"""Write-path surface: partitioned / bucketed / compacted parquet sinks."""

from .parquet import (  # noqa: F401
    compact,
    write_bucketed_table,
    write_partitioned,
)

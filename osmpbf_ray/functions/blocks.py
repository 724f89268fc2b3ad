"""Block-format helpers shared by hash-partitioned reduce stages."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def arrow_clean(df: pd.DataFrame) -> pa.Table:
    """pandas → METADATA-FREE Arrow table.

    ``pa.Table.from_pandas`` attaches a ``b'pandas'`` schema entry whose
    presence makes ``hash(pa.Schema)`` raise; Ray Data then logs
    ``Failed to hash the schemas (for deduplication)`` once per block in
    every downstream concat. Group UDFs return through this instead of
    returning the DataFrame raw (Ray would run the same conversion
    internally, metadata included)."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

"""Streaming point-in-polygon assignment — the flagship spatial join run
continuously as crawl files land.

The reference's event-driven trigger (SNS/SQS "new L0 object" ->
per-file processing) composed with the engine's two-phase PIP join:
newly landed page files flow through the stateless L1 chain (extract ->
QC -> cell encode, streaming/ingest.py) and straight into the PIP join.
Every phase is stateless on the STREAM side — the polygon cover and the
edge/ring tables are STATIC broadcasts (stream-static broadcast joins
need no watermark or state store), and the refine predicate is a
per-row filter (JVM fold or Arrow-batch ray cast) — so assignments
append exactly-once under file-source checkpointing and the drained
output equals the batch pip_join over the same landed files row-for-row
(the parity test pins it).

At 100 TB this is the shape that matters: the point side never
shuffles — each micro-batch is one map-side pass over the new files.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from ..operators import pip as pip_op
from .ingest import transform_stream


def pip_assign_stream(
    src: DataFrame,
    polygons_pdf: pd.DataFrame,
    grid_res: int = 7,
    res: int = 5,
    keep_cols: tuple[str, ...] = ("url",),
    method: str = "auto",
) -> DataFrame:
    """L0 pages stream (PAGES_STREAM_SCHEMA) -> append-mode
    (keep_cols..., polygon_id) assignment rows.

    `polygons_pdf` is the static polygon table (WKT rows, same contract
    as pip_join); `res` is the cover resolution, `grid_res` the L1 cell
    encode. Rows failing QC or hitting no polygon produce nothing."""
    l1 = transform_stream(src, grid_res)
    return pip_op.pip_join(
        l1, polygons_pdf, res=res, lat="lat", lon="lon", keep_cols=keep_cols, method=method
    )

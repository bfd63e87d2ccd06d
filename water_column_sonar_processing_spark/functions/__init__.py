"""Scalar/column function library (native Spark expressions first).

Modules:
- cells: discrete global grid encoders (equirect grid, Web-Mercator tiles,
  axial hex grid) as native column expressions + matching ANSI-SQL text
  generators used by the DuckDB parity oracle.
- s2: faithful S2 cell-id implementation (public algorithm), vectorized
  numpy behind a pandas UDF.
- geo: geodesic/planar distance expressions, QC predicates.
- text: language-ID heuristic, quality scoring, token counting,
  fingerprinting for the webtext pipeline.
"""

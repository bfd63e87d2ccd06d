"""Relational + geospatial operators, each a DataFrame -> DataFrame program.

Module map (reference analog in parens):
- extract: geolocation parse from text (raw_to_zarr.py decode stage)
- qc: bounds / null-island / distance-jump / monotonic-repair filters
- pip: two-phase point-in-polygon spatial join
- knn: k-ring kNN join (grid Chebyshev rings + hex rings)
- tiles: tile-pyramid rollup (create_empty_zarr_store + pmtile_generation)
- offsets: metadata aggregation + prefix-sum global offsets (resample_regrid)
- asof: backward as-of join (geometry_manager searchsorted alignment)
- tracks: speed/distance/Kalman/RDP track analytics (spatiotemporal,
  line_simplification)
- dedup: exact + MinHash-LSH + SimHash + n-gram Jaccard + embedding near-dup
- ann: brute-force and LSH-bucketed cosine top-k
- decontam: n-gram test-set decontamination vs a held-out eval set
- quality: Gopher-style repetition stats/filter + C4-style PII redaction
- skew: salting helpers for hot-key joins
"""

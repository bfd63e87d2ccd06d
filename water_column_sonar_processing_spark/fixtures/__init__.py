"""Deterministic synthetic fixtures (seeded, no network).

Mirrors the reference's fixture strategy (/root/reference/tests/conftest.py
pins sha256 content-addressed inputs; here determinism comes from a fixed
numpy PCG64 seed instead) at the scales listed in FIXTURES.md §7.
"""

from .pages_gen import gen_pages, gen_polygons, gen_track_points, write_fixtures  # noqa: F401

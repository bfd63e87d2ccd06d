"""Pure-Python tests for the golden-oracle twins (no SparkSession).

The cross-engine guarantees these pin:
- xxh64 matches the published xxHash64 known-answer vectors (and therefore
  Spark's xxhash64, which implements the same spec with default seed 42 —
  the Spark-side equality is exercised by the driver gate on
  simhash/minhash_lsh_pairs).
- java_double_to_string follows Java Double.toString formatting rules
  (plain decimal in [1e-3, 1e7), computerized scientific notation
  otherwise) — what Spark's to_json emits for double fields.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from golden_twins import java_double_to_string, spark_array_long_to_string, xxh64


def test_xxh64_known_answer_vectors():
    # Published xxHash64 vectors (github.com/Cyan4973/xxHash test suite)
    assert xxh64(b"", seed=0) == _signed(0xEF46DB3751D8E999)
    assert xxh64(b"a", seed=0) == _signed(0xD24EC4F1A98C6E5B)
    assert xxh64(b"abc", seed=0) == _signed(0x44BC2CF5AD770999)
    # seed sensitivity + all length branches (1/4/8/32-byte paths)
    vals = {xxh64(b"x" * n, seed=42) for n in (0, 1, 3, 4, 7, 8, 15, 16, 31, 32, 33, 64, 100)}
    assert len(vals) == 13  # all distinct
    assert xxh64(b"hello", seed=0) != xxh64(b"hello", seed=42)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def test_java_double_formatting_rules():
    cases = [
        (12.3456, "12.3456"),
        (0.001, "0.001"),
        (0.0005, "5.0E-4"),  # below 1e-3 -> scientific
        (-0.0001, "-1.0E-4"),
        (1.0, "1.0"),
        (-85.0, "-85.0"),
        (9999999.0, "9999999.0"),  # just under 1e7 -> plain
        (10000000.0, "1.0E7"),  # at 1e7 -> scientific
        (1e-5, "1.0E-5"),
        (3.0000000000000004, "3.0000000000000004"),
        (0.0, "0.0"),
        (-0.0, "-0.0"),
        (123456.7, "123456.7"),
    ]
    for x, want in cases:
        assert java_double_to_string(x) == want, (x, java_double_to_string(x), want)


def test_spark_array_cast_format():
    assert spark_array_long_to_string([]) == "[]"
    assert spark_array_long_to_string([1]) == "[1]"
    assert spark_array_long_to_string([1, -22, 333]) == "[1, -22, 333]"

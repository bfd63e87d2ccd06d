"""Build dist/wcsp.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = shutil.make_archive(
        os.path.join(dist, "wcsp"), "zip", root_dir=REPO, base_dir="water_column_sonar_processing_spark"
    )
    print(out)
    return out


if __name__ == "__main__":
    main()

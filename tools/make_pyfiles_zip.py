"""Build dist/frontier_engine.zip for spark-submit --py-files (north_rule
launch path).  Pure stdlib; includes only the package sources."""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out: str | None = None) -> str:
    out = out or os.path.join(REPO, "dist", "frontier_engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "frontier_engine")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for name in sorted(os.listdir(pkg)):
            if name.endswith(".py"):
                zf.write(os.path.join(pkg, name), arcname=f"frontier_engine/{name}")
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))

"""Build dist/whoiswho_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    os.makedirs(f"{REPO}/dist", exist_ok=True)
    out = f"{REPO}/dist/whoiswho_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(f"{REPO}/whoiswho_spark"):
            if "__pycache__" in root:
                continue
            for fn in files:
                # .json: contract data tables (whoiswho_spark/data/)
                if fn.endswith((".py", ".json")):
                    p = os.path.join(root, fn)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()

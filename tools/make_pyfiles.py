"""Package cartography_spark for `spark-submit --py-files`.

Produces dist/cartography_spark.zip; submit with:

    spark-submit --py-files dist/cartography_spark.zip your_job.py

(the north_rule's packaging requirement — `__spark_entry__.entry` is the
smoke entry point).
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "cartography_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "cartography_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                # .json: packaged config (permission_relationships.json) —
                # load_permission_mappings must work under --py-files too
                if fn.endswith((".py", ".json")):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
        z.write(os.path.join(ROOT, "__spark_entry__.py"), "__spark_entry__.py")
    print(out)
    return out


if __name__ == "__main__":
    main()

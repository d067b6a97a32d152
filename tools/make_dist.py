"""Build dist/engine.zip for spark-submit --py-files (BASELINE.json:6)."""

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    out = os.path.join(ROOT, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in ("tilers_tools_spark", "fixtures", "oracle"):
            for dirpath, _dirs, files in os.walk(os.path.join(ROOT, pkg)):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()

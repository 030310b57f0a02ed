"""Generate tests/fixtures/psv_expected.parquet — the PSV oracle table.

For every distinct document text across the sf test dirs, records
(text_md5, psv) where psv is computed by the REFERENCE's own pure
normalize_text_psv (loaded from /root/reference, like
regen_kernel_fixtures.py). The extract_psv oracle SQL joins pages on
md5(text) against this table, upgrading the query from rows-only to a
full differential hash check: engine pipeline vs reference kernel over
identical ground-truth text.

Usage: python scripts/gen_psv_oracle_fixture.py
"""

import hashlib
import importlib.util
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    ref_psv = load(REFERENCE / "fulltext" / "process" / "psv.py", "_ref_psv")

    seen = {}
    for d in SF_DIRS:
        f = Path(d) / "documents.parquet"
        if not f.exists():
            continue
        for text in pq.read_table(f, columns=["text"])["text"].to_pylist():
            key = hashlib.md5(text.encode("utf-8")).hexdigest()
            if key not in seen:
                seen[key] = ref_psv.normalize_text_psv(text)

    out = REPO / "tests" / "fixtures" / "psv_expected.parquet"
    pq.write_table(
        pa.table(
            {
                "text_md5": pa.array(list(seen.keys()), pa.string()),
                "psv": pa.array(list(seen.values()), pa.string()),
            }
        ),
        out,
    )
    print(f"wrote {len(seen)} distinct texts to {out}")


if __name__ == "__main__":
    main()

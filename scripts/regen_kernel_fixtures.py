"""Regenerate tests/fixtures/kernel_golden.json from the reference.

Runs the reference's pure-Python text functions (importable with zero
service dependencies) over the differential corpus and records their
outputs. The committed fixture file makes the byte-identity contract
testable without the reference checkout.

Usage: python scripts/regen_kernel_fixtures.py
"""

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))

from tests.test_kernel_differential import CORPUS  # noqa: E402


def load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    extractor_dir = REFERENCE / "extractor" / "fulltext"
    sys.path.insert(0, str(extractor_dir))
    fixunicode = load(extractor_dir / "fixunicode.py", "_ref_fixunicode")
    ful = load(extractor_dir / "fulltext.py", "_ref_fulltext")
    ref_psv = load(REFERENCE / "fulltext" / "process" / "psv.py", "_ref_psv")

    cases = []
    for text in CORPUS:
        body, tail = ref_psv.process_text(text)
        cases.append(
            {
                "input": text,
                "fix_unicode": fixunicode.fix_unicode(text),
                "awl": ful.average_word_length(text),
                "psv": ref_psv.normalize_text_psv(text),
                "body": body,
                "tail": tail,
            }
        )

    out = REPO / "tests" / "fixtures" / "kernel_golden.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump({"cases": cases}, f, ensure_ascii=False, indent=1)
    print(f"wrote {len(cases)} cases to {out}")


if __name__ == "__main__":
    main()

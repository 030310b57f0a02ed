"""Single-document extraction CLI (parity with the reference's
launch_single.py): read one html/pdf/text file, print the Extraction
record as JSON.

Usage: python scripts/extract_one.py <file> [--fmt plain|psv] [--text-fallback FILE]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--fmt", default="plain", choices=["plain", "psv"])
    ap.add_argument("--text-fallback", default=None,
                    help="file whose text is used when the payload is empty")
    args = ap.parse_args()

    from zzzarchived_arxiv_fulltext_ray.pipelines.api import extract_document

    payload = Path(args.path).read_bytes()
    fallback = (
        Path(args.text_fallback).read_text() if args.text_fallback else None
    )
    record = extract_document(
        payload, fallback, identifier=args.path, fmt=args.fmt
    )
    print(json.dumps(record, ensure_ascii=False))
    sys.exit(0 if record["status"] == "succeeded" else 1)


if __name__ == "__main__":
    main()

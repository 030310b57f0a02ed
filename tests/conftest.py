"""Shared fixtures. Ray is initialised ONCE per pytest session."""

import importlib.util
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")
TESTDATA = Path("/root/testdata")


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    yield ray
    ray.shutdown()


def _load_module_from(path: Path, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def reference_kernel():
    """The reference's pure-Python text functions, imported directly
    (no service deps). Skips when /root/reference is absent — the
    committed golden fixtures still pin byte-identity in that case."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not available")
    extractor_dir = REFERENCE_ROOT / "extractor" / "fulltext"
    sys.path.insert(0, str(extractor_dir))
    try:
        fixunicode = _load_module_from(
            extractor_dir / "fixunicode.py", "_ref_fixunicode"
        )
        ref_fulltext = _load_module_from(
            extractor_dir / "fulltext.py", "_ref_fulltext"
        )
        ref_psv = _load_module_from(
            REFERENCE_ROOT / "fulltext" / "process" / "psv.py", "_ref_psv"
        )
    finally:
        sys.path.remove(str(extractor_dir))
    return {
        "fix_unicode": fixunicode.fix_unicode,
        "average_word_length": ref_fulltext.average_word_length,
        "normalize_text_psv": ref_psv.normalize_text_psv,
        "process_text": ref_psv.process_text,
        "tidy": ref_psv.tidy_txt_from_pdf,
    }

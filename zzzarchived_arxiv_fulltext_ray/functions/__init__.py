"""Pure-Python text kernels. No Ray imports allowed in this subpackage.

Every function here is deterministic ``str -> str`` (or list-of-lines)
and is the byte-identity anchor for the pipeline: outputs must match the
reference implementation (arXiv/zzzArchived_arxiv-fulltext) exactly.
"""

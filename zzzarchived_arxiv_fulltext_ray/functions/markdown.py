"""HTML -> Markdown rendering over the extractor's own DOM tree.

The markdown-preserving variant of main-content extraction (the
FineWeb/Dolma-style pipelines keep headings/links/lists instead of
flattening to plain text). Rendering runs on the same forgiving
``html_main.parse_html`` tree the plain-text extractor uses, so the
two share entity resolution, skip rules (script/style/head/title) and
malformed-markup recovery.

Rendering contract (deterministic, documented — the oracle replays
it):

* ``h1``-``h6`` -> ``#`` * k + space + collapsed inline content;
* ``li`` -> ``- `` + collapsed inline content; consecutive list items
  form ONE block joined by single newlines;
* ``a`` -> ``[text](href)`` (inline, joins the surrounding run);
* other inline tags (span/em/strong/...) render their content
  inline; ``br`` renders as a space;
* every other element is a block: containers recurse, leaves (p,
  nav, footer, pre, td, ...) emit their collapsed inline content;
* whitespace inside a block collapses to single spaces (edges
  stripped); whitespace-only blocks are dropped; blocks join with
  blank lines.

No markdown-escaping of the text itself (a ``*`` in page text passes
through) — documented, matching the no-escape convention of the
plain-text extractor.
"""

import re
from typing import List

from .html_main import _Node, parse_html

_H_LEVEL = {"h%d" % i: i for i in range(1, 7)}
_INLINE = frozenset(
    "a span em strong b i code small sup sub u abbr mark time br".split()
)
_CONTAINERS = frozenset(
    "html body header div section article main aside ul ol blockquote "
    "table tbody thead tr figure form".split()
)
_WS = re.compile(r"\s+")


def _collapse(s: str) -> str:
    return _WS.sub(" ", s).strip()


def _render_inline_el(ch: _Node) -> str:
    if ch.tag == "a":
        href = next((v for k, v in ch.attrs if k == "href" and v), "")
        return "[" + _collapse(_inline(ch)) + "](" + href + ")"
    if ch.tag == "br":
        return " "
    return _inline(ch)


def _inline(node: _Node) -> str:
    parts: List[str] = []
    for ch in node.children:
        if isinstance(ch, str):
            parts.append(ch)
        else:
            parts.append(_render_inline_el(ch))
    return "".join(parts)


def _blocks(node: _Node, out: List[str]):
    run: List[str] = []

    def flush():
        s = _collapse("".join(run))
        run.clear()
        if s:
            out.append(s)

    for ch in node.children:
        if isinstance(ch, str):
            run.append(ch)
            continue
        if ch.tag in _INLINE:
            run.append(_render_inline_el(ch))
            continue
        flush()
        lvl = _H_LEVEL.get(ch.tag)
        if lvl:
            s = _collapse(_inline(ch))
            if s:
                out.append("#" * lvl + " " + s)
        elif ch.tag == "li":
            s = _collapse(_inline(ch))
            if s:
                out.append("- " + s)
        elif ch.tag in _CONTAINERS:
            _blocks(ch, out)
        else:
            s = _collapse(_inline(ch))
            if s:
                out.append(s)
    flush()


def render_markdown(markup: str) -> str:
    """Markdown rendering of an HTML document (see module contract)."""
    out: List[str] = []
    _blocks(parse_html(markup), out)
    blocks: List[str] = []
    for b in out:
        if b.startswith("- ") and blocks and blocks[-1].startswith("- "):
            blocks[-1] += "\n" + b
        else:
            blocks.append(b)
    return "\n\n".join(blocks)

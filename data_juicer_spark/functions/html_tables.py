"""HTML table extraction — hermetic stand-in for the reference's
bs4-based extractor (mapper/extract_tables_from_html_mapper.py:47-88).

bs4 is not in this container, so the extractor is a stdlib
`html.parser.HTMLParser` tree walk that reproduces the reference's
observable semantics, including its quirks:

- `soup.find_all("table")` is recursive, so NESTED tables produce their
  own entry AND their rows also accumulate into every enclosing table
  (the reference's `table.find_all("tr")` is recursive too).
- Tables and rows are emitted in document order of their START tags.
- A row is a header row iff it has a DIRECT `th` child
  (`row.find("th", recursive=False)`); cells are the DIRECT `td`/`th`
  children only, but each cell's text includes all descendant text
  (`get_text(strip=True)`: every text node stripped, empties dropped,
  concatenated without a separator).
- Mismatched end tags pop the open stack to the matching tag (bs4
  builder `_popToTag` recovery); unknown end tags are ignored.

Deviation: `retain_html_tags=True` returns the RAW source substring of
each table element (bs4 re-serializes the parsed tree); identical for
well-formed input.
"""

from __future__ import annotations

from html.parser import HTMLParser
import re

# elements with no end tag — never pushed on the open stack
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr"
    .split())

_END_TAG_RE = re.compile(r"</\s*table\s*>", re.IGNORECASE)


class _Cell:
    __slots__ = ("parts",)

    def __init__(self):
        self.parts: list[str] = []

    def text(self) -> str:
        return "".join(p for p in (s.strip() for s in self.parts) if p)


class _Row:
    __slots__ = ("cells", "has_th", "slots")

    def __init__(self):
        self.cells: list[_Cell] = []
        self.has_th = False
        # (table_ctx, index) placeholder slots reserved at open time so
        # nested rows land in start-tag document order
        self.slots: list = []


class _Table:
    __slots__ = ("rows", "start")

    def __init__(self, start: int):
        self.rows: list = []  # filled with row-cell lists or None slots
        self.start = start    # offset of '<' of the start tag


class _TableParser(HTMLParser):
    def __init__(self, text: str, include_header: bool):
        super().__init__(convert_charrefs=True)
        self.text = text
        self.include_header = include_header
        self.stack: list[tuple[str, object]] = []  # (tag, ctx|None)
        self.tables: list[_Table] = []             # document order
        self.raw_spans: list[tuple[int, int]] = []
        # absolute offset per line start, for getpos() → offset
        self.line_starts = [0]
        for i, ch in enumerate(text):
            if ch == "\n":
                self.line_starts.append(i + 1)

    def _offset(self) -> int:
        line, col = self.getpos()
        return self.line_starts[line - 1] + col

    # -- element events ------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _VOID:
            return
        ctx = None
        if tag == "table":
            ctx = _Table(self._offset())
            self.tables.append(ctx)
        elif tag == "tr":
            open_tables = [c for t, c in self.stack if t == "table"]
            if open_tables:
                ctx = _Row()
                # reserve a slot in EVERY enclosing table (recursive
                # find_all semantics) at start-tag time for ordering
                for tctx in open_tables:
                    tctx.rows.append(None)
                    ctx.slots.append((tctx, len(tctx.rows) - 1))
        elif tag in ("td", "th"):
            if self.stack and self.stack[-1][0] == "tr":
                row = self.stack[-1][1]
                if row is not None:
                    ctx = _Cell()
                    row.cells.append(ctx)
                    if tag == "th":
                        row.has_th = True
        self.stack.append((tag, ctx))

    def handle_startendtag(self, tag, attrs):
        pass  # self-closing: nothing table-shaped is void

    def handle_endtag(self, tag):
        if tag in _VOID:
            return
        if not any(t == tag for t, _ in self.stack):
            return  # stray end tag: ignored (bs4 recovery)
        while self.stack:
            open_tag, ctx = self.stack.pop()
            self._close(open_tag, ctx)
            if open_tag == tag:
                break

    def close(self):
        super().close()
        while self.stack:  # EOF with unclosed elements
            open_tag, ctx = self.stack.pop()
            self._close(open_tag, ctx)

    def _close(self, tag, ctx):
        if ctx is None:
            return
        if tag == "tr":
            row_data = [c.text() for c in ctx.cells]
            keep = bool(row_data) and (self.include_header
                                       or not ctx.has_th)
            for tctx, idx in ctx.slots:
                tctx.rows[idx] = row_data if keep else None
        elif tag == "table":
            end = self._offset()
            m = _END_TAG_RE.match(self.text, end)
            self.raw_spans.append((ctx.start, m.end() if m else end))

    # -- text ----------------------------------------------------------
    def handle_data(self, data):
        for _, ctx in self.stack:
            if isinstance(ctx, _Cell):
                ctx.parts.append(data)


def extract_tables(text: str, retain_html_tags: bool = False,
                   include_header: bool = True):
    """Return the reference's per-sample table extraction: raw table
    HTML strings when `retain_html_tags`, else nested
    [table][row][cell-text] lists (empty rows dropped, tables with no
    surviving rows dropped)."""
    parser = _TableParser(text or "", include_header)
    parser.feed(text or "")
    parser.close()
    if retain_html_tags:
        spans = sorted(parser.raw_spans)
        return [parser.text[a:b] for a, b in spans]
    out = []
    for table in parser.tables:
        rows = [r for r in table.rows if r]
        if rows:
            out.append(rows)
    return out

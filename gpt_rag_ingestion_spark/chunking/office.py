"""Office OOXML parsing with the standard library (SURVEY.md S14, C3;
reference chunking/chunker_factory.py:49-72 routes docx/pptx/xlsx).

The reference parses xlsx with openpyxl (spreadsheet_chunker.py:318-344)
and converts docx/pptx through the Document Intelligence service into
markdown with ``<!-- PageBreak -->`` separators
(doc_analysis_chunker.py:20-110).  Neither openpyxl nor the external
service exists in this container, but OOXML files are just zipped XML —
so the parse itself is reimplemented here on ``zipfile`` +
``xml.etree.ElementTree``:

- :func:`parse_xlsx_workbook`  — every sheet in workbook order, shared
  strings and inline strings resolved, cell-reference gaps filled.
- :func:`docx_to_markdown`     — paragraphs (heading styles -> ``#``),
  tables -> markdown grids, explicit page breaks -> ``<!-- PageBreak -->``.
- :func:`pptx_to_markdown`     — slides in presentation order, title
  placeholders -> ``#``, one ``<!-- PageBreak -->`` between slides.

The markdown converters emit exactly the doc-analysis contract, so
docx/pptx flow through the standard C1 chunker (numbering, page
attribution) with no special cases.  Limits, stated honestly: no
number-format/date rendering for xlsx (raw stored values), no images,
no nested tables — a real deployment swaps in the layout service for
fidelity; the pipeline shape is identical.

Everything here is driver/UDF-side scalar code over one file's bytes;
the Spark parallelism comes from the callers (one row per file).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

PAGEBREAK = "<!-- PageBreak -->"


def _local(tag: str) -> str:
    """'{ns}name' -> 'name'."""
    return tag.rsplit("}", 1)[-1]


def _findall(el: ET.Element, name: str):
    return [c for c in el.iter() if _local(c.tag) == name]


def _col_index(cell_ref: str) -> int:
    """'BC12' -> 0-based column index (54)."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


# ---------------------------------------------------------------- xlsx


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    out = []
    for si in _findall(ET.fromstring(data), "si"):
        # plain <t> or rich-text runs <r><t>; concatenate all text nodes
        out.append("".join(t.text or "" for t in _findall(si, "t")))
    return out


def _workbook_sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """[(sheet_name, archive_path)] in workbook order."""
    rels = {}
    try:
        for rel in _findall(
            ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")), "Relationship"
        ):
            target = rel.get("Target", "")
            if target.startswith("/"):
                target = target.lstrip("/")
            else:
                target = "xl/" + target
            rels[rel.get("Id")] = target.replace("xl/../", "")
    except KeyError:
        pass
    sheets = []
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    for sh in _findall(wb, "sheet"):
        rid = next(
            (v for k, v in sh.attrib.items() if _local(k) == "id"), None
        )
        path = rels.get(rid)
        if path is None:  # no rels part: fall back to sheetN.xml by order
            path = f"xl/worksheets/sheet{len(sheets) + 1}.xml"
        sheets.append((sh.get("name", f"Sheet{len(sheets) + 1}"), path))
    return sheets


def _cell_text(cell: ET.Element, shared: list[str]) -> str:
    ctype = cell.get("t", "n")
    if ctype == "inlineStr":
        return "".join(t.text or "" for t in _findall(cell, "t"))
    v = next(iter(_findall(cell, "v")), None)
    raw = "" if v is None or v.text is None else v.text
    if ctype == "s":
        try:
            return shared[int(raw)]
        except (ValueError, IndexError):
            return ""
    if ctype == "b":
        return "TRUE" if raw == "1" else "FALSE"
    return raw  # n / str / e: the stored text


def parse_xlsx_workbook(payload: bytes) -> list[dict]:
    """xlsx bytes -> [{"sheet_pos", "sheet_name", "rows"}] in workbook
    order; ``rows`` is a rectangular list of cell strings with
    cell-reference gaps filled with ''."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        shared = _shared_strings(zf)
        out = []
        for pos, (name, path) in enumerate(_workbook_sheets(zf)):
            try:
                root = ET.fromstring(zf.read(path))
            except KeyError:
                continue
            rows: list[list[str]] = []
            last_row = 0
            for row in _findall(root, "row"):
                r = int(row.get("r", last_row + 1))
                while last_row < r - 1:  # skipped empty rows
                    rows.append([])
                    last_row += 1
                cells: list[str] = []
                for c in _findall(row, "c"):
                    ref = c.get("r")
                    idx = _col_index(ref) if ref else len(cells)
                    while len(cells) < idx:
                        cells.append("")
                    text = _cell_text(c, shared)
                    if idx < len(cells):
                        cells[idx] = text
                    else:
                        cells.append(text)
                rows.append(cells)
                last_row = r
            width = max((len(r) for r in rows), default=0)
            rows = [r + [""] * (width - len(r)) for r in rows]
            out.append({"sheet_pos": pos, "sheet_name": name, "rows": rows})
        return out


# ---------------------------------------------------------------- docx


def _para_text(p: ET.Element) -> str:
    """Run text of one w:p, with explicit page breaks marked."""
    parts: list[str] = []
    for el in p.iter():
        name = _local(el.tag)
        if name == "t":
            parts.append(el.text or "")
        elif name == "br" and any(
            _local(k) == "type" and v == "page" for k, v in el.attrib.items()
        ):
            parts.append("\n" + PAGEBREAK + "\n")
        elif name == "tab":
            parts.append("\t")
    return "".join(parts)


_HEADING_RE = re.compile(r"^Heading(\d)$", re.IGNORECASE)


def _para_heading_level(p: ET.Element) -> int:
    """0 = body text, N = heading level from the paragraph style."""
    for el in p.iter():
        if _local(el.tag) == "pStyle":
            val = next(
                (v for k, v in el.attrib.items() if _local(k) == "val"), ""
            )
            m = _HEADING_RE.match(val or "")
            if m:
                return int(m.group(1))
            if (val or "").lower() == "title":
                return 1
    return 0


def _docx_table_markdown(tbl: ET.Element) -> str:
    grid: list[list[str]] = []
    for tr in _findall(tbl, "tr"):
        row = []
        for tc in _findall(tr, "tc"):
            texts = [_para_text(p) for p in _findall(tc, "p")]
            row.append(" ".join(t for t in texts if t).strip())
        grid.append(row)
    if not grid:
        return ""
    width = max(len(r) for r in grid)
    grid = [r + [""] * (width - len(r)) for r in grid]
    lines = ["| " + " | ".join(grid[0]) + " |"]
    lines.append("| " + " | ".join(["---"] * width) + " |")
    for r in grid[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


def docx_to_markdown(payload: bytes) -> str:
    """word/document.xml -> markdown on the doc-analysis contract."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        root = ET.fromstring(zf.read("word/document.xml"))
    body = next(iter(_findall(root, "body")), root)
    blocks: list[str] = []
    for child in list(body):
        name = _local(child.tag)
        if name == "p":
            text = _para_text(child)
            level = _para_heading_level(child)
            if level and text.strip():
                text = "#" * level + " " + text.strip()
            if text.strip():
                blocks.append(text)
            # the "\n<!-- PageBreak -->\n" inline form still splits into
            # its own block when the paragraph is otherwise empty
        elif name == "tbl":
            md = _docx_table_markdown(child)
            if md:
                blocks.append(md)
    return "\n\n".join(blocks)


# ---------------------------------------------------------------- pptx


def _slide_paths(zf: zipfile.ZipFile) -> list[str]:
    """Slide archive paths in presentation order (sldIdLst -> rels)."""
    try:
        rels = {}
        for rel in _findall(
            ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels")),
            "Relationship",
        ):
            target = rel.get("Target", "")
            rels[rel.get("Id")] = (
                target.lstrip("/") if target.startswith("/") else "ppt/" + target
            )
        pres = ET.fromstring(zf.read("ppt/presentation.xml"))
        paths = []
        for sld in _findall(pres, "sldId"):
            rid = next(
                (v for k, v in sld.attrib.items() if _local(k) == "id"), None
            )
            if rid in rels:
                paths.append(rels[rid])
        if paths:
            return paths
    except KeyError:
        pass
    # fallback: slideN.xml sorted numerically
    names = [
        n
        for n in zf.namelist()
        if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)
    ]
    return sorted(names, key=lambda n: int(re.search(r"(\d+)", n).group(1)))


def _slide_markdown(root: ET.Element) -> str:
    blocks: list[str] = []
    for sp in _findall(root, "sp"):
        is_title = any(
            ph.get("type") in ("title", "ctrTitle")
            for ph in _findall(sp, "ph")
        )
        paras = []
        for p in _findall(sp, "p"):
            text = "".join(
                t.text or "" for t in _findall(p, "t")
            ).strip()
            if text:
                paras.append(text)
        if not paras:
            continue
        if is_title:
            blocks.append("# " + paras[0])
            blocks.extend(paras[1:])
        else:
            blocks.extend(paras)
    return "\n\n".join(blocks)


def pptx_to_markdown(payload: bytes) -> str:
    """One ``# title + body`` block per slide, slides separated by the
    PageBreak marker (slide boundary == page boundary)."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        slides = []
        for path in _slide_paths(zf):
            try:
                slides.append(_slide_markdown(ET.fromstring(zf.read(path))))
            except KeyError:
                continue
    return ("\n" + PAGEBREAK + "\n").join(slides)


# ------------------------------------------------------- fixture writers
# Minimal OOXML writers so tests (and deterministic fixtures) can build
# real files without any office library.  Write-side only — the engine
# itself only ever parses.


def build_xlsx(sheets: list[tuple[str, list[list[str]]]]) -> bytes:
    """[(sheet_name, rows)] -> xlsx bytes (inline strings only)."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        names = "".join(
            f'<sheet name="{esc(n)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, (n, _r) in enumerate(sheets)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<workbook xmlns="http://schemas.openxmlformats.org/'
            'spreadsheetml/2006/main" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{names}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet"'
            f' Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{rels}</Relationships>',
        )
        for i, (_n, rows) in enumerate(sheets):
            body = []
            for ri, row in enumerate(rows):
                cells = "".join(
                    f'<c r="{_col_letter(ci)}{ri + 1}" t="inlineStr">'
                    f"<is><t>{esc(str(v))}</t></is></c>"
                    for ci, v in enumerate(row)
                )
                body.append(f'<row r="{ri + 1}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<worksheet xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main"><sheetData>'
                + "".join(body)
                + "</sheetData></worksheet>",
            )
    return buf.getvalue()


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"


def build_docx(blocks: list) -> bytes:
    """Blocks: str paragraph, ("h", level, text), ("table", rows),
    ("pagebreak",) -> docx bytes."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    parts = []
    for b in blocks:
        if isinstance(b, str):
            parts.append(f"<w:p><w:r><w:t>{esc(b)}</w:t></w:r></w:p>")
        elif b[0] == "h":
            parts.append(
                f'<w:p><w:pPr><w:pStyle w:val="Heading{b[1]}"/></w:pPr>'
                f"<w:r><w:t>{esc(b[2])}</w:t></w:r></w:p>"
            )
        elif b[0] == "table":
            rows = "".join(
                "<w:tr>"
                + "".join(
                    f"<w:tc><w:p><w:r><w:t>{esc(str(c))}</w:t></w:r></w:p></w:tc>"
                    for c in row
                )
                + "</w:tr>"
                for row in b[1]
            )
            parts.append(f"<w:tbl>{rows}</w:tbl>")
        elif b[0] == "pagebreak":
            parts.append('<w:p><w:r><w:br w:type="page"/></w:r></w:p>')
    doc = (
        f'<w:document xmlns:w="{_W}"><w:body>'
        + "".join(parts)
        + "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"


def build_pptx(slides: list[tuple[str, list[str]]]) -> bytes:
    """[(title, [body paragraphs])] -> pptx bytes."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        sld_ids = "".join(
            f'<p:sldId id="{256 + i}" r:id="rId{i + 1}"/>'
            for i in range(len(slides))
        )
        zf.writestr(
            "ppt/presentation.xml",
            f'<p:presentation xmlns:p="{_P}" xmlns:r="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships">'
            f"<p:sldIdLst>{sld_ids}</p:sldIdLst></p:presentation>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/slide"'
            f' Target="slides/slide{i + 1}.xml"/>'
            for i in range(len(slides))
        )
        zf.writestr(
            "ppt/_rels/presentation.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            f'package/2006/relationships">{rels}</Relationships>',
        )
        for i, (title, body) in enumerate(slides):
            shapes = [
                f'<p:sp><p:nvSpPr><p:nvPr><p:ph type="title"/></p:nvPr>'
                f"</p:nvSpPr><p:txBody><a:p><a:r><a:t>{esc(title)}</a:t>"
                "</a:r></a:p></p:txBody></p:sp>"
            ]
            paras = "".join(
                f"<a:p><a:r><a:t>{esc(t)}</a:t></a:r></a:p>" for t in body
            )
            shapes.append(
                "<p:sp><p:nvSpPr><p:nvPr><p:ph/></p:nvPr></p:nvSpPr>"
                f"<p:txBody>{paras}</p:txBody></p:sp>"
            )
            zf.writestr(
                f"ppt/slides/slide{i + 1}.xml",
                f'<p:sld xmlns:p="{_P}" xmlns:a="{_A}"><p:cSld><p:spTree>'
                + "".join(shapes)
                + "</p:spTree></p:cSld></p:sld>",
            )
    return buf.getvalue()

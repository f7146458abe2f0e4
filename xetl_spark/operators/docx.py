"""DOCX and EPUB text extraction + deterministic builders (pure stdlib:
zipfile + xml.etree).

The other half of document-format ingestion next to operators/pdfdoc.py
— the reference's analog is its subprocess extract-task class
(``/root/reference/README.md:66-77``); here extraction runs executor-
side from Arrow-batched ``mapInPandas``
(``multimodal.extract_document_text``).

Scope and contract (typed errors, bounded work):

- **DOCX** (OOXML WordprocessingML): unzip ``word/document.xml``,
  walk the body in document order — ``w:t`` text runs, ``w:tab`` →
  TAB, ``w:br``/``w:cr`` → newline, paragraphs (``w:p``) and table
  rows joined with newlines.  Headers/footers/comments are out of
  scope (they are separate parts a bulk text pipeline usually drops).
- **EPUB** (OCF + OPF): read ``META-INF/container.xml`` → rootfile →
  OPF manifest/spine, extract each spine XHTML chapter via a
  deterministic tag-stripper that mirrors
  ``operators/text.html_to_text`` (script/style dropped, block tags
  become newlines, entities unescaped), chapters joined with
  form-feed like the PDF page convention.
- **Zip-bomb guards**: member-count and per-member/total decompressed
  caps checked BEFORE reading; typed ``DocxFormatError`` /
  ``EpubFormatError`` for non-zip payloads, missing required parts,
  and malformed XML.
"""

from __future__ import annotations

import html as _html
import io
import posixpath
import re
import struct
import zipfile
import zlib
from xml.etree import ElementTree

__all__ = [
    "DocxFormatError",
    "EpubFormatError",
    "sniff_zip",
    "docx_text",
    "docx_probe",
    "build_docx",
    "epub_text",
    "epub_probe",
    "build_epub",
]


class DocxFormatError(ValueError):
    """Typed DOCX parse failure — never a silent wrong answer."""


class EpubFormatError(ValueError):
    """Typed EPUB parse failure — never a silent wrong answer."""


MAX_MEMBERS = 10_000
MAX_MEMBER_BYTES = 1 << 26  # 64 MiB decompressed per member
MAX_TOTAL_BYTES = 1 << 28  # 256 MiB decompressed per archive

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def sniff_zip(payload: bytes) -> bool:
    return payload[:4] in (b"PK\x03\x04", b"PK\x05\x06")


def _open_zip(payload: bytes, err: type[ValueError]) -> zipfile.ZipFile:
    if not sniff_zip(payload):
        raise err("not a zip container")
    try:
        # zipfile surfaces corrupt central directories as BadZipFile
        # but corrupt EOCD offsets as bare ValueError/OSError/EOFError
        # and malformed extra fields as struct.error — wrap them all
        zf = zipfile.ZipFile(io.BytesIO(payload))
        infos = zf.infolist()
    except (
        zipfile.BadZipFile, OSError, EOFError, ValueError, struct.error,
        NotImplementedError,  # "zip file version N" on corrupt central dirs
    ) as e:
        raise err(f"bad zip container: {e}") from None
    if len(infos) > MAX_MEMBERS:
        raise err(f"zip has {len(infos)} members (cap {MAX_MEMBERS})")
    total = 0
    for zi in infos:
        if zi.file_size > MAX_MEMBER_BYTES:
            raise err(f"zip member {zi.filename!r} exceeds size cap")
        total += zi.file_size
    if total > MAX_TOTAL_BYTES:
        raise err("zip decompressed size exceeds archive cap")
    return zf


def _read_member(zf: zipfile.ZipFile, name: str, err: type[ValueError]) -> bytes:
    try:
        with zf.open(name) as fh:
            data = fh.read(MAX_MEMBER_BYTES + 1)
    except (
        KeyError, zipfile.BadZipFile, zlib.error, OSError, EOFError,
        ValueError, struct.error, NotImplementedError,  # unknown method
    ) as e:
        raise err(f"cannot read zip member {name!r}: {e}") from None
    if len(data) > MAX_MEMBER_BYTES:
        raise err(f"zip member {name!r} exceeds size cap")
    return data


# ---------------------------------------------------------------------------
# DOCX


def _parse_xml(data: bytes, err: type[ValueError], what: str) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(data)
    except ElementTree.ParseError as e:
        raise err(f"malformed XML in {what}: {e}") from None


# Depth cap on our own recursive XML walks: a crafted deeply-nested
# document.xml would otherwise raise RecursionError, which is not a
# DocxFormatError and escapes the per-row typed-error triage in
# multimodal.extract_document_text (pdfdoc caps parse depth at 48 for
# the same reason). Real documents nest tables a handful of levels.
_MAX_XML_DEPTH = 128


def _docx_block_text(
    elem: ElementTree.Element, out: list[str], depth: int = 0
) -> None:
    """Collect text from one block-level element in document order."""
    if depth > _MAX_XML_DEPTH:
        raise DocxFormatError("document.xml nesting exceeds depth cap")
    tag = elem.tag
    if tag == _W + "t":
        out.append(elem.text or "")
        return
    if tag == _W + "tab":
        out.append("\t")
        return
    if tag in (_W + "br", _W + "cr"):
        out.append("\n")
        return
    for child in elem:
        _docx_block_text(child, out, depth + 1)


def docx_text(payload: bytes) -> str:
    """Paragraph-per-line body text of a DOCX document."""
    zf = _open_zip(payload, DocxFormatError)
    names = set(zf.namelist())
    if "word/document.xml" not in names:
        raise DocxFormatError("missing word/document.xml (not a DOCX?)")
    root = _parse_xml(
        _read_member(zf, "word/document.xml", DocxFormatError),
        DocxFormatError,
        "word/document.xml",
    )
    body = root.find(_W + "body")
    if body is None:
        raise DocxFormatError("document.xml has no w:body")
    paras: list[str] = []

    def walk(container: ElementTree.Element, depth: int = 0) -> None:
        if depth > _MAX_XML_DEPTH:
            raise DocxFormatError("document.xml nesting exceeds depth cap")
        for child in container:
            tag = child.tag
            if tag == _W + "p":
                run: list[str] = []
                _docx_block_text(child, run)
                paras.append("".join(run))
            elif tag in (_W + "tbl", _W + "tr", _W + "tc"):
                walk(child, depth + 1)
            elif tag == _W + "sectPr":
                continue
            else:
                walk(child, depth + 1)

    walk(body)
    return "\n".join(paras)


def docx_probe(payload: bytes) -> dict:
    """Triage: paragraph/table counts, embedded-media count, core title."""
    zf = _open_zip(payload, DocxFormatError)
    names = zf.namelist()
    if "word/document.xml" not in names:
        raise DocxFormatError("missing word/document.xml (not a DOCX?)")
    root = _parse_xml(
        _read_member(zf, "word/document.xml", DocxFormatError),
        DocxFormatError,
        "word/document.xml",
    )
    title = None
    if "docProps/core.xml" in names:
        core = _parse_xml(
            _read_member(zf, "docProps/core.xml", DocxFormatError),
            DocxFormatError,
            "docProps/core.xml",
        )
        t = core.find("{http://purl.org/dc/elements/1.1/}title")
        if t is not None:
            title = t.text
    return {
        "paragraphs": sum(1 for _ in root.iter(_W + "p")),
        "tables": sum(1 for _ in root.iter(_W + "tbl")),
        "media": sum(1 for n in names if n.startswith("word/media/")),
        "title": title,
    }


_DOCX_CONTENT_TYPES = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    b'<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    b'<Default Extension="xml" ContentType="application/xml"/>'
    b'<Override PartName="/word/document.xml" ContentType='
    b'"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    b"</Types>"
)
_DOCX_RELS = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    b'<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    b'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    b"</Relationships>"
)


def _xml_esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _zip_bytes(members: list[tuple[str, bytes]], stored_first: bool = False) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for i, (name, data) in enumerate(members):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zi.compress_type = (
                zipfile.ZIP_STORED
                if (stored_first and i == 0)
                else zipfile.ZIP_DEFLATED
            )
            zf.writestr(zi, data)
    return buf.getvalue()


def build_docx(paragraphs: list[str]) -> bytes:
    """Deterministic minimal DOCX: one w:p per paragraph, runs split on
    TAB (→ ``w:tab``) and \\n (→ ``w:br``) so the extractor's control
    handling is exercised by its own fixtures."""
    body: list[str] = []
    for para in paragraphs:
        runs: list[str] = []
        for i, seg in enumerate(para.split("\t")):
            if i:
                runs.append("<w:tab/>")
            for j, piece in enumerate(seg.split("\n")):
                if j:
                    runs.append("<w:br/>")
                if piece:
                    runs.append(
                        f'<w:t xml:space="preserve">{_xml_esc(piece)}</w:t>'
                    )
        body.append(f"<w:p><w:r>{''.join(runs)}</w:r></w:p>")
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{''.join(body)}<w:sectPr/></w:body></w:document>"
    ).encode("utf-8")
    return _zip_bytes(
        [
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES),
            ("_rels/.rels", _DOCX_RELS),
            ("word/document.xml", doc),
        ]
    )


# ---------------------------------------------------------------------------
# EPUB

_DROP = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_BLOCK = re.compile(
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|title)\b[^>]*>"
)
_TAG = re.compile(r"(?s)<[^>]*>")
_NLRUN = re.compile(r"\n{2,}")


def _html_text(markup: str) -> str:
    """Deterministic tag-strip mirroring operators/text.html_to_text:
    drop script/style subtrees, block tags → newline, all other tags
    removed, entities unescaped, newline runs collapsed."""
    s = _DROP.sub(" ", markup)
    s = _BLOCK.sub("\n", s)
    s = _TAG.sub("", s)
    s = _html.unescape(s)
    lines = [ln.strip() for ln in s.split("\n")]
    return _NLRUN.sub("\n", "\n".join(ln for ln in lines if ln)).strip()


def _epub_rootfile(zf: zipfile.ZipFile) -> str:
    data = _read_member(zf, "META-INF/container.xml", EpubFormatError)
    root = _parse_xml(data, EpubFormatError, "container.xml")
    for rf in root.iter("{urn:oasis:names:tc:opendocument:xmlns:container}rootfile"):
        path = rf.get("full-path")
        if path:
            return path
    raise EpubFormatError("container.xml has no rootfile")


_OPF = "{http://www.idpf.org/2007/opf}"


def _epub_spine(zf: zipfile.ZipFile) -> tuple[str, list[str], dict]:
    opf_path = _epub_rootfile(zf)
    opf = _parse_xml(
        _read_member(zf, opf_path, EpubFormatError), EpubFormatError, opf_path
    )
    manifest = {
        item.get("id"): item.get("href")
        for item in opf.iter(_OPF + "item")
        if item.get("id") and item.get("href")
    }
    spine = [
        ref.get("idref")
        for ref in opf.iter(_OPF + "itemref")
        if ref.get("idref")
    ]
    meta = {}
    for tag in ("title", "language", "identifier", "creator"):
        el = opf.find(f".//{{http://purl.org/dc/elements/1.1/}}{tag}")
        if el is not None and el.text:
            meta[tag] = el.text
    base = posixpath.dirname(opf_path)
    hrefs = []
    for idref in spine:
        href = manifest.get(idref)
        if href:
            hrefs.append(posixpath.normpath(posixpath.join(base, href)))
    if not hrefs:
        raise EpubFormatError("EPUB spine is empty")
    return opf_path, hrefs, meta


def epub_text(payload: bytes) -> str:
    """Spine-ordered chapter text; chapters joined with form-feed."""
    zf = _open_zip(payload, EpubFormatError)
    _, hrefs, _ = _epub_spine(zf)
    names = set(zf.namelist())
    chapters: list[str] = []
    for href in hrefs:
        if href not in names:
            raise EpubFormatError(f"spine references missing member {href!r}")
        markup = _read_member(zf, href, EpubFormatError).decode("utf-8", "replace")
        chapters.append(_html_text(markup))
    return "\f".join(chapters)


def epub_probe(payload: bytes) -> dict:
    zf = _open_zip(payload, EpubFormatError)
    opf_path, hrefs, meta = _epub_spine(zf)
    mimetype = None
    if "mimetype" in zf.namelist():
        mimetype = (
            _read_member(zf, "mimetype", EpubFormatError)
            .decode("ascii", "replace")
            .strip()
        )
    return {
        "mimetype": mimetype,
        "opf": opf_path,
        "chapters": len(hrefs),
        "title": meta.get("title"),
        "language": meta.get("language"),
    }


_EPUB_CONTAINER = (
    b'<?xml version="1.0" encoding="UTF-8"?>\n'
    b'<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
    b'<rootfiles><rootfile full-path="OEBPS/content.opf" '
    b'media-type="application/oebps-package+xml"/></rootfiles></container>'
)


def build_epub(
    chapters: list[tuple[str, str]],
    *,
    title: str = "untitled",
    language: str = "en",
) -> bytes:
    """Deterministic minimal EPUB: ``chapters`` is (title, text) pairs;
    each text's \\n-separated lines become ``<p>`` blocks."""
    items: list[str] = []
    refs: list[str] = []
    members: list[tuple[str, bytes]] = [
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml", _EPUB_CONTAINER),
    ]
    for i, (ch_title, text) in enumerate(chapters):
        name = f"ch{i:03d}.xhtml"
        paras = "".join(
            f"<p>{_xml_esc(ln)}</p>" for ln in text.split("\n")
        )
        # empty chapter title → empty <head>: the naive tag-stripper
        # includes <title> text as a line, so fixture generators that
        # want exact body round-trips pass "" here
        head = f"<title>{_xml_esc(ch_title)}</title>" if ch_title else ""
        page = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<html xmlns="http://www.w3.org/1999/xhtml">'
            f"<head>{head}</head>"
            f"<body>{paras}</body></html>"
        ).encode("utf-8")
        members.append((f"OEBPS/{name}", page))
        items.append(
            f'<item id="c{i}" href="{name}" media-type="application/xhtml+xml"/>'
        )
        refs.append(f'<itemref idref="c{i}"/>')
    opf = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">'
        '<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">'
        f"<dc:identifier id='uid'>urn:xetl:{_xml_esc(title)}</dc:identifier>"
        f"<dc:title>{_xml_esc(title)}</dc:title>"
        f"<dc:language>{_xml_esc(language)}</dc:language></metadata>"
        f"<manifest>{''.join(items)}</manifest>"
        f"<spine>{''.join(refs)}</spine></package>"
    ).encode("utf-8")
    members.insert(2, ("OEBPS/content.opf", opf))
    return _zip_bytes(members, stored_first=True)


# ---------------------------------------------------------------------------
# XLSX (SpreadsheetML) — spreadsheet → table ingestion


class XlsxFormatError(ValueError):
    """Typed XLSX parse failure — never a silent wrong answer."""


_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELLREF = re.compile(r"^([A-Z]{1,3})(\d+)$")


def _xlsx_shared_strings(zf: zipfile.ZipFile, names: set[str]) -> list[str]:
    if "xl/sharedStrings.xml" not in names:
        return []
    root = _parse_xml(
        _read_member(zf, "xl/sharedStrings.xml", XlsxFormatError),
        XlsxFormatError,
        "xl/sharedStrings.xml",
    )
    out = []
    for si in root.findall(_S + "si"):
        out.append("".join(t.text or "" for t in si.iter(_S + "t")))
    return out


def xlsx_cells(payload: bytes) -> list[tuple[str, int, str, str | None, float | None]]:
    """All cells of all sheets: (sheet, row, col, text, num).

    Shared-string and inline-string cells fill ``text``; numeric and
    boolean cells fill ``num`` (booleans as 0/1). Formula caches use
    the stored value. Sheet order follows the workbook declaration."""
    zf = _open_zip(payload, XlsxFormatError)
    names = set(zf.namelist())
    if "xl/workbook.xml" not in names:
        raise XlsxFormatError("missing xl/workbook.xml (not an XLSX?)")
    wb = _parse_xml(
        _read_member(zf, "xl/workbook.xml", XlsxFormatError),
        XlsxFormatError,
        "xl/workbook.xml",
    )
    rels = {}
    if "xl/_rels/workbook.xml.rels" in names:
        rroot = _parse_xml(
            _read_member(zf, "xl/_rels/workbook.xml.rels", XlsxFormatError),
            XlsxFormatError,
            "workbook rels",
        )
        for rel in rroot.iter(
            "{http://schemas.openxmlformats.org/package/2006/relationships}Relationship"
        ):
            rels[rel.get("Id")] = rel.get("Target")
    shared = _xlsx_shared_strings(zf, names)
    out: list[tuple[str, int, str, str | None, float | None]] = []
    _R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    sheets = list(wb.iter(_S + "sheet"))
    if not sheets:
        raise XlsxFormatError("workbook declares no sheets")
    for si, sheet in enumerate(sheets):
        sname = sheet.get("name") or f"sheet{si + 1}"
        target = rels.get(sheet.get(_R)) or f"worksheets/sheet{si + 1}.xml"
        member = target if target.startswith("xl/") else f"xl/{target}"
        if member not in names:
            raise XlsxFormatError(f"sheet member {member!r} missing")
        ws = _parse_xml(
            _read_member(zf, member, XlsxFormatError), XlsxFormatError, member
        )
        for row in ws.iter(_S + "row"):
            for cell in row.findall(_S + "c"):
                ref = cell.get("r") or ""
                m = _CELLREF.match(ref)
                if not m:
                    raise XlsxFormatError(f"bad cell reference {ref!r}")
                col, rnum = m.group(1), int(m.group(2))
                typ = cell.get("t") or "n"
                text: str | None = None
                num: float | None = None
                if typ == "inlineStr":
                    is_el = cell.find(_S + "is")
                    text = (
                        "".join(t.text or "" for t in is_el.iter(_S + "t"))
                        if is_el is not None
                        else ""
                    )
                else:
                    v = cell.find(_S + "v")
                    raw = v.text if v is not None and v.text is not None else None
                    if raw is None:
                        continue
                    if typ == "s":
                        try:
                            text = shared[int(raw)]
                        except (ValueError, IndexError):
                            raise XlsxFormatError(
                                f"bad shared-string index {raw!r}"
                            ) from None
                    elif typ == "str":
                        text = raw
                    elif typ == "b":
                        num = 1.0 if raw.strip() == "1" else 0.0
                    else:  # "n" and formula caches
                        try:
                            num = float(raw)
                        except ValueError:
                            raise XlsxFormatError(
                                f"bad numeric cell value {raw!r}"
                            ) from None
                out.append((sname, rnum, col, text, num))
    return out


def xlsx_probe(payload: bytes) -> dict:
    zf = _open_zip(payload, XlsxFormatError)
    names = set(zf.namelist())
    if "xl/workbook.xml" not in names:
        raise XlsxFormatError("missing xl/workbook.xml (not an XLSX?)")
    wb = _parse_xml(
        _read_member(zf, "xl/workbook.xml", XlsxFormatError),
        XlsxFormatError,
        "xl/workbook.xml",
    )
    sheets = [s.get("name") for s in wb.iter(_S + "sheet")]
    return {
        "sheets": sheets,
        "shared_strings": len(_xlsx_shared_strings(zf, names)),
    }


def _col_name(idx: int) -> str:
    """0-based column index → A, B, …, Z, AA, …"""
    name = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        name = chr(65 + rem) + name
    return name


_XLSX_CONTENT_TYPES = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    b'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    b'<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    b'<Default Extension="xml" ContentType="application/xml"/>'
    b'<Override PartName="/xl/workbook.xml" ContentType='
    b'"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    b'<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    b'"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    b'<Override PartName="/xl/sharedStrings.xml" ContentType='
    b'"application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>'
    b"</Types>"
)
_XLSX_RELS = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    b'<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    b'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    b"</Relationships>"
)
_XLSX_WB_RELS = (
    b'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
    b'<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    b'<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    b'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    b'<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
    b'officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
    b"</Relationships>"
)


def build_xlsx(rows: list[list], sheet_name: str = "Sheet1") -> bytes:
    """Deterministic one-sheet XLSX. Cell typing mirrors real writers:
    str → shared-string cell (t="s", deduped), int/float → numeric,
    bool → boolean, None → skipped."""
    shared: dict[str, int] = {}
    cells_xml: list[str] = []
    for r, row in enumerate(rows, start=1):
        row_cells: list[str] = []
        for ci, val in enumerate(row):
            if val is None:
                continue
            ref = f"{_col_name(ci)}{r}"
            if isinstance(val, bool):
                row_cells.append(f'<c r="{ref}" t="b"><v>{1 if val else 0}</v></c>')
            elif isinstance(val, (int, float)):
                row_cells.append(f'<c r="{ref}"><v>{val!r}</v></c>')
            else:
                idx = shared.setdefault(str(val), len(shared))
                row_cells.append(f'<c r="{ref}" t="s"><v>{idx}</v></c>')
        cells_xml.append(f'<row r="{r}">{"".join(row_cells)}</row>')
    ws = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(cells_xml)}</sheetData></worksheet>"
    ).encode("utf-8")
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        f' count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(
            f'<si><t xml:space="preserve">{_xml_esc(s)}</t></si>' for s in shared
        )
        + "</sst>"
    ).encode("utf-8")
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{_xml_esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    ).encode("utf-8")
    return _zip_bytes(
        [
            ("[Content_Types].xml", _XLSX_CONTENT_TYPES),
            ("_rels/.rels", _XLSX_RELS),
            ("xl/workbook.xml", wb),
            ("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS),
            ("xl/worksheets/sheet1.xml", ws),
            ("xl/sharedStrings.xml", sst),
        ]
    )

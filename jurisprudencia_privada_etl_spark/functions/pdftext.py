"""Text-layer PDF table extraction, pure stdlib (S5's decode half).

The reference parses sidecar "tabela" PDFs with camelot in a python child
process (/root/reference/src/sharepoint/pdf_parser.py:41, sharepoint.ts:537-
583).  This container has no PDF library, so this module implements the
minimal extractor the reference's GRID PDFs need, from scratch on the
stdlib (`zlib` + `re`):

* object scan — ``N G obj … endobj`` bodies, dict parsing, indirect-ref
  resolution, stream payloads located by ``/Length`` (direct or indirect)
  with an ``endstream`` fallback;
* filters — ``FlateDecode`` (zlib) and unfiltered streams;
* page walk — trailer ``/Root`` → ``/Pages`` → ``/Kids`` recursion, so page
  ORDER is the document's, not object-number order;
* content-stream interpretation — ``BT/ET`` text blocks with ``Tm Td TD T*
  TL Tj TJ ' "`` tracked as (x, y, text) spans (rotation ignored: grid
  tables are axis-aligned);
* grid reconstruction — spans clustered into rows by y and columns by x,
  the shape ``parse_sidecar_pages`` consumes (first row = header).

Honest limits (each raises ``NotImplementedError`` rather than degrading
silently): encrypted PDFs, cross-reference/object streams (PDF 1.5+
compressed xref), non-Flate filters, and image-only (scanned) pages.  Text
is decoded as Latin-1 — correct for the Standard/WinAnsi encodings the
reference's generator-produced sidecars use; CID/Type0 composite fonts are
out of scope.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass

import pandas as pd


@dataclass(frozen=True)
class Ref:
    num: int


@dataclass(frozen=True)
class Name:
    value: str


_WS = b" \t\r\n\x0c\x00"


def _scan_literal_string(buf: bytes, i: int) -> tuple[bytes, int]:
    """Scan a ``(...)`` literal string starting at ``i`` (at the paren).
    Handles balanced nested parens and backslash escapes per PDF spec."""
    assert buf[i : i + 1] == b"("
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i : i + 1]
        if c == b"\\":
            nxt = buf[i + 1 : i + 2]
            esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c",
                   b"(": b"(", b")": b")", b"\\": b"\\"}
            if nxt in esc:
                out += esc[nxt]
                i += 2
            elif (m := re.match(rb"\\([0-7]{1,3})", buf[i:])):  # \ddd octal
                out.append(int(m.group(1), 8) & 0xFF)
                i += m.end()
            else:  # line continuation or unknown: drop the backslash
                i += 1
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _tokens(buf: bytes) -> list[tuple[str, object]]:
    """Tokenize a PDF dict/array/content-stream body."""
    toks: list[tuple[str, object]] = []
    i, n = 0, len(buf)
    while i < n:
        c = buf[i : i + 1]
        if c in _WS:
            i += 1
        elif c == b"%":
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == b"(":
            s, i = _scan_literal_string(buf, i)
            toks.append(("str", s))
        elif buf[i : i + 2] == b"<<":
            toks.append(("op2", "<<"))
            i += 2
        elif buf[i : i + 2] == b">>":
            toks.append(("op2", ">>"))
            i += 2
        elif c == b"<":
            j = buf.find(b">", i)
            h = re.sub(rb"\s", b"", buf[i + 1 : j])
            if len(h) % 2:
                h += b"0"
            toks.append(("str", bytes.fromhex(h.decode("ascii"))))
            i = j + 1
        elif c == b"/":
            m = re.match(rb"/([^\s/<>\[\]()%]*)", buf[i:])
            toks.append(("name", m.group(1).decode("latin-1")))
            i += m.end()
        elif c in b"[]":
            toks.append(("delim", c.decode()))
            i += 1
        else:
            m = re.match(rb"[-+]?(?:\d+\.?\d*|\.\d+)", buf[i:])
            if m:
                toks.append(("num", float(m.group(0))))
                i += m.end()
                continue
            m = re.match(rb"[A-Za-z'\"*]+", buf[i:])
            if m:
                toks.append(("kw", m.group(0).decode("latin-1")))
                i += m.end()
            else:
                i += 1  # stray byte — skip
    return toks


def _parse_value(toks: list, i: int):
    t, v = toks[i]
    if (t, v) == ("op2", "<<"):
        d: dict = {}
        i += 1
        while toks[i] != ("op2", ">>"):
            key = toks[i][1]
            val, i = _parse_value(toks, i + 1)
            d[key] = val
        return d, i + 1
    if (t, v) == ("delim", "["):
        arr: list = []
        i += 1
        while toks[i] != ("delim", "]"):
            val, i = _parse_value(toks, i)
            arr.append(val)
        return arr, i + 1
    if t == "num":
        if (
            i + 2 < len(toks)
            and toks[i + 1][0] == "num"
            and toks[i + 2] == ("kw", "R")
        ):
            return Ref(int(v)), i + 3
        return (int(v) if float(v).is_integer() else v), i + 1
    if t == "name":
        return Name(v), i + 1
    if t == "str":
        return v, i + 1
    if t == "kw":
        return {"true": True, "false": False, "null": None}.get(v, ("kw", v)), i + 1
    return v, i + 1


class PdfDocument:
    """Scanned objects + trailer of one PDF file."""

    def __init__(self, data: bytes):
        if b"/Encrypt" in data:
            raise NotImplementedError("encrypted PDFs are out of scope")
        self.data = data
        self.objects: dict[int, tuple[object, bytes | None]] = {}
        self._scan_objects()
        self._expand_object_streams()
        self.trailer = self._parse_trailer()

    # -- structure -----------------------------------------------------------

    def _scan_objects(self) -> None:
        data = self.data
        for m in re.finditer(rb"(\d+)\s+(\d+)\s+obj\b", data):
            num = int(m.group(1))
            start = m.end()
            s_pos = data.find(b"stream", start)
            e_pos = data.find(b"endobj", start)
            if e_pos < 0:
                continue
            head_end = s_pos if 0 <= s_pos < e_pos else e_pos
            toks = _tokens(data[start:head_end])
            value = None
            if toks:
                try:
                    value, _ = _parse_value(toks, 0)
                except (IndexError, ValueError):
                    continue  # binary noise matched the obj pattern
            stream = None
            if 0 <= s_pos < e_pos and isinstance(value, dict):
                body = s_pos + len(b"stream")
                if data[body : body + 2] == b"\r\n":
                    body += 2
                elif data[body : body + 1] in (b"\n", b"\r"):
                    body += 1
                length = value.get("Length")
                if isinstance(length, int):
                    stream = data[body : body + length]
                else:  # indirect /Length (resolved later) or missing
                    end = data.find(b"endstream", body)
                    stream = (num, body, end)  # placeholder triple
            self.objects[num] = (value, stream)
        # second pass: resolve indirect /Length placeholders
        for num, (value, stream) in list(self.objects.items()):
            if isinstance(stream, tuple):
                length = self.resolve(value.get("Length"))
                _, body, end = stream
                if isinstance(length, int):
                    self.objects[num] = (value, self.data[body : body + length])
                else:
                    raw = self.data[body:end]
                    self.objects[num] = (value, raw.rstrip(b"\r\n"))

    def _expand_object_streams(self) -> None:
        """PDF 1.5+ object streams (``/Type /ObjStm``): Flate containers
        holding many non-stream objects — the layout every modern writer
        emits.  The decoded stream starts with ``/N`` pairs of integers
        ``objnum offset`` (offsets relative to ``/First``), followed by the
        object bodies, parsed here with the same tokenizer as direct
        objects.  Directly-defined objects are never clobbered: the scanner
        already applies last-definition-wins for incremental updates, and an
        object redefined directly supersedes its object-stream copy."""
        for num, (value, stream) in list(self.objects.items()):
            if not (isinstance(value, dict) and stream is not None):
                continue
            vtype = value.get("Type")
            if not (isinstance(vtype, Name) and vtype.value == "ObjStm"):
                continue
            try:
                body = self.stream_bytes(num)
            except (NotImplementedError, zlib.error):
                continue  # unsupported filter/corrupt: direct objects still work
            n = self.resolve(value.get("N"))
            first = self.resolve(value.get("First"))
            if not (isinstance(n, int) and isinstance(first, int)):
                continue
            header = body[:first].split()
            pairs = [
                (int(header[2 * i]), int(header[2 * i + 1]))
                for i in range(min(n, len(header) // 2))
            ]
            # slice each body at the next-higher offset (spec does not
            # require ascending order, so compute bounds by rank)
            order = sorted(range(len(pairs)), key=lambda i: pairs[i][1])
            ends = {}
            for rank, i in enumerate(order):
                ends[i] = (
                    pairs[order[rank + 1]][1]
                    if rank + 1 < len(order)
                    else len(body) - first
                )
            for i, (onum, off) in enumerate(pairs):
                seg = body[first + off : first + ends[i]]
                try:
                    toks = _tokens(seg)
                    if not toks:
                        continue
                    val, _ = _parse_value(toks, 0)
                except (IndexError, ValueError):
                    continue
                self.objects.setdefault(onum, (val, None))

    def _parse_trailer(self) -> dict:
        # classic trailer dict; 1.5+ files keep a /Root in the xref stream
        # dict instead, which _scan_objects already captured as an object.
        # Reverse order: an incrementally-updated PDF appends a new trailer,
        # and the spec resolves from the LAST startxref backward — the first
        # trailer would be the superseded original revision's
        for m in reversed(list(re.finditer(rb"trailer", self.data))):
            toks = _tokens(self.data[m.end() : m.end() + 2048])
            if toks and toks[0] == ("op2", "<<"):
                d, _ = _parse_value(toks, 0)
                if "Root" in d:
                    return d
        for _num, (value, _s) in self.objects.items():
            if isinstance(value, dict) and "Root" in value:
                return value
        raise NotImplementedError(
            "no trailer /Root found (cross-reference-stream-only layout?)"
        )

    def resolve(self, v):
        while isinstance(v, Ref):
            v = self.objects.get(v.num, (None, None))[0]
        return v

    def stream_bytes(self, num: int) -> bytes:
        value, stream = self.objects[num]
        if stream is None:
            return b""
        filt = self.resolve(value.get("Filter")) if isinstance(value, dict) else None
        filts = filt if isinstance(filt, list) else ([filt] if filt else [])
        out = stream
        for f in filts:
            fname = f.value if isinstance(f, Name) else str(f)
            if fname == "FlateDecode":
                out = zlib.decompress(out)
            else:
                raise NotImplementedError(f"PDF filter {fname} not supported")
        return out

    # -- pages ---------------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        out: list[dict] = []

        def walk(node_ref):
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            ntype = node.get("Type")
            if isinstance(ntype, Name) and ntype.value == "Page":
                out.append(node)
            else:
                for kid in self.resolve(node.get("Kids")) or []:
                    walk(kid)

        walk(root.get("Pages"))
        return out

    def page_content(self, page: dict) -> bytes:
        contents = page.get("Contents")
        refs = contents if isinstance(contents, list) else [contents]
        parts = []
        for r in refs:
            if isinstance(r, Ref):
                parts.append(self.stream_bytes(r.num))
        return b"\n".join(parts)


# -- content-stream text extraction ------------------------------------------


def extract_text_spans(content: bytes) -> list[tuple[float, float, str]]:
    """(x, y, text) spans from one page's content stream.

    Tracks the text-positioning subset (Tm/Td/TD/T*/TL); each show operator
    (Tj/TJ/'/") emits one span at the current line origin.  Glyph-width
    advances are not modeled — grid PDFs position every cell with its own
    Tm/Td, which is exactly what the reconstruction needs."""
    spans: list[tuple[float, float, str]] = []
    stack: list = []
    x = y = 0.0
    leading = 12.0
    in_text = False
    for t, v in _tokens(content):
        if t in ("num", "str"):
            stack.append(v)
        elif t == "delim":
            stack.append(v)
        elif t == "name":
            stack.append(Name(v))
        elif t == "kw":
            if v == "BT":
                in_text, x, y = True, 0.0, 0.0
            elif v == "ET":
                in_text = False
            elif v == "Tm" and len(stack) >= 6:
                x, y = float(stack[-2]), float(stack[-1])
            elif v in ("Td", "TD") and len(stack) >= 2:
                x += float(stack[-2])
                y += float(stack[-1])
                if v == "TD":
                    leading = -float(stack[-1])
            elif v == "TL" and stack:
                leading = float(stack[-1])
            elif v == "T*":
                y -= leading
            elif v in ("Tj", "'", '"') and in_text:
                s = next((e for e in reversed(stack) if isinstance(e, bytes)), b"")
                if v in ("'", '"'):
                    y -= leading
                if s:
                    spans.append((x, y, s.decode("latin-1")))
            elif v == "TJ" and in_text:
                # concatenate the string elements of the pending array
                arr: list[bytes] = []
                for e in reversed(stack):
                    if e == "[":
                        break
                    if isinstance(e, bytes):
                        arr.append(e)
                txt = b"".join(reversed(arr)).decode("latin-1")
                if txt:
                    spans.append((x, y, txt))
            stack.clear()
    return spans


def _cluster(values: list[float], tol: float) -> list[float]:
    """1-D single-linkage clustering: sorted representative per cluster."""
    reps: list[float] = []
    for v in sorted(values):
        if not reps or v - reps[-1] > tol:
            reps.append(v)
    return reps


def spans_to_grid(
    spans: list[tuple[float, float, str]], y_tol: float = 3.0, x_tol: float = 3.0
) -> pd.DataFrame:
    """Cluster text spans into the raw cell grid parse_sidecar_pages expects
    (row 0 = header).  Rows cluster by y (top first), columns by x (left
    first) ACROSS the whole page, so ragged rows still land in the right
    columns.  Cells hit by several spans concatenate in x order."""
    if not spans:
        return pd.DataFrame()
    row_reps = _cluster([s[1] for s in spans], y_tol)[::-1]  # top (max y) first
    col_reps = _cluster([s[0] for s in spans], x_tol)

    def nearest(reps: list[float], v: float) -> int:
        return min(range(len(reps)), key=lambda i: abs(reps[i] - v))

    grid: list[list[list[tuple[float, str]]]] = [
        [[] for _ in col_reps] for _ in row_reps
    ]
    for sx, sy, txt in spans:
        grid[nearest(row_reps, sy)][nearest(col_reps, sx)].append((sx, txt))
    cells = [
        [" ".join(t for _, t in sorted(cell)) if cell else None for cell in row]
        for row in grid
    ]
    return pd.DataFrame(cells)


def pdf_to_grids(data: bytes) -> list[pd.DataFrame]:
    """PDF bytes → per-page raw cell grids (the pdf_parser.py:35-49 shape).
    Pages whose content has no text spans are skipped (an image-only page in
    an otherwise-text PDF); a PDF with NO text at all raises — it is a
    scanned document, which needs OCR, not this extractor."""
    doc = PdfDocument(data)
    grids = []
    for page in doc.pages():
        spans = extract_text_spans(doc.page_content(page))
        if spans:
            grids.append(spans_to_grid(spans))
    if not grids:
        raise NotImplementedError(
            "PDF contains no extractable text layer (scanned/image-only?)"
        )
    return grids


# -- fixture writer -----------------------------------------------------------


def make_grid_pdf(
    pages: list[list[list[str | None]]],
    compress: bool = True,
    objstm: bool = False,
) -> bytes:
    """Minimal well-formed grid PDF (Helvetica, Latin-1, one Tm per cell) —
    the test fixture generator for the extractor above.  Layout mirrors the
    reference's sidecar tables: header row first, one text cell per grid
    position.

    ``objstm=True`` emits the PDF 1.5+ layout every modern writer produces:
    all non-stream objects (catalog, page tree, page dicts, font) packed
    into one Flate-compressed ``/Type /ObjStm`` container, and the trailer
    replaced by a cross-reference STREAM object carrying ``/Root`` — no
    classic ``trailer`` keyword anywhere in the file."""

    def esc(s: str) -> bytes:
        return (
            s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ).encode("latin-1")

    objs: dict[int, bytes] = {}
    font_num = 3 + 2 * len(pages)
    page_nums = []
    for p, page in enumerate(pages):
        ops = [b"BT /F1 10 Tf"]
        for r, row in enumerate(page):
            for c, cell in enumerate(row):
                if cell is None:
                    continue
                x, y = 40 + c * 110, 780 - r * 18
                ops.append(b"1 0 0 1 %d %d Tm (%s) Tj" % (x, y, esc(str(cell))))
        ops.append(b"ET")
        content = b"\n".join(ops)
        filt = b""
        if compress:
            content = zlib.compress(content)
            filt = b" /Filter /FlateDecode"
        cnum, pnum = 3 + 2 * p, 4 + 2 * p
        objs[cnum] = (
            b"<< /Length %d%s >>\nstream\n" % (len(content), filt)
            + content
            + b"\nendstream"
        )
        objs[pnum] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (font_num, cnum)
        )
        page_nums.append(pnum)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (
        b" ".join(b"%d 0 R" % n for n in page_nums),
        len(pages),
    )
    objs[font_num] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )

    if objstm:
        # pack every non-stream object into one ObjStm; streams (page
        # contents) must stay direct per spec
        stream_objs = {n: b for n, b in objs.items() if b"stream" in b[:200]}
        packed = sorted(n for n in objs if n not in stream_objs)
        bodies = [objs[n].strip() for n in packed]
        offs, pos = [], 0
        for b in bodies:
            offs.append(pos)
            pos += len(b) + 1
        header = b" ".join(b"%d %d" % (n, o) for n, o in zip(packed, offs)) + b"\n"
        payload = zlib.compress(header + b"\n".join(bodies) + b"\n")
        stm_num = max(objs) + 1
        xref_num = stm_num + 1
        direct = dict(stream_objs)
        direct[stm_num] = (
            b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
            b"\nstream\n" % (len(packed), len(header), len(payload))
            + payload
            + b"\nendstream"
        )
        out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
        for num in sorted(direct):
            out += b"%d 0 obj\n" % num + direct[num] + b"\nendobj\n"
        xref_at = len(out)
        # cross-reference STREAM (entries are a stub — this extractor
        # regex-scans objects and only needs the dict's /Root)
        xdata = b"\x00" * 4
        out += (
            b"%d 0 obj\n<< /Type /XRef /Size %d /Root 1 0 R /W [1 2 1] "
            b"/Length %d >>\nstream\n" % (xref_num, xref_num + 1, len(xdata))
            + xdata
            + b"\nendstream\nendobj\nstartxref\n%d\n%%%%EOF\n" % xref_at
        )
        return bytes(out)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
    xref_at = len(out)
    n = max(objs) + 1
    out += b"xref\n0 %d\n" % n
    out += b"0000000000 65535 f \n"
    for num in range(1, n):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (n, xref_at)
    )
    return bytes(out)

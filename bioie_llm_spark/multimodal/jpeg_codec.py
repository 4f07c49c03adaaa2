"""Pure-stdlib JPEG codec (VERDICT r5 #6; progressive added r7).

The one image format real web corpora actually contain rode the declared
stub fallback until now. This module implements the public ITU T.81
baseline AND progressive processes with nothing but ``math``/``struct``:

- ``jpeg_parse(payload) -> (w, h, rgb)``: general decoder — 8-bit
  samples, 1 (grayscale) or 3 (YCbCr) components, any sampling
  factors up to 2x2 (4:4:4 / 4:2:2 / 4:2:0), DQT/DHT tables read from
  the stream, DRI/RSTn restart intervals honored (predictor reset +
  byte realign), APPn/COM skipped. Baseline (SOF0) decodes scan-at-once;
  progressive (SOF2, T.81 Annex G — spectral selection + successive
  approximation, EOB runs, buffered correction bits) accumulates
  coefficients across scans and IDCTs at EOI. Arithmetic coding,
  lossless, hierarchical and 12-bit precision raise NotImplementedError
  so the caller's per-row stub fallback keeps the documented
  "exotic payload never hard-fails the pipeline" contract.
- ``jpeg_encode(w, h, rgb, subsampling="444")``: fixture/re-encode
  writer — standard Annex K Huffman tables, flat all-ones quant tables
  (the fixtures are md5-noise pixels, the worst case for JPEG; flat
  tables keep round-trip error to DCT float rounding, ±2 per channel),
  4:4:4 or 4:2:0.
- ``jpeg_encode_progressive(...)``: the SOF2 twin — same quant tables
  and FDCT, so progressive decode is pinned bit-for-bit against the
  baseline decode of the same pixels.
- ``jpeg_header_hex(w, h)``: the byte-exact marker prefix (SOI..SOS) the
  encoder emits for a given geometry — content-independent because the
  tables are fixed, so BOTH the Spark classification expression and the
  DuckDB oracle can classify a "real resized JPEG" by prefix without
  decoding (same pattern as the PPM/PNG/BMP header constants).

The reference repo has no media path at all (SURVEY.md §2 multimodal is
an engine extension); the format knowledge here is the public T.81 spec.
"""

from __future__ import annotations

import math
import struct

# --- constants (ITU T.81, public) ------------------------------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# fixture quant tables: flat ones — md5-noise pixels are all high
# frequency, real Annex-K tables would crush them and round-trip tests
# could not bound the error; the DECODER reads whatever tables the
# stream declares, so it stays general
_Q_FLAT = [1] * 64

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16.0) for u in range(8)] for x in range(8)
]
_C = [1.0 / math.sqrt(2.0)] + [1.0] * 7


def _fdct(block: list[float]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                cxu = _COS[x][u]
                row = x * 8
                for y in range(8):
                    s += block[row + y] * cxu * _COS[y][v]
            out[u * 8 + v] = 0.25 * _C[u] * _C[v] * s
    return out


def _idct(coef: list[float]) -> list[float]:
    out = [0.0] * 64
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cxu = _COS[x][u] * _C[u]
                row = u * 8
                for v in range(8):
                    s += coef[row + v] * cxu * _C[v] * _COS[y][v]
            out[x * 8 + y] = 0.25 * s
    return out


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical JPEG Huffman assignment: symbol -> (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) for a DC diff / AC amplitude, T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise NotImplementedError("truncated JPEG entropy data")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:  # a real marker (EOI under padding) — emit 1s
                    byte = 0xFF
                    self.pos -= 1
                    self.data = self.data[: self.pos]  # stop consuming
            self._acc = byte
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 E.2.4): padding
        bits in the current byte are dropped, then the two marker bytes.
        Raises NotImplementedError when the expected marker is absent —
        the malformed-stream path, routed to the stub fallback."""
        self._nbits = 0
        # an all-ones padding byte is 0xFF and gets a stuffed 0x00 — skip
        # the pair before the marker
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0x00
        ):
            self.pos += 2
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise NotImplementedError("JPEG missing expected restart marker")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --- encoder ----------------------------------------------------------------


def _encode_block(
    w: _BitWriter,
    samples: list[float],
    quant: list[int],
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    coefs = _fdct([s - 128.0 for s in samples])
    q = [int(round(coefs[ZIGZAG[i]] / quant[i])) for i in range(64)]
    diff = q[0] - pred
    size, bits = _magnitude(diff)
    code, length = dc_codes[size]
    w.write(code, length)
    if size:
        w.write(bits, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if q[i] != 0:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        if q[i] == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.write(code, length)
            run -= 16
        size, bits = _magnitude(q[i])
        code, length = ac_codes[(run << 4) | size]
        w.write(code, length)
        w.write(bits, size)
        run = 0
    if last_nz != 63:
        code, length = ac_codes[0x00]  # EOB
        w.write(code, length)
    return q[0]


def _component_block(plane: list[int], pw: int, ph: int, bx: int, by: int) -> list[float]:
    """8x8 block at block coords (bx, by), edge-replicated past the edge."""
    out = []
    for y in range(8):
        sy = min(by * 8 + y, ph - 1)
        row = sy * pw
        for x in range(8):
            sx = min(bx * 8 + x, pw - 1)
            out.append(float(plane[row + sx]))
    return out


def _markers(w: int, h: int, subsampling: str, restart_interval: int = 0) -> bytes:
    """SOI..SOS prefix — fixed tables, so content-independent."""
    out = bytearray(b"\xff\xd8")  # SOI
    for tid, tbl in ((0, _Q_FLAT), (1, _Q_FLAT)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(tbl)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOF0: baseline, 8-bit, 3 components
    y_h, y_v = (2, 2) if subsampling == "420" else (1, 1)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += struct.pack(">BBB", 1, (y_h << 4) | y_v, 0)
    out += struct.pack(">BBB", 2, 0x11, 1)
    out += struct.pack(">BBB", 3, 0x11, 1)
    for marker_class, tid, (bits, vals) in (
        (0, 0, _DC_LUM),
        (1, 0, _AC_LUM),
        (0, 1, _DC_CHR),
        (1, 1, _AC_CHR),
    ):
        out += b"\xff\xc4" + struct.pack(
            ">HB", 2 + 1 + 16 + len(vals), (marker_class << 4) | tid
        )
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += struct.pack(">BB", 1, 0x00)
    out += struct.pack(">BB", 2, 0x11)
    out += struct.pack(">BB", 3, 0x11)
    out += struct.pack(">BBB", 0, 63, 0)
    return bytes(out)


def jpeg_header_hex(w: int, h: int, subsampling: str = "444") -> str:
    """Hex of the byte-exact marker prefix jpeg_encode emits for this
    geometry — used by the mm pipeline (Spark AND DuckDB oracle) to
    classify real resized JPEGs by prefix, like the PPM/PNG/BMP header
    constants."""
    return _markers(w, h, subsampling).hex().upper()


def jpeg_encode(
    w: int,
    h: int,
    rgb: bytes,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline-sequential JFIF-less JPEG: fixed flat quant tables,
    standard Annex K Huffman tables, 4:4:4 (default) or 4:2:0.
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (what real web JPEGs carry for error resilience) —
    used to exercise the decoder's restart path."""
    assert len(rgb) == w * h * 3, "rgb length must be w*h*3"
    assert subsampling in ("444", "420")
    n = w * h
    ys = [0] * n
    cbs = [0] * n
    crs = [0] * n
    for i in range(n):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        ys[i] = min(255, max(0, int(round(yy))))
        cbs[i] = min(255, max(0, int(round(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b))))
        crs[i] = min(255, max(0, int(round(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b))))

    bw = _BitWriter()
    dc_l = _huff_codes(*_DC_LUM)
    ac_l = _huff_codes(*_AC_LUM)
    dc_c = _huff_codes(*_DC_CHR)
    ac_c = _huff_codes(*_AC_CHR)
    preds = [0, 0, 0]
    state = {"mcu": 0, "rst": 0}

    def end_mcu(total: int) -> None:
        state["mcu"] += 1
        if (
            restart_interval
            and state["mcu"] % restart_interval == 0
            and state["mcu"] < total
        ):
            bw.flush()
            bw.buf += bytes([0xFF, 0xD0 + (state["rst"] % 8)])
            state["rst"] += 1
            preds[0] = preds[1] = preds[2] = 0

    if subsampling == "444":
        bx_n = (w + 7) // 8
        by_n = (h + 7) // 8
        for by in range(by_n):
            for bx in range(bx_n):
                for ci, (plane, dc, ac) in enumerate(
                    ((ys, dc_l, ac_l), (cbs, dc_c, ac_c), (crs, dc_c, ac_c))
                ):
                    preds[ci] = _encode_block(
                        bw,
                        _component_block(plane, w, h, bx, by),
                        _Q_FLAT,
                        dc,
                        ac,
                        preds[ci],
                    )
                end_mcu(bx_n * by_n)
    else:  # 420: MCU = 16x16 -> 4 Y blocks + 1 Cb + 1 Cr (2x2 box mean)
        cw, ch = (w + 1) // 2, (h + 1) // 2

        def _down(plane: list[int]) -> list[int]:
            out = [0] * (cw * ch)
            for yy in range(ch):
                for xx in range(cw):
                    acc = cnt = 0
                    for dy in range(2):
                        for dx in range(2):
                            sy, sx = yy * 2 + dy, xx * 2 + dx
                            if sy < h and sx < w:
                                acc += plane[sy * w + sx]
                                cnt += 1
                    out[yy * cw + xx] = int(round(acc / cnt))
            return out

        cb_d, cr_d = _down(cbs), _down(crs)
        mcu_x = (w + 15) // 16
        mcu_y = (h + 15) // 16
        for my in range(mcu_y):
            for mx in range(mcu_x):
                for dy in range(2):
                    for dx in range(2):
                        preds[0] = _encode_block(
                            bw,
                            _component_block(ys, w, h, mx * 2 + dx, my * 2 + dy),
                            _Q_FLAT,
                            dc_l,
                            ac_l,
                            preds[0],
                        )
                preds[1] = _encode_block(
                    bw, _component_block(cb_d, cw, ch, mx, my), _Q_FLAT, dc_c, ac_c, preds[1]
                )
                preds[2] = _encode_block(
                    bw, _component_block(cr_d, cw, ch, mx, my), _Q_FLAT, dc_c, ac_c, preds[2]
                )
                end_mcu(mcu_x * mcu_y)

    bw.flush()
    return (
        _markers(w, h, subsampling, restart_interval)
        + bytes(bw.buf)
        + b"\xff\xd9"
    )


# --- decoder ----------------------------------------------------------------


def _decode_huff(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code")


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    codes = _huff_codes(bits, vals)
    return {(length, code): sym for sym, (code, length) in codes.items()}


def jpeg_parse(payload: bytes | None) -> tuple[int, int, bytes]:
    """Decode a baseline-sequential or progressive JPEG to (w, h, raw
    RGB). Anything the decoder can't express — and any malformed stream
    (truncated segment, bad struct) — raises NotImplementedError (stub
    fallback), never a hard failure."""
    try:
        return _jpeg_parse(payload)
    except (struct.error, IndexError, ValueError) as e:
        raise NotImplementedError(f"malformed JPEG: {e}") from e


def _jpeg_parse(payload: bytes | None) -> tuple[int, int, bytes]:
    if not payload or payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    data = payload
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    w = h = 0
    restart_interval = 0
    progressive = False
    coefs: list[list[list[int]]] | None = None  # per comp: padded block grid
    bdims: list[tuple[int, int]] = []  # per comp: (blocks wide, blocks high)
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError("JPEG marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if progressive and coefs is not None:
                return _progressive_finish(w, h, comps, coefs, bdims, quant)
            raise NotImplementedError("JPEG with no scan data")
        if pos + 2 > len(data):
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per marker)
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                quant[tid] = list(seg[p + 1 : p + 65])
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, tid)] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc not in (1, 3):
                raise NotImplementedError("non-8-bit or CMYK JPEG")
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise NotImplementedError("JPEG sampling factor > 2")
                comps.append((cid, ch, cv, tq))
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("non-baseline JPEG (arithmetic/lossless/12-bit)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan: list[tuple[int, int, int]] = []  # (comp idx, dc tid, ac tid)
            for i in range(ns):
                cid, tids = seg[1 + 2 * i], seg[2 + 2 * i]
                idx = next(
                    (j for j, c in enumerate(comps) if c[0] == cid), None
                )
                if idx is None:
                    raise NotImplementedError("JPEG scan references unknown component")
                scan.append((idx, tids >> 4, tids & 0x0F))
            if not progressive:
                return _decode_scan(
                    data, pos + seglen, w, h, comps, scan, quant, huff,
                    restart_interval,
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if coefs is None:
                if w <= 0 or h <= 0 or not comps:
                    raise NotImplementedError("JPEG scan before frame header")
                coefs, bdims = _alloc_coefs(w, h, comps)
            pos = _progressive_scan(
                data, pos + seglen, w, h, comps, scan, coefs, bdims, huff,
                restart_interval, ss, se, ahal >> 4, ahal & 0x0F,
            )
            continue
        # APPn / COM / others: skip
        pos += seglen
    raise NotImplementedError("truncated JPEG")


def _render_block(
    zz: list[int], q: list[int], plane: list[int], pw: int, ox: int, oy: int
) -> None:
    """Dequantize a zigzag-order coefficient block, IDCT, clip and write
    into the component plane — shared by the baseline single-scan path
    and the progressive finish so both produce bit-identical pixels."""
    coef = [0.0] * 64
    for i in range(64):
        coef[ZIGZAG[i]] = float(zz[i] * q[i])
    px = _idct(coef)
    for yy in range(8):
        row = (oy + yy) * pw + ox
        for xx in range(8):
            v = int(round(px[yy * 8 + xx] + 128.0))
            plane[row + xx] = 0 if v < 0 else (255 if v > 255 else v)


def _planes_to_rgb(
    w: int,
    h: int,
    comps: list,
    planes: list[list[int]],
    pdims: list[tuple[int, int]],
    hmax: int,
    vmax: int,
) -> tuple[int, int, bytes]:
    """Upsample component planes and convert to interleaved RGB — the
    shared tail of both decode paths (grayscale passthrough or BT.601
    YCbCr)."""
    rgb = bytearray(w * h * 3)
    if len(comps) == 1:
        pw, _ = pdims[0]
        for y in range(h):
            for x in range(w):
                g = planes[0][y * pw + x]
                i = (y * w + x) * 3
                rgb[i] = rgb[i + 1] = rgb[i + 2] = g
        return w, h, bytes(rgb)
    for y in range(h):
        for x in range(w):
            samples = []
            for idx, (_, ch, cv, _) in enumerate(comps):
                pw, _ = pdims[idx]
                sx = x * ch // hmax
                sy = y * cv // vmax
                samples.append(planes[idx][sy * pw + sx])
            yy, cb, cr = samples[0], samples[1] - 128.0, samples[2] - 128.0
            r = int(round(yy + 1.402 * cr))
            g = int(round(yy - 0.344136286 * cb - 0.714136286 * cr))
            b = int(round(yy + 1.772 * cb))
            i = (y * w + x) * 3
            rgb[i] = 0 if r < 0 else (255 if r > 255 else r)
            rgb[i + 1] = 0 if g < 0 else (255 if g > 255 else g)
            rgb[i + 2] = 0 if b < 0 else (255 if b > 255 else b)
    return w, h, bytes(rgb)


def _decode_scan(
    data, pos, w, h, comps, scan, quant, huff, restart_interval=0
) -> tuple[int, int, bytes]:
    if w <= 0 or h <= 0:
        raise NotImplementedError("empty JPEG frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcu_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes: list[list[int]] = []
    pdims: list[tuple[int, int]] = []
    for _, ch, cv, _ in comps:
        pw, ph = mcu_x * ch * 8, mcu_y * cv * 8
        planes.append([0] * (pw * ph))
        pdims.append((pw, ph))
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_done = 0
    for my in range(mcu_y):
        for mx in range(mcu_x):
            if (
                restart_interval
                and mcu_done
                and mcu_done % restart_interval == 0
            ):
                reader.sync_restart()
                preds = [0] * len(comps)
            for idx, dc_tid, ac_tid in scan:
                _, ch, cv, tq = comps[idx]
                if tq not in quant:
                    raise NotImplementedError("JPEG missing quant table")
                dc_tab = huff.get((0, dc_tid))
                ac_tab = huff.get((1, ac_tid))
                if dc_tab is None or ac_tab is None:
                    raise NotImplementedError("JPEG missing Huffman table")
                for by in range(cv):
                    for bx in range(ch):
                        zz = [0] * 64
                        size = _decode_huff(reader, dc_tab)
                        diff = _extend(reader.receive(size), size)
                        preds[idx] += diff
                        zz[0] = preds[idx]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(reader, ac_tab)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise NotImplementedError("JPEG AC index overflow")
                            zz[k] = _extend(reader.receive(size), size)
                            k += 1
                        pw, _ = pdims[idx]
                        _render_block(
                            zz, quant[tq], planes[idx], pw,
                            (mx * ch + bx) * 8, (my * cv + by) * 8,
                        )
            mcu_done += 1

    return _planes_to_rgb(w, h, comps, planes, pdims, hmax, vmax)


# --- progressive decoder (ITU T.81 Annex G, successive approximation) -------


def _grid(w: int, h: int, comps: list) -> tuple[int, int, int, int]:
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcu_y = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcu_x, mcu_y


def _nonpadded_blocks(w: int, h: int, comps: list, idx: int) -> tuple[int, int]:
    """Block grid a NON-interleaved scan covers for component idx: the
    component's own sample dims rounded up to whole blocks (T.81 A.2.2) —
    smaller than the padded MCU grid when the component is the max-factor
    one (e.g. 4:2:0 luma with w % 16 != 0)."""
    hmax, vmax, _, _ = _grid(w, h, comps)
    _, ch, cv, _ = comps[idx]
    cw = (w * ch + hmax - 1) // hmax
    chh = (h * cv + vmax - 1) // vmax
    return (cw + 7) // 8, (chh + 7) // 8


def _alloc_coefs(
    w: int, h: int, comps: list
) -> tuple[list[list[list[int]]], list[tuple[int, int]]]:
    """Zigzag-order coefficient blocks on the padded MCU grid, one array
    per component; scans accumulate into these and the IDCT happens once
    at EOI."""
    _, _, mcu_x, mcu_y = _grid(w, h, comps)
    coefs: list[list[list[int]]] = []
    bdims: list[tuple[int, int]] = []
    for _, ch, cv, _ in comps:
        bw, bh = mcu_x * ch, mcu_y * cv
        coefs.append([[0] * 64 for _ in range(bw * bh)])
        bdims.append((bw, bh))
    return coefs, bdims


def _dc_first(reader, dc_tab, blk, preds, idx, al) -> None:
    size = _decode_huff(reader, dc_tab)
    preds[idx] += _extend(reader.receive(size), size)
    blk[0] = preds[idx] << al


def _ac_first(reader, ac_tab, blk, ss, se, al, state) -> None:
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += reader.receive(r)
                break
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise NotImplementedError("JPEG AC index overflow")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1


def _ac_refine(reader, ac_tab, blk, ss, se, al, state) -> None:
    """Successive-approximation AC refinement (T.81 G.1.2.3 / the
    public jdphuff algorithm): newly-nonzero coefficients arrive as
    run/1 codes with a sign bit; every already-nonzero coefficient
    crossed on the way reads one correction bit; EOBn covers whole
    blocks whose remaining history still reads correction bits."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = _decode_huff(reader, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise NotImplementedError("JPEG AC refine size != 1")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                c = blk[k]
                if c != 0:
                    if reader.read_bit() and (c & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            c = blk[k]
            if c != 0 and reader.read_bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c > 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _progressive_scan(
    data, pos, w, h, comps, scan, coefs, bdims, huff, restart_interval,
    ss, se, ah, al,
) -> int:
    """Decode one progressive scan into the coefficient grids; returns
    the offset of the next marker."""
    reader = _BitReader(data, pos)
    state = {"eobrun": 0}
    preds = [0] * len(comps)
    units = 0  # MCUs (interleaved) or blocks (non-interleaved), for DRI

    def maybe_restart() -> None:
        nonlocal preds
        if restart_interval and units and units % restart_interval == 0:
            reader.sync_restart()
            preds = [0] * len(comps)
            state["eobrun"] = 0

    if ss == 0:  # DC scan (Se must be 0)
        if se != 0:
            raise NotImplementedError("JPEG DC scan with Se != 0")
        if len(scan) > 1:
            _, _, mcu_x, mcu_y = _grid(w, h, comps)
            for my in range(mcu_y):
                for mx in range(mcu_x):
                    maybe_restart()
                    for idx, dc_tid, _ in scan:
                        _, ch, cv, _ = comps[idx]
                        bw, _bh = bdims[idx]
                        for by in range(cv):
                            for bx in range(ch):
                                blk = coefs[idx][
                                    (my * cv + by) * bw + mx * ch + bx
                                ]
                                if ah == 0:
                                    tab = huff.get((0, dc_tid))
                                    if tab is None:
                                        raise NotImplementedError(
                                            "JPEG missing Huffman table"
                                        )
                                    _dc_first(reader, tab, blk, preds, idx, al)
                                elif reader.read_bit():
                                    blk[0] |= 1 << al
                    units += 1
        else:
            idx, dc_tid, _ = scan[0]
            bw, _bh = bdims[idx]
            nbx, nby = _nonpadded_blocks(w, h, comps, idx)
            tab = huff.get((0, dc_tid))
            if ah == 0 and tab is None:
                raise NotImplementedError("JPEG missing Huffman table")
            for by in range(nby):
                for bx in range(nbx):
                    maybe_restart()
                    blk = coefs[idx][by * bw + bx]
                    if ah == 0:
                        _dc_first(reader, tab, blk, preds, idx, al)
                    elif reader.read_bit():
                        blk[0] |= 1 << al
                    units += 1
    else:  # AC scan: always single-component (T.81 G.1.1.1)
        if len(scan) != 1:
            raise NotImplementedError("JPEG interleaved AC scan")
        idx, _, ac_tid = scan[0]
        tab = huff.get((1, ac_tid))
        if tab is None:
            raise NotImplementedError("JPEG missing Huffman table")
        bw, _bh = bdims[idx]
        nbx, nby = _nonpadded_blocks(w, h, comps, idx)
        fn = _ac_first if ah == 0 else _ac_refine
        for by in range(nby):
            for bx in range(nbx):
                maybe_restart()
                fn(reader, tab, coefs[idx][by * bw + bx], ss, se, al, state)
                units += 1

    # the reader stops mid-byte; scan forward for the next true marker
    # (skipping stuffed FF00 and any stray RSTn)
    p = min(reader.pos, len(reader.data))
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    return len(data)


def _progressive_finish(
    w, h, comps, coefs, bdims, quant
) -> tuple[int, int, bytes]:
    hmax, vmax, _, _ = _grid(w, h, comps)
    planes: list[list[int]] = []
    pdims: list[tuple[int, int]] = []
    for idx, (_, _ch, _cv, tq) in enumerate(comps):
        if tq not in quant:
            raise NotImplementedError("JPEG missing quant table")
        bw, bh = bdims[idx]
        pw, ph = bw * 8, bh * 8
        plane = [0] * (pw * ph)
        q = quant[tq]
        for by in range(bh):
            for bx in range(bw):
                _render_block(coefs[idx][by * bw + bx], q, plane, pw, bx * 8, by * 8)
        planes.append(plane)
        pdims.append((pw, ph))
    return _planes_to_rgb(w, h, comps, planes, pdims, hmax, vmax)


# --- progressive encoder (fixture writer for the SOF2 decode path) ----------

# Progressive AC scans need EOBn symbols (r<<4 for r >= 1), which the
# Annex K sequential tables do not contain — so progressive streams carry
# their own flat table: every needed symbol (EOB0..EOB14, ZRL, and
# run/size for size 1..10) at code length 8. 176 symbols fit in the 256
# length-8 slots with the all-ones code unused, and the DECODER reads
# whatever tables the stream declares, so this stays a writer-side choice.
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        [r << 4 for r in range(15)]
        + [0xF0]
        + [(run << 4) | size for run in range(16) for size in range(1, 11)]
    ),
)


def _rgb_to_ycc(w: int, h: int, rgb: bytes) -> tuple[list[int], list[int], list[int]]:
    n = w * h
    ys = [0] * n
    cbs = [0] * n
    crs = [0] * n
    for i in range(n):
        r, g, b = rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        ys[i] = min(255, max(0, int(round(yy))))
        cbs[i] = min(
            255, max(0, int(round(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b)))
        )
        crs[i] = min(
            255, max(0, int(round(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b)))
        )
    return ys, cbs, crs


def _box_down(plane: list[int], w: int, h: int) -> tuple[int, int, list[int]]:
    cw, ch = (w + 1) // 2, (h + 1) // 2
    out = [0] * (cw * ch)
    for yy in range(ch):
        for xx in range(cw):
            acc = cnt = 0
            for dy in range(2):
                for dx in range(2):
                    sy, sx = yy * 2 + dy, xx * 2 + dx
                    if sy < h and sx < w:
                        acc += plane[sy * w + sx]
                        cnt += 1
            out[yy * cw + xx] = int(round(acc / cnt))
    return cw, ch, out


def _quantize_block(samples: list[float], quant: list[int]) -> list[int]:
    """FDCT + quantize one 8x8 block to zigzag-order ints — the exact
    coefficients _encode_block entropy-codes, shared so progressive
    streams carry the SAME coefficients as the baseline writer (the
    round-trip tests pin progressive decode == baseline decode)."""
    coefs = _fdct([s - 128.0 for s in samples])
    return [int(round(coefs[ZIGZAG[i]] / quant[i])) for i in range(64)]


def _prog_comps(subsampling: str, grayscale: bool) -> list[tuple[int, int, int, int]]:
    if grayscale:
        return [(1, 1, 1, 0)]
    if subsampling == "420":
        return [(1, 2, 2, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
    return [(1, 1, 1, 0), (2, 1, 1, 1), (3, 1, 1, 1)]


def _prog_script(grayscale: bool) -> list[tuple[list[int], int, int, int, int]]:
    """(members, Ss, Se, Ah, Al) per scan — fixed, so the byte prefix up
    to the first SOS is content-independent for a given geometry."""
    if grayscale:
        return [
            ([0], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return [
        ([0, 1, 2], 0, 0, 0, 1),
        ([0], 1, 5, 0, 1),
        ([1], 1, 63, 0, 1),
        ([2], 1, 63, 0, 1),
        ([0], 6, 63, 0, 1),
        ([0, 1, 2], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
        ([1], 1, 63, 1, 0),
        ([2], 1, 63, 1, 0),
    ]


def _prog_sos_header(
    comps: list, members: list[int], ss: int, se: int, ah: int, al: int
) -> bytes:
    hdr = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(members), len(members))
    for ci in members:
        hdr += struct.pack(">BB", comps[ci][0], (0 if ci == 0 else 1) << 4 | 0)
    return hdr + struct.pack(">BBB", ss, se, (ah << 4) | al)


def _prog_markers(
    w: int, h: int, subsampling: str, grayscale: bool, restart_interval: int = 0
) -> bytes:
    """SOI..DHT for the progressive writer — fixed tables, so
    content-independent for a given geometry (+DRI when restarts on)."""
    comps = _prog_comps(subsampling, grayscale)
    out = bytearray(b"\xff\xd8")
    for tid in (0,) if grayscale else (0, 1):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(_Q_FLAT)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * len(comps), 8, h, w, len(comps))
    for cid, chf, cvf, tq in comps:
        out += struct.pack(">BBB", cid, (chf << 4) | cvf, tq)
    tables = [(0, 0, _DC_LUM), (1, 0, _AC_PROG)]
    if not grayscale:
        tables.append((0, 1, _DC_CHR))
    for cls, tid, (bits, vals) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    return bytes(out)


def jpeg_prog_header_hex(w: int, h: int, subsampling: str = "444") -> str:
    """Hex of the byte-exact content-independent prefix (SOI..DHT + the
    first SOS header) jpeg_encode_progressive emits for this geometry —
    lets the mm pipeline (Spark AND the DuckDB oracle) classify
    progressive-source assets by prefix, like jpeg_header_hex for the
    baseline writer."""
    comps = _prog_comps(subsampling, grayscale=False)
    members, ss, se, ah, al = _prog_script(grayscale=False)[0]
    return (
        _prog_markers(w, h, subsampling, grayscale=False)
        + _prog_sos_header(comps, members, ss, se, ah, al)
    ).hex().upper()


def jpeg_encode_progressive(
    w: int,
    h: int,
    rgb: bytes,
    subsampling: str = "444",
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Progressive (SOF2) JPEG with successive approximation — the
    fixture twin of ``jpeg_encode``: same flat quant tables, same FDCT,
    same coefficients, different scan structure, so
    ``jpeg_parse(progressive) == jpeg_parse(baseline)`` bit-for-bit.

    Scan script (the shape libjpeg emits by default, reduced to one
    successive-approximation level): DC first at Al=1 (interleaved),
    per-component AC first scans at Al=1 with a split luma spectral band
    (1-5 then 6-63), DC refinement, then per-component AC refinement at
    Al=0 — exercising all four progressive entropy decoders including
    EOB-run accumulation and buffered correction bits.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many restart units in EVERY scan (MCUs when interleaved, blocks
    when single-component), flushing the pending EOB run + carried
    correction bits and resetting DC predictors at each marker — the
    decoder's progressive-restart path (predictor/EOBRUN reset + byte
    realign) is exercised by this twin."""
    assert len(rgb) == w * h * 3, "rgb length must be w*h*3"
    assert subsampling in ("444", "420")
    ys, cbs, crs = _rgb_to_ycc(w, h, rgb)

    comps = _prog_comps(subsampling, grayscale)
    if grayscale:
        planes = [(ys, w, h)]
    elif subsampling == "420":
        cw, ch_, cbd = _box_down(cbs, w, h)
        _, _, crd = _box_down(crs, w, h)
        planes = [(ys, w, h), (cbd, cw, ch_), (crd, cw, ch_)]
    else:
        planes = [(ys, w, h), (cbs, w, h), (crs, w, h)]

    # quantized coefficient blocks on the padded MCU grid per component
    _, _, mcu_x, mcu_y = _grid(w, h, comps)
    qblocks: list[list[list[int]]] = []
    bdims: list[tuple[int, int]] = []
    for ci, (_, chf, cvf, _) in enumerate(comps):
        plane, pw, ph = planes[ci]
        bw_, bh_ = mcu_x * chf, mcu_y * cvf
        qblocks.append(
            [
                _quantize_block(_component_block(plane, pw, ph, bx, by), _Q_FLAT)
                for by in range(bh_)
                for bx in range(bw_)
            ]
        )
        bdims.append((bw_, bh_))

    # --- headers: SOI, DQT, SOF2, DHT (DC Annex K + the flat prog AC) ---
    out = bytearray(_prog_markers(w, h, subsampling, grayscale, restart_interval))

    dc_codes = [_huff_codes(*(_DC_LUM if ci == 0 else _DC_CHR)) for ci in range(len(comps))]
    ac_codes = _huff_codes(*_AC_PROG)

    def sos_header(members: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        return _prog_sos_header(comps, members, ss, se, ah, al)

    def dc_units(members):
        """Restart units for a DC scan: one MCU (all member blocks) when
        interleaved, one block when single-component (T.81 E.2.4: the
        restart interval counts MCUs, and a non-interleaved scan's MCU is
        one data unit)."""
        if len(members) > 1:
            for my in range(mcu_y):
                for mx in range(mcu_x):
                    unit = []
                    for ci, (_, chf, cvf, _) in enumerate(comps):
                        bw_, _ = bdims[ci]
                        for by in range(cvf):
                            for bx in range(chf):
                                unit.append(
                                    (ci, qblocks[ci][(my * cvf + by) * bw_ + mx * chf + bx])
                                )
                    yield unit
        else:
            ci = members[0]
            bw_, _ = bdims[ci]
            nbx, nby = _nonpadded_blocks(w, h, comps, ci)
            for by in range(nby):
                for bx in range(nbx):
                    yield [(ci, qblocks[ci][by * bw_ + bx])]

    def ac_blocks(ci):
        bw_, _ = bdims[ci]
        nbx, nby = _nonpadded_blocks(w, h, comps, ci)
        for by in range(nby):
            for bx in range(nbx):
                yield qblocks[ci][by * bw_ + bx]

    def flush_eob(bwr, state):
        """Emit the pending EOBn code, then any correction bits carried
        with the run (AC refinement)."""
        if state["eobrun"]:
            r = state["eobrun"].bit_length() - 1
            code, ln = ac_codes[r << 4]
            bwr.write(code, ln)
            if r:
                bwr.write(state["eobrun"] - (1 << r), r)
            for b in state["carried"]:
                bwr.write(b, 1)
            state["eobrun"] = 0
            state["carried"] = []

    def emit_dc_first_unit(bwr, unit, state, al):
        for ci, qb in unit:
            v = qb[0] >> al
            size, bits = _magnitude(v - state["preds"][ci])
            state["preds"][ci] = v
            code, ln = dc_codes[ci][size]
            bwr.write(code, ln)
            if size:
                bwr.write(bits, size)

    def emit_dc_refine_unit(bwr, unit, state, al):
        for _ci, qb in unit:
            bwr.write((qb[0] >> al) & 1, 1)

    def emit_ac_first_block(bwr, qb, ss, se, al, state):
        run = 0
        for k in range(ss, se + 1):
            t = abs(qb[k]) >> al
            if t == 0:
                run += 1
                continue
            flush_eob(bwr, state)
            while run > 15:
                code, ln = ac_codes[0xF0]
                bwr.write(code, ln)
                run -= 16
            size, bits = _magnitude(t if qb[k] > 0 else -t)
            code, ln = ac_codes[(run << 4) | size]
            bwr.write(code, ln)
            bwr.write(bits, size)
            run = 0
        if run > 0:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                flush_eob(bwr, state)

    def emit_ac_refine_block(bwr, qb, ss, se, al, state):
        t = [0] * (se + 1)
        eobpos = ss - 1
        for k in range(ss, se + 1):
            t[k] = abs(qb[k]) >> al
            if t[k] == 1:
                eobpos = k
        r = 0
        cur: list[int] = []  # bits buffered inside this block
        for k in range(ss, se + 1):
            if t[k] == 0:
                r += 1
                continue
            if k <= eobpos:
                while r > 15:
                    flush_eob(bwr, state)
                    code, ln = ac_codes[0xF0]
                    bwr.write(code, ln)
                    r -= 16
                    for b in cur:
                        bwr.write(b, 1)
                    cur = []
            if t[k] > 1:
                cur.append(t[k] & 1)
                continue
            flush_eob(bwr, state)
            code, ln = ac_codes[(r << 4) | 1]
            bwr.write(code, ln)
            bwr.write(1 if qb[k] > 0 else 0, 1)
            for b in cur:
                bwr.write(b, 1)
            cur = []
            r = 0
        if r > 0 or cur:
            state["eobrun"] += 1
            state["carried"].extend(cur)
            if state["eobrun"] == 0x7FFF or len(state["carried"]) > 900:
                flush_eob(bwr, state)

    for members, ss, se, ah, al in _prog_script(grayscale):
        out += sos_header(members, ss, se, ah, al)
        bwr = _BitWriter()
        state = {"eobrun": 0, "carried": [], "preds": [0] * len(comps)}
        if ss == 0:
            units = dc_units(members)
            emit = (
                emit_dc_first_unit if ah == 0 else emit_dc_refine_unit
            )

            def emit_unit(u, _emit=emit, _al=al):
                _emit(bwr, u, state, _al)
        else:
            units = ac_blocks(members[0])
            emit = emit_ac_first_block if ah == 0 else emit_ac_refine_block

            def emit_unit(u, _emit=emit, _ss=ss, _se=se, _al=al):
                _emit(bwr, u, _ss, _se, _al, state)
        rst = 0
        for i, unit in enumerate(units):
            if restart_interval and i and i % restart_interval == 0:
                # byte-align and emit RSTn; DC predictors and the EOB run
                # (with its carried correction bits) reset per T.81 E.2.4
                flush_eob(bwr, state)
                bwr.flush()
                bwr.buf += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                state["preds"] = [0] * len(comps)
            emit_unit(unit)
        flush_eob(bwr, state)
        bwr.flush()
        out += bytes(bwr.buf)
    return bytes(out) + b"\xff\xd9"

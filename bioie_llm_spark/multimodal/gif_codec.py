"""Pure-stdlib GIF87a/89a codec for the multimodal decode dispatch.

Decoder: logical screen descriptor, global/local color tables,
extension-block skipping (GCE/comment/application), image descriptor
with interlace support, and the full variable-width LZW decompressor
(clear/end codes, dictionary growth to 12 bits, deferred-clear
tolerant). Covers the containers real web corpora serve; for animated
GIFs the FIRST frame is decoded and later image blocks are ignored
(the frame a thumbnailer samples). Malformed/truncated payloads raise
NotImplementedError so the per-row dispatch falls back to the declared
stub (same policy as the JPEG codec's arithmetic/12-bit branches).

Encoder: the deterministic fixture twin — palette built from the
image's distinct colors (power-of-two sized, index order = first
appearance), non-interlaced or interlaced single frame, variable-width
LZW with the standard initial clear code. Round-trip equality is the
test contract: parse(encode(rgb)) == rgb exactly (GIF is lossless).

Spec: GIF89a specification (CompuServe, 1990) + GIF87a; LZW per the
spec's Appendix. No third-party deps, ~200 lines.
"""

from __future__ import annotations

import struct

__all__ = ["gif_parse", "gif_parse_frames", "gif_encode", "gif_encode_animated"]


# --------------------------------------------------------------- decoding
class _BitReader:
    """LSB-first bit reader over the concatenated LZW data stream."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise NotImplementedError("gif: truncated LZW stream")
            out |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return out


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    """Variable-width GIF LZW. Width grows when the next code value to be
    assigned reaches 2^width (the canonical giflib-compatible rule: the
    decoder may receive a code equal to its own next_code — the KwKwK
    case — so width must already cover it). Table full at 4096 freezes
    growth until a clear code (deferred-clear tolerant)."""
    clear = 1 << min_code_size
    end = clear + 1
    br = _BitReader(data)

    def reset():
        return {i: bytes([i]) for i in range(clear)}, clear + 2, min_code_size + 1

    table, next_code, width = reset()
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = br.read(width)
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code not in table:
                raise NotImplementedError("gif: first code not a root")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise NotImplementedError("gif: code out of sequence")
        if prev is not None and next_code <= 4095:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        out += entry
        prev = entry
    return bytes(out[:n_pixels])


def _deinterlace(idx: bytes, w: int, h: int) -> bytes:
    rows = [idx[y * w : (y + 1) * w] for y in range(h)]
    out: list[bytes | None] = [None] * h
    src = iter(rows)
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, h, step):
            out[y] = next(src)
    return b"".join(out)  # type: ignore[arg-type]


def gif_parse_frames(payload: bytes | None) -> tuple[int, int, list[bytes]]:
    """GIF payload -> (width, height, [raw RGB per frame]) — ALL image
    blocks decoded. Only FULL-FRAME animations are modeled: every image
    descriptor must cover the whole logical screen and no frame may use
    transparency (sub-rectangle / transparent frames need composition
    over the previous canvas — those raise NotImplementedError for the
    declared stub, same policy as the exotic JPEG variants).

    Truncated/malformed payloads raise NotImplementedError (never a bare
    struct.error/IndexError): the per-row decode dispatch in binary_ops
    catches only NotImplementedError, so anything else would hard-fail
    the whole Spark task instead of routing the row to the declared stub
    (the same wrapper _jpeg_parse got — ADVICE r7)."""
    try:
        return _gif_parse_frames_impl(payload)
    except NotImplementedError:
        raise
    except (struct.error, IndexError, ValueError) as e:
        raise NotImplementedError(f"gif: malformed payload ({e})") from e


def _gif_parse_frames_impl(payload: bytes | None) -> tuple[int, int, list[bytes]]:
    if not payload or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("gif: bad signature")
    if len(payload) < 13:
        raise NotImplementedError("gif: truncated header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise NotImplementedError("gif: truncated global color table")
        pos += 3 * n

    frames: list[tuple[int, int, bytes]] = []
    transparent_next = False
    first_frame_transparent = False
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = payload[pos]
            pos += 1
            first = True
            while pos < len(payload) and payload[pos]:
                if label == 0xF9 and first and payload[pos] >= 4:
                    # Graphic Control Extension: bit 0 = transparency
                    transparent_next = bool(payload[pos + 1] & 0x01)
                first = False
                pos += 1 + payload[pos]
            if pos >= len(payload):
                raise NotImplementedError("gif: truncated extension")
            pos += 1
            continue
        if b != 0x2C:
            raise NotImplementedError(f"gif: unexpected block 0x{b:02x}")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if frames:
            # an animation: every frame incl. the first must cover the
            # whole screen (sub-rectangle frames compose over the previous
            # canvas — out of scope, declared stub)
            if (left, top, w, h) != (0, 0, sw, sh) or frames[0][:2] != (sw, sh):
                raise NotImplementedError("gif: sub-rectangle animation frame")
            # transparency anywhere in an ANIMATION is out of scope —
            # including a transparent FIRST frame discovered to be part of
            # an animation only now (ADVICE r7: frame 0 would otherwise
            # render its transparent index as an opaque palette color)
            if transparent_next or first_frame_transparent:
                raise NotImplementedError("gif: transparent animation frame")
        else:
            first_frame_transparent = transparent_next
        transparent_next = False
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = payload[pos : pos + 3 * n]
            if len(ct) != 3 * n:
                raise NotImplementedError("gif: truncated local color table")
            pos += 3 * n
        if ct is None:
            raise NotImplementedError("gif: no color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while pos < len(payload) and payload[pos]:
            ln = payload[pos]
            if pos + 1 + ln > len(payload):
                raise NotImplementedError("gif: truncated image data")
            chunks.append(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        if pos >= len(payload):
            raise NotImplementedError("gif: missing block terminator")
        pos += 1
        idx = _lzw_decode(min_code, b"".join(chunks), w * h)
        if len(idx) < w * h:
            raise NotImplementedError("gif: short pixel data")
        if ipacked & 0x40:
            idx = _deinterlace(idx, w, h)
        rgb = bytearray(w * h * 3)
        n_colors = len(ct) // 3
        for i, c in enumerate(idx):
            if c >= n_colors:
                raise NotImplementedError("gif: palette index out of range")
            rgb[3 * i : 3 * i + 3] = ct[3 * c : 3 * c + 3]
        frames.append((w, h, bytes(rgb)))
    if not frames:
        raise NotImplementedError("gif: no image block")
    # single still: its own rect (may be smaller than the screen, common
    # in the wild); animations are full-screen by the checks above
    w0, h0, _ = frames[0]
    return w0, h0, [rgb for _, _, rgb in frames]


def gif_parse(payload: bytes | None) -> tuple[int, int, bytes]:
    """GIF payload -> (width, height, raw RGB bytes) of the FIRST frame
    (the frame a thumbnailer samples); later frames are ignored here —
    ``gif_parse_frames`` decodes them all."""
    sw, sh, frames = gif_parse_frames(payload)
    return sw, sh, frames[0]


# --------------------------------------------------------------- encoding
class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, code: int, width: int):
        for i in range(width):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    bw = _BitWriter()
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    bw.write(clear, width)
    run = b""
    for c in indices:
        cand = run + bytes([c])
        if cand in table:
            run = cand
            continue
        bw.write(table[run], width)
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            bw.write(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        run = bytes([c])
    if run:
        bw.write(table[run], width)
    bw.write(end, width)
    return bw.tobytes()


def gif_encode(w: int, h: int, rgb: bytes, interlace: bool = False) -> bytes:
    """Single-frame GIF89a with a global color table built from the
    image's distinct colors (first-appearance order; must be <= 256)."""
    assert len(rgb) == w * h * 3, "rgb length must be w*h*3"
    palette: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(w * h):
        px = bytes(rgb[3 * i : 3 * i + 3])
        if px not in palette:
            if len(palette) == 256:
                raise NotImplementedError(
                    "gif_encode: more than 256 distinct colors (needs "
                    "quantization, out of scope for the fixture twin)"
                )
            palette[px] = len(palette)
        indices.append(palette[px])
    size_exp = 0
    while (2 << size_exp) < max(len(palette), 2):
        size_exp += 1
    n_entries = 2 << size_exp
    ct = b"".join(sorted(palette, key=palette.get)) + b"\x00" * (
        3 * (n_entries - len(palette))
    )
    min_code = max(2, size_exp + 1)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_exp & 7), 0, 0)
    out += ct
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    if interlace:
        rows = [bytes(indices[y * w : (y + 1) * w]) for y in range(h)]
        order = [y for s, st_ in ((0, 8), (4, 8), (2, 4), (1, 2)) for y in range(s, h, st_)]
        indices = bytearray(b"".join(rows[y] for y in order))
    out.append(min_code)
    lzw = _lzw_encode(min_code, bytes(indices))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def gif_encode_animated(
    w: int, h: int, frames: list[bytes], delay_cs: int = 4
) -> bytes:
    """Multi-frame GIF89a fixture twin: one global color table built over
    ALL frames' distinct colors (<= 256 or NotImplementedError), a
    Graphic Control Extension per frame (delay, no transparency), every
    image descriptor full-screen — exactly the animation subset
    ``gif_parse_frames`` models, so encode->parse_frames is the identity
    per frame (GIF is lossless)."""
    assert frames and all(len(f) == w * h * 3 for f in frames)
    palette: dict[bytes, int] = {}
    per_frame_indices: list[bytearray] = []
    for rgb in frames:
        idx = bytearray()
        for i in range(w * h):
            px = bytes(rgb[3 * i : 3 * i + 3])
            if px not in palette:
                if len(palette) == 256:
                    raise NotImplementedError(
                        "gif_encode_animated: more than 256 distinct colors"
                    )
                palette[px] = len(palette)
            idx.append(palette[px])
        per_frame_indices.append(idx)
    size_exp = 0
    while (2 << size_exp) < max(len(palette), 2):
        size_exp += 1
    n_entries = 2 << size_exp
    ct = b"".join(sorted(palette, key=palette.get)) + b"\x00" * (
        3 * (n_entries - len(palette))
    )
    min_code = max(2, size_exp + 1)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_exp & 7), 0, 0)
    out += ct
    for idx in per_frame_indices:
        # GCE: disposal 1 (leave), no transparency
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x04, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode(min_code, bytes(idx))
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)

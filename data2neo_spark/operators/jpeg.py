"""Pure-python baseline JPEG decoder (ITU-T T.81 sequential DCT, 8-bit).

Public-spec implementation — marker parse (DQT/SOF0/DHT/SOS/DRI), Huffman
entropy decode with byte-unstuffing and restart markers, dequantize,
de-zigzag, separable 2-D IDCT (IEEE-double arithmetic — deterministic
across machines), chroma upsampling (4:4:4 / 4:2:2 / 4:2:0), YCbCr→RGB.

Scope: baseline sequential SOF0 only, 8-bit samples, 1 or 3 components.
Progressive (SOF2), arithmetic coding, and 12-bit inputs raise
``ValueError`` — they are parsed far enough to be identified, never
silently mis-decoded. This completes the multimodal column's pixel path:
no native imaging library is required for PNG *or* baseline JPEG.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# IDCT basis: c(u)/2 * cos((2x+1)u*pi/16); precomputed doubles.
_IDCT_TABLE = [
    [(math.sqrt(0.5) if u == 0 else 1.0) * 0.5
     * math.cos((2 * x + 1) * u * math.pi / 16)
     for u in range(8)] for x in range(8)
]


class _HuffTable:
    """Canonical JPEG Huffman table: (code length histogram, symbols) →
    fast (length, code) → symbol lookup."""

    def __init__(self, counts: List[int], symbols: List[int]) -> None:
        self.lut: Dict[Tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at markers (restart markers are consumed by the
    decoder loop)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        # drop already-consumed high bits — without this the buffer int
        # grows with the stream and every shift turns O(n)
        self.bits &= (1 << self.nbits) - 1
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # pad with 1-bits past the end (spec: decoder may pad)
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
                if nxt == 0x00:
                    self.pos += 2          # stuffed 0xFF data byte
                elif 0xD0 <= nxt <= 0xD7:
                    break                  # restart marker: caller handles
                else:
                    break                  # EOI / next segment
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise ValueError("JPEG: entropy data ended at a marker")
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Discard partial byte and consume one RSTn marker."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: expected restart marker")

    def decode_huffman(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_2d(coeffs: List[float]) -> List[float]:
    """Separable 8×8 inverse DCT (rows then columns)."""
    tmp = [0.0] * 64
    for y in range(8):
        row = coeffs[y * 8:(y + 1) * 8]
        for x in range(8):
            tx = _IDCT_TABLE[x]
            tmp[y * 8 + x] = sum(tx[u] * row[u] for u in range(8))
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            ty = _IDCT_TABLE[y]
            out[y * 8 + x] = sum(ty[v] * col[v] for v in range(8))
    return out


def decode_jpeg_pixels(b: bytes):
    """Decode a baseline JPEG to ``(width, height, channels, pixel_bytes)``
    (row-major, interleaved, 8-bit) or ``None`` if not a JPEG. Raises
    ``ValueError`` for progressive/arithmetic/12-bit streams and
    malformed entropy data."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    qt: Dict[int, List[int]] = {}
    huff_dc: Dict[int, _HuffTable] = {}
    huff_ac: Dict[int, _HuffTable] = {}
    frame = None        # (precision, h, w, comps) comps: (cid, hs, vs, tq)
    restart_interval = 0
    i = 2
    scan = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = int.from_bytes(b[i + 2:i + 4], "big")
        seg = b[i + 4:i + 2 + seg_len]
        if marker == 0xDB:                       # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                qt[tq] = list(seg[p + 1:p + 65])
                p += 65
        elif marker == 0xC4:                     # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1:p + 17])
                n = sum(counts)
                syms = list(seg[p + 17:p + 17 + n])
                tbl = _HuffTable(counts, syms)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
                p += 17 + n
        elif marker == 0xC0:                     # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: non-baseline frame marker 0xFF{marker:02X} "
                "(progressive/extended/arithmetic) unsupported"
            )
        elif marker == 0xDD:                     # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:                     # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tt >> 4, tt & 15))
            scan = (scan_comps, i + 2 + seg_len)
            break
        i += 2 + seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG: missing SOF0/SOS")
    height, width, comps = frame
    scan_comps, data_pos = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    # per-component sample planes at full MCU-grid resolution
    planes = []
    for cid, hs, vs, tq in comps:
        pw, ph = mcus_x * hs * 8, mcus_y * vs * 8
        planes.append(bytearray(pw * ph))

    scan_map = {cs: (td, ta) for cs, td, ta in scan_comps}
    reader = _BitReader(b, data_pos)
    dc_pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_restart()
                dc_pred = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = scan_map[cid]
                dct = huff_dc.get(td)
                act = huff_ac.get(ta)
                if dct is None or act is None:
                    raise ValueError("JPEG: missing Huffman table")
                q = qt.get(tq)
                if q is None:
                    raise ValueError("JPEG: missing quant table")
                for by in range(vs):
                    for bx in range(hs):
                        # --- decode one 8×8 block ---
                        t = reader.decode_huffman(dct)
                        diff = _extend(reader.read_bits(t), t)
                        dc_pred[ci] += diff
                        zz = [0] * 64
                        zz[0] = dc_pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huffman(act)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16      # ZRL
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            zz[k] = _extend(reader.read_bits(s), s) * q[k]
                            k += 1
                        coeffs = [0.0] * 64
                        for idx in range(64):
                            coeffs[ZIGZAG[idx]] = float(zz[idx])
                        spatial = _idct_2d(coeffs)
                        # place block into the component plane
                        plane = planes[ci]
                        pw = mcus_x * hs * 8
                        ox = (mx * hs + bx) * 8
                        oy = (my * vs + by) * 8
                        for yy in range(8):
                            base = (oy + yy) * pw + ox
                            row = spatial[yy * 8:(yy + 1) * 8]
                            for xx in range(8):
                                v = int(round(row[xx])) + 128
                                plane[base + xx] = 0 if v < 0 else (
                                    255 if v > 255 else v)
            mcu_count += 1

    # assemble output: upsample chroma to full res, convert color space
    nch = len(comps)
    if nch == 1:
        _, hs, vs, _ = comps[0][0], comps[0][1], comps[0][2], comps[0][3]
        pw = mcus_x * comps[0][1] * 8
        out = bytearray(width * height)
        for y in range(height):
            out[y * width:(y + 1) * width] = planes[0][y * pw:y * pw + width]
        return width, height, 1, bytes(out)
    if nch != 3:
        raise ValueError(f"JPEG: {nch}-component images unsupported")

    def sample(ci: int, x: int, y: int) -> int:
        _cid, hs, vs, _tq = comps[ci]
        pw = mcus_x * hs * 8
        sx = x * hs // hmax
        sy = y * vs // vmax
        return planes[ci][sy * pw + sx]

    out = bytearray(width * height * 3)
    for y in range(height):
        for x in range(width):
            Y = sample(0, x, y)
            cb = sample(1, x, y) - 128
            cr = sample(2, x, y) - 128
            r = int(round(Y + 1.402 * cr))
            g = int(round(Y - 0.344136 * cb - 0.714136 * cr))
            bl = int(round(Y + 1.772 * cb))
            off = (y * width + x) * 3
            out[off] = min(255, max(0, r))
            out[off + 1] = min(255, max(0, g))
            out[off + 2] = min(255, max(0, bl))
    return width, height, 3, bytes(out)

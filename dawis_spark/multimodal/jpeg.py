"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) decode + minimal encode.

Stdlib parsing + numpy for the 8x8 block transforms — no codec library.
Supports the baseline sequential DCT process: SOF0 frames, 8-bit samples,
1 or 3 components, arbitrary h/v sampling factors (4:4:4, 4:2:2, 4:2:0),
restart intervals, multiple DQT/DHT segments. Progressive (SOF2),
arithmetic coding, and 12-bit samples raise ValueError.

The encoder exists for deterministic test/corpus synthesis (the same role
``codecs.encode_png`` plays): 4:4:4 or 4:2:0 chroma, Annex K quantization
and Huffman tables. Decode(encode(x)) is lossy by design; tests assert
channel means within quantization error, not bit equality.

Reference behavior only (format spec is public); no reference-repo
counterpart — dawis has no media path at all.
"""

from __future__ import annotations

import struct

import numpy as np

# --- zigzag order (T.81 Figure A.6) ---------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)

# --- Annex K.1 quantization tables (luminance / chrominance) --------------

QTAB_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
QTAB_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# --- Annex K.3 Huffman table specs: (bits[1..16], huffval) ----------------

DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# --- orthonormal 8x8 DCT-II basis (used forward by encode, inverse by
# decode: IDCT = C.T @ X @ C with this C) ----------------------------------


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    c = np.cos((2 * n + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    c[0, :] = np.sqrt(1 / 8)
    return c


_C = _dct_matrix()


# --- Huffman code generation (T.81 Annex C) -------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length); canonical JPEG code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for MSB-first sequential decode."""
    return {
        (length, code): val
        for val, (code, length) in _build_codes(bits, vals).items()
    }


# --- bit I/O with 0xFF00 stuffing -----------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG entropy data")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn inside _fill = caller bug
                raise ValueError("unexpected restart marker in entropy data")
            else:
                # EOI or next segment reached with bits still requested:
                # pad with 1-bits per T.81 F.2.2.5 (trailing-bit convention)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial byte; if positioned at a marker, consume and
        return its second byte."""
        self.nbits = 0
        self.bitbuf = 0
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] != 0:
            m = d[self.pos + 1]
            self.pos += 2
            return m
        return None


def _decode_huff(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code in entropy data")


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 EXTEND: map n-bit magnitude to signed coefficient."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


# --- decoder --------------------------------------------------------------


def decode_jpeg(payload: bytes) -> list[float]:
    """Baseline JPEG -> [width, height, mean_r, mean_g, mean_b].

    Grayscale reports the luma mean on all three channels. Means are
    computed over the image crop (the h x w region; MCU padding rows and
    columns excluded)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    i += 64
                else:
                    tab = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(
                        np.int32
                    )
                    i += 128
                qtabs[tq] = tab
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 (baseline / ext. sequential)
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG sample precision: {prec}")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG is supported")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_decode_table(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            if ns != len(frame[2]):
                # Legal per T.81 but we only implement the single interleaved
                # scan; decoding a partial scan here would leave the remaining
                # planes zero and misplace blocks — fail loudly instead.
                raise ValueError(
                    "non-interleaved / multi-scan baseline JPEG is unsupported"
                )
            scan = []  # (comp_idx, dc_table, ac_table)
            comp_by_id = {c[0]: idx for idx, c in enumerate(frame[2])}
            for s in range(ns):
                cs, tt = seg[1 + 2 * s], seg[2 + 2 * s]
                scan.append((comp_by_id[cs], dc_tabs[tt >> 4], ac_tabs[tt & 0x0F]))
            return _decode_scan(
                payload,
                pos + 2 + seglen,
                frame,
                qtabs,
                scan,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("no SOS segment found")


def _decode_scan(payload, pos, frame, qtabs, scan, restart_interval):
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for cid, hs, vs, tq in comps:
        planes.append(
            np.zeros((mcuy * vs * 8, mcux * hs * 8), dtype=np.float64)
        )
    br = _BitReader(payload, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = br.align_to_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("missing restart marker")
                pred = [0] * len(comps)
            for ci, dc_tab, ac_tab in scan:
                cid, hs, vs, tq = comps[ci]
                q = qtabs[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _decode_huff(br, dc_tab)
                        diff = _extend(br.receive(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL: sixteen zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q
                        px = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample to full resolution, crop, color-convert, means
    full = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(np.clip(up[:fh, :fw], 0.0, 255.0))
    if len(full) == 1:
        m = float(full[0].mean()) if fh and fw else 0.0
        return [float(fw), float(fh), m, m, m]
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = np.clip(y + 1.402 * cr, 0.0, 255.0)
    g = np.clip(y - 0.344136 * cb - 0.714136 * cr, 0.0, 255.0)
    b = np.clip(y + 1.772 * cb, 0.0, 255.0)
    if fh == 0 or fw == 0:
        return [float(fw), float(fh), 0.0, 0.0, 0.0]
    return [
        float(fw),
        float(fh),
        float(r.mean()),
        float(g.mean()),
        float(b.mean()),
    ]


# --- encoder (test/corpus synthesis) --------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (ssss bit length, magnitude bits per F.1.2.1.1)."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(bw, zz, pred, dc_codes, ac_codes):
    diff = int(zz[0]) - pred
    s, bits = _magnitude(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(bits, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(bits, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    subsample: tuple[int, int] = (1, 1),
) -> bytes:
    """Minimal baseline JPEG encoder: flat RGB bytes -> SOI..EOI stream.

    ``subsample=(2, 2)`` emits 4:2:0 chroma (2x2 box-filtered), (1, 1)
    emits 4:4:4. Annex K quantization + Huffman tables, no APP segments,
    no restart intervals."""
    sh, sv = subsample
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("subsample factors must be 1 or 2")
    rgb = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def _pad(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
        ph = -plane.shape[0] % mult_y
        pw = -plane.shape[1] % mult_x
        return np.pad(plane, ((0, ph), (0, pw)), mode="edge")

    # luma grid is sh x sv blocks per MCU; chroma one block per MCU
    y_p = _pad(y, 8 * sv, 8 * sh)
    if (sh, sv) != (1, 1):
        cbp = _pad(cb, 2 * sv * 4, 2 * sh * 4)
        crp = _pad(cr, 2 * sv * 4, 2 * sh * 4)
        cb_s = cbp.reshape(cbp.shape[0] // sv, sv, cbp.shape[1] // sh, sh).mean(
            axis=(1, 3)
        )
        cr_s = crp.reshape(crp.shape[0] // sv, sv, crp.shape[1] // sh, sh).mean(
            axis=(1, 3)
        )
        cb_s = _pad(cb_s, 8, 8)
        cr_s = _pad(cr_s, 8, 8)
    else:
        cb_s = _pad(cb, 8, 8)
        cr_s = _pad(cr, 8, 8)

    dc_lum = _build_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _build_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr = _build_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_chr = _build_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    def _block_zz(plane, y0, x0, qtab):
        blk = plane[y0 : y0 + 8, x0 : x0 + 8] - 128.0
        coef = _C @ blk @ _C.T
        zz = np.round(coef.reshape(64)[ZIGZAG] / qtab[ZIGZAG])
        return zz.astype(np.int64)

    bw = _BitWriter()
    mcux = y_p.shape[1] // (8 * sh)
    mcuy = y_p.shape[0] // (8 * sv)
    pred = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(sv):
                for bx in range(sh):
                    zz = _block_zz(
                        y_p, (my * sv + by) * 8, (mx * sh + bx) * 8, QTAB_LUM
                    )
                    pred[0] = _encode_block(bw, zz, pred[0], dc_lum, ac_lum)
            for ci, plane in ((1, cb_s), (2, cr_s)):
                zz = _block_zz(plane, my * 8, mx * 8, QTAB_CHROM)
                pred[ci] = _encode_block(bw, zz, pred[ci], dc_chr, ac_chr)
    bw.flush()

    def _seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def _dqt(tq: int, tab: np.ndarray) -> bytes:
        return _seg(0xDB, bytes([tq]) + bytes(int(tab[z]) for z in ZIGZAG))

    def _dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    sof = _seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, (sh << 4) | sv, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + _dqt(0, QTAB_LUM)
        + _dqt(1, QTAB_CHROM)
        + sof
        + _dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
        + _dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
        + _dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        + _dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
        + sos
        + bytes(bw.out)
        + b"\xff\xd9"
    )

"""Baseline-sequential JPEG codec in pure numpy + stdlib (SURVEY §2 multimodal;
VERDICT r7 item 4) — no imaging library in this container, so the codec itself
is implemented: FDCT/IDCT, quantization, zigzag, differential DC, run-length
AC, canonical Huffman entropy coding with tables transmitted in DHT, byte
stuffing, and the marker grammar (SOI/DQT/SOF0/DHT/SOS/EOI). Both grayscale
(1 component) and full-resolution YCbCr color (3 components, 1×1 sampling)
are supported; progressive (SOF2), subsampling, and restart intervals are
out of scope and rejected with a clear error.

Everything here is from the public JPEG specification (ITU-T T.81): the
zigzag scan, the DCT definition (the JPEG FDCT **is** the orthonormal 2-D
DCT-II for N=8 — identical 1/8 and 1/4 normalization factors), magnitude
categories, and the DHT BITS/HUFFVAL canonical-code construction. The
Huffman tables are generated (fixed-length canonical codes — 4-bit DC,
8-bit AC) rather than copied from Annex K: baseline JPEG transmits its
tables in the stream, so any canonical table is a fully valid file; the
decoder builds its codes from the DHT segment exactly as a foreign decoder
would.

Determinism contract (suite oracle): a FLAT 8×8 block with an all-ones
quantization table round-trips EXACTLY — its DCT is one integer DC
coefficient (8·(v−128)) plus ACs within 1e-12 of zero, so quantize-round
and the float IDCT both land within 1e-12 of exact integers and the final
round reproduces every input pixel bit-for-bit. That makes decoded pixel
sums an analytic function DuckDB can compute without seeing a JPEG byte
(same strategy as the PPM/PNG decoders in :mod:`.multimodal`).

Reference parity: the reference engine has no image codec; this extends its
binary-column surface the way a 100 TB training-data pipeline needs
(decode → feature-extract as Arrow-batched partition work, never driver-side).
"""

from __future__ import annotations

import struct

import numpy as np

from ..errors import DecodeError

# ---------------------------------------------------------------------------
# constants: zigzag, DCT matrix, canonical Huffman specs
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    """Standard JPEG zigzag scan: (row, col) index pairs in scan order."""
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(7, s) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            out.append((r, s - r))
    return np.array([r * 8 + c for r, c in out], dtype=np.int64)


ZIGZAG = _zigzag_order()           # block-scan index for zigzag position k
UNZIGZAG = np.argsort(ZIGZAG)      # zigzag position for block-scan index


def _dct_matrix() -> np.ndarray:
    """Orthonormal 1-D DCT-II matrix for N=8; the JPEG FDCT equals
    ``A @ block @ A.T`` (T.81 A.3.3 — the 1/4·C(u)C(v) factors match the
    orthonormal normalization exactly)."""
    a = np.zeros((8, 8))
    for u in range(8):
        alpha = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = alpha * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_matrix()

#: DC symbols = magnitude categories 0..11 (T.81 F.1.2.1.2, 8-bit precision)
_DC_SYMBOLS = list(range(12))
#: AC symbols = EOB, ZRL, and (run<<4)|size for run 0..15, size 1..10
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_CODE_LEN = 4   # 12 codes of length 4 (≤ 2^4, incomplete tree — valid)
_AC_CODE_LEN = 8   # 162 codes of length 8 (≤ 2^8, incomplete tree — valid)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C code generation: BITS (count of codes per length 1..16) +
    HUFFVAL (symbols in code order) → {symbol: (code, length)}."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _fixed_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    """BITS/HUFFVAL for an all-same-length canonical table."""
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


_DC_BITS, _DC_VALS = _fixed_table(_DC_SYMBOLS, _DC_CODE_LEN)
_AC_BITS, _AC_VALS = _fixed_table(_AC_SYMBOLS, _AC_CODE_LEN)
_ENC_DC = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC = _canonical_codes(_AC_BITS, _AC_VALS)

FLAT_QUANT = np.ones(64, dtype=np.uint16)  # zigzag order; lossless for our use


# ---------------------------------------------------------------------------
# bit-level I/O with JPEG byte stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.write(0xFF, 8 - self._n)  # pad final byte with 1-bits
        return bytes(self.out)


class _HuffTable:
    """Decoder-side canonical table: (code, length) → symbol, plus the
    sorted distinct code lengths for length-stepped probing."""

    def __init__(self, codes: dict[int, tuple[int, int]]):
        self.codes = {(code, length): sym for sym, (code, length) in codes.items()}
        self.lengths = sorted({length for _, length in codes.values()})


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise DecodeError("jpeg: entropy stream truncated")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise DecodeError("jpeg: truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise DecodeError(
                    f"jpeg: unexpected marker 0xFF{nxt:02X} inside scan "
                    f"(restart intervals are not supported)"
                )
        self._acc = (self._acc << 8) | byte
        self._n += 8

    def bits(self, n: int) -> int:
        while self._n < n:
            self._fill()
        self._n -= n
        val = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return val

    def huffman(self, table: "_HuffTable") -> int:
        # length-stepped probe: read bits only at code lengths that exist in
        # the table (one probe for the fixed-length tables this encoder
        # emits; ≤16 worst-case for arbitrary DHT tables)
        code, length = 0, 0
        for nxt in table.lengths:
            code = (code << (nxt - length)) | self.bits(nxt - length)
            length = nxt
            sym = table.codes.get((code, length))
            if sym is not None:
                return sym
        raise DecodeError("jpeg: invalid Huffman code in scan")


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient
    (T.81 F.1.2.1: negative values are stored as v + 2^size − 1)."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ---------------------------------------------------------------------------
# color transform (full-range BT.601, T.871) — deterministic HALF_UP rounding
# ---------------------------------------------------------------------------


def _round_half_up(x: np.ndarray) -> np.ndarray:
    return np.floor(x + 0.5)


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.clip(_round_half_up(np.stack([y, cb, cr], axis=-1)), 0, 255).astype(
        np.uint8
    )


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    cb, cr = cb - 128.0, cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(_round_half_up(np.stack([r, g, b], axis=-1)), 0, 255).astype(
        np.uint8
    )


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _blockify(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Edge-replicate to 8-multiples and split into (n_by, n_bx, 8, 8)."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    blocks = plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
    return blocks.astype(np.float64), hh // 8, ww // 8


def _fdct_quant(blocks: np.ndarray, quant_zz: np.ndarray) -> np.ndarray:
    """(n, 8, 8) pixel blocks → (n, 64) quantized coefficients in ZIGZAG order."""
    shifted = blocks - 128.0
    coef = _A @ shifted @ _A.T  # batched matmul over (n, 8, 8)
    q = quant_zz[UNZIGZAG].reshape(8, 8).astype(np.float64)
    quantized = np.round(coef / q).astype(np.int64)
    return quantized.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(writer: _BitWriter, zz: np.ndarray, pred: int) -> int:
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred)
    code, length = _ENC_DC[size]
    writer.write(code, length)
    if size:
        writer.write(bits, size)
    # O(nnz) AC pass: jump between nonzero coefficients instead of scanning
    # all 63 slots — flat/sparse blocks (the common training-data payload)
    # cost one numpy call + EOB
    nz = np.nonzero(zz[1:])[0]
    prev_k = 0
    for k in nz + 1:
        run = k - prev_k - 1
        while run >= 16:
            zc, zl = _ENC_AC[0xF0]  # ZRL
            writer.write(zc, zl)
            run -= 16
        size, bits = _magnitude(int(zz[k]))
        if size > 10:
            raise DecodeError(f"jpeg: AC coefficient {int(zz[k])} out of baseline range")
        code, length = _ENC_AC[(run << 4) | size]
        writer.write(code, length)
        writer.write(bits, size)
        prev_k = k
    if prev_k != 63:
        ec, el = _ENC_AC[0x00]  # EOB
        writer.write(ec, el)
    return dc


def _dqt(table_id: int, quant_zz: np.ndarray) -> bytes:
    return struct.pack(">HHB", 0xFFDB, 67, table_id) + bytes(
        int(q) for q in quant_zz
    )


def _dht(cls: int, table_id: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([cls << 4 | table_id]) + bytes(bits) + bytes(vals)
    return struct.pack(">HH", 0xFFC4, 2 + len(payload)) + payload


def encode_baseline_jpeg(
    pixels: np.ndarray, quant: np.ndarray | None = None
) -> bytes:
    """Encode a (h, w) grayscale or (h, w, 3) RGB uint8 array as a baseline
    sequential JPEG (SOF0, 1×1 sampling, tables in-stream). ``quant`` is a
    64-entry zigzag-order quantization table (default all-ones — visually
    lossless and EXACT for flat blocks, see module docstring)."""
    quant_zz = (FLAT_QUANT if quant is None else np.asarray(quant)).astype(np.uint16)
    if pixels.ndim == 2:
        planes = [pixels]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        ycc = rgb_to_ycbcr(pixels)
        planes = [ycc[..., i] for i in range(3)]
    else:
        raise DecodeError(f"jpeg: unsupported pixel shape {pixels.shape}")
    h, w = pixels.shape[:2]
    ncomp = len(planes)

    comp_blocks = []
    for plane in planes:
        blocks, n_by, n_bx = _blockify(plane)
        comp_blocks.append(_fdct_quant(blocks.reshape(-1, 8, 8), quant_zz))

    out = bytearray(b"\xff\xd8")  # SOI
    out += _dqt(0, quant_zz)
    sof = struct.pack(">HHBHHB", 0xFFC0, 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        sof += bytes([cid, 0x11, 0])  # 1×1 sampling, quant table 0
    out += sof
    out += _dht(0, 0, _DC_BITS, _DC_VALS)
    out += _dht(1, 0, _AC_BITS, _AC_VALS)
    sos = struct.pack(">HHB", 0xFFDA, 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al
    out += sos

    writer = _BitWriter()
    preds = [0] * ncomp
    for b in range(n_by * n_bx):  # interleaved MCUs, one block per component
        for c in range(ncomp):
            preds[c] = _encode_block(writer, comp_blocks[c][b], preds[c])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG (SOF0, 1×1 sampling) to a uint8
    array: (h, w) for grayscale, (h, w, 3) RGB for 3-component (YCbCr
    inverted with the T.871 full-range transform). Rejects progressive
    scans, subsampling, and restart intervals with :class:`DecodeError`."""
    if data[:2] != b"\xff\xd8":
        raise DecodeError("jpeg: missing SOI marker")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan_comps = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise DecodeError(f"jpeg: expected marker at offset {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM / RSTn: no payload
            continue
        if pos + 2 > len(data):
            raise DecodeError("jpeg: truncated marker segment header")
        (seglen,) = struct.unpack_from(">H", data, pos)
        if pos + seglen > len(data):
            raise DecodeError(
                f"jpeg: segment 0xFF{marker:02X} claims {seglen} bytes but "
                f"only {len(data) - pos} remain"
            )
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise DecodeError("jpeg: 16-bit quant tables unsupported")
                quant[tq] = np.frombuffer(
                    seg, dtype=np.uint8, count=64, offset=off + 1
                ).astype(np.int64)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                cls, tid = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(seg[off + 17 : off + 17 + nvals])
                if len(bits) != 16 or len(vals) != nvals:
                    raise DecodeError("jpeg: truncated DHT segment")
                huff[(cls, tid)] = _HuffTable(_canonical_codes(bits, vals))
                off += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise DecodeError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise DecodeError(
                        "jpeg: chroma subsampling unsupported (1x1 only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise DecodeError(
                f"jpeg: non-baseline frame 0xFF{marker:02X} unsupported "
                f"(progressive/extended/lossless)"
            )
        elif marker == 0xDD:
            raise DecodeError("jpeg: restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS: entropy data follows the segment
            ns = seg[0]
            scan_comps = [(seg[1 + 2 * i], seg[2 + 2 * i]) for i in range(ns)]
            break
        # APPn / COM / others: skipped

    if frame is None or scan_comps is None:
        raise DecodeError("jpeg: missing SOF0 or SOS")
    h, w, comps = frame
    ncomp = len(comps)
    n_by, n_bx = -(-h // 8), -(-w // 8)
    nblocks = n_by * n_bx

    reader = _BitReader(data, pos)
    coefs = [np.zeros((nblocks, 64), dtype=np.int64) for _ in range(ncomp)]
    preds = [0] * ncomp
    tables = []
    for (_cid, tsel) in scan_comps:
        dc_t, ac_t = tsel >> 4, tsel & 0xF
        if (0, dc_t) not in huff or (1, ac_t) not in huff:
            raise DecodeError("jpeg: scan references an undefined Huffman table")
        tables.append((huff[(0, dc_t)], huff[(1, ac_t)]))

    for b in range(nblocks):
        for c in range(ncomp):
            dc_lookup, ac_lookup = tables[c]
            size = reader.huffman(dc_lookup)
            diff = _extend(reader.bits(size), size) if size else 0
            preds[c] += diff
            coefs[c][b, 0] = preds[c]
            k = 1
            while k < 64:
                sym = reader.huffman(ac_lookup)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise DecodeError("jpeg: AC run overflows the block")
                coefs[c][b, k] = _extend(reader.bits(size), size)
                k += 1

    planes = []
    for c, (_cid, tq) in enumerate(comps):
        if tq not in quant:
            raise DecodeError(f"jpeg: missing quant table {tq}")
        deq = (coefs[c] * quant[tq]).astype(np.float64)
        full = np.zeros((nblocks, 64))
        full[:, ZIGZAG] = deq
        full = full.reshape(nblocks, 8, 8)
        px = _A.T @ full @ _A + 128.0  # batched IDCT over (n, 8, 8)
        px = np.clip(_round_half_up(px), 0, 255).astype(np.uint8)
        plane = (
            px.reshape(n_by, n_bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(n_by * 8, n_bx * 8)[:h, :w]
        )
        planes.append(plane)

    if ncomp == 1:
        return planes[0]
    if ncomp == 3:
        return ycbcr_to_rgb(np.stack(planes, axis=-1))
    raise DecodeError(f"jpeg: {ncomp}-component images unsupported")

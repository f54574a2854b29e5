"""H.264/AVC intra + single-reference P codec — pure Python, no codec
library.

The third REAL video path (r13) and the one VERDICT r12 named as the
top decode miss: ITU-T Rec. H.264 (ISO/IEC 14496-10) is a public
specification, and the Baseline-profile *intra-only* subset — Annex B
byte streams, CAVLC entropy coding, I_4x4 / I_16x16 / I_PCM
macroblocks, the 4x4 integer transform with the luma-DC Hadamard and
2x2 chroma-DC stages — is fully invertible integer arithmetic, so the
repo's forward-encoder pinning discipline applies EXACTLY: the
decoder's output must equal, bit for bit, the reconstruction the
independent forward encoder computed while emitting the stream (both
sides predict from reconstructed neighbours, per the spec).

r14 (VERDICT r13 #7) adds the single-reference P-slice subset — the
shape of most real web-video GOPs (IDR + P...): P_Skip with its MV
inference (8.4.1.1), P_L0_16x16 / 16x8 / 8x16 partitions with the
median MV predictor and its directional shortcuts (8.4.1.3),
quarter-pel luma MC (6-tap halves + averaged quarters, 8.4.2.2.1),
eighth-pel bilinear chroma MC, unrestricted MVs (edge clamping),
intra-in-P macroblocks (mb_type offset 5), the inter CBP me(v)
mapping, mb_skip_run syntax, and the full inter deblock bS ladder
(4/3/2/1/0 per 4-sample edge segment, 8.7.2.1). The DPB is a single
entry (the previous reference picture); P_8x8/P_8x8ref0 decode with
all four sub-partition shapes (8x8/8x4/4x8/4x4, decode-order
neighbour availability for the sub-partition MV predictor).
Multi-reference streams, list reordering, MMCO adaptive marking,
weighted prediction and B slices return None — honest rejection,
never approximated pixels.

Decoder surface (``_h264_frames``): Annex B start-code scan with
emulation-prevention removal, exp-Golomb SPS/PPS parsing (profiles
66/77/88 — High-profile streams with their extra SPS syntax reject
honestly), IDR I-slices with CAVLC (entropy_coding_mode_flag == 0),
single slice group, frame_mbs_only; per-macroblock: mb_type, intra
prediction (all nine 4x4 modes, four 16x16 modes, four chroma modes
with the per-quadrant DC rules), coded_block_pattern via the intra
me(v) mapping, mb_qp_delta tracking, CAVLC residual decode
(coeff_token in all five nC contexts, trailing-one signs, adaptive
suffix-length levels, total_zeros, run_before), dequantisation, the
inverse transforms, and the in-loop deblocking filter (8.7 — bS 4/3
strong+normal edges with the alpha/beta/tc0 threshold tables and
slice-level offsets; intra prediction reads unfiltered samples, the
output is filtered, per the spec). Pictures may span multiple
slices (raster order): prediction, CAVLC contexts, the mode
predictor and (r14) the MV predictor honour slice independence, and
idc 2 keeps slice-boundary edges unfiltered. B slices, CABAC, MBAFF,
FMO/ASO and High-profile tools return None — honest rejection, never
approximated pixels.

Forward ``_h264_build`` emits spec-syntax Annex B bytes over RGB
frames: an SPS with real frame cropping, a PPS, one IDR slice per
frame, and a deterministic per-macroblock mode plan that cycles
I_PCM, I_16x16 (DC / V / H / Plane) and I_4x4 (all nine modes where
available) with varying mb_qp_delta — so the pin exercises every
prediction mode, both transform chains and all CAVLC contexts.
``gop=N`` (r14) interleaves P pictures whose plan cycles P_Skip,
zero-MV, every quarter-pel fractional position, out-of-frame MVs,
16x8/8x16 partitions, intra-in-P and qp-delta macroblocks
(``_encode_p_picture``).

The CAVLC code tables (Tables 9-5, 9-7..9-10) are transcribed spec
constants shared by both directions — they ARE the format, like the
JPEG zigzag or the FLAC rice layout; tests assert each table is
prefix-free and Kraft-consistent, and the per-(tc,t1) round-trip
battery exercises every coeff_token row. YCbCr<->RGB uses the
full-range JFIF matrix, the documented repo-wide convention (the
elementary stream carries no VUI colour signalling either way).

Decode-bomb guard: picture dimensions are capped before any plane
allocation (``_MAX_MBS``); corrupt streams (bad VLC codes, truncated
NALs, out-of-range deltas, impossible CBPs) return None, never raise.

Reference parity note: the reference pipeline treats media as opaque
bytes (src/wiki_pipeline.py); frame decode is an engine extension in
the same family as decode_image_pixels / sample_avi_frames.
"""

from __future__ import annotations

import struct

import numpy as np

# picture-size ceiling: 1<<22 luma samples (~4 MP) keeps every plane
# allocation bounded the way _MAX_DECODE_PIXELS does for images
_MAX_MBS = (1 << 22) // 256


# ---------------------------------------------------------------------------
# bit I/O (MSB-first, the NAL RBSP order) + exp-Golomb
# ---------------------------------------------------------------------------


class _Bits:
    """MSB-first bit reader over an RBSP (emulation already removed).

    Raises EOFError past the end — callers catch and return None.
    """

    __slots__ = ("buf", "pos", "n")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position
        self.n = len(buf) * 8

    def u(self, k: int) -> int:
        if k == 0:
            return 0
        if self.pos + k > self.n:
            raise EOFError
        v = 0
        pos = self.pos
        buf = self.buf
        end = pos + k
        # byte-at-a-time fill
        first = pos >> 3
        last = (end - 1) >> 3
        chunk = int.from_bytes(buf[first : last + 1], "big")
        total = (last + 1 - first) * 8
        v = (chunk >> (total - (end - (first << 3)))) & ((1 << k) - 1)
        self.pos = end
        return v

    def flag(self) -> int:
        return self.u(1)

    def ue(self) -> int:
        # count leading zeros
        zeros = 0
        while True:
            if self.pos >= self.n:
                raise EOFError
            if (self.buf[self.pos >> 3] >> (7 - (self.pos & 7))) & 1:
                self.pos += 1
                break
            zeros += 1
            self.pos += 1
            if zeros > 31:  # bomb guard: no legal syntax element needs more
                raise EOFError
        if zeros == 0:
            return 0
        return (1 << zeros) - 1 + self.u(zeros)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if (k & 1) else -(k >> 1)

    def more_rbsp_data(self) -> bool:
        # true if any bit beyond pos, excluding the rbsp_stop_one_bit
        # and its trailing zeros
        if self.pos >= self.n:
            return False
        # find last set bit in the buffer
        last = self.n - 1
        while last >= 0:
            if (self.buf[last >> 3] >> (7 - (last & 7))) & 1:
                break
            last -= 1
        return self.pos < last


class _BitW:
    """MSB-first bit writer (encoder side)."""

    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def u(self, value: int, k: int) -> None:
        if k == 0:
            return
        self.acc = (self.acc << k) | (value & ((1 << k) - 1))
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bits(self, s: str) -> None:
        for ch in s:
            self.u(1 if ch == "1" else 0, 1)

    def ue(self, v: int) -> None:
        v += 1
        nb = v.bit_length()
        self.u(0, nb - 1)
        self.u(v, nb)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> None:
        self.u(1, 1)
        if self.nbits:
            self.u(0, 8 - self.nbits)

    def byte_align_zero(self) -> None:
        if self.nbits:
            self.u(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# NAL framing (Annex B)
# ---------------------------------------------------------------------------


def _ebsp_to_rbsp(data: bytes) -> bytes:
    """Remove emulation-prevention bytes (00 00 03 -> 00 00)."""
    if b"\x00\x00\x03" not in data:
        return data
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        if i + 2 < n and data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 3:
            out += data[i : i + 2]
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def _rbsp_to_ebsp(data: bytes) -> bytes:
    """Insert emulation-prevention bytes wherever 00 00 0x (x<=3)."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _split_nals(payload: bytes):
    """Annex B start-code scan -> [(nal_type, nal_ref_idc, rbsp)]."""
    nals = []
    n = len(payload)
    i = payload.find(b"\x00\x00\x01")
    if i < 0:
        return None
    while i >= 0:
        start = i + 3
        nxt = payload.find(b"\x00\x00\x01", start)
        end = nxt if nxt >= 0 else n
        # trailing zeros before the next start code belong to it
        seg_end = end
        while seg_end > start and nxt >= 0 and payload[seg_end - 1] == 0:
            seg_end -= 1
        seg = payload[start:seg_end]
        if seg:
            hdr = seg[0]
            if hdr & 0x80:  # forbidden_zero_bit
                return None
            nals.append(((hdr >> 0) & 0x1F, (hdr >> 5) & 3, _ebsp_to_rbsp(seg[1:])))
        i = nxt
    return nals or None


def _wrap_nal(nal_type: int, nal_ref_idc: int, rbsp: bytes) -> bytes:
    return (
        b"\x00\x00\x00\x01"
        + bytes(((nal_ref_idc << 5) | nal_type,))
        + _rbsp_to_ebsp(rbsp)
    )


# ---------------------------------------------------------------------------
# CAVLC code tables (ITU-T H.264 Tables 9-5, 9-7..9-10, 9-4) — transcribed
# spec constants, shared by both directions (they ARE the format; tests
# assert prefix-freeness and Kraft-completeness per context)
# ---------------------------------------------------------------------------

# Table 9-5 coeff_token: _COEFF_TOKEN[ctx][(total_coeff, trailing_ones)]
# ctx 0: 0 <= nC < 2 ; ctx 1: 2 <= nC < 4 ; ctx 2: 4 <= nC < 8 ;
# chroma DC (nC == -1) is _COEFF_TOKEN_CDC; nC >= 8 is a 6-bit FLC.
def _ct(rows):
    table = {}
    for tc, codes in enumerate(rows):
        for t1, code in enumerate(codes):
            if code:
                table[(tc, t1)] = code
    return table


_COEFF_TOKEN = (
    _ct([
        ("1",),
        ("000101", "01"),
        ("00000111", "000100", "001"),
        ("000000111", "00000110", "0000101", "00011"),
        ("0000000111", "000000110", "00000101", "000011"),
        ("00000000111", "0000000110", "000000101", "0000100"),
        ("0000000001111", "00000000110", "0000000101", "00000100"),
        ("0000000001011", "0000000001110", "00000000101", "000000100"),
        ("0000000001000", "0000000001010", "0000000001101", "0000000100"),
        ("00000000001111", "00000000001110", "0000000001001", "00000000100"),
        ("00000000001011", "00000000001010", "00000000001101", "0000000001100"),
        ("000000000001111", "000000000001110", "00000000001001", "00000000001100"),
        ("000000000001011", "000000000001010", "000000000001101", "00000000001000"),
        ("0000000000001111", "000000000000001", "000000000001001", "000000000001100"),
        ("0000000000001011", "0000000000001110", "0000000000001101", "000000000001000"),
        ("0000000000000111", "0000000000001010", "0000000000001001", "0000000000001100"),
        ("0000000000000100", "0000000000000110", "0000000000000101", "0000000000001000"),
    ]),
    _ct([
        ("11",),
        ("001011", "10"),
        ("000111", "00111", "011"),
        ("0000111", "001010", "001001", "0101"),
        ("00000111", "000110", "000101", "0100"),
        ("00000100", "0000110", "0000101", "00110"),
        ("000000111", "00000110", "00000101", "001000"),
        ("00000001111", "000000110", "000000101", "000100"),
        ("00000001011", "00000001110", "00000001101", "0000100"),
        ("000000001111", "00000001010", "00000001001", "000000100"),
        ("000000001011", "000000001110", "000000001101", "00000001100"),
        ("000000001000", "000000001010", "000000001001", "00000001000"),
        ("0000000001111", "0000000001110", "0000000001101", "000000001100"),
        ("0000000001011", "0000000001010", "0000000001001", "0000000001100"),
        ("0000000000111", "00000000001011", "0000000000110", "0000000001000"),
        ("00000000001001", "00000000001000", "00000000001010", "0000000000001"),
        ("00000000000111", "00000000000110", "00000000000101", "00000000000100"),
    ]),
    _ct([
        ("1111",),
        ("001111", "1110"),
        ("001011", "01111", "1101"),
        ("001000", "01100", "01110", "1100"),
        ("0001111", "01010", "01011", "1011"),
        ("0001011", "01000", "01001", "1010"),
        ("0001001", "001110", "001101", "1001"),
        ("0001000", "001010", "001001", "1000"),
        ("00001111", "0001110", "0001101", "01101"),
        ("00001011", "00001110", "0001010", "001100"),
        ("000001111", "00001010", "00001101", "0001100"),
        ("000001011", "000001110", "00001001", "00001100"),
        ("000001000", "000001010", "000001101", "00001000"),
        ("0000001101", "000000111", "000001001", "000001100"),
        ("0000001001", "0000001100", "0000001011", "0000001010"),
        ("0000000101", "0000001000", "0000000111", "0000000110"),
        ("0000000001", "0000000100", "0000000011", "0000000010"),
    ]),
)

_COEFF_TOKEN_CDC = _ct([
    ("01",),
    ("000111", "1"),
    ("000100", "000110", "001"),
    ("000011", "0000011", "0000010", "000101"),
    ("000010", "00000011", "00000010", "0000000"),
])

# Tables 9-7/9-8 total_zeros for 4x4 blocks: _TOTAL_ZEROS[tc-1][tz]
_TOTAL_ZEROS = (
    ("1", "011", "010", "0011", "0010", "00011", "00010", "000011",
     "000010", "0000011", "0000010", "00000011", "00000010", "000000011",
     "000000010", "000000001"),
    ("111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
     "00011", "00010", "000011", "000010", "000001", "000000"),
    ("0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
     "00011", "00010", "000001", "00001", "000000"),
    ("00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
     "0010", "00010", "00001", "00000"),
    ("0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
     "00001", "0001", "00000"),
    ("000001", "00001", "111", "110", "101", "100", "011", "010", "0001",
     "001", "000000"),
    ("000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
     "000000"),
    ("000001", "0001", "00001", "011", "11", "10", "010", "001", "000000"),
    ("000001", "000000", "0001", "11", "10", "001", "01", "00001"),
    ("00001", "00000", "001", "11", "10", "01", "0001"),
    ("0000", "0001", "001", "010", "1", "011"),
    ("0000", "0001", "01", "1", "001"),
    ("000", "001", "1", "01"),
    ("00", "01", "1"),
    ("0", "1"),
)

# Table 9-9(a) total_zeros for chroma DC (4:2:0): _TOTAL_ZEROS_CDC[tc-1][tz]
_TOTAL_ZEROS_CDC = (
    ("1", "01", "001", "000"),
    ("1", "01", "00"),
    ("1", "0"),
)

# Table 9-10 run_before: _RUN_BEFORE[min(zerosLeft,7)-1][run]
_RUN_BEFORE = (
    ("1", "0"),
    ("1", "01", "00"),
    ("11", "10", "01", "00"),
    ("11", "10", "01", "001", "000"),
    ("11", "10", "011", "010", "001", "000"),
    ("11", "000", "001", "011", "010", "101", "100"),
    ("111", "110", "101", "100", "011", "010", "001", "0001", "00001",
     "000001", "0000001", "00000001", "000000001", "0000000001",
     "00000000001"),
)

# Table 9-4, Intra_4x4 column: codeNum (me(v)) -> coded_block_pattern
_CBP_INTRA = (
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41,
)
_CBP_INTRA_INV = {v: i for i, v in enumerate(_CBP_INTRA)}


def _prefix_decoder(table):
    """dict code->symbol plus max length, for bit-at-a-time decode."""
    dec = {}
    for sym, code in table.items():
        dec[code] = sym
    return dec


_CT_DEC = tuple(_prefix_decoder(t) for t in _COEFF_TOKEN)
_CT_CDC_DEC = _prefix_decoder(_COEFF_TOKEN_CDC)
_TZ_DEC = tuple(
    {code: tz for tz, code in enumerate(row)} for row in _TOTAL_ZEROS
)
_TZ_CDC_DEC = tuple(
    {code: tz for tz, code in enumerate(row)} for row in _TOTAL_ZEROS_CDC
)
_RB_DEC = tuple(
    {code: r for r, code in enumerate(row)} for row in _RUN_BEFORE
)


def _read_vlc(bits: _Bits, dec: dict, max_len: int = 16):
    code = ""
    for _ in range(max_len):
        code += "1" if bits.u(1) else "0"
        sym = dec.get(code)
        if sym is not None:
            return sym
    raise EOFError  # not a valid code


# ---------------------------------------------------------------------------
# transforms + quantisation (8.5; flat scaling matrices, 8-bit)
# ---------------------------------------------------------------------------

_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# dequant V and forward MF by qp%6 and position class
# class of raster position: 0 for (0,0),(0,2),(2,0),(2,2); 1 for odd/odd; 2 rest
_POS_CLS = tuple(
    0 if (r % 2 == 0 and c % 2 == 0) else (1 if (r % 2 and c % 2) else 2)
    for r in range(4)
    for c in range(4)
)
_V_TAB = ((10, 16, 13), (11, 18, 14), (13, 20, 16), (14, 23, 18),
          (16, 25, 20), (18, 29, 23))
_MF_TAB = ((13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
           (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559))

_CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]],
               np.int64)
_HAD4 = np.array([[1, 1, 1, 1], [1, 1, -1, -1], [1, -1, -1, 1], [1, -1, 1, -1]],
                 np.int64)

_CHROMA_QP = (29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37,
              37, 38, 38, 38, 39, 39, 39, 39)


def _chroma_qp(qp: int, offset: int = 0) -> int:
    q = max(0, min(51, qp + offset))
    return q if q < 30 else _CHROMA_QP[q - 30]


def _fwd_core(x):
    """Forward 4x4 core transform (encoder direction)."""
    return _CF @ x.astype(np.int64) @ _CF.T


def _inv_core(w):
    """Inverse 4x4 core transform per 8.5.12.2 (with the >>1 taps),
    WITHOUT the final rounding shift."""
    w = w.astype(np.int64)
    # horizontal (rows of w are frequency rows; spec operates columns
    # then rows — the butterfly is separable and symmetric)
    e0 = w[0] + w[2]
    e1 = w[0] - w[2]
    e2 = (w[1] >> 1) - w[3]
    e3 = w[1] + (w[3] >> 1)
    f = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3])
    g0 = f[:, 0] + f[:, 2]
    g1 = f[:, 0] - f[:, 2]
    g2 = (f[:, 1] >> 1) - f[:, 3]
    g3 = f[:, 1] + (f[:, 3] >> 1)
    return np.stack([g0 + g3, g1 + g2, g1 - g2, g0 - g3], axis=1)


def _quant4x4(w, qp: int, intra: bool = True, skip_dc: bool = False):
    """Forward quantisation (encoder): Z = sign(W)*((|W|*MF + f) >> qbits)."""
    qbits = 15 + qp // 6
    f = ((1 << qbits) // 3) if intra else ((1 << qbits) // 6)
    mf = np.array([_MF_TAB[qp % 6][c] for c in _POS_CLS], np.int64).reshape(4, 4)
    z = np.sign(w) * ((np.abs(w) * mf + f) >> qbits)
    if skip_dc:
        z[0, 0] = 0
    return z.astype(np.int64)


def _dequant4x4(z, qp: int, skip_dc: bool = False):
    """Dequantisation: W' = Z * V(qp%6, pos) << (qp // 6)."""
    v = np.array([_V_TAB[qp % 6][c] for c in _POS_CLS], np.int64).reshape(4, 4)
    w = z.astype(np.int64) * v
    w = w << (qp // 6)
    if skip_dc:
        w[0, 0] = 0
    return w


def _recon_block(pred, z, qp: int, dc_override=None):
    """Shared reconstruction kernel (the spec defines ONE inverse path;
    the encoder embeds it to predict from reconstructed samples, the
    decoder IS it): dequant -> inverse core -> (x+32)>>6 -> +pred, clip."""
    w = _dequant4x4(z, qp, skip_dc=dc_override is not None)
    if dc_override is not None:
        w[0, 0] = dc_override
    x = (_inv_core(w) + 32) >> 6
    return np.clip(pred.astype(np.int64) + x, 0, 255).astype(np.uint8)


def _luma_dc_dequant(f, qp: int):
    """Post-Hadamard luma DC scaling (8.5.10, flat matrices)."""
    v00 = _V_TAB[qp % 6][0]
    if qp >= 12:
        return (f * v00) << (qp // 6 - 2)
    add = 1 << (1 - qp // 6)
    return (f * v00 + add) >> (2 - qp // 6)


def _chroma_dc_dequant(f, qp: int):
    """Post-Hadamard 2x2 chroma DC scaling (8.5.11.2, flat matrices)."""
    v00 = _V_TAB[qp % 6][0]
    return ((f * v00) << (qp // 6)) >> 1


# ---------------------------------------------------------------------------
# CAVLC residual block coding (9.2) — decode and the independent forward
# direction. Blocks are coefficient lists in scan order (zigzag already
# applied by the caller); maxNumCoeff is 16 (4x4), 15 (AC of I_16x16 /
# chroma AC) or 4 (chroma DC).
# ---------------------------------------------------------------------------


def _cavlc_decode_block(bits: _Bits, nc: int, max_coeff: int):
    """Parse one residual block -> (coeffs list in scan order, total_coeff).

    ``nc`` is the neighbour-derived context (-1 for chroma DC).
    Raises EOFError / ValueError on malformed data.
    """
    if nc == -1:
        tc, t1 = _read_vlc(bits, _CT_CDC_DEC, 8)
    elif nc >= 8:
        v = bits.u(6)
        if v == 3:
            tc, t1 = 0, 0
        else:
            tc, t1 = (v >> 2) + 1, v & 3
    else:
        ctx = 0 if nc < 2 else (1 if nc < 4 else 2)
        tc, t1 = _read_vlc(bits, _CT_DEC[ctx], 16)
    if tc == 0:
        return [0] * max_coeff, 0
    if tc > max_coeff:
        raise ValueError("total_coeff > maxNumCoeff")
    # trailing-one signs (reverse scan order)
    levels = [0] * tc
    for i in range(t1):
        levels[i] = -1 if bits.u(1) else 1
    # remaining levels with adaptive suffix length
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(t1, tc):
        # level_prefix: leading zeros before a 1
        prefix = 0
        while bits.u(1) == 0:
            prefix += 1
            if prefix > 32:
                raise ValueError("level_prefix overflow")
        suffix_size = suffix_len
        if prefix == 14 and suffix_len == 0:
            suffix_size = 4
        elif prefix >= 15:
            suffix_size = prefix - 3
        level_code = min(15, prefix) << suffix_len
        if suffix_size:
            level_code += bits.u(suffix_size)
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == t1 and t1 < 3:
            level_code += 2
        levels[i] = (level_code + 2) >> 1 if level_code % 2 == 0 else -(
            (level_code + 1) >> 1
        )
        if suffix_len == 0:
            suffix_len = 1
        if abs(levels[i]) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros
    if tc < max_coeff:
        if nc == -1:
            tz = _read_vlc(bits, _TZ_CDC_DEC[tc - 1], 8)
        else:
            tz = _read_vlc(bits, _TZ_DEC[tc - 1], 10)
    else:
        tz = 0
    if tz > max_coeff - tc:
        raise ValueError("total_zeros out of range")
    # run_before
    runs = [0] * tc
    zeros_left = tz
    for i in range(tc - 1):
        if zeros_left <= 0:
            break
        run = _read_vlc(bits, _RB_DEC[min(zeros_left, 7) - 1], 12)
        if run > zeros_left:
            raise ValueError("run_before > zerosLeft")
        runs[i] = run
        zeros_left -= run
    runs[tc - 1] = zeros_left
    # place coefficients: levels/runs are in reverse scan order
    coeffs = [0] * max_coeff
    pos = tc + tz - 1  # scan index of the highest-frequency coefficient
    for i in range(tc):
        if pos < 0:
            raise ValueError("coefficient position underflow")
        coeffs[pos] = levels[i]
        pos -= 1 + runs[i]
    return coeffs, tc


def _cavlc_encode_block(w: _BitW, coeffs, nc: int, max_coeff: int) -> int:
    """Forward CAVLC for one block (coeffs in scan order, length
    max_coeff). Returns total_coeff (for the caller's nC tracking)."""
    nz = [(i, c) for i, c in enumerate(coeffs) if c != 0]
    tc = len(nz)
    if tc > max_coeff:
        raise ValueError("too many coefficients")
    # trailing ones: up to 3 |1| values at the high-frequency end
    t1 = 0
    for i in range(tc - 1, -1, -1):
        if abs(nz[i][1]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    # coeff_token
    if nc == -1:
        w.bits(_COEFF_TOKEN_CDC[(tc, t1)])
    elif nc >= 8:
        w.u(3 if tc == 0 else ((tc - 1) << 2) | t1, 6)
    else:
        ctx = 0 if nc < 2 else (1 if nc < 4 else 2)
        w.bits(_COEFF_TOKEN[ctx][(tc, t1)])
    if tc == 0:
        return 0
    rev = nz[::-1]  # reverse scan order
    for i in range(t1):
        w.u(1 if rev[i][1] < 0 else 0, 1)
    suffix_len = 1 if (tc > 10 and t1 < 3) else 0
    for i in range(t1, tc):
        v = rev[i][1]
        level_code = 2 * v - 2 if v > 0 else -2 * v - 1
        if i == t1 and t1 < 3:
            level_code -= 2
        if suffix_len == 0 and level_code < 14:
            w.u(1, level_code + 1)  # level_code zeros then the 1
        elif suffix_len == 0 and level_code < 30:
            w.u(1, 15)  # prefix 14, 4-bit suffix
            w.u(level_code - 14, 4)
        elif suffix_len > 0 and (level_code >> suffix_len) < 15:
            w.u(0, level_code >> suffix_len)
            w.u(1, 1)
            w.u(level_code & ((1 << suffix_len) - 1), suffix_len)
        else:
            base = (15 << suffix_len) + (15 if suffix_len == 0 else 0)
            if level_code - base < (1 << 12):
                w.u(1, 16)  # prefix 15, 12-bit suffix
                w.u(level_code - base, 12)
            else:
                # prefix >= 16 escape (mirrors the decoder's
                # (1 << (prefix-3)) - 4096 offset ladder)
                for p in range(16, 32):
                    lo = base + (1 << (p - 3)) - 4096
                    if lo <= level_code < lo + (1 << (p - 3)):
                        w.u(1, p + 1)
                        w.u(level_code - lo, p - 3)
                        break
                else:
                    raise ValueError("level beyond prefix-31 range")
        if suffix_len == 0:
            suffix_len = 1
        if abs(v) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros: zeros below the highest-frequency nonzero coefficient
    highest = rev[0][0]
    tz = highest + 1 - tc
    if tc < max_coeff:
        if nc == -1:
            w.bits(_TOTAL_ZEROS_CDC[tc - 1][tz])
        else:
            w.bits(_TOTAL_ZEROS[tc - 1][tz])
    # run_before per coefficient in reverse scan order
    zeros_left = tz
    for i in range(tc - 1):
        if zeros_left <= 0:
            break
        run = rev[i][0] - rev[i + 1][0] - 1
        w.bits(_RUN_BEFORE[min(zeros_left, 7) - 1][run])
        zeros_left -= run
    return tc


# ---------------------------------------------------------------------------
# intra prediction (8.3) — ONE implementation by necessity: the spec
# defines a single prediction process that both encoder and decoder
# must evaluate identically over reconstructed neighbours (like the
# YCbCr matrix, it is shared semantics, not shared direction)
# ---------------------------------------------------------------------------

# z-scan index of the 4x4 luma block at raster (row, col) within the MB
_Z4 = ((0, 1, 4, 5), (2, 3, 6, 7), (8, 9, 12, 13), (10, 11, 14, 15))
# raster (row, col) for each z-scan index
_Z4_INV = tuple(
    next((r, c) for r in range(4) for c in range(4) if _Z4[r][c] == z)
    for z in range(16)
)


# neighbours each Intra_4x4 mode requires: (left, top, top-left)
_I4_NEEDS = (
    (False, True, False),   # 0 V
    (True, False, False),   # 1 H
    (False, False, False),  # 2 DC (handles any availability)
    (False, True, False),   # 3 DDL (top-right replicated from top)
    (True, True, True),     # 4 DDR
    (True, True, True),     # 5 VR
    (True, True, True),     # 6 HD
    (False, True, False),   # 7 VL
    (True, False, False),   # 8 HU
)


def _pred4x4(mode, plane, x, y, al, at, atl, atr):
    """Intra_4x4 prediction (8.3.1.2) -> (4,4) int array.

    ``al/at/atl/atr``: availability of left / top / top-left /
    top-right neighbour samples. Top-right samples are substituted
    with p[3,-1] when unavailable but top is (the spec's replication
    rule). Raises ValueError if the mode's required neighbours are
    missing (a non-conformant stream — callers return None).
    """
    need_l, need_t, need_tl = _I4_NEEDS[mode]
    if (need_l and not al) or (need_t and not at) or (need_tl and not atl):
        raise ValueError("intra4x4 mode with unavailable neighbours")
    p = plane.astype(np.int64)
    left = p[y : y + 4, x - 1] if al else None
    top = np.empty(8, np.int64) if at else None
    if at:
        top[:4] = p[y - 1, x : x + 4]
        if atr:
            top[4:] = p[y - 1, x + 4 : x + 8]
        else:
            top[4:] = p[y - 1, x + 3]
    tl = int(p[y - 1, x - 1]) if atl else None
    out = np.empty((4, 4), np.int64)
    if mode == 0:  # Vertical
        out[:] = top[:4][None, :]
    elif mode == 1:  # Horizontal
        out[:] = left[:, None]
    elif mode == 2:  # DC
        if al and at:
            out[:] = (int(top[:4].sum()) + int(left.sum()) + 4) >> 3
        elif al:
            out[:] = (int(left.sum()) + 2) >> 2
        elif at:
            out[:] = (int(top[:4].sum()) + 2) >> 2
        else:
            out[:] = 128
    elif mode == 3:  # Diagonal-Down-Left
        for yy in range(4):
            for xx in range(4):
                if xx == 3 and yy == 3:
                    out[yy, xx] = (top[6] + 3 * top[7] + 2) >> 2
                else:
                    i = xx + yy
                    out[yy, xx] = (top[i] + 2 * top[i + 1] + top[i + 2] + 2) >> 2
    elif mode == 4:  # Diagonal-Down-Right
        for yy in range(4):
            for xx in range(4):
                if xx > yy:
                    i = xx - yy
                    out[yy, xx] = (
                        (top[i - 2] if i - 2 >= 0 else tl)
                        + 2 * (top[i - 1] if i - 1 >= 0 else tl)
                        + top[i]
                        + 2
                    ) >> 2
                elif xx < yy:
                    i = yy - xx
                    out[yy, xx] = (
                        (left[i - 2] if i - 2 >= 0 else tl)
                        + 2 * (left[i - 1] if i - 1 >= 0 else tl)
                        + left[i]
                        + 2
                    ) >> 2
                else:
                    out[yy, xx] = (top[0] + 2 * tl + left[0] + 2) >> 2
    elif mode == 5:  # Vertical-Right
        for yy in range(4):
            for xx in range(4):
                z = 2 * xx - yy
                if z >= 0 and z % 2 == 0:
                    i = xx - (yy >> 1)
                    out[yy, xx] = (
                        ((top[i - 1] if i - 1 >= 0 else tl) + top[i] + 1) >> 1
                    )
                elif z >= 0:
                    i = xx - (yy >> 1)
                    a = top[i - 2] if i - 2 >= 0 else tl
                    b = top[i - 1] if i - 1 >= 0 else tl
                    out[yy, xx] = (a + 2 * b + top[i] + 2) >> 2
                elif z == -1:
                    out[yy, xx] = (left[0] + 2 * tl + top[0] + 2) >> 2
                else:
                    i = yy - 2 * xx
                    out[yy, xx] = (
                        left[i - 1]
                        + 2 * left[i - 2]
                        + (left[i - 3] if i - 3 >= 0 else tl)
                        + 2
                    ) >> 2
    elif mode == 6:  # Horizontal-Down
        for yy in range(4):
            for xx in range(4):
                z = 2 * yy - xx
                if z >= 0 and z % 2 == 0:
                    i = yy - (xx >> 1)
                    out[yy, xx] = (
                        ((left[i - 1] if i - 1 >= 0 else tl) + left[i] + 1) >> 1
                    )
                elif z >= 0:
                    i = yy - (xx >> 1)
                    a = left[i - 2] if i - 2 >= 0 else tl
                    b = left[i - 1] if i - 1 >= 0 else tl
                    out[yy, xx] = (a + 2 * b + left[i] + 2) >> 2
                elif z == -1:
                    out[yy, xx] = (left[0] + 2 * tl + top[0] + 2) >> 2
                else:
                    i = xx - 2 * yy
                    out[yy, xx] = (
                        top[i - 1]
                        + 2 * top[i - 2]
                        + (top[i - 3] if i - 3 >= 0 else tl)
                        + 2
                    ) >> 2
    elif mode == 7:  # Vertical-Left
        for yy in range(4):
            for xx in range(4):
                i = xx + (yy >> 1)
                if yy % 2 == 0:
                    out[yy, xx] = (top[i] + top[i + 1] + 1) >> 1
                else:
                    out[yy, xx] = (top[i] + 2 * top[i + 1] + top[i + 2] + 2) >> 2
    elif mode == 8:  # Horizontal-Up
        for yy in range(4):
            for xx in range(4):
                z = xx + 2 * yy
                if z > 5:
                    out[yy, xx] = left[3]
                elif z == 5:
                    out[yy, xx] = (left[2] + 3 * left[3] + 2) >> 2
                elif z % 2 == 0:
                    i = yy + (xx >> 1)
                    out[yy, xx] = (left[i] + left[i + 1] + 1) >> 1
                else:
                    i = yy + (xx >> 1)
                    out[yy, xx] = (left[i] + 2 * left[i + 1] + left[i + 2] + 2) >> 2
    else:
        raise ValueError("bad intra4x4 mode")
    return out


def _pred16x16(mode, plane, x, y, al, at):
    """Intra_16x16 prediction (8.3.3): 0 V, 1 H, 2 DC, 3 Plane."""
    if (mode == 0 and not at) or (mode == 1 and not al) or (
        mode == 3 and not (al and at)
    ):
        raise ValueError("intra16x16 mode with unavailable neighbours")
    p = plane.astype(np.int64)
    out = np.empty((16, 16), np.int64)
    if mode == 0:
        out[:] = p[y - 1, x : x + 16][None, :]
    elif mode == 1:
        out[:] = p[y : y + 16, x - 1][:, None]
    elif mode == 2:
        if al and at:
            out[:] = (
                int(p[y - 1, x : x + 16].sum())
                + int(p[y : y + 16, x - 1].sum())
                + 16
            ) >> 5
        elif at:
            out[:] = (int(p[y - 1, x : x + 16].sum()) + 8) >> 4
        elif al:
            out[:] = (int(p[y : y + 16, x - 1].sum()) + 8) >> 4
        else:
            out[:] = 128
    elif mode == 3:  # Plane
        top = p[y - 1, x - 1 : x + 16]  # top[-1..15] shifted by 1
        left = p[y - 1 : y + 16, x - 1]
        hsum = sum((i + 1) * (int(top[9 + i]) - int(top[7 - i])) for i in range(8))
        vsum = sum((i + 1) * (int(left[9 + i]) - int(left[7 - i])) for i in range(8))
        a = 16 * (int(left[16]) + int(top[16]))
        b = (5 * hsum + 32) >> 6
        c = (5 * vsum + 32) >> 6
        xs = np.arange(16, dtype=np.int64)
        out = np.clip((a + b * (xs[None, :] - 7) + c * (xs[:, None] - 7) + 16) >> 5,
                      0, 255)
    else:
        raise ValueError("bad intra16x16 mode")
    return out


def _pred_chroma(mode, plane, x, y, al, at):
    """Chroma 8x8 prediction (8.3.4): 0 DC (per-quadrant), 1 H, 2 V,
    3 Plane."""
    if (mode == 1 and not al) or (mode == 2 and not at) or (
        mode == 3 and not (al and at)
    ):
        raise ValueError("chroma mode with unavailable neighbours")
    p = plane.astype(np.int64)
    out = np.empty((8, 8), np.int64)
    if mode == 0:
        for qy in (0, 4):
            for qx in (0, 4):
                tsum = int(p[y - 1, x + qx : x + qx + 4].sum()) if at else 0
                lsum = int(p[y + qy : y + qy + 4, x - 1].sum()) if al else 0
                if qx == qy:  # (0,0) and (4,4): prefer both
                    if al and at:
                        v = (tsum + lsum + 4) >> 3
                    elif al:
                        v = (lsum + 2) >> 2
                    elif at:
                        v = (tsum + 2) >> 2
                    else:
                        v = 128
                elif qx == 4:  # top-right quadrant: prefer top
                    if at:
                        v = (tsum + 2) >> 2
                    elif al:
                        v = (lsum + 2) >> 2
                    else:
                        v = 128
                else:  # bottom-left quadrant: prefer left
                    if al:
                        v = (lsum + 2) >> 2
                    elif at:
                        v = (tsum + 2) >> 2
                    else:
                        v = 128
                out[qy : qy + 4, qx : qx + 4] = v
    elif mode == 1:  # Horizontal
        out[:] = p[y : y + 8, x - 1][:, None]
    elif mode == 2:  # Vertical
        out[:] = p[y - 1, x : x + 8][None, :]
    elif mode == 3:  # Plane
        top = p[y - 1, x - 1 : x + 8]
        left = p[y - 1 : y + 8, x - 1]
        hsum = sum((i + 1) * (int(top[5 + i]) - int(top[3 - i])) for i in range(4))
        vsum = sum((i + 1) * (int(left[5 + i]) - int(left[3 - i])) for i in range(4))
        a = 16 * (int(left[8]) + int(top[8]))
        b = (34 * hsum + 32) >> 6
        c = (34 * vsum + 32) >> 6
        xs = np.arange(8, dtype=np.int64)
        out = np.clip((a + b * (xs[None, :] - 3) + c * (xs[:, None] - 3) + 16) >> 5,
                      0, 255)
    else:
        raise ValueError("bad chroma mode")
    return out


# ---------------------------------------------------------------------------
# parameter sets + slice header
# ---------------------------------------------------------------------------

_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
)


def _parse_sps(rbsp: bytes):
    b = _Bits(rbsp)
    profile = b.u(8)
    b.u(8)  # constraint flags + reserved
    level = b.u(8)
    sps_id = b.ue()
    if profile in _HIGH_PROFILES or profile not in (66, 77, 88):
        return None  # High-profile SPS syntax (chroma_format_idc etc.)
    log2_max_frame_num = b.ue() + 4
    poc_type = b.ue()
    sps = {"id": sps_id, "profile": profile, "level": level,
           "log2_max_frame_num": log2_max_frame_num, "poc_type": poc_type}
    if poc_type == 0:
        sps["log2_max_poc_lsb"] = b.ue() + 4
    elif poc_type == 1:
        b.flag()  # delta_pic_order_always_zero_flag
        b.se()
        b.se()
        for _ in range(b.ue()):
            b.se()
    elif poc_type != 2:
        return None
    b.ue()  # max_num_ref_frames
    b.flag()  # gaps_in_frame_num_value_allowed_flag
    mb_w = b.ue() + 1
    mb_h = b.ue() + 1
    if mb_w * mb_h > _MAX_MBS:
        return None
    frame_mbs_only = b.flag()
    if not frame_mbs_only:
        return None  # interlace out of scope
    b.flag()  # direct_8x8_inference_flag
    crop = (0, 0, 0, 0)
    if b.flag():  # frame_cropping_flag
        crop = (b.ue(), b.ue(), b.ue(), b.ue())  # left right top bottom
    # vui ignored (not parsed; nothing after it that we need)
    w = 16 * mb_w - 2 * (crop[0] + crop[1])
    h = 16 * mb_h - 2 * (crop[2] + crop[3])
    if w <= 0 or h <= 0:
        return None
    sps.update(mb_w=mb_w, mb_h=mb_h, crop=crop, width=w, height=h)
    return sps


def _parse_pps(rbsp: bytes):
    b = _Bits(rbsp)
    pps_id = b.ue()
    sps_id = b.ue()
    if b.flag():  # entropy_coding_mode_flag: CABAC
        return None
    b.flag()  # bottom_field_pic_order_in_frame_present_flag
    if b.ue() != 0:  # num_slice_groups_minus1 (FMO)
        return None
    num_ref_l0 = b.ue() + 1  # num_ref_idx_l0_active_minus1
    b.ue()  # num_ref_idx_l1_active_minus1
    weighted_pred = b.flag()
    b.u(2)  # weighted_bipred_idc
    init_qp = 26 + b.se()
    b.se()  # pic_init_qs_minus26
    chroma_qp_offset = b.se()
    deblock_ctrl = b.flag()
    constrained_intra = b.flag()
    b.flag()  # redundant_pic_cnt_present_flag
    if b.more_rbsp_data():
        # High-profile PPS extension (transform_8x8, scaling matrices)
        return None
    if constrained_intra:
        # constrained_intra_pred changes nothing for all-intra pictures
        pass
    return {"id": pps_id, "sps_id": sps_id, "init_qp": init_qp,
            "chroma_qp_offset": chroma_qp_offset,
            "deblock_ctrl": deblock_ctrl,
            "num_ref_l0": num_ref_l0,
            "weighted_pred": weighted_pred}


# ---------------------------------------------------------------------------
# inter prediction (r14, VERDICT r13 #7): quarter-pel luma MC (8.4.2.2.1
# 6-tap half-pel + averaged quarter positions), eighth-pel bilinear
# chroma MC (8.4.2.2.2), and the median MV predictor (8.4.1.3) with the
# 16x8/8x16 directional rules and P_Skip inference (8.4.1.1). MVs are
# unrestricted: reads outside the reference picture clamp to the edge
# samples (the spec's sample clipping).
# ---------------------------------------------------------------------------


def _six_tap(a0, a1, a2, a3, a4, a5):
    return a0 - 5 * a1 + 20 * a2 + 20 * a3 - 5 * a4 + a5


def _mc_luma(ref, x0: int, y0: int, w: int, h: int, mvx: int, mvy: int):
    """Quarter-sample luma prediction for the w x h block whose
    top-left sits at (x0, y0), motion vector in quarter-pel units.
    Returns an int64 (h, w) array of predicted samples."""
    ix, iy = mvx >> 2, mvy >> 2
    fx, fy = mvx & 3, mvy & 3
    ys = np.clip(np.arange(y0 + iy - 2, y0 + iy + h + 3), 0, ref.shape[0] - 1)
    xs = np.clip(np.arange(x0 + ix - 2, x0 + ix + w + 3), 0, ref.shape[1] - 1)
    G = ref[np.ix_(ys, xs)].astype(np.int64)  # (h+5, w+5) integer window
    g_int = G[2 : 2 + h, 2 : 2 + w]
    if fx == 0 and fy == 0:
        return g_int

    def clip1(v):
        return np.clip(v, 0, 255)

    # unclipped intermediates (the spec keeps full precision until the
    # final shift, so the separable 2D 6-tap for j is exact)
    b1 = _six_tap(*(G[:, k : k + w] for k in range(6)))  # (h+5, w)
    h1 = _six_tap(*(G[k : k + h, :] for k in range(6)))  # (h, w+5)
    b_pos = clip1((b1[2 : 2 + h, :] + 16) >> 5)
    s_pos = clip1((b1[3 : 3 + h, :] + 16) >> 5)  # b one integer row down
    h_pos = clip1((h1[:, 2 : 2 + w] + 16) >> 5)
    m_pos = clip1((h1[:, 3 : 3 + w] + 16) >> 5)  # h one integer col right
    j_pos = None
    if fx in (1, 2, 3) and fy in (1, 2, 3) and (fx == 2 or fy == 2):
        j1 = _six_tap(*(b1[k : k + h, :] for k in range(6)))
        j_pos = clip1((j1 + 512) >> 10)
    h_int = G[2 : 2 + h, 3 : 3 + w]  # integer sample at x+1
    m_int = G[3 : 3 + h, 2 : 2 + w]  # integer sample at y+1

    def avg(a, b):
        return (a + b + 1) >> 1

    table = {
        (1, 0): lambda: avg(g_int, b_pos),
        (2, 0): lambda: b_pos,
        (3, 0): lambda: avg(b_pos, h_int),
        (0, 1): lambda: avg(g_int, h_pos),
        (1, 1): lambda: avg(b_pos, h_pos),
        (2, 1): lambda: avg(b_pos, j_pos),
        (3, 1): lambda: avg(b_pos, m_pos),
        (0, 2): lambda: h_pos,
        (1, 2): lambda: avg(h_pos, j_pos),
        (2, 2): lambda: j_pos,
        (3, 2): lambda: avg(j_pos, m_pos),
        (0, 3): lambda: avg(h_pos, m_int),
        (1, 3): lambda: avg(h_pos, s_pos),
        (2, 3): lambda: avg(j_pos, s_pos),
        (3, 3): lambda: avg(m_pos, s_pos),
    }
    return table[(fx, fy)]()


def _mc_chroma(ref, x0: int, y0: int, w: int, h: int, mvx: int, mvy: int):
    """Eighth-sample bilinear chroma prediction (8.4.2.2.2); the
    chroma MV is the luma quarter-pel MV reinterpreted on the
    half-resolution plane (same numeric value, eighth-pel units)."""
    ix, iy = mvx >> 3, mvy >> 3
    dx, dy = mvx & 7, mvy & 7
    ys = np.clip(np.arange(y0 + iy, y0 + iy + h + 1), 0, ref.shape[0] - 1)
    xs = np.clip(np.arange(x0 + ix, x0 + ix + w + 1), 0, ref.shape[1] - 1)
    win = ref[np.ix_(ys, xs)].astype(np.int64)
    a = win[:h, :w]
    b = win[:h, 1 : 1 + w]
    c = win[1 : 1 + h, :w]
    d = win[1 : 1 + h, 1 : 1 + w]
    return (
        (8 - dx) * (8 - dy) * a + dx * (8 - dy) * b
        + (8 - dx) * dy * c + dx * dy * d + 32
    ) >> 6


def _mv_neighbor(mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, done=None):
    """(mvx, mvy, ref, addr_available) of the 4x4 block (by, bx) for MV
    prediction: blocks outside the picture, outside the current slice,
    or (``done`` given) not yet decoded in decoding order are
    address-unavailable; intra blocks are available with ref -1 and a
    zero MV (8.4.1.3.2). ``done`` matters only for P_8x8
    sub-partitions, whose above-right neighbour can be a later block
    of the SAME macroblock — MB-level partitions always see fully
    decoded raster neighbours."""
    h4, w4 = blk_ref.shape
    if not (0 <= by < h4 and 0 <= bx < w4):
        return 0, 0, -1, False
    if mb_slice[by // 4, bx // 4] != sid:
        return 0, 0, -1, False
    if done is not None and not done[by, bx]:
        return 0, 0, -1, False
    r = int(blk_ref[by, bx])
    if r < 0:  # intra-coded neighbour
        return 0, 0, -1, True
    return int(mv_x[by, bx]), int(mv_y[by, bx]), r, True


def _mvp_median(mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, w4,
                ref_idx: int = 0, done=None):
    """Luma MV predictor, general rule (8.4.1.3.1) for the partition
    whose top-left 4x4 block is (by, bx) and block-width is w4:
    neighbour C (above-right) falls back to D (above-left); if B, C
    and D are all address-unavailable and A is available, mvpA; if
    exactly one neighbour shares the reference index, its MV; else the
    componentwise median."""
    a = _mv_neighbor(mv_x, mv_y, blk_ref, mb_slice, sid, by, bx - 1, done)
    bq = _mv_neighbor(mv_x, mv_y, blk_ref, mb_slice, sid, by - 1, bx, done)
    c = _mv_neighbor(
        mv_x, mv_y, blk_ref, mb_slice, sid, by - 1, bx + w4, done
    )
    d = _mv_neighbor(
        mv_x, mv_y, blk_ref, mb_slice, sid, by - 1, bx - 1, done
    )
    c_used = c if c[3] else d
    if not bq[3] and not c[3] and not d[3] and a[3]:
        return a[0], a[1]
    matches = [n for n in (a, bq, c_used) if n[3] and n[2] == ref_idx]
    if len(matches) == 1:
        return matches[0][0], matches[0][1]
    xs = sorted((a[0], bq[0], c_used[0]))
    ys = sorted((a[1], bq[1], c_used[1]))
    return xs[1], ys[1]


def _mvp_for_partition(mv_x, mv_y, blk_ref, mb_slice, sid, by, bx,
                       part: str, done=None):
    """Partition-shaped MV predictor (8.4.1.3): the 16x8/8x16
    directional shortcuts apply when the designated neighbour shares
    the reference index, else the general rule. (by, bx) is the
    partition's top-left 4x4 block. P_8x8 sub-partitions use the
    general rule with their own block width (``subWxH`` parts)."""
    if part == "16x8_top":
        n = _mv_neighbor(mv_x, mv_y, blk_ref, mb_slice, sid, by - 1, bx, done)
        if n[3] and n[2] == 0:
            return n[0], n[1]
        return _mvp_median(
            mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, 4, done=done
        )
    if part == "16x8_bottom":
        n = _mv_neighbor(mv_x, mv_y, blk_ref, mb_slice, sid, by, bx - 1, done)
        if n[3] and n[2] == 0:
            return n[0], n[1]
        return _mvp_median(
            mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, 4, done=done
        )
    if part == "8x16_left":
        n = _mv_neighbor(mv_x, mv_y, blk_ref, mb_slice, sid, by, bx - 1, done)
        if n[3] and n[2] == 0:
            return n[0], n[1]
        return _mvp_median(
            mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, 2, done=done
        )
    if part == "8x16_right":
        c = _mv_neighbor(
            mv_x, mv_y, blk_ref, mb_slice, sid, by - 1, bx + 2, done
        )
        n = c if c[3] else _mv_neighbor(
            mv_x, mv_y, blk_ref, mb_slice, sid, by - 1, bx - 1, done
        )
        if n[3] and n[2] == 0:
            return n[0], n[1]
        return _mvp_median(
            mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, 2, done=done
        )
    if part.startswith("sub"):  # P_8x8 sub-partition: general rule only
        w4 = int(part[3])
        return _mvp_median(
            mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, w4, done=done
        )
    return _mvp_median(
        mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, 4, done=done
    )


def _skip_mv(mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, done=None):
    """P_Skip motion inference (8.4.1.1): zero MV if either the left
    or the above neighbour block is address-unavailable or is an
    inter block with reference 0 and a zero MV; else the 16x16
    predictor."""
    a = _mv_neighbor(mv_x, mv_y, blk_ref, mb_slice, sid, by, bx - 1, done)
    bq = _mv_neighbor(mv_x, mv_y, blk_ref, mb_slice, sid, by - 1, bx, done)
    for n in (a, bq):
        if not n[3]:
            return 0, 0
        if n[2] == 0 and n[0] == 0 and n[1] == 0:
            return 0, 0
    return _mvp_median(
        mv_x, mv_y, blk_ref, mb_slice, sid, by, bx, 4, done=done
    )


# coded_block_pattern me(v) mapping for Inter macroblocks (Table 9-4,
# Inter column) — the inter sibling of _CBP_INTRA; a permutation of
# 0..47 (asserted in tests, with the well-known anchor values)
_CBP_INTER = (
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41,
)
_CBP_INTER_INV = {v: i for i, v in enumerate(_CBP_INTER)}


# ---------------------------------------------------------------------------
# IDR slice decoding
# ---------------------------------------------------------------------------


def _parse_slice_header(rbsp: bytes, sps_map, pps_map, is_idr: bool,
                        nal_ref_idc: int = 3):
    """Parse one I- or P-slice header -> dict (reader positioned at
    the first macroblock) or None. P slices (r14, VERDICT r13 #7) are
    accepted with the single-reference subset: no active-count
    override beyond one picture, no list modification, no adaptive
    (MMCO) marking, no weighted prediction — each rejects honestly."""
    b = _Bits(rbsp)
    first_mb = b.ue()
    slice_type = b.ue()
    st = slice_type % 5
    if is_idr:
        if st != 2:  # IDR pictures contain I slices only
            return None
    elif st not in (0, 2):  # P or I; B/SP/SI out of scope
        return None
    is_p = st == 0
    pps_id = b.ue()
    pps = pps_map.get(pps_id)
    if pps is None:
        return None
    sps = sps_map.get(pps["sps_id"])
    if sps is None:
        return None
    frame_num = b.u(sps["log2_max_frame_num"])
    if is_idr:
        b.ue()  # idr_pic_id
    if sps["poc_type"] == 0:
        b.u(sps["log2_max_poc_lsb"])  # pic_order_cnt_lsb
    if is_p:
        if pps["weighted_pred"]:
            return None  # weighted P prediction: out of scope
        num_ref = pps["num_ref_l0"]
        if b.flag():  # num_ref_idx_active_override_flag
            num_ref = b.ue() + 1
        if num_ref != 1:
            return None  # single-reference subset
        if b.flag():  # ref_pic_list_modification_flag_l0
            return None  # list reordering: out of scope
    if is_idr:
        # dec_ref_pic_marking for IDR
        b.flag()  # no_output_of_prior_pics_flag
        b.flag()  # long_term_reference_flag
    elif nal_ref_idc != 0:
        if b.flag():  # adaptive_ref_pic_marking_mode_flag (MMCO)
            return None  # sliding window only
    qp = pps["init_qp"] + b.se()
    if not 0 <= qp <= 51:
        return None
    idc, off_a, off_b = 0, 0, 0
    if pps["deblock_ctrl"]:
        idc = b.ue()
        if idc > 2:
            return None
        if idc != 1:
            off_a = 2 * b.se()
            off_b = 2 * b.se()
            if not (-12 <= off_a <= 12 and -12 <= off_b <= 12):
                return None
    return {
        "b": b, "rbsp": rbsp, "first_mb": first_mb, "pps_id": pps_id,
        "pps": pps, "sps": sps, "qp": qp, "idc": idc,
        "off_a": off_a, "off_b": off_b, "is_p": is_p,
        "frame_num": frame_num,
    }


def _parse_idr_slice_header(rbsp: bytes, sps_map, pps_map):
    """Back-compat IDR wrapper around ``_parse_slice_header``."""
    return _parse_slice_header(rbsp, sps_map, pps_map, is_idr=True)


def _decode_idr_slice(rbsp: bytes, sps_map, pps_map):
    """Back-compat single-slice entry (tests use it directly)."""
    return _decode_idr_picture([rbsp], sps_map, pps_map)


def _decode_idr_picture(rbsps, sps_map, pps_map):
    """Back-compat intra entry around ``_decode_picture``."""
    return _decode_picture(rbsps, sps_map, pps_map, is_idr=True, ref=None)


def _decode_picture(rbsps, sps_map, pps_map, is_idr: bool = True,
                    ref=None):
    """Decode one picture (IDR/I or P, r14) from its slice RBSPs.

    Slices are independently decodable: intra prediction, the CAVLC
    total_coeff contexts, the intra-4x4 mode predictor AND the inter
    MV predictor all treat macroblocks of OTHER slices as unavailable,
    and per-slice disable_deblocking_filter_idc == 2 skips filtering
    across slice boundaries only. Slices must cover the picture in
    raster order (no ASO/FMO) and share one slice type. ``ref`` is the
    previous decoded (filtered) picture's (y, cb, cr) planes — the
    single L0 reference a P picture predicts from; P pictures without
    a reference return None. Returns (y, cb, cr, sps) or None.
    """
    heads = []
    for rbsp in rbsps:
        hd = _parse_slice_header(rbsp, sps_map, pps_map, is_idr)
        if hd is None:
            return None
        heads.append(hd)
    if not heads or heads[0]["first_mb"] != 0:
        return None
    sps = heads[0]["sps"]
    pps = heads[0]["pps"]
    if any(h["pps_id"] != heads[0]["pps_id"] for h in heads):
        return None  # mixed PPS within a picture: out of scope
    if any(h["is_p"] != heads[0]["is_p"] for h in heads):
        return None  # mixed slice types within a picture: out of scope
    pic_is_p = heads[0]["is_p"]
    if pic_is_p:
        if ref is None:
            return None  # P picture with no decoded reference
        ref_y, ref_cb, ref_cr = ref
        if ref_y.shape != (sps["mb_h"] * 16, sps["mb_w"] * 16):
            return None  # reference/current dimension mismatch

    mb_w, mb_h = sps["mb_w"], sps["mb_h"]
    W, H = mb_w * 16, mb_h * 16
    y_plane = np.zeros((H, W), np.uint8)
    cb_plane = np.zeros((H // 2, W // 2), np.uint8)
    cr_plane = np.zeros((H // 2, W // 2), np.uint8)
    # per-4x4-block CAVLC context (total_coeff) and intra-4x4 modes
    luma_tc = np.zeros((mb_h * 4, mb_w * 4), np.int16)
    cb_tc = np.zeros((mb_h * 2, mb_w * 2), np.int16)
    cr_tc = np.zeros((mb_h * 2, mb_w * 2), np.int16)
    i4_modes = np.full((mb_h * 4, mb_w * 4), -1, np.int8)
    mb_qp = np.zeros((mb_h, mb_w), np.int16)
    mb_pcm = np.zeros((mb_h, mb_w), bool)
    mb_slice = np.full((mb_h, mb_w), -1, np.int32)
    mb_idc = np.zeros((mb_h, mb_w), np.int16)
    mb_offa = np.zeros((mb_h, mb_w), np.int16)
    mb_offb = np.zeros((mb_h, mb_w), np.int16)
    # inter bookkeeping (r14): per-4x4-block MV + reference (-1 =
    # intra), per-MB intra flag — MV prediction and deblock bS inputs
    mv_x = np.zeros((mb_h * 4, mb_w * 4), np.int32)
    mv_y = np.zeros((mb_h * 4, mb_w * 4), np.int32)
    blk_ref = np.full((mb_h * 4, mb_w * 4), -1, np.int8)
    mb_intra = np.ones((mb_h, mb_w), bool)
    # decode-order block availability: a P_8x8 sub-partition's
    # above-right neighbour can be a LATER block of the same MB, which
    # the MV predictor must treat as unavailable (C -> D fallback)
    blk_done = np.zeros((mb_h * 4, mb_w * 4), bool)

    next_mb = 0
    total = mb_w * mb_h
    for sid, hd in enumerate(heads):
        if hd["first_mb"] != next_mb:
            return None  # gaps / arbitrary slice order: out of scope
        b = hd["b"]
        rbsp = hd["rbsp"]
        qp = hd["qp"]

        def n_ctx(tc_arr, by, bx, gran):
            # neighbours outside the CURRENT slice are unavailable
            na = nb = None
            if bx > 0 and mb_slice[by // gran, (bx - 1) // gran] == sid:
                na = int(tc_arr[by, bx - 1])
            if by > 0 and mb_slice[(by - 1) // gran, bx // gran] == sid:
                nb = int(tc_arr[by - 1, bx])
            if na is not None and nb is not None:
                return (na + nb + 1) >> 1
            if na is not None:
                return na
            if nb is not None:
                return nb
            return 0

        def n_ctx_chroma(tc_arr, by, bx):
            return n_ctx(tc_arr, by, bx, 2)

        def p_skip_mb(mb):
            """Reconstruct one P_Skip macroblock: inferred MV
            (8.4.1.1), pure MC copy, zero residual."""
            my, mx = divmod(mb, mb_w)
            mb_slice[my, mx] = sid
            mb_idc[my, mx] = hd["idc"]
            mb_offa[my, mx] = hd["off_a"]
            mb_offb[my, mx] = hd["off_b"]
            x0, y0 = mx * 16, my * 16
            bx0, by0 = mx * 4, my * 4
            mvx, mvy = _skip_mv(
                mv_x, mv_y, blk_ref, mb_slice, sid, by0, bx0, done=blk_done
            )
            y_plane[y0 : y0 + 16, x0 : x0 + 16] = _mc_luma(
                ref_y, x0, y0, 16, 16, mvx, mvy
            ).astype(np.uint8)
            cb_plane[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = (
                _mc_chroma(ref_cb, x0 // 2, y0 // 2, 8, 8, mvx, mvy)
            ).astype(np.uint8)
            cr_plane[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = (
                _mc_chroma(ref_cr, x0 // 2, y0 // 2, 8, 8, mvx, mvy)
            ).astype(np.uint8)
            mv_x[by0 : by0 + 4, bx0 : bx0 + 4] = mvx
            mv_y[by0 : by0 + 4, bx0 : bx0 + 4] = mvy
            blk_ref[by0 : by0 + 4, bx0 : bx0 + 4] = 0
            blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
            mb_intra[my, mx] = False
            mb_qp[my, mx] = qp  # no delta: running slice QP carries

        first_in_slice = True
        slice_is_p = hd["is_p"]
        while next_mb < total and (first_in_slice or b.more_rbsp_data()):
            first_in_slice = False
            if slice_is_p:
                skip_run = b.ue()
                if skip_run > total - next_mb:
                    return None
                for _ in range(skip_run):
                    p_skip_mb(next_mb)
                    next_mb += 1
                if next_mb >= total or not b.more_rbsp_data():
                    break
            mb = next_mb
            next_mb += 1
            my, mx = divmod(mb, mb_w)
            mb_slice[my, mx] = sid
            mb_idc[my, mx] = hd["idc"]
            mb_offa[my, mx] = hd["off_a"]
            mb_offb[my, mx] = hd["off_b"]
            x0, y0 = mx * 16, my * 16
            bx0, by0 = mx * 4, my * 4  # luma 4x4 block coords
            cx0, cy0 = mx * 2, my * 2  # chroma 4x4 block coords
            avail_l = mx > 0 and mb_slice[my, mx - 1] == sid
            avail_t = my > 0 and mb_slice[my - 1, mx] == sid
            avail_tl = (
                mx > 0 and my > 0 and mb_slice[my - 1, mx - 1] == sid
            )
            avail_tr = (
                my > 0 and mx + 1 < mb_w and mb_slice[my - 1, mx + 1] == sid
            )
            mb_type = b.ue()
            if slice_is_p:
                if mb_type < 5:
                    # inter macroblock: 16x16 / 16x8 / 8x16 MB
                    # partitions, or P_8x8(/ref0) with per-8x8
                    # sub-partitions (8x8/8x4/4x8/4x4, r14)
                    if mb_type == 0:
                        parts = [(0, 0, 4, 4, "16x16")]
                    elif mb_type == 1:
                        parts = [(0, 0, 4, 2, "16x8_top"),
                                 (2, 0, 4, 2, "16x8_bottom")]
                    elif mb_type == 2:
                        parts = [(0, 0, 2, 4, "8x16_left"),
                                 (0, 2, 2, 4, "8x16_right")]
                    else:  # P_8x8 / P_8x8ref0: sub_mb_types first
                        parts = []
                        for i8 in range(4):
                            st = b.ue()
                            if st > 3:
                                return None
                            ry8, rx8 = (i8 >> 1) * 2, (i8 & 1) * 2
                            if st == 0:
                                subs = [(0, 0, 2, 2)]
                            elif st == 1:  # 8x4: top, bottom
                                subs = [(0, 0, 2, 1), (1, 0, 2, 1)]
                            elif st == 2:  # 4x8: left, right
                                subs = [(0, 0, 1, 2), (0, 1, 1, 2)]
                            else:  # 4x4 z-order
                                subs = [(0, 0, 1, 1), (0, 1, 1, 1),
                                        (1, 0, 1, 1), (1, 1, 1, 1)]
                            for sy, sx, w4, h4 in subs:
                                parts.append(
                                    (ry8 + sy, rx8 + sx, w4, h4, f"sub{w4}")
                                )
                        # single reference: no ref_idx_l0 fields
                    mvs = []
                    for ry, rx, w4, h4, tag in parts:
                        # single reference: ref_idx_l0 not present
                        mvd_x = b.se()
                        mvd_y = b.se()
                        if abs(mvd_x) > (1 << 15) or abs(mvd_y) > (1 << 15):
                            return None
                        px, py = _mvp_for_partition(
                            mv_x, mv_y, blk_ref, mb_slice, sid,
                            by0 + ry, bx0 + rx, tag, done=blk_done,
                        )
                        mvx, mvy = px + mvd_x, py + mvd_y
                        mvs.append((ry, rx, w4, h4, mvx, mvy))
                        # later partitions of this MB predict from
                        # earlier ones: write through before the next
                        mv_x[by0 + ry : by0 + ry + h4,
                             bx0 + rx : bx0 + rx + w4] = mvx
                        mv_y[by0 + ry : by0 + ry + h4,
                             bx0 + rx : bx0 + rx + w4] = mvy
                        blk_ref[by0 + ry : by0 + ry + h4,
                                bx0 + rx : bx0 + rx + w4] = 0
                        blk_done[by0 + ry : by0 + ry + h4,
                                 bx0 + rx : bx0 + rx + w4] = True
                    code_num = b.ue()
                    if code_num > 47:
                        return None
                    cbp = _CBP_INTER[code_num]
                    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
                    if cbp_chroma == 3:
                        return None
                    if cbp:
                        delta = b.se()
                        if not -26 <= delta <= 25:
                            return None
                        qp = (qp + delta + 52) % 52
                    luma_coeffs = []
                    for z in range(16):
                        r, c = _Z4_INV[z]
                        by, bx = by0 + r, bx0 + c
                        if cbp_luma & (1 << (z >> 2)):
                            nc = n_ctx(luma_tc, by, bx, 4)
                            coeffs, tc = _cavlc_decode_block(b, nc, 16)
                        else:
                            coeffs, tc = [0] * 16, 0
                        luma_tc[by, bx] = tc
                        luma_coeffs.append(coeffs)
                    chroma_res = _parse_chroma_residual(
                        b, cbp_chroma, cb_tc, cr_tc, cy0, cx0, n_ctx_chroma
                    )
                    if chroma_res is None:
                        return None
                    pred = np.zeros((16, 16), np.int64)
                    pred_cb = np.zeros((8, 8), np.int64)
                    pred_cr = np.zeros((8, 8), np.int64)
                    for ry, rx, w4, h4, mvx, mvy in mvs:
                        pred[ry * 4 : (ry + h4) * 4,
                             rx * 4 : (rx + w4) * 4] = _mc_luma(
                            ref_y, x0 + rx * 4, y0 + ry * 4,
                            w4 * 4, h4 * 4, mvx, mvy,
                        )
                        pred_cb[ry * 2 : (ry + h4) * 2,
                                rx * 2 : (rx + w4) * 2] = _mc_chroma(
                            ref_cb, x0 // 2 + rx * 2, y0 // 2 + ry * 2,
                            w4 * 2, h4 * 2, mvx, mvy,
                        )
                        pred_cr[ry * 2 : (ry + h4) * 2,
                                rx * 2 : (rx + w4) * 2] = _mc_chroma(
                            ref_cr, x0 // 2 + rx * 2, y0 // 2 + ry * 2,
                            w4 * 2, h4 * 2, mvx, mvy,
                        )
                    for z in range(16):
                        r, c = _Z4_INV[z]
                        blk = np.zeros((4, 4), np.int64)
                        zz = luma_coeffs[z]
                        for k in range(16):
                            blk[_ZIGZAG[k] >> 2, _ZIGZAG[k] & 3] = zz[k]
                        sub = pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                        y_plane[
                            y0 + r * 4 : y0 + r * 4 + 4,
                            x0 + c * 4 : x0 + c * 4 + 4,
                        ] = _recon_block(sub, blk, qp)
                    _recon_chroma(
                        cb_plane, cr_plane, 0, chroma_res, qp,
                        pps["chroma_qp_offset"], x0 // 2, y0 // 2,
                        avail_l, avail_t, preds=(pred_cb, pred_cr),
                    )
                    mb_intra[my, mx] = False
                    mb_qp[my, mx] = qp
                    continue
                mb_type -= 5  # intra-in-P: same syntax, offset by 5
            if mb_type > 25:
                return None

            if mb_type == 25:  # I_PCM
                while b.pos % 8:
                    if b.u(1):
                        return None  # pcm_alignment_zero_bit must be 0
                need = 256 + 128
                if b.pos // 8 + need > len(rbsp):
                    return None
                base = b.pos // 8
                y_plane[y0 : y0 + 16, x0 : x0 + 16] = np.frombuffer(
                    rbsp, np.uint8, 256, base
                ).reshape(16, 16)
                cb_plane[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = (
                    np.frombuffer(rbsp, np.uint8, 64, base + 256).reshape(8, 8)
                )
                cr_plane[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = (
                    np.frombuffer(rbsp, np.uint8, 64, base + 320).reshape(8, 8)
                )
                b.pos += need * 8
                luma_tc[by0 : by0 + 4, bx0 : bx0 + 4] = 16
                cb_tc[cy0 : cy0 + 2, cx0 : cx0 + 2] = 16
                cr_tc[cy0 : cy0 + 2, cx0 : cx0 + 2] = 16
                # QP carries over unchanged; i4 modes stay -1
                mb_qp[my, mx] = qp
                mb_pcm[my, mx] = True  # filters as QP 0 (8.7.2)
                blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
                continue

            if mb_type == 0:  # I_4x4 (I_NxN)
                modes = [0] * 16
                for z in range(16):
                    r, c = _Z4_INV[z]
                    by, bx = by0 + r, bx0 + c
                    left = (
                        int(i4_modes[by, bx - 1])
                        if bx > 0 and mb_slice[by // 4, (bx - 1) // 4] == sid
                        else -1
                    )
                    top = (
                        int(i4_modes[by - 1, bx])
                        if by > 0 and mb_slice[(by - 1) // 4, bx // 4] == sid
                        else -1
                    )
                    pred_mode = min(
                        left if left >= 0 else 2, top if top >= 0 else 2
                    )
                    if b.flag():  # prev_intra4x4_pred_mode_flag
                        modes[z] = pred_mode
                    else:
                        rem = b.u(3)
                        modes[z] = rem if rem < pred_mode else rem + 1
                    i4_modes[by, bx] = modes[z]
                chroma_mode = b.ue()
                if chroma_mode > 3:
                    return None
                code_num = b.ue()
                if code_num > 47:
                    return None
                cbp = _CBP_INTRA[code_num]
                cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
                if cbp_chroma == 3:
                    return None
                if cbp:
                    delta = b.se()
                    if not -26 <= delta <= 25:
                        return None
                    qp = (qp + delta + 52) % 52
                # parse luma residuals (z-scan), then chroma
                luma_coeffs = []
                for z in range(16):
                    r, c = _Z4_INV[z]
                    by, bx = by0 + r, bx0 + c
                    if cbp_luma & (1 << (z >> 2)):
                        nc = n_ctx(luma_tc, by, bx, 4)
                        coeffs, tc = _cavlc_decode_block(b, nc, 16)
                    else:
                        coeffs, tc = [0] * 16, 0
                    luma_tc[by, bx] = tc
                    luma_coeffs.append(coeffs)
                chroma_res = _parse_chroma_residual(
                    b, cbp_chroma, cb_tc, cr_tc, cy0, cx0, n_ctx_chroma
                )
                if chroma_res is None:
                    return None
                # reconstruct luma 4x4 blocks in z-scan order
                for z in range(16):
                    r, c = _Z4_INV[z]
                    sx, sy = x0 + c * 4, y0 + r * 4
                    al = avail_l if c == 0 else True
                    at = avail_t if r == 0 else True
                    if r == 0 and c == 0:
                        atl = avail_tl
                    elif r == 0:
                        atl = avail_t
                    elif c == 0:
                        atl = avail_l
                    else:
                        atl = True
                    if r == 0:
                        atr = avail_t if c < 3 else avail_tr
                    else:
                        atr = c < 3 and _Z4[r - 1][c + 1] < z
                    zz = luma_coeffs[z]
                    blk = np.zeros((4, 4), np.int64)
                    for k in range(16):
                        blk[_ZIGZAG[k] >> 2, _ZIGZAG[k] & 3] = zz[k]
                    pred = _pred4x4(
                        modes[z], y_plane, sx, sy, al, at, atl, atr
                    )
                    y_plane[sy : sy + 4, sx : sx + 4] = _recon_block(
                        pred, blk, qp
                    )
                _recon_chroma(
                    cb_plane, cr_plane, chroma_mode, chroma_res, qp,
                    pps["chroma_qp_offset"], x0 // 2, y0 // 2,
                    avail_l, avail_t,
                )
                mb_qp[my, mx] = qp
                blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
                continue

            # I_16x16
            m = mb_type - 1
            pred16 = m % 4
            cbp_chroma = (m // 4) % 3
            cbp_luma = 15 if m >= 12 else 0
            if (pred16 == 0 and not avail_t) or (
                pred16 == 1 and not avail_l
            ) or (pred16 == 3 and not (avail_l and avail_t)):
                return None
            chroma_mode = b.ue()
            if chroma_mode > 3:
                return None
            delta = b.se()
            if not -26 <= delta <= 25:
                return None
            qp = (qp + delta + 52) % 52
            # luma DC (16 coeffs, context of block 0)
            nc = n_ctx(luma_tc, by0, bx0, 4)
            dc_coeffs, _dc_tc = _cavlc_decode_block(b, nc, 16)
            luma_coeffs = []
            for z in range(16):
                r, c = _Z4_INV[z]
                by, bx = by0 + r, bx0 + c
                if cbp_luma:
                    nc = n_ctx(luma_tc, by, bx, 4)
                    coeffs, tc = _cavlc_decode_block(b, nc, 15)
                else:
                    coeffs, tc = [0] * 15, 0
                luma_tc[by, bx] = tc
                luma_coeffs.append(coeffs)
            chroma_res = _parse_chroma_residual(
                b, cbp_chroma, cb_tc, cr_tc, cy0, cx0, n_ctx_chroma
            )
            if chroma_res is None:
                return None
            i4_modes[by0 : by0 + 4, bx0 : bx0 + 4] = -1
            # reconstruct: 16x16 prediction, DC hadamard, per-block AC
            pred = _pred16x16(pred16, y_plane, x0, y0, avail_l, avail_t)
            dcm = np.zeros((4, 4), np.int64)
            for k in range(16):
                dcm[_ZIGZAG[k] >> 2, _ZIGZAG[k] & 3] = dc_coeffs[k]
            f = _HAD4 @ dcm @ _HAD4
            dc_deq = _luma_dc_dequant(f, qp)
            for z in range(16):
                r, c = _Z4_INV[z]
                blk = np.zeros((4, 4), np.int64)
                zz = luma_coeffs[z]
                for k in range(15):
                    blk[_ZIGZAG[k + 1] >> 2, _ZIGZAG[k + 1] & 3] = zz[k]
                sub = pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                y_plane[
                    y0 + r * 4 : y0 + r * 4 + 4, x0 + c * 4 : x0 + c * 4 + 4
                ] = _recon_block(sub, blk, qp, dc_override=int(dc_deq[r, c]))
            _recon_chroma(
                cb_plane, cr_plane, chroma_mode, chroma_res, qp,
                pps["chroma_qp_offset"], x0 // 2, y0 // 2, avail_l, avail_t,
            )
            mb_qp[my, mx] = qp
            blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True

    if next_mb != total:
        return None  # picture not fully covered by its slices
    _deblock_picture(
        y_plane, cb_plane, cr_plane, mb_qp, mb_pcm, mb_idc, mb_slice,
        mb_offa, mb_offb, pps["chroma_qp_offset"],
        mb_intra=mb_intra, luma_tc=luma_tc, mv_x=mv_x, mv_y=mv_y,
        blk_ref=blk_ref,
    )
    return y_plane, cb_plane, cr_plane, sps


def _parse_chroma_residual(b, cbp_chroma, cb_tc, cr_tc, cy0, cx0, n_ctx):
    """Parse chroma DC + AC blocks for one MB -> (dc_cb, dc_cr, ac_cb,
    ac_ac lists) or None. Updates the chroma total_coeff contexts."""
    dc = {0: [0] * 4, 1: [0] * 4}
    ac = {0: [[0] * 15 for _ in range(4)], 1: [[0] * 15 for _ in range(4)]}
    if cbp_chroma > 0:
        for comp in (0, 1):
            coeffs, _tc = _cavlc_decode_block(b, -1, 4)
            dc[comp] = coeffs
    for comp, tc_arr in ((0, cb_tc), (1, cr_tc)):
        for z in range(4):
            r, c = z >> 1, z & 1
            by, bx = cy0 + r, cx0 + c
            if cbp_chroma == 2:
                nc = n_ctx(tc_arr, by, bx)
                coeffs, tc = _cavlc_decode_block(b, nc, 15)
                ac[comp][z] = coeffs
            else:
                tc = 0
            tc_arr[by, bx] = tc
    return dc, ac


def _recon_chroma(cb_plane, cr_plane, mode, res, qp_y, qp_off, cx, cy,
                  avail_l, avail_t, preds=None):
    """Reconstruct both 8x8 chroma blocks of one MB. ``preds`` (r14)
    supplies motion-compensated predictions for inter macroblocks —
    when given, ``mode``/availability are ignored and no intra
    prediction is computed."""
    dc, ac = res
    qpc = _chroma_qp(qp_y, qp_off)
    for comp, plane in ((0, cb_plane), (1, cr_plane)):
        if preds is not None:
            pred = preds[comp]
        else:
            pred = _pred_chroma(mode, plane, cx, cy, avail_l, avail_t)
        # 2x2 DC hadamard + dequant (raster-scanned coefficients)
        d = dc[comp]
        f00 = d[0] + d[1] + d[2] + d[3]
        f01 = d[0] - d[1] + d[2] - d[3]
        f10 = d[0] + d[1] - d[2] - d[3]
        f11 = d[0] - d[1] - d[2] + d[3]
        dcs = (
            (_chroma_dc_dequant(f00, qpc), _chroma_dc_dequant(f01, qpc)),
            (_chroma_dc_dequant(f10, qpc), _chroma_dc_dequant(f11, qpc)),
        )
        for z in range(4):
            r, c = z >> 1, z & 1
            blk = np.zeros((4, 4), np.int64)
            zz = ac[comp][z]
            for k in range(15):
                blk[_ZIGZAG[k + 1] >> 2, _ZIGZAG[k + 1] & 3] = zz[k]
            sub = pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
            plane[
                cy + r * 4 : cy + r * 4 + 4, cx + c * 4 : cx + c * 4 + 4
            ] = _recon_block(sub, blk, qpc, dc_override=dcs[r][c])


def _h264_frames(payload: bytes, max_frames: int = -1, every_n: int = 1):
    """REAL H.264 intra decode -> list of (frame_index, w, h, rgb
    bytes) or None.

    Annex B elementary streams of IDR I-slices (the Baseline intra
    subset this module implements — see the module docstring for the
    honest-rejection list). A picture may span MULTIPLE slices: a
    slice whose first_mb_in_slice == 0 opens a new picture and the
    following slices complete it. ``max_frames`` >= 0 stops after
    that many decoded pictures; ``every_n`` decodes every n-th IDR
    picture only — skipped pictures cost one NAL scan and ZERO
    entropy/pixel work (sampling cost scales with frames KEPT, the
    sample_avi_frames discipline)."""
    try:
        nals = _split_nals(payload)
        if not nals:
            return None
        sps_map, pps_map = {}, {}
        pictures = []  # list of (is_idr, nal_ref_idc, [slice rbsp, ...])
        for typ, ref_idc, rbsp in nals:
            if typ == 7:
                sps = _parse_sps(rbsp)
                if sps is None:
                    return None
                sps_map[sps["id"]] = sps
            elif typ == 8:
                pps = _parse_pps(rbsp)
                if pps is None:
                    return None
                pps_map[pps["id"]] = pps
            elif typ in (1, 5):  # 5 = IDR; 1 = non-IDR (P subset, r14)
                if _Bits(rbsp).ue() == 0:  # first_mb == 0: new picture
                    pictures.append((typ == 5, ref_idc, [rbsp]))
                elif pictures and pictures[-1][0] == (typ == 5):
                    pictures[-1][2].append(rbsp)
                else:
                    return None
            # SEI (6), AUD (9), filler (12), end-of-* (10/11): skipped
        frames = []
        ref = None  # last decoded reference picture (filtered planes)
        have_inter = any(not p[0] for p in pictures)
        for idx, (is_idr, ref_idc, slices) in enumerate(pictures):
            if 0 <= max_frames <= len(frames):
                break
            if idx % max(1, every_n) and not have_inter:
                continue  # skipped intra picture: no decode work at all
            got = _decode_picture(slices, sps_map, pps_map, is_idr, ref)
            if got is None:
                return None
            y, cb, cr, sps = got
            if ref_idc != 0:
                # reference pictures update the (single-entry) DPB;
                # non-reference pictures are display-only
                ref = (y, cb, cr)
            if idx % max(1, every_n):
                continue  # inter GOPs: decoded as a reference, not kept
            frames.append((idx, got))
        if not frames:
            return None
        return [
            (idx, *_planes_to_rgb(y, cb, cr, sps))
            for idx, (y, cb, cr, sps) in frames
        ]
    except (EOFError, ValueError, IndexError, struct.error):
        return None


def _planes_to_rgb(y, cb, cr, sps):
    """Upsample + convert decoded planes to display-cropped RGB bytes
    (full-range JFIF matrix, the repo-wide convention)."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        _ycbcr_to_rgb,
    )

    cb_up = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
    cr_up = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
    rgb = _ycbcr_to_rgb(
        y.astype(np.float64),
        cb_up.astype(np.float64),
        cr_up.astype(np.float64),
    )
    left, _right, top, _bottom = sps["crop"]
    w, h = sps["width"], sps["height"]
    rgb = rgb[2 * top : 2 * top + h, 2 * left : 2 * left + w]
    return w, h, np.ascontiguousarray(rgb).tobytes()


# ---------------------------------------------------------------------------
# forward encoder (fixtures/tests only — the independent direction)
# ---------------------------------------------------------------------------


def _rgb_to_yuv420(img):
    """RGB -> (y, cb, cr) uint8 planes, chroma 2x2 box-averaged (the
    repo-wide JFIF full-range convention, mirroring _y4m_build)."""
    h, w = img.shape[:2]
    rgb = img.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    y = np.clip(np.rint(y), 0, 255).astype(np.uint8)
    cb = np.clip(
        np.rint(cb.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))), 0, 255
    ).astype(np.uint8)
    cr = np.clip(
        np.rint(cr.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))), 0, 255
    ).astype(np.uint8)
    return y, cb, cr


def _quant_dc(f, qp: int):
    """Quantise a post-Hadamard DC matrix (double rounding offset,
    extra >>1 — the standard DC companion of _quant4x4)."""
    qbits = 15 + qp // 6
    off = 2 * ((1 << qbits) // 3)
    mf00 = _MF_TAB[qp % 6][0]
    return (np.sign(f) * ((np.abs(f) * mf00 + off) >> (qbits + 1))).astype(
        np.int64
    )


def _zigzag_list(blk, skip_dc=False):
    out = []
    for k in range(1 if skip_dc else 0, 16):
        out.append(int(blk[_ZIGZAG[k] >> 2, _ZIGZAG[k] & 3]))
    return out


def _write_sps(mb_w, mb_h, crop, level=30):
    w = _BitW()
    w.u(66, 8)  # profile_idc: Baseline
    w.u(0xC0, 8)  # constraint_set0/1
    w.u(level, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type
    w.ue(1)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(mb_w - 1)
    w.ue(mb_h - 1)
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    if any(crop):
        w.u(1, 1)
        for v in crop:
            w.ue(v)
    else:
        w.u(0, 1)
    w.u(0, 1)  # vui_parameters_present_flag
    w.rbsp_trailing()
    return w.getvalue()


def _write_pps(init_qp, chroma_qp_offset=0, deblock_ctrl=True):
    w = _BitW()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.u(0, 1)  # entropy_coding_mode_flag: CAVLC
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_active_minus1
    w.ue(0)  # num_ref_idx_l1_active_minus1
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.se(init_qp - 26)
    w.se(0)  # pic_init_qs_minus26
    w.se(chroma_qp_offset)
    w.u(1 if deblock_ctrl else 0, 1)  # deblocking_filter_control_present
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return w.getvalue()


def _h264_build(frames_rgb, qp: int = 28, chroma_qp_offset: int = 0,
                return_recon: bool = False, deblock: bool = False,
                deblock_offsets=(0, 0), pps_deblock_ctrl: bool = True,
                slices: int = 1, idc2: bool = False, gop: int = 1):
    """Forward H.264 builder for fixtures/tests: Annex B stream over
    (h, w, 3) uint8 RGB frames (even dims). With the default
    ``gop=1`` every frame is an IDR picture cycling I_PCM / I_16x16
    (all four prediction modes) / I_4x4 (all nine) macroblocks with
    varying mb_qp_delta — byte-identical to the pre-r14 builder.
    ``gop=N`` (r14, VERDICT r13 #7) makes every N-th frame an IDR and
    the rest P pictures referencing the previous reconstruction (see
    ``_encode_p_picture`` for the inter macroblock plan). ``deblock``
    emits disable_deblocking_filter_idc = 0 (+ the div2 alpha/beta
    offsets) and runs the in-loop filter over the reconstruction.
    With ``return_recon`` also returns the per-frame reconstructed
    (y, cb, cr) planes (cropped) that a conformant decoder MUST
    reproduce bit-exactly. Not exported API."""
    f0 = frames_rgb[0]
    h, w = f0.shape[:2]
    if h % 2 or w % 2:
        raise ValueError("even frame dims required (4:2:0)")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    W, H = mb_w * 16, mb_h * 16
    crop = (0, (W - w) // 2, 0, (H - h) // 2)  # left right top bottom
    if not pps_deblock_ctrl:
        # implicit filter: the PPS omits the control flag, so the
        # slice header carries no idc/offsets and the filter is ON
        assert deblock and deblock_offsets == (0, 0)
    out = bytearray()
    out += _wrap_nal(7, 3, _write_sps(mb_w, mb_h, crop))
    out += _wrap_nal(
        8, 3, _write_pps(qp, chroma_qp_offset, deblock_ctrl=pps_deblock_ctrl)
    )
    recons = []
    prev_planes = None  # full (uncropped) reference planes
    frame_num = 0
    for fi, img in enumerate(frames_rgb):
        assert img.shape[:2] == (h, w)
        y_src, cb_src, cr_src = _rgb_to_yuv420(img.astype(np.uint8))
        y_src = np.pad(y_src, ((0, H - h), (0, W - w)), mode="edge")
        cb_src = np.pad(
            cb_src, ((0, (H - h) // 2), (0, (W - w) // 2)), mode="edge"
        )
        cr_src = np.pad(
            cr_src, ((0, (H - h) // 2), (0, (W - w) // 2)), mode="edge"
        )
        is_idr = gop <= 1 or fi % gop == 0
        if is_idr:
            frame_num = 0
            rbsps, planes = _encode_idr_picture(
                y_src, cb_src, cr_src, mb_w, mb_h, qp, chroma_qp_offset, fi,
                deblock=deblock, deblock_offsets=deblock_offsets,
                write_idc=pps_deblock_ctrl, n_slices=slices, idc2=idc2,
            )
        else:
            frame_num += 1
            rbsps, planes = _encode_p_picture(
                y_src, cb_src, cr_src, mb_w, mb_h, qp, chroma_qp_offset,
                frame_num, fi, prev_planes,
                deblock=deblock, deblock_offsets=deblock_offsets,
                write_idc=pps_deblock_ctrl, n_slices=slices, idc2=idc2,
            )
        for rbsp in rbsps:
            out += _wrap_nal(5 if is_idr else 1, 3, rbsp)
        prev_planes = planes
        if return_recon:
            yp, cbp_, crp = planes
            recons.append(
                (yp[:h, :w], cbp_[: h // 2, : w // 2], crp[: h // 2, : w // 2])
            )
    return (bytes(out), recons) if return_recon else bytes(out)


def _encode_idr_picture(y_src, cb_src, cr_src, mb_w, mb_h, slice_qp,
                        chroma_qp_offset, frame_idx, deblock=False,
                        deblock_offsets=(0, 0), write_idc=True,
                        n_slices=1, idc2=False):
    """Encode one IDR picture as ``n_slices`` contiguous I-slices;
    returns ([slice rbsp, ...], recon planes). Slice independence is
    honoured exactly as the decoder requires: prediction, CAVLC
    contexts and the intra-4x4 mode predictor never cross a slice
    boundary, and with idc 2 the loop filter skips cross-slice
    macroblock edges."""
    W, H = mb_w * 16, mb_h * 16
    total = mb_w * mb_h
    n_slices = max(1, min(n_slices, total))
    bounds = [total * k // n_slices for k in range(n_slices + 1)]

    y_rec = np.zeros((H, W), np.uint8)
    cb_rec = np.zeros((H // 2, W // 2), np.uint8)
    cr_rec = np.zeros((H // 2, W // 2), np.uint8)
    luma_tc = np.zeros((mb_h * 4, mb_w * 4), np.int16)
    cb_tc = np.zeros((mb_h * 2, mb_w * 2), np.int16)
    cr_tc = np.zeros((mb_h * 2, mb_w * 2), np.int16)
    i4_modes = np.full((mb_h * 4, mb_w * 4), -1, np.int8)
    mb_qp = np.zeros((mb_h, mb_w), np.int16)
    mb_pcm = np.zeros((mb_h, mb_w), bool)
    mb_slice = np.full((mb_h, mb_w), -1, np.int32)
    mb_idc = np.zeros((mb_h, mb_w), np.int16)
    mb_offa = np.zeros((mb_h, mb_w), np.int16)
    mb_offb = np.zeros((mb_h, mb_w), np.int16)
    eff_idc = ((2 if idc2 else 0) if deblock else 1) if write_idc else 0

    rbsps = []
    for sid in range(n_slices):
        w = _BitW()
        w.ue(bounds[sid])  # first_mb_in_slice
        w.ue(7)  # slice_type: I (all slices in picture)
        w.ue(0)  # pic_parameter_set_id
        w.u(0, 4)  # frame_num (log2_max_frame_num == 4)
        w.ue(frame_idx & 1)  # idr_pic_id (alternate between IDRs)
        w.u(0, 1)  # no_output_of_prior_pics_flag
        w.u(0, 1)  # long_term_reference_flag
        w.se(0)  # slice_qp_delta
        if write_idc:
            if deblock:
                # idc 0 = filter everything; idc 2 = keep slice
                # boundaries unfiltered (both carry the offsets)
                w.ue(2 if idc2 else 0)
                w.se(deblock_offsets[0])
                w.se(deblock_offsets[1])
            else:
                w.ue(1)  # filter off

        def n_ctx(tc_arr, by, bx, gran):
            na = nb = None
            if bx > 0 and mb_slice[by // gran, (bx - 1) // gran] == sid:
                na = int(tc_arr[by, bx - 1])
            if by > 0 and mb_slice[(by - 1) // gran, bx // gran] == sid:
                nb = int(tc_arr[by - 1, bx])
            if na is not None and nb is not None:
                return (na + nb + 1) >> 1
            if na is not None:
                return na
            if nb is not None:
                return nb
            return 0

        def n_ctx_chroma(tc_arr, by, bx):
            return n_ctx(tc_arr, by, bx, 2)

        qp = slice_qp
        for mb in range(bounds[sid], bounds[sid + 1]):
            my, mx = divmod(mb, mb_w)
            mb_slice[my, mx] = sid
            mb_idc[my, mx] = eff_idc
            mb_offa[my, mx] = 2 * deblock_offsets[0]
            mb_offb[my, mx] = 2 * deblock_offsets[1]
            x0, y0 = mx * 16, my * 16
            bx0, by0 = mx * 4, my * 4
            cx0, cy0 = mx * 2, my * 2
            avail_l = mx > 0 and mb_slice[my, mx - 1] == sid
            avail_t = my > 0 and mb_slice[my - 1, mx] == sid
            avail_tl = mx > 0 and my > 0 and mb_slice[my - 1, mx - 1] == sid
            avail_tr = (
                my > 0 and mx + 1 < mb_w and mb_slice[my - 1, mx + 1] == sid
            )
            sel = (mx + 2 * my + 3 * frame_idx) % 7
            desired_qp = min(46, max(10, slice_qp + ((mb * 7) % 5) - 2))

            if sel == 0:  # I_PCM
                w.ue(25)
                w.byte_align_zero()
                for v in y_src[y0 : y0 + 16, x0 : x0 + 16].ravel():
                    w.u(int(v), 8)
                for pl in (cb_src, cr_src):
                    for v in pl[
                        y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8
                    ].ravel():
                        w.u(int(v), 8)
                y_rec[y0 : y0 + 16, x0 : x0 + 16] = y_src[
                    y0 : y0 + 16, x0 : x0 + 16
                ]
                cb_rec[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = cb_src[
                    y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8
                ]
                cr_rec[y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8] = cr_src[
                    y0 // 2 : y0 // 2 + 8, x0 // 2 : x0 // 2 + 8
                ]
                luma_tc[by0 : by0 + 4, bx0 : bx0 + 4] = 16
                cb_tc[cy0 : cy0 + 2, cx0 : cx0 + 2] = 16
                cr_tc[cy0 : cy0 + 2, cx0 : cx0 + 2] = 16
                i4_modes[by0 : by0 + 4, bx0 : bx0 + 4] = -1
                mb_qp[my, mx] = qp
                mb_pcm[my, mx] = True
                continue

            # chroma mode plan: DC always legal, others availability-gated
            cm_want = (mb + frame_idx) % 4
            legal_cm = [0]
            if avail_l:
                legal_cm.append(1)
            if avail_t:
                legal_cm.append(2)
            if avail_l and avail_t:
                legal_cm.append(3)
            chroma_mode = cm_want if cm_want in legal_cm else 0

            if sel in (1, 2, 3, 6):  # I_16x16
                want = {1: 2, 2: 0, 3: 3, 6: 1}[sel]
                if want == 0 and not avail_t:
                    want = 2
                elif want == 1 and not avail_l:
                    want = 2
                elif want == 3 and not (avail_l and avail_t):
                    want = 2
                new_qp = desired_qp  # always codable for I_16x16
                qpc = _chroma_qp(new_qp, chroma_qp_offset)
                pred = _pred16x16(want, y_rec, x0, y0, avail_l, avail_t)
                dcm = np.zeros((4, 4), np.int64)
                ac_z = [None] * 16
                for z in range(16):
                    r, c = _Z4_INV[z]
                    orig = y_src[
                        y0 + r * 4 : y0 + r * 4 + 4,
                        x0 + c * 4 : x0 + c * 4 + 4,
                    ].astype(np.int64)
                    res = orig - pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                    wm = _fwd_core(res)
                    dcm[r, c] = wm[0, 0]
                    ac_z[z] = _zigzag_list(
                        _quant4x4(wm, new_qp, skip_dc=True), skip_dc=True
                    )
                cbp_luma = 15 if any(any(v for v in zz) for zz in ac_z) else 0
                f = _HAD4 @ dcm @ _HAD4
                z_dc = _quant_dc(f, new_qp)
                cres = _encode_chroma_blocks(
                    cb_src, cr_src, cb_rec, cr_rec, chroma_mode, x0 // 2,
                    y0 // 2, avail_l, avail_t, qpc,
                )
                cbp_chroma, dc_q, ac_q = cres
                m = want + 4 * cbp_chroma + (12 if cbp_luma else 0)
                w.ue(1 + m)
                w.ue(chroma_mode)
                w.se(new_qp - qp)
                qp = new_qp
                nc = n_ctx(luma_tc, by0, bx0, 4)
                _cavlc_encode_block(w, _zigzag_list(z_dc), nc, 16)
                for z in range(16):
                    r, c = _Z4_INV[z]
                    by, bx = by0 + r, bx0 + c
                    if cbp_luma:
                        nc = n_ctx(luma_tc, by, bx, 4)
                        tc = _cavlc_encode_block(w, ac_z[z], nc, 15)
                    else:
                        tc = 0
                    luma_tc[by, bx] = tc
                _write_chroma_residual(
                    w, cbp_chroma, dc_q, ac_q, cb_tc, cr_tc, cy0, cx0,
                    n_ctx_chroma,
                )
                i4_modes[by0 : by0 + 4, bx0 : bx0 + 4] = -1
                # reconstruct exactly as the decoder will
                f_rec = _HAD4 @ z_dc @ _HAD4
                dc_deq = _luma_dc_dequant(f_rec, qp)
                for z in range(16):
                    r, c = _Z4_INV[z]
                    blk = np.zeros((4, 4), np.int64)
                    for k in range(15):
                        blk[_ZIGZAG[k + 1] >> 2, _ZIGZAG[k + 1] & 3] = ac_z[z][k]
                    sub = pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                    y_rec[
                        y0 + r * 4 : y0 + r * 4 + 4,
                        x0 + c * 4 : x0 + c * 4 + 4,
                    ] = _recon_block(sub, blk, qp, dc_override=int(dc_deq[r, c]))
                _recon_chroma(
                    cb_rec, cr_rec, chroma_mode, (dc_q, ac_q), qp,
                    chroma_qp_offset, x0 // 2, y0 // 2, avail_l, avail_t,
                )
                mb_qp[my, mx] = qp
                continue

            # I_4x4 (sel 4 or 5)
            trial_qp = desired_qp
            qpc = _chroma_qp(trial_qp, chroma_qp_offset)
            modes = [0] * 16
            coeffs_z = [None] * 16
            # first pass: choose modes, quantise, reconstruct per block
            for z in range(16):
                r, c = _Z4_INV[z]
                by, bx = by0 + r, bx0 + c
                sx, sy = x0 + c * 4, y0 + r * 4
                al = avail_l if c == 0 else True
                at = avail_t if r == 0 else True
                if r == 0 and c == 0:
                    atl = avail_tl
                elif r == 0:
                    atl = avail_t
                elif c == 0:
                    atl = avail_l
                else:
                    atl = True
                if r == 0:
                    atr = avail_t if c < 3 else avail_tr
                else:
                    atr = c < 3 and _Z4[r - 1][c + 1] < z
                legal = [2]
                if at:
                    legal += [0, 3, 7]
                if al:
                    legal += [1, 8]
                if al and at and atl:
                    legal += [4, 5, 6]
                mode = (
                    2 if sel == 4 else legal[(z + mb + frame_idx) % len(legal)]
                )
                modes[z] = mode
                pred = _pred4x4(mode, y_rec, sx, sy, al, at, atl, atr)
                orig = y_src[sy : sy + 4, sx : sx + 4].astype(np.int64)
                zq = _quant4x4(_fwd_core(orig - pred), trial_qp)
                coeffs_z[z] = _zigzag_list(zq)
                blk = np.zeros((4, 4), np.int64)
                for k in range(16):
                    blk[_ZIGZAG[k] >> 2, _ZIGZAG[k] & 3] = coeffs_z[z][k]
                y_rec[sy : sy + 4, sx : sx + 4] = _recon_block(
                    pred, blk, trial_qp
                )
                i4_modes[by, bx] = mode
            cbp_luma = 0
            for z in range(16):
                if any(coeffs_z[z]):
                    cbp_luma |= 1 << (z >> 2)
            cres = _encode_chroma_blocks(
                cb_src, cr_src, cb_rec, cr_rec, chroma_mode, x0 // 2,
                y0 // 2, avail_l, avail_t, qpc,
            )
            cbp_chroma, dc_q, ac_q = cres
            cbp = cbp_luma | (cbp_chroma << 4)
            # NOTE: if cbp == 0 no mb_qp_delta is coded and qp stays —
            # the residuals are all zero, so trial_qp never mattered
            w.ue(0)  # mb_type I_NxN
            for z in range(16):
                r, c = _Z4_INV[z]
                by, bx = by0 + r, bx0 + c
                left = (
                    int(i4_modes[by, bx - 1])
                    if bx > 0 and mb_slice[by // 4, (bx - 1) // 4] == sid
                    else -1
                )
                top = (
                    int(i4_modes[by - 1, bx])
                    if by > 0 and mb_slice[(by - 1) // 4, bx // 4] == sid
                    else -1
                )
                pred_mode = min(
                    left if left >= 0 else 2, top if top >= 0 else 2
                )
                if modes[z] == pred_mode:
                    w.u(1, 1)
                else:
                    w.u(0, 1)
                    rem = modes[z] if modes[z] < pred_mode else modes[z] - 1
                    w.u(rem, 3)
            w.ue(chroma_mode)
            w.ue(_CBP_INTRA_INV[cbp])
            if cbp:
                w.se(trial_qp - qp)
                qp = trial_qp
            for z in range(16):
                r, c = _Z4_INV[z]
                by, bx = by0 + r, bx0 + c
                if cbp_luma & (1 << (z >> 2)):
                    nc = n_ctx(luma_tc, by, bx, 4)
                    tc = _cavlc_encode_block(w, coeffs_z[z], nc, 16)
                else:
                    tc = 0
                luma_tc[by, bx] = tc
            _write_chroma_residual(
                w, cbp_chroma, dc_q, ac_q, cb_tc, cr_tc, cy0, cx0,
                n_ctx_chroma,
            )
            _recon_chroma(
                cb_rec, cr_rec, chroma_mode, (dc_q, ac_q),
                qp, chroma_qp_offset, x0 // 2, y0 // 2,
                avail_l, avail_t,
            )
            mb_qp[my, mx] = qp

        w.rbsp_trailing()
        rbsps.append(w.getvalue())

    _deblock_picture(
        y_rec, cb_rec, cr_rec, mb_qp, mb_pcm, mb_idc, mb_slice,
        mb_offa, mb_offb, chroma_qp_offset,
    )
    return rbsps, (y_rec, cb_rec, cr_rec)


def _encode_p_picture(y_src, cb_src, cr_src, mb_w, mb_h, slice_qp,
                      chroma_qp_offset, frame_num, frame_idx, ref_planes,
                      deblock=False, deblock_offsets=(0, 0),
                      write_idc=True, n_slices=1, idc2=False):
    """Encode one P picture (r14, VERDICT r13 #7) as ``n_slices``
    contiguous P-slices; returns ([slice rbsp, ...], recon planes).

    The deterministic per-macroblock plan cycles P_Skip, zero-MV
    P_16x16, P_16x16 over every quarter-pel fractional position,
    out-of-frame MVs (edge-clamp path), P_16x8 and P_8x16 partitions
    (their directional MV-predictor rules), I_16x16 intra-in-P (the
    mb_type + 5 offset and the intra-neighbour MV/bS interactions),
    and qp-delta carrying macroblocks — so one GOP exercises the MC
    interpolator, the MV predictor, the skip-run syntax and every
    inter deblock bS value. Motion search is NOT the point (any MV is
    a valid encode); the pin is that the decoder reproduces this
    reconstruction bit for bit. Prediction/MC/MVP code is shared with
    the decoder — it is the format, like the intra predictors; the
    entropy writer, forward transforms and bookkeeping are this
    side's own."""
    W, H = mb_w * 16, mb_h * 16
    total = mb_w * mb_h
    n_slices = max(1, min(n_slices, total))
    bounds = [total * k // n_slices for k in range(n_slices + 1)]
    ref_y, ref_cb, ref_cr = ref_planes

    y_rec = np.zeros((H, W), np.uint8)
    cb_rec = np.zeros((H // 2, W // 2), np.uint8)
    cr_rec = np.zeros((H // 2, W // 2), np.uint8)
    luma_tc = np.zeros((mb_h * 4, mb_w * 4), np.int16)
    cb_tc = np.zeros((mb_h * 2, mb_w * 2), np.int16)
    cr_tc = np.zeros((mb_h * 2, mb_w * 2), np.int16)
    i4_modes = np.full((mb_h * 4, mb_w * 4), -1, np.int8)
    mb_qp = np.zeros((mb_h, mb_w), np.int16)
    mb_pcm = np.zeros((mb_h, mb_w), bool)
    mb_slice = np.full((mb_h, mb_w), -1, np.int32)
    mb_idc = np.zeros((mb_h, mb_w), np.int16)
    mb_offa = np.zeros((mb_h, mb_w), np.int16)
    mb_offb = np.zeros((mb_h, mb_w), np.int16)
    mv_x = np.zeros((mb_h * 4, mb_w * 4), np.int32)
    mv_y = np.zeros((mb_h * 4, mb_w * 4), np.int32)
    blk_ref = np.full((mb_h * 4, mb_w * 4), -1, np.int8)
    mb_intra = np.ones((mb_h, mb_w), bool)
    blk_done = np.zeros((mb_h * 4, mb_w * 4), bool)
    eff_idc = ((2 if idc2 else 0) if deblock else 1) if write_idc else 0

    rbsps = []
    for sid in range(n_slices):
        w = _BitW()
        w.ue(bounds[sid])  # first_mb_in_slice
        w.ue(5)  # slice_type: P (all slices in picture)
        w.ue(0)  # pic_parameter_set_id
        w.u(frame_num % 16, 4)  # frame_num (log2_max_frame_num == 4)
        w.u(0, 1)  # num_ref_idx_active_override_flag
        w.u(0, 1)  # ref_pic_list_modification_flag_l0
        w.u(0, 1)  # adaptive_ref_pic_marking_mode_flag (sliding window)
        w.se(0)  # slice_qp_delta
        if write_idc:
            if deblock:
                w.ue(2 if idc2 else 0)
                w.se(deblock_offsets[0])
                w.se(deblock_offsets[1])
            else:
                w.ue(1)  # filter off

        def n_ctx(tc_arr, by, bx, gran):
            na = nb = None
            if bx > 0 and mb_slice[by // gran, (bx - 1) // gran] == sid:
                na = int(tc_arr[by, bx - 1])
            if by > 0 and mb_slice[(by - 1) // gran, bx // gran] == sid:
                nb = int(tc_arr[by - 1, bx])
            if na is not None and nb is not None:
                return (na + nb + 1) >> 1
            if na is not None:
                return na
            if nb is not None:
                return nb
            return 0

        def n_ctx_chroma(tc_arr, by, bx):
            return n_ctx(tc_arr, by, bx, 2)

        qp = slice_qp
        skip_run = 0
        for mb in range(bounds[sid], bounds[sid + 1]):
            my, mx = divmod(mb, mb_w)
            mb_slice[my, mx] = sid
            mb_idc[my, mx] = eff_idc
            mb_offa[my, mx] = 2 * deblock_offsets[0]
            mb_offb[my, mx] = 2 * deblock_offsets[1]
            x0, y0 = mx * 16, my * 16
            bx0, by0 = mx * 4, my * 4
            cx0, cy0 = mx * 2, my * 2
            avail_l = mx > 0 and mb_slice[my, mx - 1] == sid
            avail_t = my > 0 and mb_slice[my - 1, mx] == sid
            sel = (mx + 2 * my + 3 * frame_idx) % 9
            desired_qp = min(46, max(10, slice_qp + ((mb * 7) % 5) - 2))

            def mc_recon_16x16(mvx, mvy):
                return (
                    _mc_luma(ref_y, x0, y0, 16, 16, mvx, mvy),
                    _mc_chroma(ref_cb, x0 // 2, y0 // 2, 8, 8, mvx, mvy),
                    _mc_chroma(ref_cr, x0 // 2, y0 // 2, 8, 8, mvx, mvy),
                )

            if sel == 0:  # P_Skip
                mvx, mvy = _skip_mv(
                    mv_x, mv_y, blk_ref, mb_slice, sid, by0, bx0,
                    done=blk_done,
                )
                py_, pcb, pcr = mc_recon_16x16(mvx, mvy)
                y_rec[y0 : y0 + 16, x0 : x0 + 16] = py_.astype(np.uint8)
                cb_rec[cy0 * 4 : cy0 * 4 + 8, cx0 * 4 : cx0 * 4 + 8] = (
                    pcb.astype(np.uint8)
                )
                cr_rec[cy0 * 4 : cy0 * 4 + 8, cx0 * 4 : cx0 * 4 + 8] = (
                    pcr.astype(np.uint8)
                )
                mv_x[by0 : by0 + 4, bx0 : bx0 + 4] = mvx
                mv_y[by0 : by0 + 4, bx0 : bx0 + 4] = mvy
                blk_ref[by0 : by0 + 4, bx0 : bx0 + 4] = 0
                blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
                mb_intra[my, mx] = False
                mb_qp[my, mx] = qp
                skip_run += 1
                continue

            if sel == 6:  # I_16x16 intra-in-P (DC / availability-gated)
                w.ue(skip_run)
                skip_run = 0
                want = 2  # DC: always legal
                new_qp = desired_qp
                qpc = _chroma_qp(new_qp, chroma_qp_offset)
                pred = _pred16x16(want, y_rec, x0, y0, avail_l, avail_t)
                dcm = np.zeros((4, 4), np.int64)
                ac_z = [None] * 16
                for z in range(16):
                    r, c = _Z4_INV[z]
                    orig = y_src[
                        y0 + r * 4 : y0 + r * 4 + 4,
                        x0 + c * 4 : x0 + c * 4 + 4,
                    ].astype(np.int64)
                    res = orig - pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                    wm = _fwd_core(res)
                    dcm[r, c] = wm[0, 0]
                    ac_z[z] = _zigzag_list(
                        _quant4x4(wm, new_qp, skip_dc=True), skip_dc=True
                    )
                cbp_luma = (
                    15 if any(any(v for v in zz) for zz in ac_z) else 0
                )
                f = _HAD4 @ dcm @ _HAD4
                z_dc = _quant_dc(f, new_qp)
                cres = _encode_chroma_blocks(
                    cb_src, cr_src, cb_rec, cr_rec, 0, x0 // 2, y0 // 2,
                    avail_l, avail_t, qpc,
                )
                cbp_chroma, dc_q, ac_q = cres
                m = want + 4 * cbp_chroma + (12 if cbp_luma else 0)
                w.ue(5 + 1 + m)  # intra mb_type offset by 5 in P slices
                w.ue(0)  # intra_chroma_pred_mode: DC
                w.se(new_qp - qp)
                qp = new_qp
                nc = n_ctx(luma_tc, by0, bx0, 4)
                _cavlc_encode_block(w, _zigzag_list(z_dc), nc, 16)
                for z in range(16):
                    r, c = _Z4_INV[z]
                    by, bx = by0 + r, bx0 + c
                    if cbp_luma:
                        nc = n_ctx(luma_tc, by, bx, 4)
                        tc = _cavlc_encode_block(w, ac_z[z], nc, 15)
                    else:
                        tc = 0
                    luma_tc[by, bx] = tc
                _write_chroma_residual(
                    w, cbp_chroma, dc_q, ac_q, cb_tc, cr_tc, cy0, cx0,
                    n_ctx_chroma,
                )
                i4_modes[by0 : by0 + 4, bx0 : bx0 + 4] = -1
                f_rec = _HAD4 @ z_dc @ _HAD4
                dc_deq = _luma_dc_dequant(f_rec, qp)
                for z in range(16):
                    r, c = _Z4_INV[z]
                    blk = np.zeros((4, 4), np.int64)
                    for k in range(15):
                        blk[_ZIGZAG[k + 1] >> 2, _ZIGZAG[k + 1] & 3] = (
                            ac_z[z][k]
                        )
                    sub = pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                    y_rec[
                        y0 + r * 4 : y0 + r * 4 + 4,
                        x0 + c * 4 : x0 + c * 4 + 4,
                    ] = _recon_block(
                        sub, blk, qp, dc_override=int(dc_deq[r, c])
                    )
                _recon_chroma(
                    cb_rec, cr_rec, 0, (dc_q, ac_q), qp,
                    chroma_qp_offset, x0 // 2, y0 // 2, avail_l, avail_t,
                )
                # intra MB: blocks stay ref -1 / zero MV for neighbours
                mv_x[by0 : by0 + 4, bx0 : bx0 + 4] = 0
                mv_y[by0 : by0 + 4, bx0 : bx0 + 4] = 0
                blk_ref[by0 : by0 + 4, bx0 : bx0 + 4] = -1
                blk_done[by0 : by0 + 4, bx0 : bx0 + 4] = True
                mb_intra[my, mx] = True
                mb_qp[my, mx] = qp
                continue

            # inter macroblock: pick partitions + deterministic MVs
            w.ue(skip_run)
            skip_run = 0
            sub_types = None
            if sel == 4:
                mb_type = 1  # P_16x8
                parts = [(0, 0, 4, 2, "16x8_top"), (2, 0, 4, 2, "16x8_bottom")]
            elif sel == 5:
                mb_type = 2  # P_8x16
                parts = [(0, 0, 2, 4, "8x16_left"), (0, 2, 2, 4, "8x16_right")]
            elif sel == 8:
                mb_type = 3  # P_8x8: all four sub shapes in one MB,
                # rotated per MB so every 8x8 position sees every shape
                sub_types = [(i8 + mb + frame_idx) % 4 for i8 in range(4)]
                parts = []
                for i8, st in enumerate(sub_types):
                    ry8, rx8 = (i8 >> 1) * 2, (i8 & 1) * 2
                    if st == 0:
                        subs = [(0, 0, 2, 2)]
                    elif st == 1:
                        subs = [(0, 0, 2, 1), (1, 0, 2, 1)]
                    elif st == 2:
                        subs = [(0, 0, 1, 2), (0, 1, 1, 2)]
                    else:
                        subs = [(0, 0, 1, 1), (0, 1, 1, 1),
                                (1, 0, 1, 1), (1, 1, 1, 1)]
                    for sy, sx, w4, h4 in subs:
                        parts.append((ry8 + sy, rx8 + sx, w4, h4, f"sub{w4}"))
            else:
                mb_type = 0  # P_L0_16x16
                parts = [(0, 0, 4, 4, "16x16")]
            new_qp = desired_qp if sel == 7 else qp
            mv_plan = []
            for pi, (ry, rx, w4, h4, tag) in enumerate(parts):
                if sel == 1:
                    mvx = mvy = 0
                elif sel == 3:
                    # large / out-of-frame MVs: exercise edge clamping
                    mvx = (-64 - 4 * (mb % 5)) if mx == 0 else 64 + 4 * (
                        (mb + pi) % 7
                    )
                    mvy = (-48 - 4 * (my % 3)) if my == 0 else 40
                else:
                    # cycle all 16 quarter-pel fractional positions
                    base = mb * 5 + frame_idx * 7 + pi * 3
                    mvx = ((base % 13) - 6) * 4 + (base % 4)
                    mvy = (((base // 2) % 11) - 5) * 4 + ((base + 1) % 4)
                mv_plan.append((ry, rx, w4, h4, tag, mvx, mvy))
            # write partitions: mvd against the shared predictor; the
            # write-through order matters (later partitions predict
            # from earlier ones)
            w.ue(mb_type)
            if sub_types is not None:
                for st in sub_types:
                    w.ue(st)
            pred = np.zeros((16, 16), np.int64)
            pred_cb = np.zeros((8, 8), np.int64)
            pred_cr = np.zeros((8, 8), np.int64)
            for ry, rx, w4, h4, tag, mvx, mvy in mv_plan:
                px, py = _mvp_for_partition(
                    mv_x, mv_y, blk_ref, mb_slice, sid, by0 + ry, bx0 + rx,
                    tag, done=blk_done,
                )
                w.se(mvx - px)
                w.se(mvy - py)
                mv_x[by0 + ry : by0 + ry + h4,
                     bx0 + rx : bx0 + rx + w4] = mvx
                mv_y[by0 + ry : by0 + ry + h4,
                     bx0 + rx : bx0 + rx + w4] = mvy
                blk_ref[by0 + ry : by0 + ry + h4,
                        bx0 + rx : bx0 + rx + w4] = 0
                blk_done[by0 + ry : by0 + ry + h4,
                         bx0 + rx : bx0 + rx + w4] = True
                pred[ry * 4 : (ry + h4) * 4, rx * 4 : (rx + w4) * 4] = (
                    _mc_luma(ref_y, x0 + rx * 4, y0 + ry * 4,
                             w4 * 4, h4 * 4, mvx, mvy)
                )
                pred_cb[ry * 2 : (ry + h4) * 2, rx * 2 : (rx + w4) * 2] = (
                    _mc_chroma(ref_cb, x0 // 2 + rx * 2, y0 // 2 + ry * 2,
                               w4 * 2, h4 * 2, mvx, mvy)
                )
                pred_cr[ry * 2 : (ry + h4) * 2, rx * 2 : (rx + w4) * 2] = (
                    _mc_chroma(ref_cr, x0 // 2 + rx * 2, y0 // 2 + ry * 2,
                               w4 * 2, h4 * 2, mvx, mvy)
                )
            # forward-transform the residual at new_qp (inter rounding)
            ac_z = [None] * 16
            for z in range(16):
                r, c = _Z4_INV[z]
                orig = y_src[
                    y0 + r * 4 : y0 + r * 4 + 4,
                    x0 + c * 4 : x0 + c * 4 + 4,
                ].astype(np.int64)
                res = orig - pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                ac_z[z] = _zigzag_list(
                    _quant4x4(_fwd_core(res), new_qp, intra=False)
                )
            cbp_luma = 0
            for z in range(16):
                if any(ac_z[z]):
                    cbp_luma |= 1 << (z >> 2)
            qpc = _chroma_qp(new_qp, chroma_qp_offset)
            cres = _encode_chroma_blocks(
                cb_src, cr_src, cb_rec, cr_rec, 0, x0 // 2, y0 // 2,
                avail_l, avail_t, qpc, preds=(pred_cb, pred_cr),
            )
            cbp_chroma, dc_q, ac_q = cres
            cbp = cbp_luma | (cbp_chroma << 4)
            w.ue(_CBP_INTER_INV[cbp])
            if cbp:
                w.se(new_qp - qp)
                qp = new_qp
            for z in range(16):
                r, c = _Z4_INV[z]
                by, bx = by0 + r, bx0 + c
                if cbp_luma & (1 << (z >> 2)):
                    nc = n_ctx(luma_tc, by, bx, 4)
                    tc = _cavlc_encode_block(w, ac_z[z], nc, 16)
                else:
                    tc = 0
                luma_tc[by, bx] = tc
            _write_chroma_residual(
                w, cbp_chroma, dc_q, ac_q, cb_tc, cr_tc, cy0, cx0,
                n_ctx_chroma,
            )
            # reconstruct exactly as the decoder will
            for z in range(16):
                r, c = _Z4_INV[z]
                blk = np.zeros((4, 4), np.int64)
                for k in range(16):
                    blk[_ZIGZAG[k] >> 2, _ZIGZAG[k] & 3] = ac_z[z][k]
                sub = pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
                y_rec[
                    y0 + r * 4 : y0 + r * 4 + 4,
                    x0 + c * 4 : x0 + c * 4 + 4,
                ] = _recon_block(sub, blk, qp)
            _recon_chroma(
                cb_rec, cr_rec, 0, (dc_q, ac_q), qp, chroma_qp_offset,
                x0 // 2, y0 // 2, avail_l, avail_t,
                preds=(pred_cb, pred_cr),
            )
            i4_modes[by0 : by0 + 4, bx0 : bx0 + 4] = -1
            mb_intra[my, mx] = False
            mb_qp[my, mx] = qp

        if skip_run:
            w.ue(skip_run)  # trailing skipped macroblocks
        w.rbsp_trailing()
        rbsps.append(w.getvalue())

    _deblock_picture(
        y_rec, cb_rec, cr_rec, mb_qp, mb_pcm, mb_idc, mb_slice,
        mb_offa, mb_offb, chroma_qp_offset,
        mb_intra=mb_intra, luma_tc=luma_tc, mv_x=mv_x, mv_y=mv_y,
        blk_ref=blk_ref,
    )
    return rbsps, (y_rec, cb_rec, cr_rec)


def _encode_chroma_blocks(cb_src, cr_src, cb_rec, cr_rec, mode, cx, cy,
                          avail_l, avail_t, qpc, preds=None):
    """Forward-transform both chroma 8x8s -> (cbp_chroma, dc_q, ac_q).
    ``preds`` (r14) supplies MC predictions for inter macroblocks."""
    dc_q = {0: [0] * 4, 1: [0] * 4}
    ac_q = {0: [[0] * 15 for _ in range(4)], 1: [[0] * 15 for _ in range(4)]}
    any_ac = False
    any_dc = False
    for comp, (src, rec) in enumerate(((cb_src, cb_rec), (cr_src, cr_rec))):
        if preds is not None:
            pred = preds[comp]
        else:
            pred = _pred_chroma(mode, rec, cx, cy, avail_l, avail_t)
        dcm = np.zeros((2, 2), np.int64)
        for z in range(4):
            r, c = z >> 1, z & 1
            orig = src[cy + r * 4 : cy + r * 4 + 4, cx + c * 4 : cx + c * 4 + 4]
            res = orig.astype(np.int64) - pred[r * 4 : r * 4 + 4, c * 4 : c * 4 + 4]
            wm = _fwd_core(res)
            dcm[r, c] = wm[0, 0]
            zq = _quant4x4(wm, qpc, skip_dc=True)
            ac_q[comp][z] = _zigzag_list(zq, skip_dc=True)
            if any(ac_q[comp][z]):
                any_ac = True
        f = np.array(
            [
                [dcm[0, 0] + dcm[0, 1] + dcm[1, 0] + dcm[1, 1],
                 dcm[0, 0] - dcm[0, 1] + dcm[1, 0] - dcm[1, 1]],
                [dcm[0, 0] + dcm[0, 1] - dcm[1, 0] - dcm[1, 1],
                 dcm[0, 0] - dcm[0, 1] - dcm[1, 0] + dcm[1, 1]],
            ],
            np.int64,
        )
        zdc = _quant_dc(f, qpc)
        dc_q[comp] = [int(zdc[0, 0]), int(zdc[0, 1]), int(zdc[1, 0]),
                      int(zdc[1, 1])]
        if any(dc_q[comp]):
            any_dc = True
    cbp_chroma = 2 if any_ac else (1 if any_dc else 0)
    return cbp_chroma, dc_q, ac_q


def _write_chroma_residual(w, cbp_chroma, dc_q, ac_q, cb_tc, cr_tc,
                           cy0, cx0, n_ctx):
    """CAVLC-write chroma DC + AC blocks, updating the tc contexts."""
    if cbp_chroma > 0:
        for comp in (0, 1):
            _cavlc_encode_block(w, dc_q[comp], -1, 4)
    for comp, tc_arr in ((0, cb_tc), (1, cr_tc)):
        for z in range(4):
            r, c = z >> 1, z & 1
            by, bx = cy0 + r, cx0 + c
            if cbp_chroma == 2:
                nc = n_ctx(tc_arr, by, bx)
                tc = _cavlc_encode_block(w, ac_q[comp][z], nc, 15)
            else:
                tc = 0
            tc_arr[by, bx] = tc


# ---------------------------------------------------------------------------
# deblocking filter (8.7) for all-intra pictures — bS is 4 on
# macroblock edges and 3 on internal 4x4 edges (intra trumps the
# coefficient rules), applied after the picture is constructed (intra
# prediction always reads UNFILTERED samples, so reconstruction is
# untouched). One shared implementation: the spec defines a single
# filter both sides must evaluate identically over the reconstruction.
# ---------------------------------------------------------------------------

_ALPHA = (0,) * 16 + (4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22,
                      25, 28, 32, 36, 40, 45, 50, 56, 63, 71, 80, 90,
                      101, 113, 127, 144, 162, 182, 203, 226, 255, 255)
_BETA = (0,) * 16 + (2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8, 9,
                     9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
                     16, 16, 17, 17, 18, 18)
_TC0 = (
    (0,) * 16 + (0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
                 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13),
    (0,) * 16 + (0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
                 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17,
                 19, 23),
    (0,) * 16 + (0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 4,
                 4, 4, 5, 6, 6, 7, 9, 10, 11, 13, 14, 16, 18, 20, 23,
                 25, 27, 31),
)


def _clip3(lo, hi, v):
    return np.minimum(hi, np.maximum(lo, v))


def _filter_lines(p, q, bs, index_a, index_b, chroma):
    """Filter one edge: ``p``/``q`` are (n_lines, 4) int64 arrays of
    samples on each side, p[:, 0] adjacent to the edge. Returns the
    modified copies (only the spec-allowed taps change)."""
    alpha = _ALPHA[index_a]
    beta = _BETA[index_b]
    p = p.copy()
    q = q.copy()
    p0, p1, p2, p3 = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    q0, q1, q2, q3 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    act = (
        (np.abs(p0 - q0) < alpha)
        & (np.abs(p1 - p0) < beta)
        & (np.abs(q1 - q0) < beta)
    )
    if not act.any():
        return p, q
    ap = np.abs(p2 - p0)
    aq = np.abs(q2 - q0)
    if bs == 4:
        small = np.abs(p0 - q0) < ((alpha >> 2) + 2)
        if chroma:
            strong_p = np.zeros_like(act, bool)
            strong_q = np.zeros_like(act, bool)
        else:
            strong_p = act & small & (ap < beta)
            strong_q = act & small & (aq < beta)
        basic_p = act & ~strong_p
        basic_q = act & ~strong_q
        np0 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
        np1 = (p2 + p1 + p0 + q0 + 2) >> 2
        np2 = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
        bp0 = (2 * p1 + p0 + q1 + 2) >> 2
        nq0 = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
        nq1 = (q2 + q1 + q0 + p0 + 2) >> 2
        nq2 = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
        bq0 = (2 * q1 + q0 + p1 + 2) >> 2
        p[:, 0] = np.where(strong_p, np0, np.where(basic_p, bp0, p0))
        p[:, 1] = np.where(strong_p, np1, p1)
        p[:, 2] = np.where(strong_p, np2, p2)
        q[:, 0] = np.where(strong_q, nq0, np.where(basic_q, bq0, q0))
        q[:, 1] = np.where(strong_q, nq1, q1)
        q[:, 2] = np.where(strong_q, nq2, q2)
        return p, q
    # bS 1..3: clipped delta filter
    tc0 = _TC0[bs - 1][index_a]
    if chroma:
        tc = tc0 + 1
        adj_p1 = np.zeros_like(act, bool)
        adj_q1 = np.zeros_like(act, bool)
    else:
        adj_p1 = act & (ap < beta)
        adj_q1 = act & (aq < beta)
        tc = tc0 + adj_p1.astype(np.int64) + adj_q1.astype(np.int64)
    delta = _clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
    np0 = _clip3(0, 255, p0 + delta)
    nq0 = _clip3(0, 255, q0 - delta)
    np1 = p1 + _clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)
    nq1 = q1 + _clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)
    p[:, 0] = np.where(act, np0, p0)
    q[:, 0] = np.where(act, nq0, q0)
    p[:, 1] = np.where(adj_p1, np1, p1)
    q[:, 1] = np.where(adj_q1, nq1, q1)
    return p, q


def _deblock_edge(plane, x, y, n_lines, vertical, bs, index_a, index_b,
                  chroma):
    """Apply the filter across one edge of ``n_lines`` sample lines;
    the edge lies between column x-1 and x (vertical) or row y-1 and
    y (horizontal)."""
    pl = plane.astype(np.int64)
    if vertical:
        p = pl[y : y + n_lines, x - 4 : x][:, ::-1]
        q = pl[y : y + n_lines, x : x + 4]
    else:
        p = pl[y - 4 : y, x : x + n_lines][::-1].T
        q = pl[y : y + 4, x : x + n_lines].T
    p, q = _filter_lines(p, q, bs, index_a, index_b, chroma)
    if vertical:
        plane[y : y + n_lines, x - 4 : x] = p[:, ::-1]
        plane[y : y + n_lines, x : x + 4] = q
    else:
        plane[y - 4 : y, x : x + n_lines] = p[::-1].T.copy()
        plane[y : y + 4, x : x + n_lines] = q.T


def _deblock_picture(y_plane, cb_plane, cr_plane, mb_qp, mb_pcm,
                     mb_idc, mb_slice, mb_offa, mb_offb,
                     chroma_qp_offset, mb_intra=None, luma_tc=None,
                     mv_x=None, mv_y=None, blk_ref=None):
    """In-place loop filter over the whole picture, MB by MB in raster
    order: vertical edges left-to-right, then horizontal edges
    top-to-bottom (8.7's order — later edges read already-filtered
    samples). All mb_* inputs are (mb_h, mb_w) arrays; each macroblock
    filters under ITS slice's idc and alpha/beta offsets: idc 1 skips
    the MB entirely, idc 2 skips macroblock edges whose neighbour lies
    in a different slice. I_PCM macroblocks filter as QP 0 (8.7.2).

    With inter pictures (r14) bS follows 8.7.2.1 per 4-sample edge
    segment: 4 on intra macroblock edges, 3 on intra internal edges,
    2 when either adjacent 4x4 luma block has non-zero coefficients,
    1 on a quarter-pel MV difference >= 4 in either component, else 0
    (segment unfiltered). Chroma edge segments reuse the co-located
    luma segment's bS. When the inter inputs are omitted (the
    all-intra callers) every MB is intra and the historic constant
    4/3 behaviour — bit-identical output — falls out of the same
    rule."""
    mb_h, mb_w = mb_qp.shape
    if mb_intra is None:
        mb_intra = np.ones((mb_h, mb_w), bool)
    if luma_tc is None:
        luma_tc = np.zeros((mb_h * 4, mb_w * 4), np.int16)
    if mv_x is None:
        mv_x = np.zeros((mb_h * 4, mb_w * 4), np.int32)
        mv_y = np.zeros((mb_h * 4, mb_w * 4), np.int32)
        blk_ref = np.full((mb_h * 4, mb_w * 4), -1, np.int8)

    def qp_of(my, mx):
        return 0 if mb_pcm[my, mx] else int(mb_qp[my, mx])

    def seg_bs(p_by, p_bx, q_by, q_bx, mb_edge):
        if (
            mb_intra[p_by // 4, p_bx // 4]
            or mb_intra[q_by // 4, q_bx // 4]
        ):
            return 4 if mb_edge else 3
        if luma_tc[p_by, p_bx] > 0 or luma_tc[q_by, q_bx] > 0:
            return 2
        if blk_ref[p_by, p_bx] != blk_ref[q_by, q_bx]:
            return 1
        if (
            abs(int(mv_x[p_by, p_bx]) - int(mv_x[q_by, q_bx])) >= 4
            or abs(int(mv_y[p_by, p_bx]) - int(mv_y[q_by, q_bx])) >= 4
        ):
            return 1
        return 0

    for my in range(mb_h):
        for mx in range(mb_w):
            idc = int(mb_idc[my, mx])
            if idc == 1:
                continue
            off_a = int(mb_offa[my, mx])
            off_b = int(mb_offb[my, mx])
            x0, y0 = mx * 16, my * 16
            by0, bx0 = my * 4, mx * 4
            qp_cur = qp_of(my, mx)
            for vertical in (True, False):
                for e in range(4):
                    if e == 0:
                        if vertical and mx == 0:
                            continue
                        if not vertical and my == 0:
                            continue
                        ny, nx = (my, mx - 1) if vertical else (my - 1, mx)
                        if idc == 2 and mb_slice[ny, nx] != mb_slice[my, mx]:
                            continue  # slice-boundary edge, idc 2
                        qp_nb = qp_of(ny, nx)
                        mb_edge = True
                    else:
                        qp_nb = qp_cur
                        mb_edge = False
                    # per-4x4-segment bS along the 16-sample edge
                    seg = []
                    for s in range(4):
                        if vertical:
                            q_by, q_bx = by0 + s, bx0 + e
                            p_by, p_bx = q_by, q_bx - 1
                        else:
                            q_by, q_bx = by0 + e, bx0 + s
                            p_by, p_bx = q_by - 1, q_bx
                        seg.append(seg_bs(p_by, p_bx, q_by, q_bx, mb_edge))
                    qpav = (qp_cur + qp_nb + 1) >> 1
                    ia = min(51, max(0, qpav + off_a))
                    ib = min(51, max(0, qpav + off_b))
                    qc = (
                        _chroma_qp(qp_cur, chroma_qp_offset)
                        + _chroma_qp(qp_nb, chroma_qp_offset)
                        + 1
                    ) >> 1
                    ia_c = min(51, max(0, qc + off_a))
                    ib_c = min(51, max(0, qc + off_b))
                    # group consecutive equal-bS segments (one call for
                    # the constant all-intra case — identical to r13)
                    s = 0
                    while s < 4:
                        t = s
                        while t < 4 and seg[t] == seg[s]:
                            t += 1
                        bs = seg[s]
                        if bs > 0:
                            n = (t - s) * 4
                            if vertical:
                                _deblock_edge(
                                    y_plane, x0 + 4 * e, y0 + 4 * s, n,
                                    True, bs, ia, ib, False,
                                )
                            else:
                                _deblock_edge(
                                    y_plane, x0 + 4 * s, y0 + 4 * e, n,
                                    False, bs, ia, ib, False,
                                )
                            if e in (0, 2):  # chroma edges: luma 0 and 8
                                nc_ = (t - s) * 2
                                for pl in (cb_plane, cr_plane):
                                    if vertical:
                                        _deblock_edge(
                                            pl, x0 // 2 + 2 * e,
                                            y0 // 2 + 2 * s, nc_, True,
                                            bs, ia_c, ib_c, True,
                                        )
                                    else:
                                        _deblock_edge(
                                            pl, x0 // 2 + 2 * s,
                                            y0 // 2 + 2 * e, nc_, False,
                                            bs, ia_c, ib_c, True,
                                        )
                        s = t


# ---------------------------------------------------------------------------
# MP4 (ISO-BMFF, 14496-12/-15) carriage of AVC: demux for the decoder,
# mux for fixtures. Most real-world H.264 travels in MP4 'avc1' tracks
# as length-prefixed NAL units with SPS/PPS in the avcC record — this
# is what turns sample_frames_stub's md5 buffers into real pixels for
# the intra subset.
# ---------------------------------------------------------------------------


def _mp4_avc_track(payload: bytes):
    """Locate the first avc1/avc3 video track -> (sps_list, pps_list,
    nal_length_size, [sample byte ranges]) or None.

    Walks moov/trak/mdia/minf/stbl, reads avcC (parameter sets +
    lengthSizeMinusOne), stsz (sample sizes), stsc (sample-to-chunk
    runs) and stco/co64 (chunk offsets), then maps every sample to its
    byte range. Caps: <= 100k samples (decode-bomb guard for the
    table allocations)."""
    from llm_training_data_pipeline_spark.operators.multimodal import (
        _iter_boxes,
    )

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None

    def find(start, end, *path):
        for btype, ps, pe in _iter_boxes(payload, start, end):
            if btype == path[0]:
                if len(path) == 1:
                    return ps, pe
                got = find(ps, pe, *path[1:])
                if got:
                    return got
        return None

    moov = find(0, len(payload), b"moov")
    if not moov:
        return None
    for btype, ts, te in _iter_boxes(payload, *moov):
        if btype != b"trak":
            continue
        stbl = find(ts, te, b"mdia", b"minf", b"stbl")
        if not stbl:
            continue
        got = _parse_stbl(payload, stbl)
        if got:
            return got
    return None


def _parse_stbl(payload: bytes, stbl):
    from llm_training_data_pipeline_spark.operators.multimodal import (
        _iter_boxes,
    )

    sps_l = pps_l = None
    nal_len = 4
    sizes = None
    chunk_offsets = None
    stsc_runs = None
    for btype, ps, pe in _iter_boxes(payload, stbl[0], stbl[1]):
        if btype == b"stsd" and pe - ps >= 8:
            # full box header (4) + entry_count (4), then sample entries
            for etype, es, ee in _iter_boxes(payload, ps + 8, pe):
                if etype not in (b"avc1", b"avc3"):
                    continue
                # VisualSampleEntry: 78 bytes before the child boxes
                for ctype, cs, ce in _iter_boxes(payload, es + 78, ee):
                    if ctype != b"avcC" or ce - cs < 7:
                        continue
                    nal_len = (payload[cs + 4] & 3) + 1
                    pos = cs + 5
                    n_sps = payload[pos] & 31
                    pos += 1
                    sps_l = []
                    for _ in range(n_sps):
                        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
                        sps_l.append(payload[pos + 2 : pos + 2 + ln])
                        pos += 2 + ln
                    n_pps = payload[pos]
                    pos += 1
                    pps_l = []
                    for _ in range(n_pps):
                        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
                        pps_l.append(payload[pos + 2 : pos + 2 + ln])
                        pos += 2 + ln
        elif btype == b"stsz" and pe - ps >= 12:
            uniform, count = struct.unpack(">II", payload[ps + 4 : ps + 12])
            if count > 100_000:
                return None
            if uniform:
                sizes = [uniform] * count
            else:
                if ps + 12 + 4 * count > pe:
                    return None
                sizes = list(
                    struct.unpack(">" + "I" * count,
                                   payload[ps + 12 : ps + 12 + 4 * count])
                )
        elif btype in (b"stco", b"co64") and pe - ps >= 8:
            (count,) = struct.unpack(">I", payload[ps + 4 : ps + 8])
            if count > 100_000:
                return None
            fmt, width = (">I", 4) if btype == b"stco" else (">Q", 8)
            if ps + 8 + width * count > pe:
                return None
            chunk_offsets = [
                struct.unpack(fmt, payload[ps + 8 + width * i : ps + 8 + width * (i + 1)])[0]
                for i in range(count)
            ]
        elif btype == b"stsc" and pe - ps >= 8:
            (count,) = struct.unpack(">I", payload[ps + 4 : ps + 8])
            if count > 100_000 or ps + 8 + 12 * count > pe:
                return None
            stsc_runs = [
                struct.unpack(">III", payload[ps + 8 + 12 * i : ps + 20 + 12 * i])
                for i in range(count)
            ]
    if not sps_l or not pps_l or sizes is None or chunk_offsets is None \
            or stsc_runs is None:
        return None
    # expand sample->chunk mapping into per-sample byte ranges
    ranges = []
    si = 0
    n_chunks = len(chunk_offsets)
    for ri, (first_chunk, per_chunk, _desc) in enumerate(stsc_runs):
        last_chunk = (
            stsc_runs[ri + 1][0] - 1 if ri + 1 < len(stsc_runs) else n_chunks
        )
        if first_chunk < 1 or per_chunk < 1:
            return None
        for chunk in range(first_chunk, last_chunk + 1):
            if chunk > n_chunks:
                break
            off = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= len(sizes):
                    break
                if off + sizes[si] > len(payload):
                    return None
                ranges.append((off, off + sizes[si]))
                off += sizes[si]
                si += 1
    if si < len(sizes):
        return None
    return sps_l, pps_l, nal_len, ranges


def _mp4_h264_frames(payload: bytes, max_frames: int = -1, every_n: int = 1):
    """REAL H.264-in-MP4 decode -> [(sample_index, w, h, rgb bytes)]
    or None: avc1 track demux (length-prefixed NALs, avcC parameter
    sets) feeding the same slice decoder as the Annex B path — IDR/I
    pictures and (r14) the single-reference P subset; other inter
    shapes reject honestly inside ``_parse_slice_header``. When the
    track is all-intra, skipped samples (every_n) cost nothing but
    the sample-table walk; with inter samples present every picture
    must still decode as a potential reference and the sampling only
    bounds the RGB conversion + output."""
    try:
        track = _mp4_avc_track(payload)
        if track is None:
            return None
        sps_nals, pps_nals, nal_len, ranges = track
        sps_map, pps_map = {}, {}
        for raw in sps_nals:
            if not raw or raw[0] & 0x1F != 7:
                return None
            sps = _parse_sps(_ebsp_to_rbsp(raw[1:]))
            if sps is None:
                return None
            sps_map[sps["id"]] = sps
        for raw in pps_nals:
            if not raw or raw[0] & 0x1F != 8:
                return None
            pps = _parse_pps(_ebsp_to_rbsp(raw[1:]))
            if pps is None:
                return None
            pps_map[pps["id"]] = pps

        def sample_nals(lo, hi):
            """[(typ, ref_idc, rbsp), ...] of one sample or None."""
            pos = lo
            nals = []
            while pos + nal_len <= hi:
                ln = int.from_bytes(payload[pos : pos + nal_len], "big")
                pos += nal_len
                if ln == 0 or pos + ln > hi:
                    return None
                nal = payload[pos : pos + ln]
                pos += ln
                if nal[0] & 0x80:
                    return None
                nals.append((nal[0] & 0x1F, (nal[0] >> 5) & 3, nal))
            return nals

        # an inter sample anywhere forces reference decoding of all
        have_inter = False
        parsed = []
        for lo, hi in ranges:
            nals = sample_nals(lo, hi)
            if nals is None:
                return None
            if any(t == 1 for t, _r, _n in nals):
                have_inter = True
            parsed.append(nals)
        out = []
        ref = None
        for idx, nals in enumerate(parsed):
            if 0 <= max_frames <= len(out):
                break
            if idx % max(1, every_n) and not have_inter:
                continue
            slices = []
            is_idr = None
            ref_idc = 3
            for typ, ridc, nal in nals:
                if typ in (1, 5):
                    if is_idr is None:
                        is_idr, ref_idc = typ == 5, ridc
                    elif is_idr != (typ == 5):
                        return None  # mixed NAL types in one sample
                    slices.append(_ebsp_to_rbsp(nal[1:]))
                elif typ == 7:
                    sps = _parse_sps(_ebsp_to_rbsp(nal[1:]))
                    if sps is None:
                        return None
                    sps_map[sps["id"]] = sps
                elif typ == 8:
                    pps = _parse_pps(_ebsp_to_rbsp(nal[1:]))
                    if pps is None:
                        return None
                    pps_map[pps["id"]] = pps
                # SEI/AUD/filler: skip
            if not slices:
                return None
            decoded = _decode_picture(slices, sps_map, pps_map, is_idr, ref)
            if decoded is None:
                return None
            y, cb, cr, sps = decoded
            if ref_idc != 0:
                ref = (y, cb, cr)
            if idx % max(1, every_n):
                continue
            out.append((idx, *_planes_to_rgb(y, cb, cr, sps)))
        return out or None
    except (EOFError, ValueError, IndexError, struct.error, OverflowError):
        return None


def _full_box(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    data = bytes((version,)) + flags.to_bytes(3, "big") + body
    return struct.pack(">I", 8 + len(data)) + btype + data


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_avc_build(frames_rgb, qp: int = 28, fps: int = 25, **enc_kw):
    """Forward MP4 muxer for fixtures/tests: the Annex B output of
    ``_h264_build`` re-framed as an isom/avc1 track — SPS/PPS in avcC,
    one length-prefixed IDR sample per frame, real stts/stsc/stsz/stco
    tables, mdat before moov so chunk offsets are stable. Returns
    (mp4_bytes, recon) when the encoder kwargs request recon. Not
    exported API."""
    got = _h264_build(frames_rgb, qp=qp, **enc_kw)
    annexb, recons = got if isinstance(got, tuple) else (got, None)
    nals = _split_nals(annexb)
    sps_raw = pps_raw = None
    samples = []
    for typ, ref, rbsp in nals:
        raw = bytes(((ref << 5) | typ,)) + _rbsp_to_ebsp(rbsp)
        if typ == 7:
            sps_raw = raw
        elif typ == 8:
            pps_raw = raw
        elif typ in (1, 5):  # IDR or (r14) P slices
            framed = struct.pack(">I", len(raw)) + raw
            if _Bits(rbsp).ue() == 0:  # first_mb == 0: new picture
                samples.append(framed)
            else:  # later slice of the same picture -> same sample
                samples[-1] += framed
    h, w = frames_rgb[0].shape[:2]
    n = len(samples)
    avcc = (
        bytes((1, sps_raw[1], sps_raw[2], sps_raw[3], 0xFC | 3, 0xE0 | 1))
        + struct.pack(">H", len(sps_raw)) + sps_raw
        + bytes((1,))
        + struct.pack(">H", len(pps_raw)) + pps_raw
    )
    visual_entry = (
        bytes(6) + struct.pack(">H", 1)  # reserved + data_reference_index
        + bytes(16)  # pre_defined/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + bytes(4)
        + struct.pack(">H", 1)  # frame_count
        + bytes(32)  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    avc1 = _box(b"avc1", visual_entry + _box(b"avcC", avcc))
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full_box(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    mdat_payload = b"".join(samples)
    # layout: ftyp, mdat, moov — first sample offset = len(ftyp) + 8
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    first_off = len(ftyp) + 8
    stco = _full_box(b"stco", 0, 0, struct.pack(">II", 1, first_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url_ = _full_box(b"url ", 0, 1, b"")
    dref = _full_box(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full_box(b"vmhd", 0, 1, bytes(8))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full_box(
        b"hdlr", 0, 0,
        bytes(4) + b"vide" + bytes(12) + b"VideoHandler\x00",
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n) + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full_box(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)
        + struct.pack(">I", n)
        + bytes(8)
        + struct.pack(">HHHH", 0, 0, 0x0100, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, fps, n)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + bytes(8)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    mp4 = ftyp + _box(b"mdat", mdat_payload) + moov
    return (mp4, recons) if recons is not None else mp4

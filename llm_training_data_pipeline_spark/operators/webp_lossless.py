"""WebP lossless (VP8L) codec — pure Python, no imaging library.

The seventh real image decoder (r13): the WebP Lossless Bitstream
Specification is public (Google, RFC-hosted at
datatracker.ietf.org/doc/html/draft-zern-webp / developers.google.com),
and unlike lossy VP8 the lossless profile is losslessly invertible, so
the forward-encoder pinning discipline applies byte-exact.

Decoder surface: LSB-first bitstream, canonical prefix codes (simple
2-symbol and code-length-coded with 16/17/18 repeats + completeness
check), LZ77 backward references with the 120-entry 2D distance map,
color cache, meta prefix-code groups, and all four transforms —
predictor (14 modes, libwebp edge conventions), color (signed 3.5
fixed-point deltas), subtract-green, and color indexing (palette with
sub-byte pixel bundling). Alpha is decoded then DROPPED at the RGB
boundary, matching the PNG alpha policy.

Forward ``_vp8l_build`` emits real canonical-Huffman streams over an
(h, w, 3) array with every feature selectable, so
``test_multimodal.py`` pins the decoder against the spec's forward
direction across the whole matrix. The reference pipeline treats
assets as opaque (src/wiki_pipeline.py); this engine decodes them.

Decode-bomb guard: dimensions are capped before any pixel-buffer
allocation (``_VP8L_MAX_PIXELS`` — the pixel store is a Python list,
8 bytes per entry, so the cap is tighter than the numpy decoders').
Corrupt streams (bad codes, over/under-subscribed prefix trees,
out-of-range cache/group indices, truncation) return None, never
raise beyond the wrapped EOFError/IndexError.
"""

from __future__ import annotations

import struct

import numpy as np

_VP8L_MAX_PIXELS = 1 << 24  # python-list pixel store: ~128 MB ceiling




class _Vp8lBits:
    """LSB-first bit reader (VP8L byte order)."""

    __slots__ = ("buf", "pos", "acc", "n", "nbuf")

    def __init__(self, buf, pos=0):
        self.buf, self.pos, self.acc, self.n = buf, pos, 0, 0
        self.nbuf = len(buf)

    def get(self, k):
        while self.n < k:
            if self.pos >= self.nbuf:
                raise EOFError
            self.acc |= self.buf[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << k) - 1)
        self.acc >>= k
        self.n -= k
        return v


class _Vp8lBitWriter:
    """LSB-first bit writer."""

    __slots__ = ("buf", "acc", "n")

    def __init__(self):
        self.buf, self.acc, self.n = bytearray(), 0, 0

    def put(self, value, nbits):
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self):
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11,
                     12, 13, 14, 15)


def canonical_codes(lengths):
    """Canonical prefix codes from lengths (DEFLATE rule): returns
    {(len, code): symbol} with code bits MSB-first."""
    out = {}
    code = 0
    maxlen = max(lengths) if lengths else 0
    for ln in range(1, maxlen + 1):
        for sym, l in enumerate(lengths):
            if l == ln:
                out[(ln, code)] = sym
                code += 1
        code <<= 1
    return out


def read_code(bits, table):
    code, ln = 0, 0
    while ln <= 15:
        code = (code << 1) | bits.get(1)
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise EOFError


def read_prefix_code(bits, alphabet_size):
    """One prefix code (spec 6.2): simple (1-2 symbols) or
    length-coded."""
    if bits.get(1):  # simple
        nsym = bits.get(1) + 1
        if bits.get(1):
            s0 = bits.get(8)
        else:
            s0 = bits.get(1)
        if s0 >= alphabet_size:
            return None
        if nsym == 1:
            return {(0, 0): s0}  # zero-length: decodes without bits
        s1 = bits.get(8)
        if s1 >= alphabet_size or s1 == s0:
            return None
        return {(1, 0): s0, (1, 1): s1}
    # complex: code-length code
    nclc = bits.get(4) + 4
    if nclc > 19:
        return None
    cl_lengths = [0] * 19
    for i in range(nclc):
        cl_lengths[CODE_LENGTH_ORDER[i]] = bits.get(3)
    if not any(cl_lengths):
        return None
    cl_table = canonical_codes(cl_lengths)
    if bits.get(1):  # limited symbol count
        length_nbits = 2 + 2 * bits.get(3)
        max_symbol = 2 + bits.get(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        s = read_code(bits, cl_table)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + bits.get(2)
            if i + rep > alphabet_size:
                return None
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif s == 17:
            rep = 3 + bits.get(3)
            i += rep
        else:  # 18
            rep = 11 + bits.get(7)
            i += rep
        if i > alphabet_size:
            return None
    if sum(1 for l in lengths if l) == 1:
        # single used symbol: decodes with zero bits
        sym = next(k for k, l in enumerate(lengths) if l)
        return {(0, 0): sym}
    # kraft check: must be a complete code (reject over/under-subscribed)
    kraft = sum((1 << (15 - l)) for l in lengths if l)
    if kraft != (1 << 15):
        return None
    return canonical_codes(lengths)


def read_single(bits, table):
    if (0, 0) in table:
        return table[(0, 0)]
    return read_code(bits, table)


def lz77_value(bits, code):
    """Length/distance prefix decoding (spec 6.2.3)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + bits.get(extra) + 1


# 2D distance mapping (spec 6.2.3): first 120 distance values map to
# (dx, dy) neighborhood offsets
_DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]


def plane_dist(code, xsize):
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize + dx
    return d if d >= 1 else 1


def cache_key(argb, bits_):
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits_)


def decode_image_stream(bits, xsize, ysize, is_level0):
    """Returns (pixels ARGB uint32 list, transforms list) — transforms
    only at level 0, applied by the caller in reverse order."""
    transforms = []
    packed_xsize = xsize
    if is_level0:
        while bits.get(1):
            ttype = bits.get(2)
            if any(t[0] == ttype for t in transforms):
                return None  # each transform at most once
            if ttype == 2:  # subtract green
                transforms.append((2,))
            elif ttype in (0, 1):  # predictor / color
                size_bits = bits.get(3) + 2
                bw = -(-xsize // (1 << size_bits))
                bh = -(-ysize // (1 << size_bits))
                sub = decode_image_stream(bits, bw, bh, False)
                if sub is None:
                    return None
                transforms.append((ttype, size_bits, sub[0], bw, bh))
            elif ttype == 3:  # color indexing (palette)
                psize = bits.get(8) + 1
                sub = decode_image_stream(bits, psize, 1, False)
                if sub is None:
                    return None
                pal = list(sub[0])
                # palette entries are componentwise delta-summed
                for i in range(1, len(pal)):
                    a0 = (pal[i - 1] >> 24) & 0xFF
                    r0 = (pal[i - 1] >> 16) & 0xFF
                    g0 = (pal[i - 1] >> 8) & 0xFF
                    b0 = pal[i - 1] & 0xFF
                    a1 = (pal[i] >> 24) & 0xFF
                    r1 = (pal[i] >> 16) & 0xFF
                    g1 = (pal[i] >> 8) & 0xFF
                    b1 = pal[i] & 0xFF
                    pal[i] = (
                        (((a0 + a1) & 0xFF) << 24)
                        | (((r0 + r1) & 0xFF) << 16)
                        | (((g0 + g1) & 0xFF) << 8)
                        | ((b0 + b1) & 0xFF)
                    )
                if psize <= 2:
                    width_bits = 3
                elif psize <= 4:
                    width_bits = 2
                elif psize <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                packed_xsize = -(-xsize // (1 << width_bits))
                transforms.append((3, width_bits, pal, xsize))
    xsize_eff = packed_xsize

    cache_bits = 0
    cache = None
    if bits.get(1):
        cache_bits = bits.get(4)
        if not 1 <= cache_bits <= 11:
            return None
        cache = [0] * (1 << cache_bits)

    # meta prefix codes (level 0 only)
    meta = None
    meta_bits = 0
    ngroups = 1
    if is_level0 and bits.get(1):
        meta_bits = bits.get(3) + 2
        mw = -(-xsize_eff // (1 << meta_bits))
        mh = -(-ysize // (1 << meta_bits))
        sub = decode_image_stream(bits, mw, mh, False)
        if sub is None:
            return None
        meta = sub[0]
        ngroups = max(((p >> 8) & 0xFFFF) for p in meta) + 1
        meta_w = mw

    groups = []
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    for _ in range(ngroups):
        g = read_prefix_code(bits, green_alpha)
        r = read_prefix_code(bits, 256)
        b = read_prefix_code(bits, 256)
        a = read_prefix_code(bits, 256)
        d = read_prefix_code(bits, 40)
        if None in (g, r, b, a, d):
            return None
        groups.append((g, r, b, a, d))

    npix = xsize_eff * ysize
    pixels = [0] * npix
    i = 0
    gcur = groups[0]
    while i < npix:
        if meta is not None:
            x, y = i % xsize_eff, i // xsize_eff
            mcode = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            gidx = (mcode >> 8) & 0xFFFF
            if gidx >= ngroups:
                return None
            gcur = groups[gidx]
        gt, rt, bt, at, dt = gcur
        s = read_single(bits, gt)
        if s < 256:  # literal
            red = read_single(bits, rt)
            blue = read_single(bits, bt)
            alpha = read_single(bits, at)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[i] = px
            if cache is not None:
                cache[cache_key(px, cache_bits)] = px
            i += 1
        elif s < 280:  # back reference
            length = lz77_value(bits, s - 256)
            dcode = read_single(bits, dt)
            dist = plane_dist(lz77_value(bits, dcode), xsize_eff)
            if dist > i or length > npix - i:
                return None
            for _ in range(length):
                px = pixels[i - dist]
                pixels[i] = px
                if cache is not None:
                    cache[cache_key(px, cache_bits)] = px
                i += 1
        else:  # color cache
            if cache is None:
                return None
            idx = s - 280
            if idx >= len(cache):
                return None
            pixels[i] = cache[idx]
            i += 1
    return pixels, transforms


def apply_transforms(pixels, transforms, xsize, ysize):
    """Inverse transforms in reverse reading order (spec 4)."""
    for t in reversed(transforms):
        if t[0] == 2:  # add green
            out = []
            for p in pixels:
                g = (p >> 8) & 0xFF
                r = ((p >> 16) + g) & 0xFF
                b = (p + g) & 0xFF
                out.append((p & 0xFF00FF00) | (r << 16) | b)
            pixels = out
        elif t[0] == 3:  # palette
            _t, width_bits, pal, full_x = t
            pw = -(-full_x // (1 << width_bits))
            out = [0] * (full_x * ysize)
            bits_per = 8 >> width_bits
            mask = (1 << bits_per) - 1
            for y in range(ysize):
                for x in range(full_x):
                    packed = pixels[y * pw + (x >> width_bits)]
                    idx = (
                        ((packed >> 8) & 0xFF)
                        >> ((x & ((1 << width_bits) - 1)) * bits_per)
                    ) & mask
                    if idx >= len(pal):
                        return None
                    out[y * full_x + x] = pal[idx]
            pixels = out
        elif t[0] == 0:  # predictor
            pixels = inv_predictor(pixels, t, xsize, ysize)
            if pixels is None:
                return None
        elif t[0] == 1:  # color transform
            pixels = inv_color_transform(pixels, t, xsize, ysize)
    return pixels


def _avg2(a, b):
    return (a + b) // 2


def _clamp_add_subtract_full(a, b, c):
    v = a + b - c
    return 0 if v < 0 else (255 if v > 255 else v)


def _clamp_add_subtract_half(a, b):
    v = a + (a - b) // 2
    return 0 if v < 0 else (255 if v > 255 else v)


def _comps(p):
    return ((p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)


def _pack(a, r, g, b):
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)


def _select(l, t, tl):
    pl, pt = 0, 0
    for cl, ct, ctl in zip(_comps(l), _comps(t), _comps(tl)):
        pred = cl + ct - ctl
        pl += abs(pred - cl)
        pt += abs(pred - ct)
    return l if pl <= pt else t


def predict(mode, l, t, tr, tl):
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        a = tuple(_avg2(_avg2(cl, ctr), ct)
                  for cl, ct, ctr in zip(_comps(l), _comps(t), _comps(tr)))
        return _pack(*a)
    if mode == 6:
        return _pack(*(
            _avg2(cl, ctl) for cl, ctl in zip(_comps(l), _comps(tl))
        ))
    if mode == 7:
        return _pack(*(
            _avg2(cl, ct) for cl, ct in zip(_comps(l), _comps(t))
        ))
    if mode == 8:
        return _pack(*(
            _avg2(ctl, ct) for ct, ctl in zip(_comps(t), _comps(tl))
        ))
    if mode == 9:
        return _pack(*(
            _avg2(ct, ctr) for ct, ctr in zip(_comps(t), _comps(tr))
        ))
    if mode == 10:
        return _pack(*(
            _avg2(_avg2(cl, ctl), _avg2(ct, ctr))
            for cl, ct, ctr, ctl in zip(
                _comps(l), _comps(t), _comps(tr), _comps(tl)
            )
        ))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _pack(*(
            _clamp_add_subtract_full(cl, ct, ctl)
            for cl, ct, ctl in zip(_comps(l), _comps(t), _comps(tl))
        ))
    if mode == 13:
        return _pack(*(
            _clamp_add_subtract_half(_avg2(cl, ct), ctl)
            for cl, ct, ctl in zip(_comps(l), _comps(t), _comps(tl))
        ))
    return None


def inv_predictor(pixels, t, xsize, ysize):
    _t, size_bits, sub, bw, bh = t
    out = [0] * len(pixels)
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = out[i - 1]  # mode 1 (left) on the top row
            elif x == 0:
                pred = out[i - xsize]  # mode 2 (top) on the left edge
            else:
                mode = (sub[(y >> size_bits) * bw + (x >> size_bits)] >> 8) & 0xFF
                l = out[i - 1]
                tt = out[i - xsize]
                tl = out[i - xsize - 1]
                # last column: TR wraps to the first pixel of the
                # CURRENT row (libwebp's top_row[x+1] aliasing)
                tr = out[i - xsize + 1] if x + 1 < xsize else out[y * xsize]
                pred = predict(mode, l, tt, tr, tl)
                if pred is None:
                    return None
            p = pixels[i]
            out[i] = _pack(*(
                (cp + cr) & 0xFF
                for cp, cr in zip(_comps(pred), _comps(p))
            ))
    return out


def _cdelta(t, c):
    # t is int8, c uint8: delta = (t * c) >> 5 with signed t and SIGNED c
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def inv_color_transform(pixels, t, xsize, ysize):
    """Inverse color transform (spec 5 / libwebp
    VP8LTransformColorInverse): red += delta(g2r, green); blue +=
    delta(g2b, green) + delta(r2b, NEW red). Element channels of the
    transform pixel: red=green_to_red, green=green_to_blue,
    blue=red_to_blue."""
    _t, size_bits, sub, bw, bh = t
    out = [0] * len(pixels)
    for y in range(ysize):
        for x in range(xsize):
            i = y * xsize + x
            cx = sub[(y >> size_bits) * bw + (x >> size_bits)]
            g2r = (cx >> 16) & 0xFF
            g2b = (cx >> 8) & 0xFF
            r2b = cx & 0xFF
            p = pixels[i]
            a, r, g, b = _comps(p)
            red = (r + _cdelta(g2r, g)) & 0xFF
            blue = (b + _cdelta(g2b, g) + _cdelta(r2b, red)) & 0xFF
            out[i] = _pack(a, red, g, blue)
    return out


def _vp8l_decode(payload):
    """Full WebP-lossless decode → (w, h, rgb bytes) or None."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    i = 12
    data = None
    while i + 8 <= len(payload):
        fourcc = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if fourcc == b"VP8L":
            data = payload[i + 8 : i + 8 + clen]
            break
        i += 8 + clen + (clen % 2)
    if data is None or len(data) < 5 or data[0] != 0x2F:
        return None
    bits = _Vp8lBits(data, 1)
    try:
        w = bits.get(14) + 1
        h = bits.get(14) + 1
        bits.get(1)  # alpha hint
        if bits.get(3) != 0:
            return None  # version
        if w * h > _VP8L_MAX_PIXELS:
            return None
        got = decode_image_stream(bits, w, h, True)
        if got is None:
            return None
        pixels, transforms = got
        pixels = apply_transforms(pixels, transforms, w, h)
        if pixels is None:
            return None
    except (EOFError, IndexError):
        return None
    arr = np.array(pixels, np.uint32).reshape(h, w)
    rgb = np.stack(
        [(arr >> 16) & 0xFF, (arr >> 8) & 0xFF, arr & 0xFF], axis=2
    ).astype(np.uint8)
    return w, h, rgb.tobytes()


# ---------------------------------------------------------------- encoder

import heapq


def huffman_lengths(freqs, alphabet_size):
    """Complete canonical Huffman lengths from a frequency map (len<=15
    asserted; fixtures stay shallow)."""
    used = [(f, s) for s, f in freqs.items() if f]
    if len(used) == 0:
        return None
    if len(used) == 1:
        return {used[0][1]: 0}  # caller uses the simple-code path
    heap = [(f, i, (s,)) for i, (f, s) in enumerate(sorted(used))]
    heapq.heapify(heap)
    depth = {s: 0 for _f, s in used}
    ctr = len(heap)
    while len(heap) > 1:
        f1, _i1, s1 = heapq.heappop(heap)
        f2, _i2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, ctr, s1 + s2))
        ctr += 1
    assert max(depth.values()) <= 15, "fixture histogram too skewed"
    return depth


def write_prefix_code(w, freqs, alphabet_size):
    """Emit one prefix code for the given symbol frequencies; returns
    {sym: (code, len)} for the payload emission ((None, 0) lengths for
    the single-symbol case — zero bits on the wire)."""
    used = sorted(s for s, f in freqs.items() if f)
    if len(used) == 0:
        used = [0]
        freqs = {0: 1}
    if len(used) <= 2 and used[-1] < 256:
        # the simple-code path carries at most 8-bit symbols; length /
        # cache codes (>= 256) must go through the code-length path
        w.put(1, 1)  # simple
        w.put(len(used) - 1, 1)
        w.put(1, 1)  # first symbol in 8 bits
        w.put(used[0], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        w.put(used[1], 8)
        return {used[0]: (0, 1), used[1]: (1, 1)}
    depths = huffman_lengths(freqs, alphabet_size)
    single = next(iter(depths)) if len(depths) == 1 else None
    if single is not None:
        depths = {single: 1}  # stored length 1; decodes with 0 bits
    lengths = [depths.get(s, 0) for s in range(alphabet_size)]
    # tokenize lengths: zero runs -> 17/18, literals otherwise
    tokens = []  # (token, extra_val, extra_bits)
    i = 0
    while i < alphabet_size:
        if lengths[i] == 0:
            j = i
            while j < alphabet_size and lengths[j] == 0:
                j += 1
            run = j - i
            while run >= 11:
                take = min(run, 138)
                tokens.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 10)
                tokens.append((17, take - 3, 3))
                run -= take
            for _ in range(run):
                tokens.append((0, 0, 0))
            i = j
        else:
            tokens.append((lengths[i], 0, 0))
            i += 1
    clfreq = {}
    for t, _v, _b in tokens:
        clfreq[t] = clfreq.get(t, 0) + 1
    cl_depths = huffman_lengths(clfreq, 19)
    if len(clfreq) == 1:
        cl_depths = {next(iter(clfreq)): 1}
    cl_lengths = [cl_depths.get(s, 0) for s in range(19)]
    nclc = max(
        i + 1 for i, s in enumerate(CODE_LENGTH_ORDER) if cl_lengths[s]
    )
    nclc = max(nclc, 4)
    w.put(0, 1)  # complex
    w.put(nclc - 4, 4)
    for i in range(nclc):
        w.put(cl_lengths[CODE_LENGTH_ORDER[i]], 3)
    cl_table = canonical_codes(cl_lengths)
    cl_enc = {sym: (code, ln) for (ln, code), sym in cl_table.items()}
    w.put(0, 1)  # no max_symbol shortcut
    for t, v, b in tokens:
        code, ln = cl_enc[t]
        w.put(_revbits(code, ln), ln)
        if b:
            w.put(v, b)
    if single is not None:
        return {single: (0, 0)}  # decoder's single-symbol zero-bit read
    table = canonical_codes(lengths)
    return {sym: (code, ln) for (ln, code), sym in table.items()}


def _revbits(v, n):
    out = 0
    for _ in range(n):
        out = (out << 1) | (v & 1)
        v >>= 1
    return out


def emit_sym(w, enc, sym):
    code, ln = enc[sym]
    if ln:
        w.put(_revbits(code, ln), ln)


def lz77_code(v):
    if v <= 4:
        return v - 1, 0, 0
    v -= 1
    nbits = v.bit_length() - 2
    rem = v - (2 << nbits)
    if rem >= (1 << nbits):
        return 2 * nbits + 3, rem - (1 << nbits), nbits
    return 2 * nbits + 2, rem, nbits


def tokenize(pixels, xsize, cache_bits, use_lz77):
    cache = [0] * (1 << cache_bits) if cache_bits else None
    toks = []
    n = len(pixels)
    i = 0
    while i < n:
        if use_lz77:
            best_len, best_dist = 0, 0
            for dist in (1, xsize):
                if i < dist:
                    continue
                l = 0
                while i + l < n and pixels[i + l] == pixels[i + l - dist]:
                    l += 1
                    if l >= 4000:
                        break
                if l > best_len:
                    best_len, best_dist = l, dist
            if best_len >= 3:
                toks.append(("copy", best_len, best_dist, i))
                if cache is not None:
                    for k in range(best_len):
                        px = pixels[i + k]
                        cache[cache_key(px, cache_bits)] = px
                i += best_len
                continue
        px = pixels[i]
        if cache is not None and cache[cache_key(px, cache_bits)] == px:
            toks.append(("cache", cache_key(px, cache_bits), i))
        else:
            toks.append(("lit", px, i))
            if cache is not None:
                cache[cache_key(px, cache_bits)] = px
        i += 1
    return toks


def write_image_data(w, pixels, xsize, ysize, cache_bits, use_lz77,
                     meta_bits=0, ngroups=1):
    """Entropy-coded image data: optional color cache + meta prefix
    codes, token stream with complete prefix codes per group."""
    if cache_bits:
        w.put(1, 1)
        w.put(cache_bits, 4)
    else:
        w.put(0, 1)
    group_of_token = None
    if meta_bits:
        mw = -(-xsize // (1 << meta_bits))
        mh = -(-ysize // (1 << meta_bits))
        meta_px = []
        for ty in range(mh):
            for tx in range(mw):
                gidx = (tx + ty) % ngroups
                meta_px.append(0xFF000000 | (gidx << 8))
        w.put(1, 1)
        w.put(meta_bits - 2, 3)
        write_image_stream(w, meta_px, mw, mh, is_level0=False)

        def group_of(i):
            x, y = i % xsize, i // xsize
            return ((x >> meta_bits) + (y >> meta_bits)) % ngroups

        group_of_token = group_of
    else:
        if ngroups != 1:
            raise AssertionError("groups need meta_bits")
        # level-0 callers write the meta flag; sub-images don't
        w.put(0, 1)

    toks = tokenize(pixels, xsize, cache_bits, use_lz77)
    green_n = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    hists = [
        {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}} for _ in range(ngroups)
    ]

    def bump(h, k):
        h[k] = h.get(k, 0) + 1

    for t in toks:
        gi = group_of_token(t[-1]) if group_of_token else 0
        h = hists[gi]
        if t[0] == "lit":
            px = t[1]
            bump(h["g"], (px >> 8) & 0xFF)
            bump(h["r"], (px >> 16) & 0xFF)
            bump(h["b"], px & 0xFF)
            bump(h["a"], (px >> 24) & 0xFF)
        elif t[0] == "copy":
            lcode, _v, _b = lz77_code(t[1])
            bump(h["g"], 256 + lcode)
            dcode, _v2, _b2 = lz77_code(t[2] + 120)
            bump(h["d"], dcode)
        else:
            bump(h["g"], 280 + t[1])
    encs = []
    for h in hists:
        ge = write_prefix_code(w, h["g"], green_n)
        re_ = write_prefix_code(w, h["r"], 256)
        be = write_prefix_code(w, h["b"], 256)
        ae = write_prefix_code(w, h["a"], 256)
        de = write_prefix_code(w, h["d"], 40)
        encs.append((ge, re_, be, ae, de))
    for t in toks:
        gi = group_of_token(t[-1]) if group_of_token else 0
        ge, re_, be, ae, de = encs[gi]
        if t[0] == "lit":
            px = t[1]
            emit_sym(w, ge, (px >> 8) & 0xFF)
            emit_sym(w, re_, (px >> 16) & 0xFF)
            emit_sym(w, be, px & 0xFF)
            emit_sym(w, ae, (px >> 24) & 0xFF)
        elif t[0] == "copy":
            lcode, lv, lb = lz77_code(t[1])
            emit_sym(w, ge, 256 + lcode)
            if lb:
                w.put(lv, lb)
            dcode, dv, db = lz77_code(t[2] + 120)
            emit_sym(w, de, dcode)
            if db:
                w.put(dv, db)
        else:
            emit_sym(w, ge, 280 + t[1])


def write_image_stream(w, pixels, xsize, ysize, is_level0):
    """Sub-image writer (palette / meta / transform data): no
    transforms, no cache, no meta, literal tokens."""
    assert not is_level0
    # color cache flag
    w.put(0, 1)
    # NOTE: sub-images have no meta flag in the spec reader? libwebp
    # DecodeImageStream passes is_level0=False to ReadHuffmanCodes which
    # skips the meta-huffman read entirely — so no flag bit here.
    toks_pixels = pixels
    green_n = 256 + 24
    h = {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}}
    for px in toks_pixels:
        h["g"][(px >> 8) & 0xFF] = h["g"].get((px >> 8) & 0xFF, 0) + 1
        h["r"][(px >> 16) & 0xFF] = h["r"].get((px >> 16) & 0xFF, 0) + 1
        h["b"][px & 0xFF] = h["b"].get(px & 0xFF, 0) + 1
        h["a"][(px >> 24) & 0xFF] = h["a"].get((px >> 24) & 0xFF, 0) + 1
    ge = write_prefix_code(w, h["g"], green_n)
    re_ = write_prefix_code(w, h["r"], 256)
    be = write_prefix_code(w, h["b"], 256)
    ae = write_prefix_code(w, h["a"], 256)
    de = write_prefix_code(w, h["d"], 40)
    for px in toks_pixels:
        emit_sym(w, ge, (px >> 8) & 0xFF)
        emit_sym(w, re_, (px >> 16) & 0xFF)
        emit_sym(w, be, px & 0xFF)
        emit_sym(w, ae, (px >> 24) & 0xFF)


def fwd_color_delta(t, c):
    return _cdelta(t, c)


def _vp8l_build(img, subtract_green=False, cache_bits=0, use_lz77=True,
           palette=False, predictor_mode=None, predictor_bits=3,
           color_element=None, color_bits=3, meta_bits=0, ngroups=1):
    """Forward VP8L encoder over an (h, w, 3) uint8 RGB array."""
    h, wd, _ = img.shape
    pixels = [
        0xFF000000 | (int(img[y, x, 0]) << 16) | (int(img[y, x, 1]) << 8)
        | int(img[y, x, 2])
        for y in range(h)
        for x in range(wd)
    ]
    w = _Vp8lBitWriter()
    w.put(0x2F, 8)
    w.put(wd - 1, 14)
    w.put(h - 1, 14)
    w.put(0, 1)  # alpha hint
    w.put(0, 3)  # version
    xsize_eff = wd

    # ---- transforms, applied forward in stream order ----
    if predictor_mode is not None:
        bw = -(-wd // (1 << predictor_bits))
        bh = -(-h // (1 << predictor_bits))
        sub = [0xFF000000 | (predictor_mode << 8)] * (bw * bh)
        out = []
        for y in range(h):
            for x in range(wd):
                i = y * wd + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pixels[i - 1]
                elif x == 0:
                    pred = pixels[i - wd]
                else:
                    l = pixels[i - 1]
                    tt = pixels[i - wd]
                    tl = pixels[i - wd - 1]
                    tr = (
                        pixels[i - wd + 1]
                        if x + 1 < wd
                        else pixels[y * wd]
                    )
                    pred = predict(predictor_mode, l, tt, tr, tl)
                out.append(_pack(*(
                    (cp - cq) & 0xFF
                    for cq, cp in zip(_comps(pred), _comps(pixels[i]))
                )))
        pixels = out
        w.put(1, 1)
        w.put(0, 2)
        w.put(predictor_bits - 2, 3)
        write_image_stream(w, sub, bw, bh, is_level0=False)
    if color_element is not None:
        g2r, g2b, r2b = color_element
        bw = -(-wd // (1 << color_bits))
        bh = -(-h // (1 << color_bits))
        cx = 0xFF000000 | (g2r << 16) | (g2b << 8) | r2b
        sub = [cx] * (bw * bh)
        out = []
        for p in pixels:
            a, r, g, b = _comps(p)
            new_r = (r - _cdelta(g2r, g)) & 0xFF
            # r2b rides on the ORIGINAL red: the inverse recovers red
            # first, then applies delta(r2b, red)
            new_b = (b - _cdelta(g2b, g) - _cdelta(r2b, r)) & 0xFF
            out.append(_pack(a, new_r, g, new_b))
        pixels = out
        w.put(1, 1)
        w.put(1, 2)
        w.put(color_bits - 2, 3)
        write_image_stream(w, sub, bw, bh, is_level0=False)
    if subtract_green:
        out = []
        for p in pixels:
            a, r, g, b = _comps(p)
            out.append(_pack(a, (r - g) & 0xFF, g, (b - g) & 0xFF))
        pixels = out
        w.put(1, 1)
        w.put(2, 2)
    if palette:
        colors = []
        seen = {}
        for p in pixels:
            if p not in seen:
                seen[p] = len(colors)
                colors.append(p)
        psize = len(colors)
        assert psize <= 256
        if psize <= 2:
            width_bits = 3
        elif psize <= 4:
            width_bits = 2
        elif psize <= 16:
            width_bits = 1
        else:
            width_bits = 0
        bits_per = 8 >> width_bits
        pw = -(-wd // (1 << width_bits))
        packed = [0] * (pw * h)
        for y in range(h):
            for x in range(wd):
                idx = seen[pixels[y * wd + x]]
                packed[y * pw + (x >> width_bits)] |= idx << (
                    (x & ((1 << width_bits) - 1)) * bits_per
                )
        pixels = [0xFF000000 | (v << 8) for v in packed]
        # delta-code the palette for the stream
        dpal = []
        prev = 0
        for c in colors:
            a0, r0, g0, b0 = _comps(prev)
            a1, r1, g1, b1 = _comps(c)
            dpal.append(_pack(a1 - a0, r1 - r0, g1 - g0, b1 - b0))
            prev = c
        w.put(1, 1)
        w.put(3, 2)
        w.put(psize - 1, 8)
        write_image_stream(w, dpal, psize, 1, is_level0=False)
        xsize_eff = pw
    w.put(0, 1)  # end of transforms

    write_image_data(
        w, pixels, xsize_eff, h, cache_bits, use_lz77,
        meta_bits=meta_bits, ngroups=ngroups,
    )
    data = bytes((0x2F,)) + w.done()[1:]  # header byte already in buf
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) % 2:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body
